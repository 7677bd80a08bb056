#!/usr/bin/env python3
"""Pre-fetch a Scryfall bulk dump + card images into the offline layout
``ScryfallCatalog`` reads (mtgvision_tpu/data/catalog.py):

    root/bulk.json            # scryfall bulk list (array of card objects)
    root/images/{id}.jpg      # card face images

Run this OUTSIDE the training container (the container is zero-egress by
design; the framework itself never touches the network). Replaces the
reference's mtgdata/doorway lazy-download + FileLock stack
(mtgvision/encoder_datasets.py:531-537,632: ``dl_and_open_im_resized`` via
``ProxyDownloader``) with an explicit, resumable one-shot fetch:

- downloads are SKIPPED when the target file already exists (resume a
  crashed run by re-invoking — same semantics as qdrant_populate.py:73-75),
- a ``.lock`` file guards concurrent invocations (FileLock parity),
- Scryfall's API guidelines ask for <=10 req/s — the default delay honors
  that; images come from the static CDN so the limit is generous.

Usage:
    python scripts/fetch_scryfall.py --root ~/mtg-data [--kind unique_artwork]
        [--limit 1000] [--size normal] [--delay 0.11]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
import urllib.request

BULK_INDEX = "https://api.scryfall.com/bulk-data"
USER_AGENT = "mtgvision-tpu-fetch/1.0"


def _get(url: str) -> bytes:
    req = urllib.request.Request(url, headers={"User-Agent": USER_AGENT})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.read()


def fetch_bulk(root: pathlib.Path, kind: str) -> list[dict]:
    """Download the bulk card list (kind: default_cards | unique_artwork |
    oracle_cards) to root/bulk.json, unless it already exists."""
    out = root / "bulk.json"
    if out.exists():
        print(f"bulk.json exists — reusing ({out})")
        return json.loads(out.read_text())
    index = json.loads(_get(BULK_INDEX))
    uri = next(d["download_uri"] for d in index["data"] if d["type"] == kind)
    print(f"downloading bulk list {kind}: {uri}")
    records = json.loads(_get(uri))
    # keep only single-faced records with images (the reference's census
    # filtering, encoder_datasets.py:548-560 resolves faces similarly)
    records = [r for r in records if r.get("image_uris", {}).get("normal")]
    out.write_text(json.dumps(records))
    print(f"wrote {len(records)} records → {out}")
    return records


def fetch_images(
    root: pathlib.Path, records: list[dict], size: str, delay: float, limit: int | None
):
    imgdir = root / "images"
    imgdir.mkdir(parents=True, exist_ok=True)
    todo = records[:limit] if limit else records
    done = skipped = failed = 0
    for i, rec in enumerate(todo):
        dst = imgdir / f"{rec['id']}.jpg"
        if dst.exists():
            skipped += 1
            continue
        uri = rec.get("image_uris", {}).get(size)
        if not uri:
            failed += 1
            continue
        try:
            dst.write_bytes(_get(uri))
            done += 1
        except Exception as e:  # catch-and-continue, re-run to resume
            print(f"  ! {rec['id']}: {e}", file=sys.stderr)
            failed += 1
        time.sleep(delay)
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{len(todo)} (new {done}, cached {skipped}, failed {failed})")
    print(f"images: {done} downloaded, {skipped} already cached, {failed} failed")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="output dir (catalog root)")
    ap.add_argument("--kind", default="default_cards",
                    choices=["default_cards", "unique_artwork", "oracle_cards"])
    ap.add_argument("--size", default="normal",
                    choices=["small", "normal", "large", "png", "border_crop"])
    ap.add_argument("--delay", type=float, default=0.11, help="s between requests")
    ap.add_argument("--limit", type=int, default=None, help="max images (debug)")
    args = ap.parse_args(argv)

    root = pathlib.Path(args.root).expanduser()
    root.mkdir(parents=True, exist_ok=True)
    lock = root / ".lock"
    if lock.exists():
        sys.exit(f"{lock} exists — another fetch is running (delete it if stale)")
    lock.write_text(str(time.time()))
    try:
        records = fetch_bulk(root, args.kind)
        fetch_images(root, records, args.size, args.delay, args.limit)
    finally:
        lock.unlink(missing_ok=True)
    print(f"done — point ScryfallCatalog(root={root!s}) at this directory")


if __name__ == "__main__":
    main()
