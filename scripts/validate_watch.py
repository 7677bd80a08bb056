"""Checkpoint watcher: retrieval-validate every encoder checkpoint as it lands.

Training loss (circle) is a noisy proxy — r1/r2 evidence: the 30k checkpoint
scores WORSE e2e top-1 than the 10k one despite lower loss. This watcher runs
the encoder_validate protocol (orig/crop/virtual top-1/top-5, eval/validate.py)
on each new step_XXXXXXXX under --ckpt-dir and appends one JSON line per
checkpoint to --out, so the serving export can pick the best checkpoint by
RETRIEVAL accuracy.

Run on the CPU backend to leave the chip to the trainer:

    python scripts/run_cpu.py scripts.validate_watch --ckpt-dir artifacts_r2/enc_long
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def validate_ckpt(step_dir: pathlib.Path, args) -> dict:
    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.eval.system import load_encoder
    from mtgvision_tpu.eval.validate import validate_retrieval
    from mtgvision_tpu.index.populate import populate_index
    from mtgvision_tpu.index.store import VectorStore

    enc, enc_vars = load_encoder(str(step_dir), model_name=args.model_name)
    apply = jax.jit(lambda x: enc.apply(enc_vars, x))

    def encode_batch(x: np.ndarray) -> np.ndarray:
        b = x.shape[0]
        if b < args.batch_size:
            x = np.concatenate(
                [x, np.zeros((args.batch_size - b, *x.shape[1:]), x.dtype)]
            )
        return np.asarray(apply(jnp.asarray(x)))[:b]

    catalog = ProceduralCatalog(n_cards=args.n_cards)
    store = VectorStore(dim=768)
    populate_index(store, catalog, encode_batch, batch_size=args.batch_size)
    stats = validate_retrieval(
        store, catalog, ProceduralBackgrounds(), encode_batch,
        n=args.n, batch_size=args.batch_size,
    )
    return {
        f"{m}_top{k}": round(getattr(s, f"acc{k}"), 4)
        for m, s in stats.items()
        for k in (1, 5)
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--model-name", default="cnvnxt2ae_nano")
    ap.add_argument("--n-cards", type=int, default=512)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--out", default="")
    ap.add_argument("--poll-s", type=int, default=120)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args(argv)

    ckpt_dir = pathlib.Path(args.ckpt_dir)
    out = pathlib.Path(args.out or (ckpt_dir / "validate_watch.jsonl"))
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                done.add(json.loads(line)["step"])
            except Exception:  # noqa: BLE001
                pass

    while True:
        steps = sorted(ckpt_dir.glob("step_*"))
        new = [s for s in steps if int(s.name.split("_")[1]) not in done]
        for s in new:
            step = int(s.name.split("_")[1])
            try:
                rec = {"step": step, **validate_ckpt(s, args)}
            except Exception as e:  # noqa: BLE001 — ckpt may be mid-write
                print(f"step {step}: {e}", file=sys.stderr, flush=True)
                continue
            done.add(step)
            with out.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        if args.once:
            break
        time.sleep(args.poll_s)


if __name__ == "__main__":
    main()
