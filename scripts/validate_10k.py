"""Retrieval validation at reference scale (VERDICT r1 item 3).

Mirrors the reference's protocol (encoder_validate.py:41-99): populate a
>=10k-card index with the trained encoder, then measure top-1/top-5 for the
orig / crop / virtual variants over all 10k cards.

    python scripts/validate_10k.py --enc artifacts_r2/enc_long \
        --model-name cnvnxt2ae_nano --n 10000 --out artifacts_r2/validate_10k.json
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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--enc", required=True, help="encoder checkpoint dir")
    ap.add_argument("--model-name", default="cnvnxt2ae_nano")
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--n-cards", type=int, default=10_000, help="catalog size")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--confusable", default="n", choices=("y", "n"),
        help="same-name printings differ only in the set-symbol glyph "
        "(the real-Scryfall difficulty; de-saturates the benchmark)",
    )
    args = ap.parse_args(argv)

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.eval.system import load_encoder
    from mtgvision_tpu.eval.validate import validate_retrieval
    from mtgvision_tpu.index.populate import populate_index
    from mtgvision_tpu.index.store import VectorStore

    enc, enc_vars = load_encoder(args.enc, model_name=args.model_name)
    apply = jax.jit(lambda x: enc.apply(enc_vars, x))

    def encode_batch(x: np.ndarray) -> np.ndarray:
        # pad the tail chunk so one program shape serves the whole run
        b = x.shape[0]
        if b < args.batch_size:
            x = np.concatenate(
                [x, np.zeros((args.batch_size - b, *x.shape[1:]), x.dtype)]
            )
        return np.asarray(apply(jnp.asarray(x)))[:b]

    catalog = ProceduralCatalog(
        n_cards=args.n_cards, confusable=args.confusable == "y"
    )
    backgrounds = ProceduralBackgrounds()
    store = VectorStore(dim=768)

    t0 = time.time()
    added = populate_index(
        store, catalog, encode_batch, batch_size=args.batch_size, progress=True
    )
    t_pop = time.time() - t0
    print(f"populated {added} cards in {t_pop:.1f}s", flush=True)

    t0 = time.time()
    stats = validate_retrieval(
        store, catalog, backgrounds, encode_batch,
        n=args.n, batch_size=args.batch_size,
    )
    t_val = time.time() - t0

    rec = {
        "n_index": len(store),
        "n_eval": args.n,
        "confusable": args.confusable == "y",
        "encoder": args.enc,
        "model": args.model_name,
        "populate_s": round(t_pop, 1),
        "validate_s": round(t_val, 1),
        **{
            f"{m}_top{k}": round(getattr(s, f"acc{k}"), 4)
            for m, s in stats.items()
            for k in (1, 5)
        },
    }
    print(json.dumps(rec), flush=True)
    if args.out:
        pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        pathlib.Path(args.out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
