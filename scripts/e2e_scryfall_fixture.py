"""Full-system e2e over the REAL data path at fixture scale: ScryfallCatalog
(bulk.json records + root/images/{id}.jpg cache dir, the reference's layout —
mtgvision/encoder_datasets.py:515-668) → index populate with real payload
metadata → scene generation → detect→orient→rectify→embed→match → scored
artifact.

This container is zero-egress, so card FACES are rendered deterministically
per card id (same trick as tests/test_scryfall.py) and written as JPEG so the
run exercises the native libjpeg decode path — everything else (bulk parsing,
id/name/set indexes, image-dir loading, payload population, the whole serving
pipeline) is exactly what a real Scryfall dump would hit. Swap in a real
``bulk.json`` + scan images and the command is unchanged:

    python scripts/e2e_scryfall_fixture.py --det artifacts_r3/det_seg \
        --enc artifacts_r2/enc_long --out artifacts_r3/e2e_scryfall_fixture.json
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def build_root(work: pathlib.Path, bulk_src: pathlib.Path) -> pathlib.Path:
    """Render each bulk record a deterministic CARD-STRUCTURED face (frame +
    art + title + text box, the ProceduralCatalog renderer keyed by the real
    id/name/set) so the detector sees in-domain card geometry — the run
    measures the ScryfallCatalog data path, not pixel-domain transfer."""
    from mtgvision_tpu.data.catalog import Card, ProceduralCatalog

    renderer = ProceduralCatalog(n_cards=1)
    work.mkdir(parents=True, exist_ok=True)
    (work / "bulk.json").write_text(bulk_src.read_text())
    imgdir = work / "images"
    imgdir.mkdir(exist_ok=True)
    from PIL import Image

    for rec in json.loads(bulk_src.read_text()):
        p = imgdir / f"{rec['id']}.jpg"
        if not p.exists():
            card = Card(id=rec["id"], name=rec["name"], set_code=rec["set"])
            arr = (renderer.get_image(card) * 255).astype(np.uint8)
            Image.fromarray(arr).save(p, quality=92)
    return work


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--det", default="artifacts_r3/det_seg")
    ap.add_argument("--enc", default="artifacts_r2/enc_long")
    ap.add_argument("--enc-model", default="cnvnxt2ae_nano")
    ap.add_argument("--refine-head", default="artifacts_r4/refine_head")
    # defaults = the UNIFIED serving config (one config contract: exactly
    # what bench.py times and eval_protocols scores — the r4 run of this
    # fixture used the r3 quality config, violating that contract)
    ap.add_argument("--refine-head-flip", default="n", choices=("y", "n"))
    ap.add_argument("--refine-redewarp", default="n", choices=("y", "n"))
    ap.add_argument("--refine-iters", type=int, default=1)
    ap.add_argument("--sel-redewarp", type=int, default=0)
    ap.add_argument("--flip-vote-m", type=int, default=1)
    ap.add_argument("--dewarp-window", type=int, default=192)
    ap.add_argument("--score-thresh", type=float, default=0.15)
    ap.add_argument("--flip-aware-index", default="y", choices=("y", "n"))
    ap.add_argument("--control", default="y", choices=("y", "n"),
                    help="also run the SAME protocol on a ProceduralCatalog "
                    "of equal size — the in-artifact control that isolates "
                    "the ScryfallCatalog data path from protocol difficulty")
    ap.add_argument("--bulk", default="tests/fixtures/scryfall/bulk.json")
    ap.add_argument("--work", default=".run/scryfall_fixture")
    ap.add_argument("--n-scenes", type=int, default=20)
    ap.add_argument("--out", default="artifacts_r3/e2e_scryfall_fixture.json")
    ap.add_argument("--details-out", default=None)
    args = ap.parse_args(argv)

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ScryfallCatalog
    from mtgvision_tpu.data.scene_gen import SceneGenerator
    from mtgvision_tpu.eval.e2e_eval import evaluate_e2e
    from mtgvision_tpu.eval.system import build_system

    from mtgvision_tpu.data.catalog import ProceduralCatalog

    root = build_root(pathlib.Path(args.work), pathlib.Path(args.bulk))
    catalog = ScryfallCatalog(root)

    def run_one(cat):
        pipe, _ = build_system(
            args.det, args.enc, cat, enc_model=args.enc_model,
            refine_head_ckpt=args.refine_head,
            refine_redewarp=args.refine_redewarp == "y",
            refine_iters=args.refine_iters,
            refine_head_flip=args.refine_head_flip == "y",
            score_thresh=args.score_thresh,
            flip_aware_index=args.flip_aware_index == "y",
            sel_redewarp=args.sel_redewarp,
            flip_vote_m=args.flip_vote_m,
            dewarp_window=args.dewarp_window,
        )
        gen = SceneGenerator(
            cat, ProceduralBackgrounds(), num_cards_min=1, num_cards_max=2,
            card_min_area_ratio=0.10, seed=0,
        )
        details = [] if args.details_out else None
        stats = evaluate_e2e(pipe, gen, n_scenes=args.n_scenes, details=details)
        return pipe, stats, details

    pipe, stats, details = run_one(catalog)
    # real-metadata payloads must have made it into the store
    sample = pipe.store.retrieve([next(iter(catalog)).id])[0]
    assert sample.payload and "name" in sample.payload, sample.payload
    if details is not None:
        with open(args.details_out, "w") as f:
            for d in details:
                f.write(json.dumps(d) + "\n")
    control = None
    if args.control == "y":
        _, cstats, _ = run_one(ProceduralCatalog(n_cards=len(catalog)))
        control = {
            "recall": cstats.recall, "top1": cstats.top1,
            "corner_err_px": cstats.mean_corner_err,
            "quad_err_px": cstats.mean_oriented_err,
            "flip_rate": cstats.flip_rate,
        }
    print(stats)
    rec = {
        "catalog": "ScryfallCatalog", "n_index": len(pipe.store),
        "bulk": str(args.bulk), "payload_sample": sample.payload,
        "recall": stats.recall, "precision": stats.precision,
        "top1": stats.top1, "top5": stats.top5,
        "corner_err_px": stats.mean_corner_err,
        "quad_err_px": stats.mean_oriented_err, "flip_rate": stats.flip_rate,
        "n_gt": stats.n_gt, "n_detected": stats.n_detected,
        "procedural_control": control,
        # self-describing artifact (r5): the full invocation config
        "config": {k.replace("_", "-"): v for k, v in vars(args).items()},
    }
    print(json.dumps(rec))
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(args.out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
