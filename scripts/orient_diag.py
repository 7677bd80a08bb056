"""Orientation-sign + corner diagnostics on PREDICTED detector masks.

Isolates the geometric post-process from retrieval: runs the detector on
generated scenes with known GT quads, then scores every (sign_mode, refine)
variant of orient_corners/refine_corners on the same masks — initial-guess
flip rate and corner error, before any index-match disambiguation.

    python scripts/run_cpu.py scripts.orient_diag --det artifacts_r1/det_long
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--det", required=True)
    ap.add_argument("--det-size", default="s")
    ap.add_argument("--n-scenes", type=int, default=25)
    ap.add_argument("--n-cards", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args(argv)

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.scene_gen import SceneGenerator, card_bbox
    from mtgvision_tpu.eval.e2e_eval import _scene_with_gt, apply_m
    from mtgvision_tpu.eval.system import load_detector
    from mtgvision_tpu.infer.orient import orient_corners, refine_corners
    from mtgvision_tpu.models.yolo import detect

    det, det_vars = load_detector(args.det, size=args.det_size)
    catalog = ProceduralCatalog(n_cards=args.n_cards)
    gen = SceneGenerator(
        catalog, ProceduralBackgrounds(), num_cards_min=1, num_cards_max=4,
        seed=args.seed,
    )
    card_hw = catalog.card_hw

    detect_j = jax.jit(
        lambda v, f: detect(v, det, f, max_det=8, score_thresh=0.25)
    )

    variants = {
        "notch": dict(sign_mode="notch", refine=False),
        "extent": dict(sign_mode="extent", refine=False),
        "notch+refine": dict(sign_mode="notch", refine=True),
        "extent+refine": dict(sign_mode="extent", refine=True),
        # r1 behavior: binarize the sigmoid mask before the moment math
        "notch.bin": dict(sign_mode="notch", refine=False, binary=True),
        "extent.bin": dict(sign_mode="extent", refine=False, binary=True),
    }

    def corners_fn(mask, sign_mode, refine, binary=False):
        m = (mask > 0.5).astype(jnp.float32) if binary else mask
        c, ok = orient_corners(m, sign_mode=sign_mode)
        if refine:
            c = refine_corners(mask, c)
        return c, ok

    fns = {
        name: jax.jit(jax.vmap(lambda m, kw=kw: corners_fn(m, **kw)))
        for name, kw in variants.items()
    }

    agg = {name: dict(n=0, flips=0, err=0.0, qerr=0.0) for name in variants}
    for _ in range(args.n_scenes):
        s, gt = _scene_with_gt(gen)
        boxes, scores, classes, masks, valid = detect_j(
            det_vars, jnp.asarray(s)[None]
        )
        h = s.shape[0]
        masks0 = masks[0]
        scale = h / masks0.shape[1]
        valid0 = np.asarray(valid[0])
        for name, fn in fns.items():
            cs, oks = fn(masks0)
            cs = np.asarray(cs) * scale
            oks = np.asarray(oks) & valid0
            cents = cs.mean(1)
            used = set()
            for card, m in gt:
                quad = apply_m(card_bbox(card_hw), m)
                c = quad.mean(0)
                best, best_d = None, 64.0
                for d in np.where(oks)[0]:
                    if d in used:
                        continue
                    dist = float(np.linalg.norm(cents[d] - c))
                    if dist < best_d:
                        best, best_d = d, dist
                if best is None:
                    continue
                used.add(best)
                err = float(np.linalg.norm(cs[best] - quad, axis=1).mean())
                err_f = float(
                    np.linalg.norm(np.roll(cs[best], 2, axis=0) - quad, axis=1).mean()
                )
                a = agg[name]
                a["n"] += 1
                a["flips"] += err_f < err
                a["err"] += err
                a["qerr"] += min(err, err_f)

    out = {}
    for name, a in agg.items():
        n = max(a["n"], 1)
        out[name] = {
            "n": a["n"],
            "flip_rate": round(a["flips"] / n, 4),
            "corner_err_px": round(a["err"] / n, 2),
            "quad_err_px": round(a["qerr"] / n, 2),
        }
        print(name, json.dumps(out[name]), flush=True)
    if args.json_out:
        import pathlib

        pathlib.Path(args.json_out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
