"""OBB-kind detector evaluation: per-class recall + box IoU on GT scenes.

The reference ships two dataset kinds (od_datasets.py:244-268): "seg"
(notch-mask instance seg) and "obb" (3 keypoint classes: card / card_top /
card_bottom). This scores a trained obb detector the way e2e_eval scores the
seg kind: generate scenes with known placements, compute the analytic GT
keypoint boxes (train/od_train.obb_gt_from_ms), and measure per-class
detection recall at an IoU threshold plus mean matched IoU.

    python scripts/obb_eval.py --det artifacts_r2/det_obb --n-scenes 25
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def box_iou_np(a, b):
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    area = lambda x: max(x[2] - x[0], 0) * max(x[3] - x[1], 0)  # noqa: E731
    return inter / max(area(a) + area(b) - inter, 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--det", required=True)
    ap.add_argument("--det-size", default="n")
    ap.add_argument("--n-scenes", type=int, default=25)
    ap.add_argument("--n-cards", type=int, default=256)
    ap.add_argument("--img-size", type=int, default=640,
                    help="scene side; match the detector's train img_size")
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--score-thresh", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args(argv)

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.scene_gen import SceneGenerator
    from mtgvision_tpu.eval.e2e_eval import _scene_with_gt
    from mtgvision_tpu.eval.system import load_detector
    from mtgvision_tpu.models.yolo import detect
    from mtgvision_tpu.train.od_train import obb_gt_from_ms

    det, det_vars = load_detector(args.det, size=args.det_size, num_classes=3)
    catalog = ProceduralCatalog(n_cards=args.n_cards)
    gen = SceneGenerator(
        catalog, ProceduralBackgrounds(), num_cards_min=1, num_cards_max=4,
        bg_size_hw=(args.img_size, args.img_size), seed=args.seed,
    )
    card_hw = catalog.card_hw

    detect_j = jax.jit(
        lambda v, f: detect(
            v, det, f, max_det=24, score_thresh=args.score_thresh
        )
    )

    from mtgvision_tpu.data.scene_gen import apply_m, card_bbox
    from mtgvision_tpu.infer.obb import obb_card_corners

    names = ("card", "card_top", "card_bottom")
    agg = {c: dict(gt=0, hit=0, iou=0.0) for c in names}
    quad_errs: list[float] = []
    n_quads = 0
    scenes_done = 0
    for _ in range(args.n_scenes * 4):
        if scenes_done >= args.n_scenes:
            break
        s, gt = _scene_with_gt(gen)
        if not gt:
            # rejection placement can fail every attempt (small img_size),
            # leaving a pure-background scene — nothing to score
            continue
        scenes_done += 1
        h = s.shape[0]
        ms = jnp.asarray(np.stack([m for _, m in gt]))[None]
        val = jnp.ones((1, ms.shape[1]), jnp.float32)
        gt_boxes, gt_labels, gt_valid = (
            np.asarray(x[0])
            for x in obb_gt_from_ms(ms, val, card_hw, (h, s.shape[1]))
        )
        boxes, scores, classes, masks, valid = detect_j(
            det_vars, jnp.asarray(s)[None]
        )
        boxes = np.asarray(boxes[0])
        classes = np.asarray(classes[0])
        ok = np.asarray(valid[0])
        used = set()
        for g in range(len(gt_boxes)):
            if not gt_valid[g]:
                continue
            cname = names[int(gt_labels[g])]
            agg[cname]["gt"] += 1
            best, best_iou = None, args.iou
            for d in np.where(ok)[0]:
                if d in used or int(classes[d]) != int(gt_labels[g]):
                    continue
                iou = box_iou_np(boxes[d], gt_boxes[g])
                if iou > best_iou:
                    best, best_iou = d, iou
            if best is not None:
                used.add(best)
                agg[cname]["hit"] += 1
                agg[cname]["iou"] += best_iou

        # oriented quad recovery (infer/obb.py): associate card/top/bottom
        # dets, solve the rotated rect, score ORIENTED corner error vs GT
        rec_c, rec_ok, _ = (
            np.asarray(x)
            for x in obb_card_corners(
                jnp.asarray(boxes), scores[0], jnp.asarray(classes),
                jnp.asarray(ok), max_cards=8,
            )
        )
        gt_quads = [apply_m(card_bbox(card_hw), m) for _, m in gt]
        n_quads += len(gt_quads)
        for q in gt_quads:
            ctr = q.mean(0)
            cand = [
                i for i in range(len(rec_ok))
                if rec_ok[i]
                and np.linalg.norm(rec_c[i].mean(0) - ctr) < 0.5 * np.ptp(q)
            ]
            if not cand:
                continue
            i = min(cand, key=lambda i: np.linalg.norm(rec_c[i].mean(0) - ctr))
            quad_errs.append(float(np.linalg.norm(rec_c[i] - q, axis=-1).mean()))

    rec = {"det": args.det, "iou_thresh": args.iou}
    rec["n_scenes_scored"] = scenes_done
    if scenes_done < args.n_scenes:
        print(
            f"warning: only {scenes_done}/{args.n_scenes} scenes had "
            "placeable cards; metrics cover those scenes only",
            file=sys.stderr,
        )
    rec["quad_recall"] = round(len(quad_errs) / max(n_quads, 1), 4)
    rec["quad_err_px"] = round(
        float(np.mean(quad_errs)) if quad_errs else float("nan"), 2
    )
    for c, a in agg.items():
        rec[f"{c}_recall"] = round(float(a["hit"]) / max(a["gt"], 1), 4)
        rec[f"{c}_mean_iou"] = round(float(a["iou"]) / max(a["hit"], 1), 4)
        rec[f"{c}_n_gt"] = int(a["gt"])
    print(json.dumps(rec), flush=True)
    if args.json_out:
        pathlib.Path(args.json_out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
