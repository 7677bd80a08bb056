"""Full-system assembly + evaluation runner.

Loads trained detector/encoder checkpoints, populates the vector index from a
catalog, builds the fused FramePipeline, and scores the complete system
(detect → orient → rectify → embed → match) with eval/e2e_eval.py — the
closest reference analogue is the manual webcam loop (mtgvision/od_cam.py)
plus encoder-only validation (mtgvision/encoder_validate.py:22-114); here it
is one reproducible command:

    python -m mtgvision_tpu.eval.system --det <ckpt> --enc <ckpt> \
        --n-cards 512 --n-scenes 40

Checkpoint dirs may be either a slim inference export ({params[,batch_stats]}
orbax tree, as committed under artifacts_r1/) or a train CheckpointManager dir
(step_XXXXXXXX subdirs — the latest/best step is used and the train-state
wrapper is stripped).
"""

from __future__ import annotations

import argparse
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np


def _restore_tree(path: str | pathlib.Path) -> dict:
    """Orbax tree from a slim export dir or a CheckpointManager dir."""
    import orbax.checkpoint as ocp

    p = pathlib.Path(path)
    if not (p / "manifest.ocdbt").exists():
        steps = sorted(p.glob("step_*"))
        if not steps:
            raise FileNotFoundError(f"no checkpoint under {p}")
        p = steps[-1]
    raw = ocp.PyTreeCheckpointer().restore(str(p.resolve()))
    if "params" not in raw:
        # slim export of bare params (e.g. artifacts_r1/enc)
        return {"params": raw}
    # train-state trees carry params/batch_stats alongside opt_state — strip
    return {k: raw[k] for k in ("params", "batch_stats", "loss_weights") if k in raw and raw[k] is not None}


def load_detector(ckpt: str, size: str = "s", num_classes: int = 1, dtype=jnp.bfloat16):
    """(YoloSeg, variables) from a checkpoint dir."""
    from mtgvision_tpu.models.yolo import YoloSeg

    tree = _restore_tree(ckpt)
    model = YoloSeg(num_classes=num_classes, size=size, dtype=dtype)
    variables = {"params": tree["params"]}
    if tree.get("batch_stats"):
        variables["batch_stats"] = tree["batch_stats"]
    return model, variables


def load_encoder(
    ckpt: str,
    model_name: str = "cnvnxt2ae_atto",
    head_type: str = "conv+linear",
    dtype=jnp.bfloat16,
):
    """(ConvNeXtV2Encoder, variables) from an encoder/AE checkpoint dir."""
    from mtgvision_tpu.models.convnextv2ae import AE_SIZES, ConvNeXtV2Encoder
    from mtgvision_tpu.train.encoder_train import MODELS

    tree = _restore_tree(ckpt)
    params = tree["params"]
    # AE train states hold encoder params under params["encoder"]
    if "encoder" in params:
        params = params["encoder"]
    model = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, head_type=head_type,
        dtype=dtype, **AE_SIZES[MODELS[model_name]],
    )
    return model, {"params": params}


def build_system(
    det_ckpt: str,
    enc_ckpt: str,
    catalog=None,
    det_size: str = "s",
    det_kind: str = "seg",  # "seg" | "obb" (3 keypoint classes)
    enc_model: str = "cnvnxt2ae_atto",
    max_det: int = 8,
    score_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    populate_batch: int = 64,
    refine: bool = False,
    refine_crop: bool = True,
    both_orientations: bool = True,
    fast_dewarp: bool = True,
    orient_sign: str = "notch",
    orient_head_ckpt: str = "",
    refine_head_ckpt: str = "",
    refine_redewarp: bool = False,
    refine_iters: int = 1,
    refine_head_flip: bool = True,
    box_snap: bool = False,
    top_k: int = 5,
    flip_aware_index: bool = False,
    sel_redewarp: int = 0,
    flip_vote_m: int = 1,
    dewarp_window: int = 192,
):
    """(FramePipeline with store attached, catalog). Populates the index by
    embedding every catalog card's crop (qdrant_populate.py:70-90 semantics)."""
    from mtgvision_tpu.data.catalog import ProceduralCatalog
    from mtgvision_tpu.index.populate import populate_card_info, populate_index
    from mtgvision_tpu.index.store import VectorStore
    from mtgvision_tpu.infer.pipeline import FramePipeline

    if catalog is None:
        catalog = ProceduralCatalog(n_cards=512)

    det, det_vars = load_detector(
        det_ckpt, size=det_size, num_classes=3 if det_kind == "obb" else 1
    )
    enc, enc_vars = load_encoder(enc_ckpt, model_name=enc_model)

    # params ride as a jit ARGUMENT — closing over them bakes multi-MB
    # weight literals into the HLO, which remote compile services reject
    embed = jax.jit(enc.apply)

    def predict_batch(crops: np.ndarray) -> np.ndarray:
        return np.asarray(embed(enc_vars, jnp.asarray(crops, jnp.float32)))

    # flip_aware_index: populate both orientation halves so serving decides
    # the 180° flip from ONE encoder pass (index/store.py flip_aware)
    store = VectorStore(dim=768, flip_aware=flip_aware_index)
    populate_index(store, catalog, predict_batch, batch_size=populate_batch,
                   crop_hw=(192, 128))
    populate_card_info(store, catalog)

    head = head_vars = None
    if orient_head_ckpt:
        from mtgvision_tpu.models.orient_head import OrientHead

        head = OrientHead()
        head_vars = _restore_tree(orient_head_ckpt)
        head_vars = {"params": head_vars["params"]}

    rhead = rhead_vars = None
    if refine_head_ckpt:
        from mtgvision_tpu.models.refine_head import RefineHead

        rhead = RefineHead()
        rhead_vars = {"params": _restore_tree(refine_head_ckpt)["params"]}

    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=store,
        det_kind=det_kind,
        max_det=max_det, score_thresh=score_thresh, iou_thresh=iou_thresh,
        refine=refine, refine_crop=refine_crop,
        both_orientations=both_orientations,
        fast_dewarp=fast_dewarp, orient_sign=orient_sign,
        orient_head=head, orient_head_vars=head_vars,
        refine_head=rhead, refine_head_vars=rhead_vars,
        refine_redewarp=refine_redewarp,
        refine_iters=refine_iters,
        refine_head_flip=refine_head_flip,
        sel_redewarp=sel_redewarp,
        flip_vote_m=flip_vote_m,
        dewarp_window=dewarp_window,
        box_snap=box_snap,
        # default 5 so reported top-5 metrics are true top-5: the
        # FramePipeline serving default (top_k=3, reference server.py:189)
        # silently capped the eval's "top5" at top-3 before this
        top_k=top_k,
    )
    return pipe, catalog


def _ckpt_id(path: str) -> str | None:
    """Resolved checkpoint identity (latest step dir for train-ckpt dirs) —
    part of the self-describing artifact config block."""
    if not path:
        return None
    p = pathlib.Path(path)
    if not (p / "manifest.ocdbt").exists():
        steps = sorted(p.glob("step_*"))
        if steps:
            return str(steps[-1])
    return str(p)


def main(argv=None):
    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.scene_gen import SceneGenerator
    from mtgvision_tpu.eval.e2e_eval import evaluate_e2e

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--det", required=True, help="detector checkpoint dir")
    ap.add_argument("--enc", required=True, help="encoder checkpoint dir")
    ap.add_argument("--det-size", default="s")
    ap.add_argument("--det-kind", default="seg", choices=("seg", "obb"))
    ap.add_argument("--enc-model", default="cnvnxt2ae_atto")
    ap.add_argument("--n-cards", type=int, default=512)
    ap.add_argument("--n-scenes", type=int, default=40)
    ap.add_argument("--score-thresh", type=float, default=0.25)
    ap.add_argument("--iou-thresh", type=float, default=0.45,
                    help="NMS box-IoU threshold (overlapping rotated cards "
                    "can exceed 0.45 while quads barely intersect)")
    ap.add_argument("--max-cards", type=int, default=4)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--details-out", default=None,
                    help="write per-GT-card diagnostic records (JSONL)")
    # pipeline-option ablations (y/n)
    ap.add_argument("--orient-head", default="", help="OrientHead ckpt dir")
    ap.add_argument("--refine-head", default="", help="RefineHead ckpt dir")
    ap.add_argument("--refine-redewarp", default="n", choices=("y", "n"),
                    help="re-dewarp off refined corners before embedding")
    ap.add_argument("--refine-iters", type=int, default=1,
                    help="refine head passes (>1 needs --refine-redewarp y)")
    ap.add_argument("--sel-redewarp", type=int, default=0,
                    help="re-dewarp + second refine pass on only the N "
                    "highest-offset slots per frame (conditional compute; "
                    "the embedding of those slots comes from the corrected "
                    "crop). 0 = off; ignored with --refine-redewarp y")
    ap.add_argument("--flip-aware-index", default="n", choices=("y", "n"),
                    help="populate upright + 180deg embeddings; orientation "
                    "decided by the matched matrix half (one encoder pass)")
    ap.add_argument("--flip-vote-m", type=int, default=1,
                    help="flip-aware orientation from a score-weighted vote "
                    "over the top-M candidates' halves (1 = rank-0 only)")
    ap.add_argument("--dewarp-window", type=int, default=192,
                    help="two-pass dewarp window px (ops/warp.dewarp_quad); "
                    "cost ~window^2, resolution loss bounded at 1/sqrt(2) "
                    "in narrow card-size bands")
    ap.add_argument("--refine-head-flip", default="y", choices=("y", "n"),
                    help="n = head corrects corners only; orientation decided "
                    "by dual-orientation embedding + index match")
    ap.add_argument("--box-snap", default="n", choices=("y", "n"),
                    help="snap moment-quad scale/center to the amodal box")
    ap.add_argument("--oracle", default="n", choices=("y", "n"),
                    help="GT-corner oracle: embed+match tail only "
                    "(appearance-limited ceiling, evaluate_oracle)")
    ap.add_argument("--refine", default="n", choices=("y", "n"))
    ap.add_argument("--refine-crop", default="n", choices=("y", "n"))
    ap.add_argument("--both-orientations", default="y", choices=("y", "n"))
    ap.add_argument("--fast-dewarp", default="y", choices=("y", "n"))
    ap.add_argument("--orient-sign", default="notch", choices=("notch", "extent"))
    ap.add_argument("--seed", type=int, default=0, help="scene-stream seed")
    ap.add_argument(
        "--min-area-ratio", type=float, default=0.02,
        help="scene card size floor (place_card min_area_ratio; the "
        "reference convention maps 0.02 to cards as small as ~700 px² — "
        "raise for a serving-like 'card held to webcam' distribution)",
    )
    # scene-distribution knobs (reference ACTIVE config: --ratio-bg 0.1
    # --jitter 0.7 --min-visible-edge 0.0, od_datasets.py:861-873)
    ap.add_argument("--ratio-bg", type=float, default=0.0,
                    help="fraction of pure-background scenes (FP probe)")
    ap.add_argument("--jitter", type=float, default=0.3,
                    help="corner jitter ratio for placed cards")
    ap.add_argument("--min-visible-edge", type=float, default=1.0,
                    help="min in-frame visible fraction (clamped up to 0.5)")
    ap.add_argument("--num-cards-min", type=int, default=1)
    ap.add_argument("--track-frames", type=int, default=0,
                    help="N>0: track-level protocol — render each scene as "
                    "an N-frame jittered sequence, run the tracker + EWMA "
                    "temporal fusion (server parity), score per TRACK "
                    "(eval/track_eval.py)")
    args = ap.parse_args(argv)
    if args.refine_iters > 1 and args.refine_redewarp != "y":
        ap.error("--refine-iters > 1 requires --refine-redewarp y (the "
                 "pipeline clamps to one pass otherwise, and the run would "
                 "be mislabeled as multi-iteration)")

    catalog = ProceduralCatalog(n_cards=args.n_cards)
    pipe, _ = build_system(
        args.det, args.enc, catalog,
        det_size=args.det_size, det_kind=args.det_kind, enc_model=args.enc_model,
        score_thresh=args.score_thresh,
        iou_thresh=args.iou_thresh,
        refine=args.refine == "y",
        refine_crop=args.refine_crop == "y",
        both_orientations=args.both_orientations == "y",
        fast_dewarp=args.fast_dewarp == "y",
        orient_sign=args.orient_sign,
        orient_head_ckpt=args.orient_head,
        refine_head_ckpt=args.refine_head,
        refine_redewarp=args.refine_redewarp == "y",
        refine_iters=args.refine_iters,
        refine_head_flip=args.refine_head_flip == "y",
        flip_aware_index=args.flip_aware_index == "y",
        box_snap=args.box_snap == "y",
        sel_redewarp=args.sel_redewarp,
        flip_vote_m=args.flip_vote_m,
        dewarp_window=args.dewarp_window,
    )
    gen = SceneGenerator(
        catalog, ProceduralBackgrounds(), num_cards_min=args.num_cards_min,
        num_cards_max=args.max_cards, seed=args.seed,
        card_min_area_ratio=args.min_area_ratio,
        card_jitter_ratio=args.jitter,
        card_min_visible_edge=args.min_visible_edge,
        ratio_bg=args.ratio_bg,
    )
    details: list | None = [] if args.details_out else None
    # self-describing artifacts (r5): every eval JSON embeds the FULL
    # invocation config + resolved checkpoint steps + backend, so no
    # provenance archaeology is ever needed to interpret a number
    config_block = {
        **{k.replace("_", "-"): v for k, v in vars(args).items()},
        "det-resolved": _ckpt_id(args.det),
        "enc-resolved": _ckpt_id(args.enc),
        "refine-head-resolved": _ckpt_id(args.refine_head),
        "backend": jax.devices()[0].platform,
    }
    if args.track_frames > 0:
        from mtgvision_tpu.eval.track_eval import evaluate_tracked

        tstats = evaluate_tracked(
            pipe, gen, n_scenes=args.n_scenes, n_frames=args.track_frames,
            details=details,
        )
        print(tstats)
        rec = {
            "track_recall": tstats.track_recall,
            "top1_ewma": tstats.top1_ewma,
            "top5_ewma": tstats.top5_ewma,
            "top1_vote": tstats.top1_vote,
            "flip_rate": tstats.flip_rate,
            "frame_top1": tstats.frame_top1,
            "n_gt": tstats.n_gt,
            "n_tracked": tstats.n_tracked,
            "n_frame_obs": tstats.n_frame_obs,
            "config": config_block,
        }
        print(json.dumps(rec))
        if args.json_out:
            pathlib.Path(args.json_out).write_text(json.dumps(rec))
        if args.details_out:
            with open(args.details_out, "w") as f:
                for d in details:
                    f.write(json.dumps(d) + "\n")
        return tstats
    if args.oracle == "y":
        from mtgvision_tpu.eval.e2e_eval import evaluate_oracle

        stats = evaluate_oracle(pipe, gen, n_scenes=args.n_scenes, details=details)
    else:
        stats = evaluate_e2e(pipe, gen, n_scenes=args.n_scenes, details=details)
    print(stats)
    rec = {
        "recall": stats.recall, "top1": stats.top1, "top5": stats.top5,
        "corner_err_px": stats.mean_corner_err,
        "quad_err_px": stats.mean_oriented_err, "flip_rate": stats.flip_rate,
        "n_gt": stats.n_gt, "n_detected": stats.n_detected,
        "top1_idable": stats.top1_idable, "top5_idable": stats.top5_idable,
        "n_gt_idable": stats.n_gt_idable,
        "n_detected_idable": stats.n_detected_idable,
        "precision": stats.precision, "fp_per_frame": stats.fp_per_frame,
        "n_valid_det": stats.n_valid_det, "n_fp": stats.n_fp,
        "bg_fp_per_frame": stats.bg_fp_per_frame,
        "n_bg_frames": stats.n_bg_frames,
        "recall_clipped": stats.recall_clipped,
        "recall_unclipped": stats.recall_unclipped,
        "n_gt_clipped": stats.n_gt_clipped,
        "config": config_block,
    }
    if args.oracle == "y":
        # evaluate_oracle never populates the FP/precision/bg/clipped
        # counters (recall is 1.0 by construction, there are no unmatched
        # detections); serializing their zero defaults reads as a
        # catastrophic false-positive rate on an otherwise-perfect run
        for k in ("precision", "fp_per_frame", "n_valid_det", "n_fp",
                  "bg_fp_per_frame", "n_bg_frames", "recall_clipped",
                  "recall_unclipped", "n_gt_clipped"):
            rec[k] = None
    print(json.dumps(rec))
    if args.json_out:
        pathlib.Path(args.json_out).write_text(json.dumps(rec))
    if args.details_out:
        with open(args.details_out, "w") as f:
            for d in details:
                f.write(json.dumps(d) + "\n")
    return stats


if __name__ == "__main__":
    main()
