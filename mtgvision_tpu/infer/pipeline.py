"""End-to-end fused frame program: detect → orient → rectify → embed → match.

The reference runs this as four separate systems with host round-trips
(mtgvision/server.py:133-205: ultralytics CoreML segmenter → shapely/cv2
orientation (od_export.py:52-110) → CoreML encoder (encoder_export.py:85-110)
→ HTTP Qdrant query (qdrant.py:76)). Here the whole per-frame compute is ONE
jitted XLA program on padded detection slots:

    frame (B,640,640,3)
      → YoloSeg + fixed-shape NMS            (models/yolo.py)
      → per-slot mask → oriented corners     (infer/orient.py, moment math)
      → batched dewarp to (192,128)          (homography + bilinear warp)
      → ConvNeXtV2 encoder → (D,768)         (models/convnextv2ae.py)
      → cosine top-k vs HBM index            (ops/topk.py)

Only payload lookup (host dict) happens outside XLA. Invalid slots carry
valid=False through the whole chain (SURVEY.md §7: pad-to-max design).

Deployment note: the pipeline runs as THREE chained jitted stages
(detect → orient/rectify/embed → match) rather than one mega-program.
Intermediate arrays never leave the device, so the only cost is ~3 dispatch
round-trips; in exchange each stage's HLO stays small enough for
size-limited compile services (the axon tunnel rejects the fused program
with HTTP 413) and stages recompile independently.
"""

from __future__ import annotations

import functools
import time
import jax
import jax.numpy as jnp
import numpy as np

from mtgvision_tpu.infer.orient import (
    extract_dewarped,
    orient_corners,
    refine_corners,
    refine_quad_from_crop,
)
from mtgvision_tpu.models.convnextv2ae import ConvNeXtV2Encoder
from mtgvision_tpu.models.yolo import YoloSeg, detect
from mtgvision_tpu.ops.topk import cosine_topk


def box_snap_quads(corners: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Snap quad scale+center to the detector's amodal boxes.

    corners (…,4,2), boxes (…,4) xyxy → corrected corners. Isotropic
    grow-only scale about the quad center (frame-axis anisotropic scaling
    would shear a rotated quad; card aspect is fixed so isotropic is the
    principled correction; occlusion only ever SHRINKS masks so s ≥ 1),
    bounded at 2× against box outliers, then re-centered on the box."""
    qlo = corners.min(axis=-2)
    qhi = corners.max(axis=-2)
    qc = 0.5 * (qlo + qhi)
    qwh = jnp.maximum(qhi - qlo, 1e-3)
    blo, bhi = boxes[..., :2], boxes[..., 2:]
    bwh = jnp.maximum(bhi - blo, 1e-3)
    s = jnp.clip(jnp.max(bwh / qwh, axis=-1, keepdims=True), 1.0, 2.0)
    bc = 0.5 * (blo + bhi)
    return (corners - qc[..., None, :]) * s[..., None, :] + bc[..., None, :]


class FramePipeline:
    """Owns detector+encoder params and the jitted frame program.

    API-parity facade for the reference serving stack: ``__call__`` plays the
    role of CardSegmenter + per-instance dewarp + CoreMlEncoder.predict +
    VectorStore query in one device trip.
    """

    def __init__(
        self,
        detector: YoloSeg,
        det_variables,
        encoder: ConvNeXtV2Encoder,
        enc_variables,
        store=None,  # VectorStore | None
        max_det: int = 8,
        crop_hw: tuple[int, int] = (192, 128),
        top_k: int = 3,
        score_thresh: float = 0.25,
        # NMS suppression threshold on axis-aligned boxes. Overlapping
        # ROTATED cards can exceed 0.45 box-IoU while their quads barely
        # intersect (the scene generator allows ≤50% polygon overlap), so
        # multicard serving may want this higher than the single-object
        # default — measured on the headline protocol (artifacts_r3).
        iou_thresh: float = 0.45,
        both_orientations: bool = True,
        # refine_corners measured on PREDICTED masks (scripts/orient_diag.py,
        # artifacts_r2): quad err 11.28 → 11.6 px, e2e top-1 0.52 → 0.45 — the
        # subpixel line fits only help on clean masks, so serving defaults OFF
        refine: bool = False,
        # image-gradient corner snap in dewarped-crop space + second dewarp
        # (orient.refine_quad_from_crop). Measured on the e2e protocol
        # (artifacts_r2/ablate_rc_{y,n}.json, 20 scenes, r2 ckpts): corner
        # err 15.0 vs 13.9 px OFF, same top-1 — the true edge often falls
        # outside its stable search window, so serving defaults OFF. The
        # LEARNED refine_head below is the production corner fix.
        refine_crop: bool = False,
        # learned corner offsets + 180° flip from the crop
        # (models/refine_head.py): back-projects the predicted quad through
        # the crop→frame homography, re-dewarps, un-rotates — one tiny conv
        # program replaces BOTH the proto-grid corner floor and the 2×
        # dual-orientation encoder cost. Supersedes refine_crop/orient_head.
        refine_head=None,
        refine_head_vars=None,
        refine_redewarp: bool = False,
        refine_iters: int = 1,
        # SELECTIVE redewarp: re-dewarp only the ``sel_redewarp`` slots per
        # frame whose refine-head offsets are largest, run a second refine
        # pass on those fresh crops, and embed the corrected crops. The r4
        # failure analysis (artifacts_r4/e2e_headline_details.jsonl) showed
        # clear cards with 3 px REPORTED corner error failing to match at
        # score ~0.34: with refine_redewarp off the embedding still came
        # from the pre-refine (misregistered) crop. Full redewarp pays a
        # dewarp pass on every slot; the error distribution is a fat tail
        # (median 7 px, tail 20-100 px on occluded cards), so re-dewarping
        # the k hardest slots captures the tail at k/max_det of the cost —
        # fixed-shape conditional compute (top-k select, no dynamic shapes).
        # 0 = off. Ignored when refine_redewarp already re-dewarps everything.
        sel_redewarp: int = 0,
        # flip-aware orientation decision from a score-weighted VOTE over the
        # top-m candidates instead of rank-0 alone (1 = rank-0, the r4
        # behavior). On sub-idable crops the rank-0 candidate is near-random
        # (r4 refparity flip 0.29 vs 0.0-0.06 on clean protocols) while the
        # half with more/better candidates is a steadier signal; the vote is
        # a handful of VPU ops — zero fps cost. VERDICT r4 task 8.
        flip_vote_m: int = 1,
        # use the refine head's flip logit as the orientation decision. When
        # False the head still corrects corners but orientation falls back to
        # dual-orientation embedding + index matching (both_orientations) —
        # measured r3: the logit's e2e flip rate collapses on heavy-jitter /
        # edge-clipped distributions (0.37 on refparity) while match-based
        # selection stays robust, at the cost of the 2× encoder pass
        refine_head_flip: bool = True,
        fast_dewarp: bool = True,
        dewarp_impl: str = "auto",  # "pallas" | "xla" | "auto"
        # two-pass dewarp window (ops/warp.dewarp_quad): the hat-weight
        # tensors scale ~window², so the window is the dewarp's main cost
        # knob — 8 crops/frame at window 192 are ~36% of the whole frame
        # budget. The √2-stepped pyramid bounds the worst-case resolution
        # loss of a smaller window at 1/√2 in narrow card-size bands (the
        # level cutoffs shift down); measured fps/quality tradeoff in
        # scripts/probe_redewarp_fps.py + sweep_redewarp_quality.sh.
        dewarp_window: int = 192,
        # roll 90°-mislabeled quads so the card's long axis maps to the crop
        # height (see the repair note in _rectify_embed_stage). Seg-mask
        # front end only; GT-corner oracle and obb paths are unaffected.
        aspect_fix: bool = True,
        orient_sign: str = "notch",  # "notch" | "extent" (orient.py)
        orient_head=None,  # models/orient_head.OrientHead | None
        orient_head_vars=None,
        # "seg" (notch-mask instance seg, the flagship) or "obb" (3 keypoint
        # classes card/top/bottom — detector must be num_classes=3); the obb
        # front end recovers oriented quads analytically (infer/obb.py) and
        # shares the whole dewarp→refine→embed→match tail
        det_kind: str = "seg",
        # program layout served by __call__: "3prog" (detect / rectify+embed /
        # match as separate dispatches whose RTTs overlap across concurrent
        # streams), "2prog" (rectify+embed+match fused — one fewer RTT), or
        # "fused" (single mega-program; can exceed remote compile-service
        # size limits). bench.py measures all and reports the fastest.
        layout: str = "3prog",
        # snap moment-quad scale/center to the detector's box before
        # refinement. Hypothesis was the box is amodal and restores occluded
        # extent; MEASURED NEGATIVE on the multicard-occlusion protocol
        # (artifacts_r2/e2e_headline_boxsnap.json vs …_rh6k.json: occluded
        # corner err 57.9→89.8 px, occluded top-1 0.40→0.27, clear
        # 31.0→33.8 px) — predicted boxes are not reliably amodal and
        # isotropic growth amplifies the mask quad's rotation error. Kept
        # as an off-by-default ablation flag.
        box_snap: bool = False,
    ):
        self.detector = detector
        self.det_variables = det_variables
        self.encoder = encoder
        self.enc_variables = enc_variables
        self.store = store
        # multi-chip serving: when the store shards its matrix over a mesh
        # (index/store.py rows-over-1D-mesh), the match stage uses the
        # explicit-collective sharded top-k (ops/topk.cosine_topk_sharded) —
        # per-shard matmul + local top-k, then only (B,k) candidates cross
        # ICI (SURVEY §2.5 plan b)
        self.mesh = getattr(store, "mesh", None) if store is not None else None
        self.max_det = max_det
        self.crop_hw = crop_hw
        self.top_k = top_k
        self.score_thresh = score_thresh
        self.iou_thresh = iou_thresh
        self.both_orientations = both_orientations
        self.refine = refine
        self.refine_crop = refine_crop
        self.fast_dewarp = fast_dewarp
        self.orient_sign = orient_sign
        # pixel-space orientation classifier (models/orient_head.py): when
        # present, crops are un-rotated BEFORE the encoder and the pipeline
        # runs a SINGLE encoder pass — the measured mask-notch signal is
        # unreadable at proto res (scripts/orient_diag.py: 0.30+ flip on
        # predicted masks), while crop pixels carry the card's top/bottom
        # layout directly. both_orientations remains the head-free fallback.
        self.orient_head = orient_head
        self.orient_head_vars = orient_head_vars
        self.refine_head = refine_head
        self.refine_head_vars = refine_head_vars
        self.refine_redewarp = refine_redewarp
        self.refine_iters = refine_iters
        self.sel_redewarp = 0 if refine_redewarp else min(sel_redewarp, max_det)
        self.flip_vote_m = flip_vote_m
        self.refine_head_flip = refine_head_flip
        if refine_head is not None:
            if refine_head_flip:
                # the refine head's flip logit replaces both disambiguators
                self.both_orientations = False
            self.orient_head = None
            self.refine_crop = False
        elif orient_head is not None:
            self.both_orientations = False
        if store is not None and getattr(store, "flip_aware", False):
            # flip-aware index (store.py flip_aware): orientation is decided
            # by which matrix half the top match lands in — ONE encoder pass
            # regardless of other flags. Composes with refine_head_flip: a
            # head-corrected crop that is still upside down is caught by the
            # index half (flipped = head_flip ^ match_flip, as with dual).
            self.both_orientations = False
        # storeless flip-aware operation (bench / externally-supplied
        # matrices): set to the per-orientation row count of an
        # [upright; flipped] index matrix and the match stage treats it
        # exactly like a flip-aware store's matrix
        self.index_half: int | None = None
        if dewarp_impl == "auto":
            # measured on v5e (64 crops / 8 frames): XLA bf16 two-pass 6.5 ms
            # vs fused Pallas kernel 8.8-10 ms (ops/dewarp_pallas.py docstring)
            # — the XLA path wins, the kernel stays available for explicit use
            dewarp_impl = "xla"
        self.dewarp_impl = dewarp_impl
        self.dewarp_window = dewarp_window
        self.aspect_fix = aspect_fix
        self.det_kind = det_kind
        self.box_snap = box_snap
        if layout not in ("3prog", "2prog", "fused"):
            raise ValueError(f"unknown layout {layout!r}")
        self.layout = layout
        self._layout_warned = False
        # obb needs 3 raw detections (card/top/bottom) per card slot
        self._det_slots = max_det * 3 if det_kind == "obb" else max_det
        self._detect = jax.jit(self._detect_stage)
        self._rectify_embed = jax.jit(self._rectify_embed_stage)
        # oracle/diagnostic: embed+match from externally supplied corners
        # (skips detect+orient) — isolates appearance-limited accuracy from
        # corner-misregistration error (eval/e2e_eval.evaluate_oracle)
        self._embed_corners = jax.jit(self._embed_from_corners)
        self._fused = None  # lazily-jitted single-program variant (run_fused)
        self._re_match = None  # lazily-jitted rectify+embed+match (run_2prog)
        self._rectify_embed_obb = jax.jit(self._rectify_embed_obb_stage)
        self._match = jax.jit(functools.partial(cosine_topk, k=top_k))
        # match + orientation selection as ONE program: the selection ops
        # (take_along_axis/roll/where) ran eagerly before, costing ~5 host
        # dispatches (~5-9 ms each over tunneled TPUs) per frame batch
        self._match_select = jax.jit(self._match_select_stage)

    # -- stage 1: detect ----------------------------------------------------

    @staticmethod
    def _as_float(frames):
        """uint8 frames → bf16 [0,1]. Serving frames arrive as decoded-JPEG
        uint8; keeping them u8 in HBM quarters the frame-read bandwidth of
        the detector stem and every per-crop dewarp vs f32 (XLA fuses the
        convert into each consumer, so reads pull 1 byte/px)."""
        if frames.dtype == jnp.uint8:
            return frames.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        return frames

    def _detect_stage(self, det_vars, frames):
        return detect(
            det_vars,
            self.detector,
            self._as_float(frames),
            max_det=self._det_slots,
            iou_thresh=self.iou_thresh,
            score_thresh=self.score_thresh,
        )

    # -- stage 2: orient → dewarp → embed -----------------------------------

    def _rectify_embed_stage(self, enc_vars, frames, masks, valid, boxes=None):
        b, h, w, _ = frames.shape

        # masks are at 1/4 frame resolution — orient there, scale corners up.
        # pass the CONTINUOUS sigmoid masks: orient_corners thresholds
        # internally, and refine_corners exploits the soft boundary
        # gradient for subpixel edge localization
        def per_frame(frame_masks, frame_valid):
            def per_det(mask, ok_det):
                corners, ok = orient_corners(mask, sign_mode=self.orient_sign)
                if self.refine:
                    # subpixel line-fit refinement at mask res (orient.py) —
                    # helps on clean masks (<1.6 px), measured NEUTRAL-to-
                    # harmful on predicted sigmoid masks (see __init__ note)
                    corners = refine_corners(mask, corners)
                corners = corners * (h / mask.shape[0])
                return corners, ok & ok_det

            return jax.vmap(per_det)(frame_masks, frame_valid)

        corners, ok = jax.vmap(per_frame)(masks, valid)
        if self.aspect_fix:
            from mtgvision_tpu.infer.orient import enforce_quad_aspect

            corners = enforce_quad_aspect(corners)
        if self.box_snap and boxes is not None:
            # The detector's box GT is the full quad AABB (amodal) while the
            # mask covers only visible pixels, so moment corners shrink
            # toward the visible half on occluded cards (20-100 px off,
            # e2e_headline_occhead_details.jsonl). Snapping scale+center to
            # the box was meant to restore amodal extent — measured NEGATIVE
            # (see the box_snap flag note in __init__): default off.
            corners = box_snap_quads(corners, boxes)
        return self._embed_from_corners(enc_vars, frames, corners, ok)

    def _rectify_embed_obb_stage(
        self, enc_vars, frames, boxes, scores, classes, masks, valid
    ):
        """OBB-kind front end: oriented quads from the 3 keypoint classes
        (infer/obb.py), then the SAME dewarp → refine head → encoder path the
        seg kind uses. Also re-indexes the raw det-slot arrays to the
        per-card slots (inside the jit — eager gathers cost a dispatch each
        on remote runtimes)."""
        from mtgvision_tpu.infer.obb import obb_card_corners_batch

        b = frames.shape[0]
        corners, ok, card_idx = obb_card_corners_batch(
            boxes, scores, classes, valid, max_cards=self.max_det
        )
        out = self._embed_from_corners(enc_vars, frames, corners, ok)
        take = lambda a: jnp.take_along_axis(
            a, card_idx.reshape(b, self.max_det, *([1] * (a.ndim - 2))), axis=1
        )
        return (*out, take(boxes), take(scores), take(classes), take(masks))

    def _embed_from_corners(self, enc_vars, frames, corners, ok):
        frames = self._as_float(frames)
        b = frames.shape[0]

        def dewarp(corners_):
            if self.fast_dewarp and self.dewarp_impl == "pallas":
                # fused VMEM-resident kernel, one flat (B·D,) grid
                from mtgvision_tpu.ops.dewarp_pallas import (
                    dewarp_quads_pallas_frames,
                )

                return dewarp_quads_pallas_frames(
                    frames, corners_, out_hw=self.crop_hw
                )
            if self.fast_dewarp:
                # gather-free two-pass resample (ops/warp.py) — the bilinear
                # gather warp was 59 ms of the 77 ms r1 frame budget
                from mtgvision_tpu.ops.warp import dewarp_quads_batch

                return jax.vmap(
                    lambda f, q: dewarp_quads_batch(
                        f, q, out_hw=self.crop_hw, window=self.dewarp_window
                    )
                )(frames, corners_)
            return jax.vmap(
                lambda f, qs: jax.vmap(
                    lambda q: extract_dewarped(f, q, out_hw=self.crop_hw)
                )(qs)
            )(frames, corners_)

        crops = dewarp(corners)
        if self.refine_crop:
            # full-res edge snap in crop space (orient.refine_quad_from_crop)
            # then a SECOND dewarp off the corrected corners — the proto-grid
            # mask corners are ~12 px coarse at frame res; the crop sees the
            # card's physical edges at full resolution
            refined = jax.vmap(
                jax.vmap(
                    lambda c, q: refine_quad_from_crop(c, q, out_hw=self.crop_hw)
                )
            )(crops, corners)
            corners = jnp.where(ok[..., None, None], refined, corners)
            crops = dewarp(corners)
        flat_crops = crops.reshape(b * self.max_det, *self.crop_hw, 3)
        head_flip = jnp.zeros((b, self.max_det), bool)
        if self.refine_head is not None:
            # learned quad correction (models/refine_head.py): predicted
            # crop-space offsets → back-project through each detection's
            # crop→frame homography → re-dewarp off the corrected corners
            from mtgvision_tpu.models.refine_head import nominal_quad
            from mtgvision_tpu.ops.warp import (
                apply_transform_points,
                perspective_from_quads,
            )

            nom = nominal_quad(self.crop_hw)
            flip_logit = None
            # extra iterations need a fresh crop per pass — only meaningful
            # with re-dewarping on (each redewarp costs a dewarp pass)
            iters = self.refine_iters if self.refine_redewarp else 1
            for it in range(iters):
                offsets, logit = self.refine_head.apply(
                    self.refine_head_vars,
                    crops.reshape(b * self.max_det, *self.crop_hw, 3),
                )
                if flip_logit is None:
                    flip_logit = logit  # orientation fixed by pass 1
                quad_crop = nom[None] + offsets  # (B·D,4,2)
                corners_flat = corners.reshape(b * self.max_det, 4, 2)
                m = perspective_from_quads(
                    corners_flat, jnp.broadcast_to(nom, corners_flat.shape)
                )  # frame→crop per detection
                new_corners = apply_transform_points(jnp.linalg.inv(m), quad_crop)
                fin = jnp.all(jnp.isfinite(new_corners), axis=(-2, -1)).reshape(
                    b, self.max_det
                )
                new_corners = new_corners.reshape(b, self.max_det, 4, 2)
                corners = jnp.where(
                    (ok & fin)[..., None, None], new_corners, corners
                )
                if self.refine_redewarp:
                    # re-dewarp off the corrected corners so the encoder sees
                    # a registered crop. Measured: +6.7 ms / 64 crops (the
                    # dewarp's hat-weight HBM traffic) for NO top-1 gain —
                    # identifiable-card top-1 is already 1.0 off the first
                    # crop (artifacts_r2/e2e_refinehead.json) — so serving
                    # defaults OFF: the corrected corners still flow to the
                    # output, only the embedding reuses the stage-1 crop.
                    crops = dewarp(corners)
            if self.sel_redewarp:
                # conditional second pass on the k hardest slots per frame
                # (see the sel_redewarp flag note): the pass-1 offset
                # magnitude is the hardness signal — tanh saturation means
                # the crop was far off and its embedding would come from a
                # misregistered crop. Fixed-shape top-k select; the other
                # slots keep their stage-1 crop (their median error is ~7 px,
                # within the encoder's trained pose tolerance).
                k_sel = self.sel_redewarp
                mag = jnp.linalg.norm(offsets, axis=-1).max(-1).reshape(
                    b, self.max_det
                )
                mag = jnp.where(ok, mag, -1.0)
                _, sel = jax.lax.top_k(mag, k_sel)  # (b, k) slot indices
                bi = jnp.arange(b)[:, None]
                sel_corners = corners[bi, sel]  # (b, k, 4, 2)
                # redewarp from pass-1-corrected corners → second refine pass
                # walks residual error → final redewarp registers the crop
                # the encoder embeds. 2 dewarps × k slots ≈ 2k/max_det of a
                # full redewarp pass.
                sel_crops = dewarp(sel_corners)
                off2, _ = self.refine_head.apply(
                    self.refine_head_vars,
                    sel_crops.reshape(b * k_sel, *self.crop_hw, 3),
                )
                quad2 = nom[None] + off2
                cf = sel_corners.reshape(b * k_sel, 4, 2)
                m2 = perspective_from_quads(
                    cf, jnp.broadcast_to(nom, cf.shape)
                )
                nc2 = apply_transform_points(jnp.linalg.inv(m2), quad2)
                fin2 = jnp.all(jnp.isfinite(nc2), axis=(-2, -1)).reshape(
                    b, k_sel
                )
                sel_ok = ok[bi, sel] & fin2
                sel_corners = jnp.where(
                    sel_ok[..., None, None],
                    nc2.reshape(b, k_sel, 4, 2),
                    sel_corners,
                )
                final_crops = dewarp(sel_corners)
                corners = corners.at[bi, sel].set(sel_corners)
                crops = crops.at[bi, sel].set(
                    jnp.where(
                        sel_ok[..., None, None, None], final_crops, crops[bi, sel]
                    )
                )
                flat_crops = crops.reshape(b * self.max_det, *self.crop_hw, 3)
            if self.refine_head_flip:
                flip = flip_logit.reshape(b, self.max_det) > 0.0
                crops = jnp.where(
                    flip[..., None, None, None],
                    jnp.rot90(crops, 2, axes=(2, 3)),
                    crops,
                )
                corners = jnp.where(
                    flip[..., None, None], jnp.roll(corners, 2, axis=2), corners
                )
                head_flip = flip
            flat_crops = crops.reshape(b * self.max_det, *self.crop_hw, 3)
        elif self.orient_head is not None:
            # classify + un-rotate BEFORE the encoder: one tiny conv head
            # (~1% of an encoder pass) replaces the 2× dual-orientation cost
            logits = self.orient_head.apply(self.orient_head_vars, flat_crops)
            flip = logits > 0.0
            flat_crops = jnp.where(
                flip[:, None, None, None],
                jnp.rot90(flat_crops, 2, axes=(1, 2)),
                flat_crops,
            )
            head_flip = flip.reshape(b, self.max_det)
            corners = jnp.where(
                head_flip[..., None, None], jnp.roll(corners, 2, axis=2), corners
            )
            crops = flat_crops.reshape(b, self.max_det, *self.crop_hw, 3)
        if self.both_orientations:
            # notch-based top/bottom disambiguation (orient.py) occasionally
            # flips 180°; embedding BOTH orientations lets the index match
            # decide (stage 3 keeps the higher-scoring one). The second
            # encoder pass on D small crops is cheap next to detection.
            flat_flip = jnp.rot90(flat_crops, 2, axes=(1, 2))
            z2 = self.encoder.apply(
                enc_vars, jnp.concatenate([flat_crops, flat_flip])
            )
            z = z2.reshape(2, b, self.max_det, -1)
        else:
            z = self.encoder.apply(enc_vars, flat_crops)[None].reshape(
                1, b, self.max_det, -1
            )
        # degenerate quads (near-collinear moment corners on garbage masks)
        # survive to here as Inf crops → NaN embeddings → NaN cosine scores,
        # which poison match ranking and break JSON payload serialization
        # (json.dumps emits NaN; JS JSON.parse rejects it). Mark the slot
        # invalid and zero the vector. Measured: 2/76 detections on the
        # reference-distribution eval hit this.
        zfin = jnp.all(jnp.isfinite(z), axis=(0, -1))
        ok = ok & zfin
        z = jnp.nan_to_num(z)
        return crops, corners, ok, z, head_flip

    # -- stage 3: match + orientation selection ------------------------------

    def _match_select_stage(self, z, corners, index_mat, row_valid=None,
                            half=None):
        """(n_or,B,D,Z) embeddings + corners + index → per-detection match
        results with the better-scoring orientation selected (n_or == 2).

        ``row_valid`` ((rows,) bool, traced): which matrix rows hold real
        vectors — capacity/mesh padding rows are zero vectors and can win
        the top-k when every real score is <= 0, surfacing out-of-range
        match_idx to consumers (ADVICE r3).

        ``half`` (traced scalar, flip-aware stores): the matrix carries
        upright embeddings in rows [0, half) and 180°-rotated embeddings in
        [half, 2·half) (index/store.py flip_aware). The crop is embedded
        ONCE; a top match landing in the flipped half means the crop is
        upside down. Replaces the dual-orientation 2× encoder pass with a 2×
        MXU matmul; candidates are deduped per canonical card so top-k ids
        stay unique like the dual-orientation path's."""
        n_or, b, d, _ = z.shape
        q = z.reshape(n_or * b * d, -1)
        k_query = self.top_k if half is None else 2 * self.top_k
        if self.mesh is not None:
            from mtgvision_tpu.ops.topk import cosine_topk_sharded

            # NaN-query sanitation matches cosine_topk (degenerate crops)
            q = jnp.nan_to_num(q)
            ms, mi = cosine_topk_sharded(
                q, index_mat, k=k_query, mesh=self.mesh, row_valid=row_valid
            )
        else:
            ms, mi = cosine_topk(q, index_mat, k=k_query, row_valid=row_valid)
        if half is not None:
            assert n_or == 1, "flip-aware index implies one orientation pass"
            ms, mi, m_flip = self._flip_aware_select(ms, mi, half)
            ms = ms.reshape(n_or, b, d, self.top_k)
            mi = mi.reshape(n_or, b, d, self.top_k)
            m_flip = m_flip.reshape(b, d)
            corners = jnp.where(
                m_flip[..., None, None], jnp.roll(corners, 2, axis=2), corners
            )
            return ms[0], mi[0], corners, m_flip, z[0]
        ms = ms.reshape(n_or, b, d, self.top_k)
        mi = mi.reshape(n_or, b, d, self.top_k)
        if n_or == 1:
            flipped = jnp.zeros((b, d), bool)
            return ms[0], mi[0], corners, flipped, z[0]
        # keep the orientation whose best match scores higher; fix the
        # reported corners to match (180° roll = swap TL↔BR, TR↔BL)
        flipped = ms[1, ..., 0] > ms[0, ..., 0]
        sel = jnp.broadcast_to(
            flipped[None, ..., None].astype(jnp.int32), (1, b, d, self.top_k)
        )
        match_scores = jnp.take_along_axis(ms, sel, 0)[0]
        match_idx = jnp.take_along_axis(mi, sel, 0)[0]
        corners = jnp.where(
            flipped[..., None, None], jnp.roll(corners, 2, axis=2), corners
        )
        # report the embedding of the SELECTED orientation so z is consistent
        # with match_idx/corners (server.py consumes it for the EWMA track
        # embedding)
        z_sel = jnp.where(flipped[..., None], z[1], z[0])
        return match_scores, match_idx, corners, flipped, z_sel

    def _flip_aware_select(self, ms, mi, half):
        """(B, 2k) candidates over a [upright; flipped] matrix → (B, k)
        canonical matches + (B,) crop-flip decision.

        The rank-0 candidate's half decides the crop's orientation; the
        reported top-k is then re-ranked WITHIN that half only — matching
        dual-orientation semantics exactly (pick the better orientation by
        its best score, rank among that orientation's rows). Mixing halves
        in the ranking measurably costs top-1: a wrong card's opposite-half
        embedding can outrank the right card's same-half one on noisy
        (tiny/occluded) crops. Fixed unrolled O((2k)²) VPU compares, k ≤ 8."""
        k, k2 = self.top_k, ms.shape[1]
        flip_c = mi >= half
        ci = jnp.where(flip_c, mi - half, mi)
        if self.flip_vote_m > 1:
            # orientation decision: score-weighted vote over the top-m
            # candidates' halves (see the flip_vote_m flag note). -inf
            # scores from masked rows zero out under the relu weight.
            m = min(self.flip_vote_m, k2)
            w = jnp.maximum(ms[:, :m], 0.0)
            flip0 = (w * flip_c[:, :m]).sum(1) > (w * ~flip_c[:, :m]).sum(1)
        else:
            # the overall best-scoring candidate's half
            flip0 = flip_c[:, 0]
        same = flip_c == flip0[:, None]
        dup = jnp.zeros(ms.shape, bool)
        for j in range(1, k2):
            dup = dup.at[:, j].set(
                ((ci[:, :j] == ci[:, j : j + 1]) & same[:, :j]).any(axis=1)
            )
        keep = same & ~dup
        slot = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # target slot
        out_ms, out_mi = [], []
        for t in range(k):
            pick = keep & (slot == t)  # ≤ 1 true per row
            got = pick.any(axis=1)
            out_ms.append(
                jnp.where(got, jnp.where(pick, ms, 0.0).sum(axis=1), -jnp.inf)
            )
            # empty-slot sentinel: ``half`` ≥ n real rows, so consumers'
            # existing "index ≥ len(store) ⇒ empty" handling applies
            out_mi.append(
                jnp.where(got, jnp.where(pick, ci, 0).sum(axis=1), half)
            )
        ms_k = jnp.stack(out_ms, axis=1)
        mi_k = jnp.stack(out_mi, axis=1).astype(mi.dtype)
        return ms_k, mi_k, flip0

    def _index_mask(self, index_mat):
        """(row_valid, half) for the match stage. row_valid marks the real
        rows of the (padded) store matrix; half is the per-orientation row
        count of a flip-aware store (None otherwise). Both are None for an
        externally-supplied matrix (e.g. bench) — every row real, no flip
        halves — so the masking costs nothing there."""
        if self.store is not None and len(self.store):
            rv = self.store.row_valid_mask()
            half = None
            if getattr(self.store, "flip_aware", False):
                half = jnp.asarray(self.store.half_rows(), jnp.int32)
            return rv, half
        if self.index_half is not None:
            return None, jnp.asarray(self.index_half, jnp.int32)
        return None, None

    # -- chained execution (arrays stay on device between stages) -----------

    def run(self, frames, index_mat=None):
        b = frames.shape[0]
        boxes, scores, classes, masks, valid = self._detect(self.det_variables, frames)
        if self.det_kind == "obb":
            (crops, corners, ok, z, head_flip,
             boxes, scores, classes, masks) = self._rectify_embed_obb(
                self.enc_variables, frames, boxes, scores, classes, masks, valid
            )
            valid = ok
        else:
            crops, corners, ok, z, head_flip = self._rectify_embed(
                self.enc_variables, frames, masks, valid, boxes
            )
        match_scores = match_idx = None
        flipped = head_flip
        z_sel = z[0]
        if index_mat is not None:
            rv, half = self._index_mask(index_mat)
            match_scores, match_idx, corners, m_flip, z_sel = self._match_select(
                z, corners, index_mat, rv, half
            )
            flipped = flipped ^ m_flip
        return {
            "boxes": boxes,
            "det_scores": scores,
            "classes": classes,
            "masks": masks,  # (B, D, H/4, W/4) sigmoid proto masks
            "corners": corners,
            "valid": ok,
            "crops": crops,
            "z": z_sel,
            "flipped": flipped,
            "match_scores": match_scores,
            "match_idx": match_idx,
        }

    def __call__(self, frames: jnp.ndarray) -> dict:
        """frames (B,H,W,3) float [0,1] → padded detection dict (device arrays)."""
        mat = self.store._matrix() if (self.store is not None and len(self.store)) else None
        if mat is not None and self.det_kind == "seg":
            if self.layout == "2prog":
                return self.run_2prog(frames, mat)
            if self.layout == "fused":
                return self.run_fused(frames, mat)
        elif self.layout != "3prog" and not self._layout_warned:
            self._layout_warned = True
            import warnings

            warnings.warn(
                f"layout={self.layout!r} needs a populated store and "
                f"det_kind='seg'; serving the 3-program path instead",
                stacklevel=2,
            )
        return self.run(frames, mat)

    def run_fused(self, frames, index_mat):
        """Single-program variant of run(): the three stages trace into ONE
        jitted program, so a frame batch costs one host dispatch instead of
        three. The chained path's dispatches already overlap device compute
        on remote runtimes (run()'s stages), so the win is bounded by the
        per-dispatch round-trip (~5 ms on tunneled TPUs) minus what overlap
        already hides — measure both (bench_e2e(layout=…)) before switching a
        deployment. Requires a store matrix (match runs inside the program).
        """
        if self._fused is None:
            def fused(det_vars, enc_vars, frames_, mat, rv, half):
                boxes, scores, classes, masks, valid = self._detect_stage(
                    det_vars, frames_
                )
                if self.det_kind == "obb":
                    (crops, corners, ok, z, head_flip, boxes, scores,
                     classes, masks) = self._rectify_embed_obb_stage(
                        enc_vars, frames_, boxes, scores, classes, masks, valid
                    )
                else:
                    crops, corners, ok, z, head_flip = self._rectify_embed_stage(
                        enc_vars, frames_, masks, valid, boxes
                    )
                ms, mi, corners, m_flip, z_sel = self._match_select_stage(
                    z, corners, mat, rv, half
                )
                return {
                    "boxes": boxes,
                    "det_scores": scores,
                    "classes": classes,
                    "masks": masks,
                    "corners": corners,
                    "valid": ok,
                    "crops": crops,
                    "z": z_sel,
                    "flipped": head_flip ^ m_flip,
                    "match_scores": ms,
                    "match_idx": mi,
                }

            self._fused = jax.jit(fused)
        return self._fused(
            self.det_variables, self.enc_variables, frames, index_mat,
            *self._index_mask(index_mat),
        )

    def run_2prog(self, frames, index_mat):
        """Two-program layout: detect stays its own dispatch (its HLO is the
        big one — fusing it in is what trips remote compile-service size
        limits, see run_fused), while orient→rectify→embed→match traces into
        ONE program. Per frame batch: 2 host round-trips instead of 3. The
        device work is identical to run(); only dispatch count changes, so on
        remote-dispatch runtimes this trades ~one RTT for a slightly larger
        (but still detect-free) program. Requires a store matrix. Seg kind
        only (the obb front end keeps the 3-program run() path)."""
        if self.det_kind != "seg":
            raise ValueError("run_2prog supports det_kind='seg' only")
        if self._re_match is None:
            def re_match(enc_vars, frames_, masks, valid, boxes, mat, rv, half):
                crops, corners, ok, z, head_flip = self._rectify_embed_stage(
                    enc_vars, frames_, masks, valid, boxes
                )
                ms, mi, corners, m_flip, z_sel = self._match_select_stage(
                    z, corners, mat, rv, half
                )
                return crops, corners, ok, z_sel, head_flip ^ m_flip, ms, mi

            self._re_match = jax.jit(re_match)
        boxes, scores, classes, masks, valid = self._detect(self.det_variables, frames)
        crops, corners, ok, z_sel, flipped, ms, mi = self._re_match(
            self.enc_variables, frames, masks, valid, boxes, index_mat,
            *self._index_mask(index_mat),
        )
        return {
            "boxes": boxes,
            "det_scores": scores,
            "classes": classes,
            "masks": masks,
            "corners": corners,
            "valid": ok,
            "crops": crops,
            "z": z_sel,
            "flipped": flipped,
            "match_scores": ms,
            "match_idx": mi,
        }

    def run_corners(self, frames, corners, ok, index_mat=None):
        """Diagnostic entry: embed + match from GIVEN frame-space corners
        (B,D,4,2 in the pipeline's TL,TR,BR,BL convention), bypassing
        detect + orient. With GT quads this measures the appearance-limited
        ceiling of the embed→match tail — if oracle top-1 is also low on
        occluded cards, better corners cannot fix them and the encoder must
        be retrained; if oracle is high, corner misregistration is the cost.
        The configured tail (refine head / dual orientation) still runs."""
        if index_mat is None and self.store is not None and len(self.store):
            index_mat = self.store._matrix()
        crops, corners, ok, z, head_flip = self._embed_corners(
            self.enc_variables, frames, corners, ok
        )
        match_scores = match_idx = None
        flipped = head_flip
        z_sel = z[0]
        if index_mat is not None:
            rv, half = self._index_mask(index_mat)
            match_scores, match_idx, corners, m_flip, z_sel = self._match_select(
                z, corners, index_mat, rv, half
            )
            flipped = flipped ^ m_flip
        return {
            "corners": corners,
            "valid": ok,
            "crops": crops,
            "z": z_sel,
            "flipped": flipped,
            "match_scores": match_scores,
            "match_idx": match_idx,
        }

    def detect_frame(self, frame: np.ndarray) -> list[dict]:
        """Host-facing single-frame API: list of detections with resolved
        payloads — the shape served over the websocket (server.py:283-297)."""
        out = self(jnp.asarray(frame)[None])
        dets = []
        valid = np.asarray(out["valid"][0])
        for i in range(self.max_det):
            if not valid[i]:
                continue
            det = {
                "box": np.asarray(out["boxes"][0, i]),
                "score": float(out["det_scores"][0, i]),
                "corners": np.asarray(out["corners"][0, i]),
                "crop": np.asarray(out["crops"][0, i]),
                "z": np.asarray(out["z"][0, i]),
                "matches": [],
            }
            if out["match_idx"] is not None and self.store is not None:
                for k in range(self.top_k):
                    ridx = int(out["match_idx"][0, i, k])
                    if ridx < len(self.store):
                        pid = self.store._ids[ridx]
                        det["matches"].append(
                            {
                                "id": pid,
                                "score": float(out["match_scores"][0, i, k]),
                                "payload": self.store._payloads.get(pid),
                            }
                        )
            dets.append(det)
        return dets


# ---------------------------------------------------------------------------
# benchmark harness (bench.py hook)
# ---------------------------------------------------------------------------


def build_e2e_pipeline(
    batch: int = 8,
    frame_hw: tuple[int, int] = (640, 640),
    n_index: int = 60_000,
    det_size: str = "s",
    enc_size: str = "nano",
    max_det: int = 8,
    seed: int = 0,
    layout: str = "3prog",  # "3prog" | "2prog" | "fused"
    # frame ingest dtype: bf16 halves and u8 quarters the HBM traffic of
    # every frame-sized read (detector stem + per-crop dewarp resamples) at
    # no accuracy cost — the detector casts to bf16 internally anyway and
    # crops re-enter the bf16 encoder. u8 is also the realistic serving
    # input (decoded JPEG) and quarters host→device transfer.
    frame_dtype: str = "f32",  # "f32" | "bf16" | "u8"
):
    """Random-weight pipeline at deployment sizes (YOLO11-s + ConvNeXtV2 nano,
    od_train.py:138-151 / encoder_export.py:23-26) for throughput benchmarks."""
    from mtgvision_tpu.models.convnextv2ae import AE_SIZES

    rng = jax.random.PRNGKey(seed)
    det = YoloSeg(num_classes=1, size=det_size, dtype=jnp.bfloat16)
    det_vars = jax.jit(det.init, static_argnums=2)(rng, jnp.zeros((1, *frame_hw, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, head_type="conv+linear",
        dtype=jnp.bfloat16, **AE_SIZES[enc_size],
    )
    enc_vars = {"params": jax.jit(enc.init)(rng, jnp.zeros((1, 192, 128, 3)))["params"]}

    # THE UNIFIED SERVING CONFIG (r5): exactly what scripts/eval_protocols_r5
    # scores for quality — refine head corrects corners, SELECTIVE redewarp
    # re-registers the 2 hardest slots per frame before embedding, the
    # FLIP-AWARE index decides the 180° orientation (upright + rotated
    # embedding halves) from a top-3 score-weighted vote, one encoder pass
    # per crop, dewarp window 160 (fps curve: w192 sel2 468 → w160 sel2 527;
    # scripts/probe_redewarp_fps.py). Random weights cost the same compute
    # as trained ones, so the benchmark measures the served program.
    from mtgvision_tpu.models.refine_head import RefineHead

    rhead = RefineHead()
    rhead_vars = jax.jit(rhead.init)(rng, jnp.zeros((1, 192, 128, 3)))

    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=None, max_det=max_det,
        refine_head=rhead, refine_head_vars=rhead_vars,
        refine_head_flip=False, both_orientations=False,
        sel_redewarp=2, flip_vote_m=3, dewarp_window=160,
        score_thresh=0.15,
    )
    # [upright; flipped] halves — 2·n_index rows, matching a flip-aware
    # store's matrix layout (index/store.py)
    pipe.index_half = n_index
    db = jax.random.normal(jax.random.PRNGKey(1), (2 * n_index, 768), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)

    runner = {
        "3prog": pipe.run,
        "2prog": pipe.run_2prog,
        "fused": pipe.run_fused,
    }[layout]

    def run(frames):
        out = runner(frames, db)
        return out["match_idx"], out["valid"]

    frames = jax.random.uniform(jax.random.PRNGKey(2), (batch, *frame_hw, 3))
    if frame_dtype == "bf16":
        frames = frames.astype(jnp.bfloat16)
    elif frame_dtype == "u8":
        frames = (frames * 255.0).astype(jnp.uint8)
    return run, frames


# bench_e2e memo: (batch, layout) → (run, frames); see its docstring
_BENCH_PIPES: dict = {}


def bench_e2e(
    batch: int = 8,
    iters: int = 20,
    layout: str = "3prog",
    chains: int = 2,
    frame_dtype: str = "f32",
) -> float:
    """Frames/s/chip for the full detect→orient→rectify→embed→match program.

    Methodology: ``chains`` independent data chains (each iteration's frame
    input depends on that chain's previous match output), interleaved, ending
    in a value fetch on every chain. Within a chain, execution is fully
    serialized — async dispatch can't hide compute. Across chains, host
    dispatch overlaps device compute, which is exactly what a real server does
    with concurrent client streams; the device still has to execute every
    program. Measured r2 (v5e-1, quiet): 1-chain 341.9 fps, 2-chain 352.5 fps
    — the delta is the honest dispatch-overlap gain, not an artifact. Deeper
    interleave raises the ceiling toward the device-compute bound (~20 ms per
    8 frames ≈ 400 fps single-orientation at batch 8; larger batches amortize
    per-program fixed cost further) by hiding the ~5 ms/program dispatch RTT.

    The built pipeline is memoized per (batch, layout): sweeping chain depths
    over the same layout (bench.py) reuses the compiled programs instead of
    paying pipeline init + trace + warmup again per config.
    """
    key = (batch, layout, frame_dtype)
    if key not in _BENCH_PIPES:
        run, frames = build_e2e_pipeline(
            batch=batch, layout=layout, frame_dtype=frame_dtype
        )
    else:
        run, frames = _BENCH_PIPES[key]

    def step(c):
        idx, valid = run(frames + c.astype(frames.dtype))
        return 0.0 * idx[0, 0, 0].astype(jnp.float32)

    cs = [jnp.full((), i * 1e-6, jnp.float32) for i in range(max(1, chains))]
    cs = [step(c) for c in cs]
    [float(c) for c in cs]  # compile + hard execution barrier (value fetch)
    # memoize only AFTER the warm-up value fetch succeeds: a compile/OOM
    # failure during warm-up must leave the key absent so a later same-key
    # config is still treated as a new compile by bench.py's compile-budget
    # deadline (ADVICE r4 — the earlier build-time-only fix missed failures
    # during the first execution)
    _BENCH_PIPES[key] = (run, frames)
    t0 = time.perf_counter()
    for _ in range(iters):
        cs = [step(c) for c in cs]
    [float(c) for c in cs]  # value fetch: block_until_ready alone can resolve
    # early on remote-dispatch runtimes, reporting impossible times
    dt = (time.perf_counter() - t0) / (len(cs) * iters)
    return batch / dt
