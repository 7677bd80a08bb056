"""Detector training losses: task-aligned assignment, CIoU, DFL, mask BCE.

The reference trains its detector entirely inside ultralytics
(mtgvision/od_train.py:65 ``model.train(...)``) — the loss stack there is the
YOLOv8/11 one: TaskAlignedAssigner(topk=10, α=0.5, β=6), CIoU + DFL box loss,
BCE classification, prototype-mask BCE cropped to boxes. This is an in-repo
JAX implementation of the same training objective, written mask-based and
fixed-shape so the whole loss jits (no per-image dynamic gather lists).

Shapes: B batch, N anchors (Σ Hi·Wi), M max GT per image, nc classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtgvision_tpu.models.yolo import REG_MAX, STRIDES


def anchor_points(img_hw: tuple[int, int]):
    """((N,2) xy centers in pixels, (N,) stride per anchor)."""
    pts, strides = [], []
    h, w = img_hw
    for s in STRIDES:
        hs, ws = h // s, w // s
        yy = (jnp.arange(hs, dtype=jnp.float32) + 0.5) * s
        xx = (jnp.arange(ws, dtype=jnp.float32) + 0.5) * s
        gx, gy = jnp.meshgrid(xx, yy)
        pts.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        strides.append(jnp.full(hs * ws, s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strides)


def pairwise_ciou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """CIoU between (…,4) xyxy boxes, elementwise over broadcast dims."""
    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    gx1, gy1, gx2, gy2 = (gt[..., i] for i in range(4))
    iw = jnp.clip(jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1), 0.0)
    ih = jnp.clip(jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1), 0.0)
    inter = iw * ih
    pa = jnp.clip(px2 - px1, 0.0) * jnp.clip(py2 - py1, 0.0)
    ga = jnp.clip(gx2 - gx1, 0.0) * jnp.clip(gy2 - gy1, 0.0)
    union = pa + ga - inter + 1e-9
    iou = inter / union
    # enclosing box diagonal
    cw = jnp.maximum(px2, gx2) - jnp.minimum(px1, gx1)
    chh = jnp.maximum(py2, gy2) - jnp.minimum(py1, gy1)
    c2 = cw * cw + chh * chh + 1e-9
    # center distance
    d2 = ((px1 + px2 - gx1 - gx2) ** 2 + (py1 + py2 - gy1 - gy2) ** 2) / 4.0
    # aspect term
    pw, ph = jnp.clip(px2 - px1, 1e-6), jnp.clip(py2 - py1, 1e-6)
    gw, gh = jnp.clip(gx2 - gx1, 1e-6), jnp.clip(gy2 - gy1, 1e-6)
    v = (4 / jnp.pi**2) * (jnp.arctan(gw / gh) - jnp.arctan(pw / ph)) ** 2
    alpha = v / (1.0 - iou + v + 1e-9)
    return iou - d2 / c2 - jax.lax.stop_gradient(alpha) * v


def task_aligned_assign(
    scores: jnp.ndarray,  # (B, N, nc) sigmoid probs
    pred_boxes: jnp.ndarray,  # (B, N, 4) xyxy px
    anchors: jnp.ndarray,  # (N, 2)
    gt_boxes: jnp.ndarray,  # (B, M, 4)
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_valid: jnp.ndarray,  # (B, M) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """Task-aligned assigner (TOOD / ultralytics semantics), fixed-shape.

    Returns:
      assigned_gt  (B, N) int32 — gt index per anchor (0 if none)
      fg_mask      (B, N) bool — anchor has a target
      target_score (B, N) f32 — normalized alignment (cls target magnitude)
    """
    b, n, nc = scores.shape
    m = gt_boxes.shape[1]

    # score of each anchor for each gt's class: (B, N, M)
    s = jnp.take_along_axis(
        scores[:, :, None, :].repeat(m, 2),
        gt_labels[:, None, :, None].repeat(n, 1),
        axis=-1,
    )[..., 0]
    iou = pairwise_ciou(pred_boxes[:, :, None, :], gt_boxes[:, None, :, :])
    iou = jnp.clip(iou, 0.0)
    metric = (s**alpha) * (iou**beta)  # (B, N, M)

    # candidates: anchor center inside gt box
    ax, ay = anchors[:, 0], anchors[:, 1]
    inside = (
        (ax[None, :, None] > gt_boxes[:, None, :, 0])
        & (ax[None, :, None] < gt_boxes[:, None, :, 2])
        & (ay[None, :, None] > gt_boxes[:, None, :, 1])
        & (ay[None, :, None] < gt_boxes[:, None, :, 3])
    )
    metric = jnp.where(inside & gt_valid[:, None, :], metric, 0.0)

    # top-k anchors per gt
    k = min(topk, n)
    topv, topi = jax.lax.top_k(jnp.swapaxes(metric, 1, 2), k)  # (B, M, k)
    sel = jnp.zeros((b, m, n), bool)
    sel = jax.vmap(
        lambda sm, ti, tv: jax.vmap(
            lambda row, ii, vv: row.at[ii].set(vv > 0)
        )(sm, ti, tv)
    )(sel, topi, topv)
    sel = jnp.swapaxes(sel, 1, 2) & inside & gt_valid[:, None, :]  # (B, N, M)

    # conflict resolution: anchor claimed by several gts → keep max-IoU gt
    many = jnp.sum(sel, -1, keepdims=True) > 1
    best_gt = jnp.argmax(iou, axis=-1)  # (B, N)
    onehot_best = jax.nn.one_hot(best_gt, m, dtype=bool)
    sel = jnp.where(many, sel & onehot_best, sel)

    fg_mask = jnp.any(sel, -1)
    assigned_gt = jnp.argmax(sel, -1).astype(jnp.int32)  # 0 when none (masked later)

    # normalized target scores: metric/max_metric_gt · max_iou_gt
    pos_metric = jnp.where(sel, metric, 0.0)
    pos_iou = jnp.where(sel, iou, 0.0)
    max_metric = jnp.max(pos_metric, axis=1, keepdims=True)  # per gt
    max_iou = jnp.max(pos_iou, axis=1, keepdims=True)
    norm = pos_metric * max_iou / (max_metric + 1e-9)
    target_score = jnp.max(norm, axis=-1)  # (B, N)
    return assigned_gt, fg_mask, target_score


def dfl_loss(box_logits: jnp.ndarray, target_ltrb: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss: CE to the two bins bracketing the target.
    box_logits (…, 4, REG_MAX), target (…, 4) in [0, REG_MAX-1]."""
    t = jnp.clip(target_ltrb, 0.0, REG_MAX - 1 - 1e-3)
    tl = jnp.floor(t)
    wr = t - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(box_logits, -1)
    il = tl.astype(jnp.int32)
    pl_ = jnp.take_along_axis(logp, il[..., None], -1)[..., 0]
    pr = jnp.take_along_axis(logp, (il + 1)[..., None], -1)[..., 0]
    return -(wl * pl_ + wr * pr).mean(-1)  # mean over 4 sides


def detection_loss(
    out: dict,  # YoloSeg raw outputs
    gt_boxes: jnp.ndarray,  # (B, M, 4) xyxy px
    gt_labels: jnp.ndarray,  # (B, M)
    gt_valid: jnp.ndarray,  # (B, M) bool
    gt_masks: jnp.ndarray | None,  # (B, M, Hp, Wp) f32 at proto res, or None
    img_hw: tuple[int, int],
    num_classes: int = 1,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    mask_gain: float = 2.5,
):
    """Full YOLO-seg objective on flat anchors. Returns (loss, logs)."""
    from mtgvision_tpu.models.yolo import _dfl_expectation

    preds = out["preds"]
    protos = out["protos"]  # (B, Hp, Wp, NM)
    b = preds[0].shape[0]

    flat = jnp.concatenate([p.reshape(b, -1, p.shape[-1]) for p in preds], 1)
    n = flat.shape[1]
    box_logits = flat[..., : 4 * REG_MAX].reshape(b, n, 4, REG_MAX)
    cls_logits = flat[..., 4 * REG_MAX : 4 * REG_MAX + num_classes]
    mcoef = flat[..., 4 * REG_MAX + num_classes :]

    anchors, strides = anchor_points(img_hw)
    dist = _dfl_expectation(flat[..., : 4 * REG_MAX])  # (B, N, 4) in stride units
    px1 = anchors[None, :, 0] - dist[..., 0] * strides[None]
    py1 = anchors[None, :, 1] - dist[..., 1] * strides[None]
    px2 = anchors[None, :, 0] + dist[..., 2] * strides[None]
    py2 = anchors[None, :, 1] + dist[..., 3] * strides[None]
    pred_boxes = jnp.stack([px1, py1, px2, py2], -1)

    scores = jax.nn.sigmoid(cls_logits)
    assigned, fg, t_score = task_aligned_assign(
        jax.lax.stop_gradient(scores),
        jax.lax.stop_gradient(pred_boxes),
        anchors,
        gt_boxes,
        gt_labels,
        gt_valid,
    )

    take_gt = lambda arr: jnp.take_along_axis(
        arr, assigned[..., None, None] if arr.ndim == 4 else assigned[..., None], 1
    )

    # --- cls: BCE to soft target scores on all anchors
    t_cls = jax.nn.one_hot(
        jnp.take_along_axis(gt_labels, assigned, 1), num_classes
    ) * t_score[..., None] * fg[..., None]
    bce = optax_sigmoid_bce(cls_logits, t_cls)
    denom = jnp.maximum(jnp.sum(t_score * fg), 1.0)
    loss_cls = jnp.sum(bce) / denom

    # --- box: CIoU weighted by target score on fg anchors
    tgt_boxes = jnp.take_along_axis(gt_boxes, assigned[..., None], 1)  # (B, N, 4)
    ciou = pairwise_ciou(pred_boxes, tgt_boxes)
    w = t_score * fg
    loss_box = jnp.sum((1.0 - ciou) * w) / denom

    # --- dfl
    tl_ = (anchors[None, :, 0] - tgt_boxes[..., 0]) / strides[None]
    tt = (anchors[None, :, 1] - tgt_boxes[..., 1]) / strides[None]
    tr_ = (tgt_boxes[..., 2] - anchors[None, :, 0]) / strides[None]
    tb = (tgt_boxes[..., 3] - anchors[None, :, 1]) / strides[None]
    t_ltrb = jnp.stack([tl_, tt, tr_, tb], -1)
    loss_dfl = jnp.sum(dfl_loss(box_logits, t_ltrb) * w) / denom

    loss = box_gain * loss_box + cls_gain * loss_cls + dfl_gain * loss_dfl
    logs = {"loss_box": loss_box, "loss_cls": loss_cls, "loss_dfl": loss_dfl}

    # --- masks: BCE(protos·coef, gt instance mask) cropped to gt box.
    # Computed ONLY for the top ``mask_topk`` foreground anchors per image —
    # materializing (B, N=8400, Hp, Wp) masks for every anchor needs ~18 GB
    # HBM at 640px; fg anchors are ≤ topk·M anyway (ultralytics computes per
    # assigned anchor too).
    if gt_masks is not None:
        mask_topk = 64
        hp, wp = protos.shape[1:3]
        scale = hp / img_hw[0]
        sel_w, sel_idx = jax.lax.top_k(w, min(mask_topk, w.shape[1]))  # (B, MF)
        sel_coef = jnp.take_along_axis(mcoef, sel_idx[..., None], 1)  # (B, MF, NM)
        sel_assigned = jnp.take_along_axis(assigned, sel_idx, 1)  # (B, MF)
        tgt_m = jnp.take_along_axis(
            gt_masks, sel_assigned[..., None, None], 1
        )  # (B, MF, Hp, Wp)
        sel_boxes = jnp.take_along_axis(tgt_boxes, sel_idx[..., None], 1)
        pred_m = jnp.einsum("bhwc,bmc->bmhw", protos, sel_coef)  # (B, MF, Hp, Wp)
        mbce = optax_sigmoid_bce(pred_m, tgt_m)
        yy = jnp.arange(hp, dtype=jnp.float32)[None, None, :, None]
        xx = jnp.arange(wp, dtype=jnp.float32)[None, None, None, :]
        bx = sel_boxes * scale
        in_box = (
            (xx >= bx[..., 0, None, None])
            & (xx < bx[..., 2, None, None])
            & (yy >= bx[..., 1, None, None])
            & (yy < bx[..., 3, None, None])
        )
        area = jnp.maximum(
            (bx[..., 2] - bx[..., 0]) * (bx[..., 3] - bx[..., 1]), 1.0
        )
        per_anchor = jnp.sum(mbce * in_box, (-2, -1)) / area
        loss_mask = jnp.sum(per_anchor * sel_w) / denom
        loss = loss + mask_gain * loss_mask
        logs["loss_mask"] = loss_mask

    logs["loss"] = loss
    return loss, logs


def optax_sigmoid_bce(logits, targets):
    """Numerically-stable sigmoid BCE."""
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
