"""YOLO11-style anchor-free instance-segmentation detector, Flax/NHWC.

The reference delegates detection entirely to ultralytics YOLO11-seg
(mtgvision/od_train.py:57-65 builds "yolo11s-seg.yaml"; mtgvision/od_export.py
:141-160 runs the exported model). This is an in-repo TPU-native equivalent:
same macro-architecture family (CSP backbone with C3k2 blocks, SPPF, C2PSA
attention, PAN-FPN neck, decoupled DFL detect head + mask-coefficient segment
head with a Proto mask branch), implemented NHWC with bf16-friendly compute so
convs land on the MXU.

Classes follow the reference's dataset kinds (mtgvision/od_datasets.py:244-268):
- kind="seg": 1 class ("card"), masks carry an orientation notch.
- kind="obb": 3 classes ("card", "card_top", "card_bottom").

Inference decode + fixed-shape NMS live in ``decode_predictions`` /
``nms_fixed`` — no dynamic shapes anywhere, so the whole
image→boxes/masks graph jits into one XLA program (pad-to-max with validity
mask, SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

REG_MAX = 16  # DFL bins per box side
NM = 32  # mask coefficients
STRIDES = (8, 16, 32)

# size scales: (depth_mult, width_mult, max_channels)
YOLO_SIZES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(round(x / divisor) * divisor))


class ConvBnAct(nn.Module):
    """Conv + BatchNorm + SiLU — the YOLO 'Conv' block."""

    out_ch: int
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_ch, (self.k, self.k), strides=(self.s, self.s),
            padding=self.k // 2, use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    e: float = 0.5
    k: tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_ch * self.e)
        y = ConvBnAct(c_, self.k[0], dtype=self.dtype)(x, train)
        y = ConvBnAct(self.out_ch, self.k[1], dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C3k(nn.Module):
    """CSP block with 3 convs and n inner bottlenecks (kernel 3)."""

    out_ch: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_ch * self.e)
        a = ConvBnAct(c_, 1, dtype=self.dtype)(x, train)
        b = ConvBnAct(c_, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            a = Bottleneck(c_, self.shortcut, e=1.0, dtype=self.dtype)(a, train)
        return ConvBnAct(self.out_ch, 1, dtype=self.dtype)(
            jnp.concatenate([a, b], -1), train
        )


class C3k2(nn.Module):
    """C2f-style split block; inner units are C3k when ``c3k`` else Bottleneck."""

    out_ch: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_ch * self.e)
        y = ConvBnAct(2 * c_, 1, dtype=self.dtype)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for _ in range(self.n):
            if self.c3k:
                b = C3k(c_, 2, self.shortcut, dtype=self.dtype)(b, train)
            else:
                b = Bottleneck(c_, self.shortcut, e=0.5, dtype=self.dtype)(b, train)
            outs.append(b)
        return ConvBnAct(self.out_ch, 1, dtype=self.dtype)(
            jnp.concatenate(outs, -1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 stacked 5×5 maxpools."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, dtype=self.dtype)(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBnAct(self.out_ch, 1, dtype=self.dtype)(
            jnp.concatenate([x, p1, p2, p3], -1), train
        )


class PSABlock(nn.Module):
    """Position-sensitive attention block: MHSA + conv FFN."""

    ch: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        hd = c // self.num_heads
        # attention: q/k at half head-dim, v at full dim (ultralytics Attention)
        key_dim = max(1, hd // 2)
        q = nn.Conv(self.num_heads * key_dim, (1, 1), dtype=self.dtype)(x)
        k = nn.Conv(self.num_heads * key_dim, (1, 1), dtype=self.dtype)(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype)(x)
        n = h * w
        q = q.reshape(b, n, self.num_heads, key_dim)
        k = k.reshape(b, n, self.num_heads, key_dim)
        v_ = v.reshape(b, n, self.num_heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(key_dim)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v_).reshape(b, h, w, c)
        # positional depthwise on v + projection
        pe = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, dtype=self.dtype)(v)
        x = x + nn.Conv(c, (1, 1), dtype=self.dtype)(o + pe)
        # FFN
        y = ConvBnAct(c * 2, 1, dtype=self.dtype)(x, train)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype)(y)
        return x + y


class C2PSA(nn.Module):
    """CSP wrapper around n PSA attention blocks."""

    out_ch: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.out_ch // 2
        y = ConvBnAct(2 * c_, 1, dtype=self.dtype)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for _ in range(self.n):
            b = PSABlock(c_, num_heads=max(1, c_ // 64), dtype=self.dtype)(b, train)
        return ConvBnAct(self.out_ch, 1, dtype=self.dtype)(
            jnp.concatenate([a, b], -1), train
        )


class Proto(nn.Module):
    """Mask prototype branch from P3: conv → 2× upsample → conv → nm protos."""

    mid_ch: int = 256
    nm: int = NM
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.mid_ch, 3, dtype=self.dtype)(x, train)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = ConvBnAct(self.mid_ch, 3, dtype=self.dtype)(x, train)
        return ConvBnAct(self.nm, 1, dtype=self.dtype)(x, train)


class YoloSeg(nn.Module):
    """Backbone + PAN neck + decoupled detect/segment heads.

    __call__(images (B,H,W,3) float [0,1]) →
      dict(preds=[(B,Hi,Wi, 4·REG_MAX + nc + NM)]×3, protos=(B,H/4,W/4,NM))
    """

    num_classes: int = 1
    size: str = "s"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, wm, maxc = YOLO_SIZES[self.size]

        def ch(c):
            return _make_divisible(min(c, maxc) * wm)

        def rep(n):
            return max(1, round(n * d))

        dt = self.dtype
        x = x.astype(dt)

        # backbone
        x = ConvBnAct(ch(64), 3, 2, dtype=dt)(x, train)  # P1
        x = ConvBnAct(ch(128), 3, 2, dtype=dt)(x, train)  # P2
        x = C3k2(ch(256), rep(2), c3k=False, e=0.25, dtype=dt)(x, train)
        x = ConvBnAct(ch(256), 3, 2, dtype=dt)(x, train)  # P3
        x = C3k2(ch(512), rep(2), c3k=False, e=0.25, dtype=dt)(x, train)
        p3 = x
        x = ConvBnAct(ch(512), 3, 2, dtype=dt)(x, train)  # P4
        x = C3k2(ch(512), rep(2), c3k=True, dtype=dt)(x, train)
        p4 = x
        x = ConvBnAct(ch(1024), 3, 2, dtype=dt)(x, train)  # P5
        x = C3k2(ch(1024), rep(2), c3k=True, dtype=dt)(x, train)
        x = SPPF(ch(1024), dtype=dt)(x, train)
        x = C2PSA(ch(1024), rep(2), dtype=dt)(x, train)
        p5 = x

        # PAN-FPN neck
        def up2(t):
            b, h, w, c = t.shape
            return jax.image.resize(t, (b, h * 2, w * 2, c), "nearest")

        x = jnp.concatenate([up2(p5), p4], -1)
        x = C3k2(ch(512), rep(2), c3k=False, dtype=dt)(x, train)
        n4 = x
        x = jnp.concatenate([up2(x), p3], -1)
        x = C3k2(ch(256), rep(2), c3k=False, dtype=dt)(x, train)
        n3 = x  # P3 out
        x = ConvBnAct(ch(256), 3, 2, dtype=dt)(n3, train)
        x = jnp.concatenate([x, n4], -1)
        x = C3k2(ch(512), rep(2), c3k=False, dtype=dt)(x, train)
        o4 = x  # P4 out
        x = ConvBnAct(ch(512), 3, 2, dtype=dt)(o4, train)
        x = jnp.concatenate([x, p5], -1)
        o5 = C3k2(ch(1024), rep(2), c3k=True, dtype=dt)(x, train)  # P5 out

        # heads
        protos = Proto(ch(256), dtype=dt)(n3, train)
        c_box = max(REG_MAX * 4, ch(256) // 4)
        c_cls = max(self.num_classes, min(ch(256), 100))
        preds = []
        for feat in (n3, o4, o5):
            box = ConvBnAct(c_box, 3, dtype=dt)(feat, train)
            box = ConvBnAct(c_box, 3, dtype=dt)(box, train)
            box = nn.Conv(4 * REG_MAX, (1, 1), dtype=dt)(box)
            cls = ConvBnAct(c_cls, 3, dtype=dt)(feat, train)
            cls = ConvBnAct(c_cls, 3, dtype=dt)(cls, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                          bias_init=nn.initializers.constant(-4.6))(cls)  # prior p≈0.01
            mc = ConvBnAct(NM, 3, dtype=dt)(feat, train)
            mc = nn.Conv(NM, (1, 1), dtype=dt)(mc)
            preds.append(
                jnp.concatenate([box, cls, mc], -1).astype(jnp.float32)
            )
        return {"preds": preds, "protos": protos.astype(jnp.float32)}


# ---------------------------------------------------------------------------
# decode + fixed-shape NMS (replaces ultralytics postproc, od_export.py:149-160)
# ---------------------------------------------------------------------------


def _dfl_expectation(box_logits: jnp.ndarray) -> jnp.ndarray:
    """(…, 4·REG_MAX) DFL logits → (…, 4) expected l,t,r,b distances (in
    stride units) via per-side softmax expectation."""
    shape = box_logits.shape[:-1]
    x = box_logits.reshape(*shape, 4, REG_MAX)
    p = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def decode_predictions(out: dict, img_hw: tuple[int, int], num_classes: int = 1):
    """Raw head outputs → flat (B, N, 4+nc+NM): xyxy boxes in pixels, class
    probabilities (sigmoid), mask coefficients. N = Σ Hi·Wi over the 3 scales.
    """
    flat = []
    for pred, stride in zip(out["preds"], STRIDES):
        b, h, w, _ = pred.shape
        box = _dfl_expectation(pred[..., : 4 * REG_MAX])  # (B,H,W,4) ltrb
        cls = jax.nn.sigmoid(pred[..., 4 * REG_MAX : 4 * REG_MAX + num_classes])
        mc = pred[..., 4 * REG_MAX + num_classes :]
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        x1 = (cx - box[..., 0]) * stride
        y1 = (cy - box[..., 1]) * stride
        x2 = (cx + box[..., 2]) * stride
        y2 = (cy + box[..., 3]) * stride
        xyxy = jnp.stack([x1, y1, x2, y2], -1)
        flat.append(
            jnp.concatenate([xyxy, cls, mc], -1).reshape(b, h * w, -1)
        )
    return jnp.concatenate(flat, axis=1)


def _box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,4) × (M,4) xyxy → (N,M) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.prod(jnp.clip(a[:, 2:] - a[:, :2], 0.0), -1)
    area_b = jnp.prod(jnp.clip(b[:, 2:] - b[:, :2], 0.0), -1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def nms_fixed(
    boxes: jnp.ndarray,  # (N, 4) xyxy
    scores: jnp.ndarray,  # (N,) best-class score
    classes: jnp.ndarray,  # (N,) int32
    max_det: int = 32,
    pre_nms: int = 256,
    iou_thresh: float = 0.45,
    score_thresh: float = 0.25,
):
    """Greedy class-aware NMS with fully static shapes (SURVEY.md §7).

    Returns (idx (max_det,), valid (max_det,) bool) into the input arrays.
    Candidates are the top ``pre_nms`` by score; suppression uses a single
    (pre_nms × pre_nms) IoU matrix and a masked argmax loop of ``max_det``
    steps — all fixed shapes, MXU/VPU friendly.
    """
    n = boxes.shape[0]
    pre = min(pre_nms, n)
    top_s, top_i = jax.lax.top_k(scores, pre)
    cand_boxes = boxes[top_i]
    cand_cls = classes[top_i]
    iou = _box_iou(cand_boxes, cand_boxes)
    same_cls = cand_cls[:, None] == cand_cls[None, :]
    suppress_mat = (iou > iou_thresh) & same_cls

    def body(i, carry):
        alive, sel, val = carry
        s = jnp.where(alive, top_s, -1.0)
        j = jnp.argmax(s)
        ok = s[j] > score_thresh
        sel = sel.at[i].set(jnp.where(ok, top_i[j], 0))
        val = val.at[i].set(ok)
        alive = alive & ~suppress_mat[j] & (jnp.arange(pre) != j)
        alive = alive & ok  # once below threshold, stop selecting
        return alive, sel, val

    carry = (jnp.ones(pre, bool), jnp.zeros(max_det, jnp.int32), jnp.zeros(max_det, bool))
    # unrolled python loop, NOT lax.fori_loop: XLA while-loop iterations run
    # as separate host round-trips on remote-dispatch runtimes; max_det is
    # small and static, so unrolling costs nothing
    for i in range(max_det):
        carry = body(i, carry)
    _, sel, val = carry
    return sel, val


def crop_masks(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside each detection's box (ultralytics crop_mask).
    masks (D, H, W); boxes (D, 4) xyxy at mask resolution."""
    d, h, w = masks.shape
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1, y1, x2, y2 = (boxes[:, i][:, None, None] for i in range(4))
    inside = (xx >= x1) & (xx < x2) & (yy >= y1) & (yy < y2)
    return masks * inside


def detect(
    variables,
    model: YoloSeg,
    images: jnp.ndarray,
    max_det: int = 32,
    iou_thresh: float = 0.45,
    score_thresh: float = 0.25,
):
    """Full jittable inference: images (B,H,W,3) → dict of padded detections.

    Returns (per batch element): boxes (B,D,4) px xyxy, scores (B,D),
    classes (B,D), masks (B,D,H/4,W/4) sigmoid mask crops, valid (B,D) bool.
    Replaces CardSegmenter.__call__ + ultralytics NMS (od_export.py:149-160).
    """
    h, w = images.shape[1:3]
    out = model.apply(variables, images)
    flat = decode_predictions(out, (h, w), model.num_classes)
    nc = model.num_classes
    boxes = flat[..., :4]
    cls_probs = flat[..., 4 : 4 + nc]
    mcoef = flat[..., 4 + nc :]
    scores = jnp.max(cls_probs, -1)
    classes = jnp.argmax(cls_probs, -1).astype(jnp.int32)

    def per_image(bx, sc, cl, mc, protos):
        sel, val = nms_fixed(
            bx, sc, cl, max_det=max_det, iou_thresh=iou_thresh, score_thresh=score_thresh
        )
        dbox = bx[sel]
        dcoef = mc[sel]  # (D, NM)
        # mask = sigmoid(protos · coef), cropped to box (at proto resolution)
        m = jax.nn.sigmoid(jnp.einsum("hwc,dc->dhw", protos, dcoef))
        scale = protos.shape[0] / h  # proto grid is H/4
        m = crop_masks(m, dbox * scale)
        return dbox, sc[sel], cl[sel], m, val

    return jax.vmap(per_image)(boxes, scores, classes, mcoef, out["protos"])
