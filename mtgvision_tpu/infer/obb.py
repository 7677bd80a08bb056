"""Oriented card quads from the OBB detector kind (3 keypoint AABBs).

The reference's second dataset kind trains a plain 3-class detector — card /
card_top / card_bottom axis-aligned boxes (od_datasets.py:244-256) — and
leaves quad recovery to the consumer. This module is the TPU-native
consumer: a fixed-shape, jittable association + analytic rectangle solve
that turns padded ``models.yolo.detect`` outputs into the same oriented
[TL,TR,BR,BL] quads the seg path produces, so the rest of the pipeline
(dewarp → refine head → encoder → match) is shared between both kinds.

Geometry. The top/bottom keypoint boxes are AABBs of the card's top and
bottom halves (data/scene_gen.py:72-88), so their centers sit at ±h/4 along
the card's "down" axis: ``bottom_center − top_center`` gives the in-plane
orientation AND a direct scale estimate (|d| = h/2). The card's own AABB
adds two more equations (W = w·|cos θ| + h·|sin θ|, H = w·|sin θ| + h·|cos θ|,
singular at 45°); all three are solved jointly by 2×2 least squares, which
stays well-conditioned at every angle.
"""

from __future__ import annotations

import jax.numpy as jnp

# class ids fixed by the dataset writer (scene_gen.py obb kind)
CLS_CARD, CLS_TOP, CLS_BOTTOM = 0, 1, 2


def _centers(boxes: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (boxes[..., :2] + boxes[..., 2:])


def obb_card_corners(
    boxes: jnp.ndarray,  # (D, 4) xyxy from detect()
    scores: jnp.ndarray,  # (D,)
    classes: jnp.ndarray,  # (D,) int32
    valid: jnp.ndarray,  # (D,) bool
    max_cards: int = 8,
    pad_ratio: float = 0.15,
):
    """Padded detections → (max_cards, 4, 2) oriented quads + (max_cards,) ok.

    Association is fully dense/fixed-shape: each card slot picks the highest-
    scoring top/bottom detection whose center falls inside the (padded) card
    box. Slots without a valid card + top + bottom triple come back ok=False.
    """
    d = boxes.shape[0]
    is_card = valid & (classes == CLS_CARD)
    card_rank = jnp.where(is_card, scores, -1.0)
    # top max_cards card detections by score (stable fixed shape)
    top_idx = jnp.argsort(-card_rank)[:max_cards]
    cbox = boxes[top_idx]  # (Dc, 4)
    cok = is_card[top_idx]

    # candidate centers inside each card box (padded by pad_ratio of its size)
    cen = _centers(boxes)  # (D, 2)
    wh = jnp.maximum(cbox[:, 2:] - cbox[:, :2], 1e-3)  # (Dc, 2)
    lo = cbox[:, :2] - pad_ratio * wh
    hi = cbox[:, 2:] + pad_ratio * wh
    inside = jnp.all(
        (cen[None, :, :] >= lo[:, None, :]) & (cen[None, :, :] <= hi[:, None, :]),
        axis=-1,
    )  # (Dc, D)

    def pick(cls):
        cand = inside & (classes[None, :] == cls) & valid[None, :]
        sc = jnp.where(cand, scores[None, :], -1.0)
        j = jnp.argmax(sc, axis=1)  # (Dc,)
        found = jnp.take_along_axis(sc, j[:, None], 1)[:, 0] > 0.0
        return j, found

    jt, has_t = pick(CLS_TOP)
    jb, has_b = pick(CLS_BOTTOM)
    ok = cok & has_t & has_b

    c = _centers(cbox)  # card center (Dc, 2)
    dvec = cen[jb] - cen[jt]  # top→bottom = "down" · h/2
    dlen = jnp.maximum(jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-3)
    down = dvec / dlen
    # right = down rotated −90° (upright card: down=(0,1) ⇒ right=(1,0))
    right = jnp.stack([down[:, 1], -down[:, 0]], axis=-1)

    # least squares for (w, h): rows [|cosθ| |sinθ|; |sinθ| |cosθ|; 0 1]
    # against [W, H, 2|d|]  (θ measured from upright, so |cosθ| = |down_y|)
    co = jnp.abs(down[:, 1])
    si = jnp.abs(down[:, 0])
    W, H = wh[:, 0], wh[:, 1]
    t2 = 2.0 * dlen[:, 0]
    # normal equations A^T A x = A^T b, A = [[co,si],[si,co],[0,1]]
    a11 = co * co + si * si  # = 1
    a12 = 2.0 * co * si
    a22 = si * si + co * co + 1.0  # = 2
    b1 = co * W + si * H
    b2 = si * W + co * H + t2
    det = jnp.maximum(a11 * a22 - a12 * a12, 1e-6)
    w = (a22 * b1 - a12 * b2) / det
    h = (a11 * b2 - a12 * b1) / det
    w = jnp.maximum(w, 1.0)[:, None]
    h = jnp.maximum(h, 1.0)[:, None]

    tl = c - 0.5 * w * right - 0.5 * h * down
    tr = c + 0.5 * w * right - 0.5 * h * down
    br = c + 0.5 * w * right + 0.5 * h * down
    bl = c - 0.5 * w * right + 0.5 * h * down
    corners = jnp.stack([tl, tr, br, bl], axis=1)  # (Dc, 4, 2)
    return corners, ok, top_idx


def obb_card_corners_batch(boxes, scores, classes, valid, max_cards: int = 8):
    """(B,D,…) batched variant of :func:`obb_card_corners` —
    returns (corners (B,Dc,4,2), ok (B,Dc), card_idx (B,Dc) into D)."""
    import jax

    return jax.vmap(
        lambda b, s, c, v: obb_card_corners(b, s, c, v, max_cards=max_cards)
    )(boxes, scores, classes, valid)
