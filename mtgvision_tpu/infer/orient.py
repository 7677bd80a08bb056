"""Oriented-corner recovery from notched card masks — on-device, batched.

Reference algorithm (mtgvision/od_export.py:52-93, `InstanceSeg._orient`):
shapely buffer(+d).buffer(−d) morphological close of the U-shaped mask
polygon, centroid(orig)−centroid(closed) as the top→bottom direction,
cv2.approxPolyN 4-corner fit, ray–edge intersection to find the bottom edge,
np.roll so corner 0 = top-left.

TPU-native redesign — same outputs, closed-form moment math instead of
GEOS/iterative polygon ops (no dynamic shapes, vmaps over detections):

1. image moments of the mask → centroid + covariance → principal axis
   (the card's long axis), eigendecomposition in closed form (2×2).
2. notch-side disambiguation: the bottom-center cutout shifts the centroid
   toward the top, so the max projection along the axis (distance centroid→
   edge) is LARGER toward the bottom → sign(extent) picks the true
   top→bottom direction (replaces the buffer-close + centroid-diff trick).
3. corners = extreme mask pixels along the two diagonal directions of the
   oriented frame (argmax of ±u±v over mask pixels) — exact for convex
   quads under perspective (replaces approxPolyN + ray test), returned
   rolled to [TL, TR, BR, BL] like the reference (:89-93).

`extract_dewarped` then matches od_export.py:95-110: homography from the 5%%-
expanded corner quad to the (192,128) card frame, bilinear warp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mtgvision_tpu.ops.warp import perspective_from_quads, warp_perspective


def orient_corners(mask: jnp.ndarray):
    """(H, W) float mask → (corners (4,2) xy [TL,TR,BR,BL], ok flag).

    Fully differentiable-free forward math; NaN-safe for empty masks
    (ok=False and corners=0).
    """
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    area = jnp.sum(m)
    ok = area > 8.0
    denom = jnp.maximum(area, 1e-6)

    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = jnp.sum(m * xx) / denom
    cy = jnp.sum(m * yy) / denom
    dx = xx - cx
    dy = yy - cy

    # central second moments → principal axis (closed-form 2×2 eig)
    mxx = jnp.sum(m * dx * dx) / denom
    myy = jnp.sum(m * dy * dy) / denom
    mxy = jnp.sum(m * dx * dy) / denom
    # largest-eigenvalue eigenvector of [[mxx, mxy], [mxy, myy]]
    tr = mxx + myy
    det = mxx * myy - mxy * mxy
    lam = tr / 2.0 + jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    # eigenvector: (mxy, lam - mxx), fall back to (1,0)/(0,1) for axis-aligned
    v = jnp.where(
        jnp.abs(mxy) > 1e-6,
        jnp.stack([mxy, lam - mxx]),
        jnp.where(mxx >= myy, jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0])),
    )
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)  # long (vertical) card axis

    # projections of mask pixels on the axis
    proj = dx * v[0] + dy * v[1]
    big = 1e9
    pmax = jnp.max(jnp.where(m > 0.5, proj, -big))
    pmin = jnp.min(jnp.where(m > 0.5, proj, big))
    # notch pulls the centroid toward the top ⇒ larger extent toward the bottom
    sign = jnp.where(pmax >= -pmin, 1.0, -1.0)
    down = v * sign  # unit vector pointing top→bottom of the card
    # left→right axis: down rotated −90° in y-DOWN screen coordinates
    right = jnp.stack([down[1], -down[0]])

    u = dx * right[0] + dy * right[1]
    t = dx * down[0] + dy * down[1]

    def extreme(score):
        idx = jnp.argmax(jnp.where(m > 0.5, score, -big))
        iy, ix = jnp.unravel_index(idx, (h, w))
        return jnp.stack([ix.astype(jnp.float32), iy.astype(jnp.float32)])

    tl = extreme(-u - t)
    tr_ = extreme(u - t)
    br = extreme(u + t)
    bl = extreme(-u + t)
    corners = jnp.stack([tl, tr_, br, bl])
    return jnp.where(ok, corners, jnp.zeros_like(corners)), ok


@functools.partial(jax.jit, static_argnames=("out_hw",))
def extract_dewarped(
    frame: jnp.ndarray,
    corners: jnp.ndarray,
    out_hw: tuple[int, int] = (192, 128),
    expand_ratio: float = 0.05,
):
    """Perspective-rectify the card given [TL,TR,BR,BL] frame-space corners
    (od_export.py:95-110: getPerspectiveTransform + warpPerspective to
    (192,128) with 5% outward expansion)."""
    oh, ow = out_hw
    e = expand_ratio
    dst = jnp.asarray(
        [
            [ow * e, oh * e],
            [ow * (1 - e), oh * e],
            [ow * (1 - e), oh * (1 - e)],
            [ow * e, oh * (1 - e)],
        ],
        jnp.float32,
    )
    m = perspective_from_quads(corners.astype(jnp.float32), dst)
    return warp_perspective(frame, m, out_hw)


def orient_batch(masks: jnp.ndarray):
    """(D, H, W) masks → ((D,4,2) corners, (D,) ok)."""
    return jax.vmap(orient_corners)(masks)
