"""Batched affine / perspective warps and 2-D homogeneous point transforms.

TPU-native rebuild of the reference's cv2 geometry:
- cv2.warpPerspective / cv2.warpAffine usage (mtgvision/od_datasets.py:73-83,
  mtgvision/od_export.py:95-110, mtgvision/encoder_datasets.py:94-116)
- homogeneous 2-D point ops (mtgvision/od_datasets.py:29-118)
- cv2.getPerspectiveTransform (od_export.py:106) via a batched DLT solve.

Conventions (identical to OpenCV so matrices interchange):
- points are (x, y) columns; a transform M (3,3) maps SRC → DST:
  ``dst ~ M @ [x, y, 1]^T``.
- ``warp_*`` ops take the forward (src→dst) matrix and inverse-sample, exactly
  like ``cv2.warpPerspective(img, M, dsize)``.
- images are (…,H,W,C); output shapes are static.

Sampling is bilinear with zero (or constant) fill outside the source — XLA
lowers the gathers to efficient dynamic-slices; for the serving hot path a
fused Pallas dewarp kernel lives in mtgvision_tpu/infer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# matrix builders (reference: od_datasets.py:50-118, encoder_datasets.py:353-400)
# ---------------------------------------------------------------------------


def rotation_matrix_2d(theta) -> jnp.ndarray:
    """(…,3,3) rotation about the origin by ``theta`` radians (od_datasets.py:50-56)."""
    theta = jnp.asarray(theta, jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)],
        axis=-2,
    )


def translation_matrix_2d(tx, ty) -> jnp.ndarray:
    """(…,3,3) translation (od_datasets.py:59-62)."""
    tx = jnp.asarray(tx, jnp.float32)
    ty = jnp.broadcast_to(jnp.asarray(ty, jnp.float32), tx.shape)
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack(
        [jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1), jnp.stack([z, z, o], -1)],
        axis=-2,
    )


def scale_matrix_2d(sx, sy=None) -> jnp.ndarray:
    sx = jnp.asarray(sx, jnp.float32)
    sy = sx if sy is None else jnp.broadcast_to(jnp.asarray(sy, jnp.float32), sx.shape)
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack(
        [jnp.stack([sx, z, z], -1), jnp.stack([z, sy, z], -1), jnp.stack([z, z, o], -1)],
        axis=-2,
    )


def shear_matrix_2d(shx, shy) -> jnp.ndarray:
    shx = jnp.asarray(shx, jnp.float32)
    shy = jnp.broadcast_to(jnp.asarray(shy, jnp.float32), shx.shape)
    z, o = jnp.zeros_like(shx), jnp.ones_like(shx)
    return jnp.stack(
        [jnp.stack([o, shx, z], -1), jnp.stack([shy, o, z], -1), jnp.stack([z, z, o], -1)],
        axis=-2,
    )


def compose(*ms: jnp.ndarray) -> jnp.ndarray:
    """Chain 3×3 transforms left-to-right application order (m0 applied last).

    Always full f32 precision — the TPU's default bf16 matmul visibly distorts
    composed homographies.
    """
    out = ms[0]
    for m in ms[1:]:
        out = jnp.matmul(out, m, precision="highest")
    return out


def affine_matrix(
    rot=0.0, tx=0.0, ty=0.0, sx=1.0, sy=None, shx=0.0, shy=0.0, center=None
) -> jnp.ndarray:
    """Compose rot·scale·shear about ``center`` then translate — the reference's
    affine aug (encoder_datasets.py:353-375) as a single (…,3,3) matrix."""
    m = compose(rotation_matrix_2d(rot), scale_matrix_2d(sx, sy), shear_matrix_2d(shx, shy))
    if center is not None:
        cx, cy = center
        m = compose(translation_matrix_2d(cx, cy), m, translation_matrix_2d(-cx, -cy))
    return compose(translation_matrix_2d(tx, ty), m)


def apply_transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (…,3,3) homography to (…,N,2) xy points (od_datasets.py:64-71)."""
    ones = jnp.ones((*pts.shape[:-1], 1), pts.dtype)
    h = jnp.concatenate([pts, ones], axis=-1)  # (…,N,3)
    # tiny matrices: full f32 precision matters (TPU default matmul is bf16)
    out = jnp.einsum("...ij,...nj->...ni", m, h, precision="highest")
    return out[..., :2] / (out[..., 2:3] + 1e-12)


def perspective_from_quads(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Homography mapping 4 src (x,y) points to 4 dst points — batched
    cv2.getPerspectiveTransform (od_export.py:106). src/dst: (…,4,2) → (…,3,3).

    Solves the standard 8×8 DLT system; the batched solve maps onto the MXU.
    """
    x, y = src[..., 0], src[..., 1]  # (…,4)
    u, v = dst[..., 0], dst[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    # rows for u: [x y 1 0 0 0 -u·x -u·y]; rows for v: [0 0 0 x y 1 -v·x -v·y]
    ru = jnp.stack([x, y, o, z, z, z, -u * x, -u * y], axis=-1)  # (…,4,8)
    rv = jnp.stack([z, z, z, x, y, o, -v * x, -v * y], axis=-1)
    a = jnp.concatenate([ru, rv], axis=-2)  # (…,8,8)
    b = jnp.concatenate([u, v], axis=-1)[..., None]  # (…,8,1)
    h = jnp.linalg.solve(a, b)[..., 0]  # (…,8)
    ones = jnp.ones((*h.shape[:-1], 1), h.dtype)
    return jnp.concatenate([h, ones], axis=-1).reshape(*h.shape[:-1], 3, 3)


# ---------------------------------------------------------------------------
# bilinear sampling + warps
# ---------------------------------------------------------------------------


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Sample (H,W,C) ``img`` at float (…,2) xy coords; zero/constant outside.

    The gather is expressed as 4 clamped integer lookups + lerp — XLA fuses this
    into a single gather kernel on TPU.
    """
    h, w = img.shape[-3], img.shape[-2]
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    # constant fill outside the source rect (cv2 BORDER_CONSTANT semantics)
    inside = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    return jnp.where(inside[..., None], out, fill)


def _out_grid(out_hw: tuple[int, int]) -> jnp.ndarray:
    oh, ow = out_hw
    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (oh,ow)
    return jnp.stack([gx, gy], axis=-1)  # (oh,ow,2) xy


def warp_perspective(
    img: jnp.ndarray, m: jnp.ndarray, out_hw: tuple[int, int], fill: float = 0.0
) -> jnp.ndarray:
    """cv2.warpPerspective equivalent: ``m`` maps src→dst; inverse-sampled.

    img: (H,W,C) or (B,H,W,C) with m (3,3) or (B,3,3).
    """
    if img.ndim == 4:
        return jax.vmap(lambda i, mm: warp_perspective(i, mm, out_hw, fill))(
            img, jnp.broadcast_to(m, (img.shape[0], 3, 3))
        )
    minv = jnp.linalg.inv(m)
    src_xy = apply_transform_points(minv, _out_grid(out_hw).reshape(-1, 2))
    out = bilinear_sample(img, src_xy, fill=fill)
    return out.reshape(*out_hw, img.shape[-1])


def warp_affine(
    img: jnp.ndarray, m: jnp.ndarray, out_hw: tuple[int, int], fill: float = 0.0
) -> jnp.ndarray:
    """cv2.warpAffine equivalent; accepts (2,3) or (3,3) matrices."""
    if m.shape[-2] == 2:
        pad = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], m.dtype), (*m.shape[:-2], 1, 3)
        )
        m = jnp.concatenate([m, pad], axis=-2)
    return warp_perspective(img, m, out_hw, fill=fill)


def warp_perspective_onto(
    fg_rgba: jnp.ndarray, m: jnp.ndarray, bg_rgb: jnp.ndarray
) -> jnp.ndarray:
    """Warp an RGBA foreground by ``m`` onto a background and alpha-blend —
    the scene-compositor primitive (od_datasets.py:589-601, util/cv2.py:86-114)."""
    out_hw = (bg_rgb.shape[-3], bg_rgb.shape[-2])
    warped = warp_perspective(fg_rgba, m, out_hw, fill=0.0)
    a = warped[..., 3:4]
    return jnp.clip(bg_rgb * (1.0 - a) + warped[..., :3] * a, 0.0, 1.0)


def rotate_bounded(img: jnp.ndarray, deg, out_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """Rotate anticlockwise by ``deg`` degrees keeping the whole image visible,
    scaled to fit a fixed canvas (util/image.py:381-404 semantics, static shape).

    The reference grows the canvas to the rotated bounding box (dynamic shape);
    under XLA we keep ``out_hw`` static (default: input shape) and uniformly
    scale the rotated bbox to fit, centered.
    """
    h, w = img.shape[-3], img.shape[-2]
    if out_hw is None:
        out_hw = (h, w)
    oh, ow = out_hw
    theta = -jnp.deg2rad(jnp.asarray(deg, jnp.float32))  # cv2 angle>0 = anticlockwise
    c, s = jnp.abs(jnp.cos(theta)), jnp.abs(jnp.sin(theta))
    nw = h * s + w * c
    nh = h * c + w * s
    scale = jnp.minimum(ow / nw, oh / nh)
    m = compose(
        translation_matrix_2d(ow / 2.0, oh / 2.0),
        scale_matrix_2d(scale),
        rotation_matrix_2d(theta),
        translation_matrix_2d(-w / 2.0, -h / 2.0),
    )
    return warp_perspective(img, m, out_hw)


__all__ = [s for s in dir() if not s.startswith("_")]
