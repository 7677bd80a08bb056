"""Canonical float32 [0,1] image ops, batched NHWC, jittable.

TPU-native rebuild of the reference's numpy/OpenCV image layer
(mtgvision/util/image.py:185-488). Differences by design:

- images are JAX arrays, NHWC (or HWC for single images — every op works on
  arbitrary leading batch dims because the math is expressed on the last 3 axes),
- all randomness takes an explicit ``jax.random`` key (the reference uses global
  ``np.random`` — mtgvision/util/image.py:434-488),
- output shapes are static (XLA requirement), so ops that change size take the
  target shape as a static argument.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# dtype conversion (reference: util/image.py:185-238)
# ---------------------------------------------------------------------------


def img_clip(img: jnp.ndarray) -> jnp.ndarray:
    """Clip to valid range: [0,1] for floats, [0,255] for ints."""
    if jnp.issubdtype(img.dtype, jnp.floating):
        return jnp.clip(img, 0.0, 1.0)
    return jnp.clip(img, 0, 255)


def img_float32(img) -> jnp.ndarray:
    """Convert uint8 [0,255] or float to canonical float32 [0,1]."""
    img = jnp.asarray(img)
    if jnp.issubdtype(img.dtype, jnp.floating):
        return img_clip(img.astype(jnp.float32))
    return img_clip(img.astype(jnp.float32) / 255.0)


def img_uint8(img) -> jnp.ndarray:
    """Convert float [0,1] or int image to uint8 [0,255]."""
    img = jnp.asarray(img)
    if jnp.issubdtype(img.dtype, jnp.floating):
        return (img_clip(img) * 255.0).astype(jnp.uint8)
    return img_clip(img).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# flips (reference: util/image.py:299-318)
# ---------------------------------------------------------------------------


def flip_vert(img: jnp.ndarray) -> jnp.ndarray:
    """Flip vertically (rows). Image axes are the last three (…,H,W,C)."""
    return jnp.flip(img, axis=-3)


def flip_horr(img: jnp.ndarray) -> jnp.ndarray:
    """Flip horizontally (cols)."""
    return jnp.flip(img, axis=-2)


# ---------------------------------------------------------------------------
# resize / crop (reference: util/image.py:321-378)
# ---------------------------------------------------------------------------


def resize(img: jnp.ndarray, size_hw: tuple[int, int], method: str = "linear") -> jnp.ndarray:
    """Resize the (…,H,W,C) image to ``size_hw`` (static).

    The reference picks INTER_AREA when shrinking and INTER_CUBIC when growing
    (util/image.py:321-335); on TPU we use XLA's bilinear resize with
    anti-aliasing, which matches INTER_AREA closely when shrinking and is fused
    by the compiler.
    """
    h, w = size_hw
    out_shape = (*img.shape[:-3], h, w, img.shape[-1])
    out = jax.image.resize(img, out_shape, method=method, antialias=True)
    return img_clip(out)


def remove_border_resized(
    img: jnp.ndarray, border_width: int, size_hw: tuple[int, int] | None = None
) -> jnp.ndarray:
    """Crop a fixed border then (optionally) resize (util/image.py:338-347)."""
    b = border_width
    crop = img[..., b : img.shape[-3] - b, b : img.shape[-2] - b, :]
    if size_hw is not None:
        crop = resize(crop, size_hw)
    return crop


def crop_to_size(img: jnp.ndarray, size_hw: tuple[int, int], pad: bool = False) -> jnp.ndarray:
    """Aspect-preserving resize then center-crop (pad=False) or center-pad
    (pad=True) to ``size_hw``. Semantics match util/image.py:350-378.

    Shapes are static so the scale factor is computed in Python.
    """
    ih, iw = int(img.shape[-3]), int(img.shape[-2])
    sh, sw = size_hw
    if (ih, iw) == (sh, sw):
        return img
    rh, rw = ih / sh, iw / sw
    r = min(rh, rw) if not pad else max(rh, rw)
    nh, nw = int(ih / r), int(iw / r)
    resized = resize(img, (nh, nw))
    if pad:
        y0, x0 = (sh - nh) // 2, (sw - nw) // 2
        pads = [(0, 0)] * (img.ndim - 3) + [
            (y0, sh - nh - y0),
            (x0, sw - nw - x0),
            (0, 0),
        ]
        return jnp.pad(resized, pads)
    y0, x0 = (nh - sh) // 2, (nw - sw) // 2
    return resized[..., y0 : y0 + sh, x0 : x0 + sw, :]


# ---------------------------------------------------------------------------
# masks (reference: util/image.py:407-431)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def round_rect_mask(
    size_hw: tuple[int, int],
    radius: int | None = None,
    radius_ratio: float = 0.045,
) -> jnp.ndarray:
    """(H,W) float32 mask of a rounded rectangle — the card alpha mask.

    Matches util/image.py:407-431: ones everywhere, quarter-circles of radius
    ``radius`` (default ceil(max(H,W)·radius_ratio)) cut into the 4 corners.
    Computed analytically (distance to corner centers) instead of cv2.circle.
    """
    h, w = size_hw
    if radius is None:
        radius = int(math.ceil(max(h, w) * radius_ratio))
    r = float(radius)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    # distance from each corner's circle center (inset by r at each corner)
    cy = jnp.clip(yy, r - 0.0, h - r)  # nearest point of the "safe" rect, y
    cx = jnp.clip(xx, r - 0.0, w - r)
    # corner circle centers at (r-?, …): replicate cv2.circle((0,0),r) stamped
    # into an r×r corner tile → pixel kept iff dist(px, corner_center) <= r.
    d2 = (yy - cy) ** 2 + (xx - cx) ** 2
    return (d2 <= r * r).astype(jnp.float32)


# ---------------------------------------------------------------------------
# compositing (reference: util/image.py:246-296)
# ---------------------------------------------------------------------------


def rgb_mask_over_rgb(fg_rgb: jnp.ndarray, fg_mask: jnp.ndarray, bg_rgb: jnp.ndarray) -> jnp.ndarray:
    """Alpha-composite fg over bg using a (…,H,W) mask (util/image.py:265-296)."""
    a = fg_mask[..., None]
    return img_clip(fg_rgb * a + bg_rgb * (1.0 - a))


def rgba_over_rgb(fg_rgba: jnp.ndarray, bg_rgb: jnp.ndarray) -> jnp.ndarray:
    """Alpha-composite a (…,H,W,4) image over a (…,H,W,3) one (util/image.py:246-262)."""
    return rgb_mask_over_rgb(fg_rgba[..., :3], fg_rgba[..., 3], bg_rgb)


# ---------------------------------------------------------------------------
# noise family (reference: util/image.py:434-488) — explicit PRNG keys
# ---------------------------------------------------------------------------


def _split_rgb(img):
    """RGB channels + passthrough extra channels (alpha preserved by noise ops)."""
    return img[..., :3], img[..., 3:]


def noise_speckle(key, img: jnp.ndarray, strength: float = 0.1) -> jnp.ndarray:
    """Multiplicative gaussian speckle on RGB; alpha untouched (image.py:439-447)."""
    rgb, rest = _split_rgb(img)
    gauss = jax.random.normal(key, rgb.shape, dtype=rgb.dtype)
    rgb = rgb * (1.0 + gauss * strength)
    return jnp.concatenate([img_clip(rgb), rest], axis=-1)


def noise_gaussian(key, img: jnp.ndarray, mean: float = 0.0, var: float = 0.5) -> jnp.ndarray:
    """Additive gaussian noise on RGB (image.py:450-458)."""
    rgb, rest = _split_rgb(img)
    gauss = mean + (var**0.5) * jax.random.normal(key, rgb.shape, dtype=rgb.dtype)
    return jnp.concatenate([img_clip(rgb + gauss), rest], axis=-1)


def noise_salt_pepper(key, img: jnp.ndarray, strength: float = 0.1, svp: float = 0.5) -> jnp.ndarray:
    """Set a random fraction of RGB pixels to 1 (salt) or 0 (pepper).

    Reference (image.py:461-477) flips `strength·size` random *elements*;
    expressed here as an i.i.d. per-element Bernoulli mask, which has the same
    expected density and is trivially batched/jittable. Alpha preserved.
    """
    rgb, rest = _split_rgb(img)
    ks, kp = jax.random.split(key)
    u = jax.random.uniform(ks, rgb.shape)
    salt = u < (strength * svp)
    pepper = u > 1.0 - (strength * (1.0 - svp))
    rgb = jnp.where(salt, 1.0, jnp.where(pepper, 0.0, rgb))
    return jnp.concatenate([rgb, rest], axis=-1)


def noise_poisson(key, img: jnp.ndarray, peak: float = 0.1, amount: float = 0.25) -> jnp.ndarray:
    """Poisson (shot) noise blended with the image (image.py:480-488).

    Uses a gaussian approximation to Poisson(λ=img·peak)/peak — mean img,
    variance img/peak — which is indistinguishable at these settings and keeps
    the op cheap/vectorized on the VPU.
    """
    rgb, rest = _split_rgb(img)
    lam = jnp.maximum(rgb * peak, 1e-8)
    noisy = (lam + jnp.sqrt(lam) * jax.random.normal(key, rgb.shape, dtype=rgb.dtype)) / peak
    out = (1.0 - amount) * img_clip(rgb) + amount * img_clip(noisy)
    return jnp.concatenate([img_clip(out), rest], axis=-1)


# ---------------------------------------------------------------------------
# batched helpers
# ---------------------------------------------------------------------------


def batch_keys(key, n: int) -> jnp.ndarray:
    """Split one key into a (n, …) stack of keys for per-sample augs."""
    return jax.random.split(key, n)


def to_batch(img: jnp.ndarray) -> jnp.ndarray:
    """Ensure a leading batch dim on an HWC image."""
    return img[None] if img.ndim == 3 else img


__all__ = [s for s in dir() if not s.startswith("_")]
