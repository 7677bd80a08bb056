"""SSIM / MS-SSIM in pure JAX (NHWC) — replaces kornia.losses.ssim_loss /
ms_ssim usage in the reference recon losses (mtgvision/encoder_train.py:298-307).

Standard Wang et al. SSIM: 11×11 gaussian window (σ=1.5), C1=(0.01·L)²,
C2=(0.03·L)² with L=1 for [0,1] images. The separable gaussian blur is two
depthwise convs — XLA fuses these tightly on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian blur, NHWC, VALID padding."""
    c = img.shape[-1]
    k = kernel.shape[0]
    kh = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(img.shape, (k, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(img, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    dn = lax.conv_dimension_numbers(out.shape, (1, k, 1, c), ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(out, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over the batch; x, y (B,H,W,C) in [0,1]."""
    return jnp.mean(ssim_map(x, y, window_size, sigma))


def ssim_map(x, y, window_size: int = 11, sigma: float = 1.5):
    c1, c2 = 0.01**2, 0.03**2
    kern = _gaussian_kernel(window_size, sigma)
    mx = _blur(x, kern)
    my = _blur(y, kern)
    mxx = _blur(x * x, kern)
    myy = _blur(y * y, kern)
    mxy = _blur(x * y, kern)
    vx = mxx - mx * mx
    vy = myy - my * my
    cxy = mxy - mx * my
    num = (2 * mx * my + c1) * (2 * cxy + c2)
    den = (mx * mx + my * my + c1) * (vx + vy + c2)
    return num / den


def ssim_loss(x, y, window_size: int = 11) -> jnp.ndarray:
    """(1 - SSIM)/2 — kornia.losses.ssim_loss convention used by the reference."""
    return (1.0 - ssim(x, y, window_size)) / 2.0


@functools.partial(jax.jit, static_argnames=("window_size", "levels"))
def ms_ssim(x, y, window_size: int = 11, levels: int = 5):
    """Multi-scale SSIM (Wang 2003) with the standard 5 level weights.

    Levels that would shrink below the window are dropped statically (the
    192×128 card crops support 4 levels with an 11-tap window).
    """
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels]
    h, w = x.shape[-3], x.shape[-2]
    usable = 0
    th, tw = h, w
    for _ in range(levels):
        if min(th, tw) < window_size:
            break
        usable += 1
        th, tw = th // 2, tw // 2
    weights = weights[:usable] / jnp.sum(weights[:usable])

    vals = []
    cur_x, cur_y = x, y
    c2 = 0.03**2
    kern = _gaussian_kernel(window_size, 1.5)
    for lvl in range(usable):
        if lvl == usable - 1:
            vals.append(jnp.clip(jnp.mean(ssim_map(cur_x, cur_y, window_size)), 1e-6))
        else:
            # contrast·structure term only for intermediate scales
            mx, my = _blur(cur_x, kern), _blur(cur_y, kern)
            vx = _blur(cur_x * cur_x, kern) - mx * mx
            vy = _blur(cur_y * cur_y, kern) - my * my
            cxy = _blur(cur_x * cur_y, kern) - mx * my
            cs = (2 * cxy + c2) / (vx + vy + c2)
            vals.append(jnp.clip(jnp.mean(cs), 1e-6))
            b, hh, ww, c = cur_x.shape
            cur_x = jax.image.resize(cur_x, (b, hh // 2, ww // 2, c), "linear", antialias=True)
            cur_y = jax.image.resize(cur_y, (b, hh // 2, ww // 2, c), "linear", antialias=True)
    vals = jnp.stack(vals)
    return jnp.prod(vals**weights)


def ms_ssim_loss(x, y) -> jnp.ndarray:
    return 1.0 - ms_ssim(x, y)
