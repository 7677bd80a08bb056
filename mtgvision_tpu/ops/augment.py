"""Photometric/geometric augmentation kernels — the Mutate family, jittable.

Rebuild of mtgvision/encoder_datasets.py:68-403 (class ``Mutate``: 20 static
augs driven by global numpy RNG + OpenCV) as pure ``(key, img) -> img``
functions of fixed shape so whole pipelines jit, vmap over batches, and run on
the VPU/MXU. Every function keeps the reference's default magnitudes; alpha
channels pass through photometric ops unchanged (the reference augments RGBA
foregrounds).

Images: (H, W, C) float32 [0,1], C ∈ {3, 4}. For batches, vmap. The
pipeline combinators live in mtgvision_tpu.utils.random.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax

from mtgvision_tpu.ops import image as I
from mtgvision_tpu.ops import warp as W


def _rgb_blend(img, noisy_rgb, ratio):
    """Blend only the RGB channels, keep alpha."""
    rgb = img[..., :3] * (1.0 - ratio) + noisy_rgb * ratio
    return jnp.concatenate([I.img_clip(rgb), img[..., 3:]], axis=-1)


# -- geometric ---------------------------------------------------------------


def flip(key, img, horr: bool = True, vert: bool = True):
    """Random h/v flips, p=0.5 each (encoder_datasets.py:73-80)."""
    kh, kv = jax.random.split(key)
    if horr:
        img = jnp.where(jax.random.bernoulli(kh), I.flip_horr(img), img)
    if vert:
        img = jnp.where(jax.random.bernoulli(kv), I.flip_vert(img), img)
    return img


def upsidedown(key, img):
    """180° rotation (encoder_datasets.py:90-92)."""
    return jnp.rot90(img, k=2, axes=(0, 1))


def rotate_bounded(key, img, deg_min: float = 0.0, deg_max: float = 360.0):
    """Random bounded rotation (encoder_datasets.py:82-88)."""
    deg = jax.random.uniform(key, (), minval=deg_min, maxval=deg_max)
    return W.rotate_bounded(img, deg)


def warp(key, img, warp_ratio: float = 0.3, warp_ratio_min: float = -0.25):
    """Random 4-corner perspective displacement (encoder_datasets.py:94-112).

    Each corner slides along its inward diagonal by an independent per-axis
    factor drawn from [min, min + |ratio-min|/2) — same envelope as the
    reference (negative = outward).
    """
    h, w = img.shape[0] - 1, img.shape[1] - 1
    lo = warp_ratio_min
    span = abs(warp_ratio - warp_ratio_min) * 0.5
    ran = lo + jax.random.uniform(key, (4, 2)) * span
    # corners TL,TR,BL,BR with inward diagonal signs
    src = jnp.asarray([[0, 0], [w, 0], [0, h], [w, h]], jnp.float32)
    signs = jnp.asarray([[1, 1], [-1, 1], [1, -1], [-1, -1]], jnp.float32)
    dst = src + ran * signs * jnp.asarray([w, h], jnp.float32)
    m = W.perspective_from_quads(src, dst)
    return W.warp_perspective(img, m, img.shape[:2])


def warp_inv(key, img, warp_ratio: float = 0.5, warp_ratio_min: float = 0.25):
    """Outward-only corner warp (encoder_datasets.py:114-116)."""
    return warp(key, img, warp_ratio=-warp_ratio, warp_ratio_min=-warp_ratio_min)


def affine_transform(key, img, angle: float = 5.0, translate=(10.0, 10.0),
                     scale: float = 0.1, shear: float = 0.3):
    """Random rot+trans+scale+shear about center (encoder_datasets.py:353-375)."""
    ka, kt, ks, ksh = jax.random.split(key, 4)
    h, w = img.shape[:2]
    ang = jnp.deg2rad(jax.random.uniform(ka, (), minval=-angle, maxval=angle))
    t = jax.random.uniform(kt, (2,), minval=-1.0, maxval=1.0) * jnp.asarray(translate)
    s_lo = min(1.0 + scale, 1.0 / (1.0 + scale))
    s = jax.random.uniform(ks, (), minval=s_lo, maxval=1.0 / s_lo)
    sh = jax.random.uniform(ksh, (), minval=-shear, maxval=shear)
    m = W.compose(
        W.shear_matrix_2d(sh, 0.0),
        W.translation_matrix_2d(w / 2.0, h / 2.0),
        W.rotation_matrix_2d(-ang),  # cv2 rotation is anticlockwise for +angle
        W.scale_matrix_2d(s),
        W.translation_matrix_2d(-w / 2.0, -h / 2.0),
    )
    m = W.compose(W.translation_matrix_2d(t[0], t[1]), m)
    return W.warp_perspective(img, m, img.shape[:2])


def perspective_transform(key, img, strength: float = 0.1):
    """Random perspective with corners jittered ±strength (encoder_datasets.py:377-403)."""
    h, w = img.shape[:2]
    src = jnp.asarray([[0, 0], [w, 0], [0, h], [w, h]], jnp.float32)
    jit = jax.random.uniform(key, (4, 2), minval=-strength, maxval=strength)
    dst = src + jit * jnp.asarray([w, h], jnp.float32)
    m = W.perspective_from_quads(src, dst)
    return W.warp_perspective(img, m, img.shape[:2])


# -- degradation -------------------------------------------------------------


def noise(key, img, amount: float = 0.5):
    """Random choice of speckle/gaussian/pepper/poisson blended with ratio
    U(0, amount) (encoder_datasets.py:118-134)."""
    kc, kn, kr = jax.random.split(key, 3)
    idx = jax.random.randint(kc, (), 0, 4)
    noisy = lax.switch(
        idx,
        [
            lambda k, im: I.noise_speckle(k, im, strength=0.3),
            lambda k, im: I.noise_gaussian(k, im, mean=0.0, var=0.05),
            lambda k, im: I.noise_salt_pepper(k, im, strength=0.1, svp=0.5),
            lambda k, im: I.noise_poisson(k, im, peak=0.8, amount=0.5),
        ],
        kn,
        img,
    )
    ratio = jax.random.uniform(kr) * amount
    return _rgb_blend(img, noisy[..., :3], ratio)


def blur(key, img, n_max: int = 3):
    """Gaussian blur with kernel size ∈ {1, 3, …} (encoder_datasets.py:136-140).

    Expressed as a fixed 3×3 depthwise conv whose kernel is selected between
    identity and gaussian — keeps the shape static for XLA.
    """
    n = jax.random.randint(key, (), 0, (n_max - 1) // 2 + 1)
    g1 = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    gauss = jnp.outer(g1, g1)
    ident = jnp.zeros((3, 3), jnp.float32).at[1, 1].set(1.0)
    kern = jnp.where(n > 0, gauss, ident)
    return _conv3x3(img, kern)


def _conv3x3(img, kern):
    c = img.shape[-1]
    x = img[None]
    k = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, (3, 3, 1, c), ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    return I.img_clip(out[0])


def sharpen(key, img):
    """5-point sharpen kernel (encoder_datasets.py:242-247)."""
    kern = jnp.asarray([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], jnp.float32)
    return _conv3x3(img, kern)


def downscale_upscale(key, img, n_min: int = 0, n_max: int = 2):
    """Resize down by 2^n then back up (encoder_datasets.py:142-163).

    Interp-method randomness of the reference is folded into the single
    bilinear path (visually equivalent at these scales); n is a lax.switch so
    shapes stay static.
    """
    h, w, c = img.shape
    n = jax.random.randint(key, (), n_min, n_max + 1)

    def at_scale(k):
        def f(im):
            if k == 0:
                return im
            small = jax.image.resize(im, (h // 2**k, w // 2**k, c), "linear")
            return jax.image.resize(small, (h, w, c), "linear")

        return f

    return I.img_clip(lax.switch(n, [at_scale(k) for k in range(n_min, n_max + 1)], img))


def gaussian_noise(key, img, mean: float = 0.0, sigma: float = 0.25):
    """Strong additive noise on ALL channels (encoder_datasets.py:222-226)."""
    return I.img_clip(img + mean + sigma * jax.random.normal(key, img.shape))


def salt_pepper_noise(key, img, salt_prob: float = 0.01, pepper_prob: float = 0.01):
    """Whole-pixel salt/pepper (all channels set, encoder_datasets.py:228-240)."""
    # reference draws strength·size element draws but sets whole pixels; an
    # i.i.d. per-pixel bernoulli with matched expected density
    ks, kp = jax.random.split(key)
    u = jax.random.uniform(ks, img.shape[:2])
    c = img.shape[-1]
    salt = (u < salt_prob * c)[..., None]
    pepper = (u > 1.0 - pepper_prob * c)[..., None]
    return jnp.where(salt, 1.0, jnp.where(pepper, 0.0, img))


# -- photometric -------------------------------------------------------------


def tint(key, img, amount: float = 0.15):
    """Independent per-channel gain 1 ± amount (encoder_datasets.py:165-170)."""
    r = 1.0 + amount * (2.0 * jax.random.uniform(key, (3,)) - 1.0)
    rgb = I.img_clip(img[..., :3] * r)
    return jnp.concatenate([rgb, img[..., 3:]], axis=-1)


def fade_white(key, img, amount: float = 0.33):
    """Blend toward white by U(0, amount) (encoder_datasets.py:173-177)."""
    ratio = jax.random.uniform(key) * amount
    return _rgb_blend(img, jnp.ones_like(img[..., :3]), ratio)


def fade_black(key, img, amount: float = 0.5):
    """Blend toward black (encoder_datasets.py:179-185)."""
    ratio = jax.random.uniform(key) * amount
    return _rgb_blend(img, jnp.zeros_like(img[..., :3]), ratio)


def brightness_contrast(key, img, brightness: float = 0.2, contrast: float = 0.2):
    """x·α + β on all channels (encoder_datasets.py:187-193)."""
    ka, kb = jax.random.split(key)
    alpha = 1.0 + jax.random.uniform(ka, (), minval=-contrast, maxval=contrast)
    beta = jax.random.uniform(kb, (), minval=-brightness, maxval=brightness)
    return I.img_clip(img * alpha + beta)


def rgb_jitter_add(key, img, brightness: float = 0.3):
    """Per-channel additive jitter (encoder_datasets.py:195-200; NB the
    reference body multiplies due to a `*=` typo — we implement the documented
    additive behavior; neither is used in the stock pipelines)."""
    rgb = jax.random.uniform(key, (3,), minval=-brightness, maxval=brightness)
    out = I.img_clip(img[..., :3] + rgb)
    return jnp.concatenate([out, img[..., 3:]], axis=-1)


def rgb_jitter_mul(key, img, brightness: float = 0.3):
    """Per-channel gain jitter (encoder_datasets.py:202-208)."""
    rgb = jax.random.uniform(key, (3,), minval=1 - brightness, maxval=1 + brightness)
    out = I.img_clip(img[..., :3] * rgb)
    return jnp.concatenate([out, img[..., 3:]], axis=-1)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    mx = jnp.max(rgb, -1)
    mn = jnp.min(rgb, -1)
    d = mx - mn + 1e-12
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    h = jnp.where(
        mx == r, ((g - b) / d) % 6.0, jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)
    ) / 6.0
    s = jnp.where(mx > 0, d / (mx + 1e-12), 0.0)
    return jnp.stack([h % 1.0, s, mx], -1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], -1)


def hue_saturation_value(
    key, img, hue_shift: float = 30 / 360, sat_shift: float = 0.4, val_shift: float = 0.0
):
    """Random HSV shift — albumentations HueSaturationValue equivalent
    (od_datasets.py:464-469 hue ±30°, sat ±40/255, val optional)."""
    kh, ks, kv = jax.random.split(key, 3)
    hsv = rgb_to_hsv(img[..., :3])
    h = (hsv[..., 0] + jax.random.uniform(kh, (), minval=-hue_shift, maxval=hue_shift)) % 1.0
    s = jnp.clip(hsv[..., 1] + jax.random.uniform(ks, (), minval=-sat_shift, maxval=sat_shift), 0, 1)
    v = jnp.clip(hsv[..., 2] + jax.random.uniform(kv, (), minval=-val_shift, maxval=val_shift), 0, 1)
    rgb = hsv_to_rgb(jnp.stack([h, s, v], -1))
    return jnp.concatenate([I.img_clip(rgb), img[..., 3:]], axis=-1)


def motion_blur(key, img, max_k: int = 7):
    """Directional blur along a random axis — MotionBlur-style degradation
    (od_datasets.py:452-454), fixed 7-tap kernel with random orientation."""
    kd, ka = jax.random.split(key)
    ang = jax.random.uniform(ka, (), maxval=jnp.pi)
    # build a 7×7 line kernel along angle
    yy = jnp.arange(max_k, dtype=jnp.float32) - max_k // 2
    xx = jnp.arange(max_k, dtype=jnp.float32) - max_k // 2
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    # distance from the line through origin at angle ang
    dist = jnp.abs(-jnp.sin(ang) * gx + jnp.cos(ang) * gy)
    kern = (dist < 0.7).astype(jnp.float32)
    kern = kern / jnp.sum(kern)
    c = img.shape[-1]
    x = img[None]
    k = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, (max_k, max_k, 1, c), ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    return I.img_clip(out[0])


# -- occlusion ---------------------------------------------------------------


def cutout(key, img, num_holes: int = 8, max_h_size: int = 8, max_w_size: int = 8):
    """Zero out ``num_holes`` small rects (encoder_datasets.py:259-271)."""
    h, w = img.shape[:2]
    kys, kxs = jax.random.split(key)
    cy = jax.random.randint(kys, (num_holes,), 0, h)
    cx = jax.random.randint(kxs, (num_holes,), 0, w)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    hole = jnp.zeros((h, w), bool)
    for i in range(num_holes):
        in_y = (yy >= cy[i] - max_h_size // 2) & (yy < cy[i] + max_h_size // 2)
        in_x = (xx >= cx[i] - max_w_size // 2) & (xx < cx[i] + max_w_size // 2)
        hole = hole | (in_y & in_x)
    return jnp.where(hole[..., None], 0.0, img)


def random_erasing(
    key,
    img,
    scale_min_max=(0.2, 0.4),
    aspect_min_max=(1.0, 3.0),
    inside: bool = False,
):
    """Erase one random block with a random fill mode
    (encoder_datasets.py:273-351): fill ∈ {random field, uniform color,
    zeros, ones, block mean}, block center may sit partly outside."""
    ks, ka, kf, kcy, kcx, km, kcol = jax.random.split(key, 7)
    h, w, c = img.shape
    scale = jax.random.uniform(ks, (), minval=scale_min_max[0], maxval=scale_min_max[1])
    area = scale * h * w
    aspect = jax.random.uniform(ka, (), minval=aspect_min_max[0], maxval=aspect_min_max[1])
    aspect = jnp.where(jax.random.bernoulli(kf), 1.0 / aspect, aspect)
    bw = jnp.sqrt(area / aspect)
    bh = jnp.sqrt(area * aspect)
    if inside:
        cx = jax.random.uniform(kcx, (), minval=bw / 2, maxval=jnp.maximum(w - bw / 2, bw / 2 + 1e-3))
        cy = jax.random.uniform(kcy, (), minval=bh / 2, maxval=jnp.maximum(h - bh / 2, bh / 2 + 1e-3))
    else:
        cx = jax.random.uniform(kcx, (), minval=-bw / 2, maxval=w + bw / 2)
        cy = jax.random.uniform(kcy, (), minval=-bh / 2, maxval=h + bh / 2)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    mask = (
        (yy >= cy - bh / 2) & (yy < cy + bh / 2) & (xx >= cx - bw / 2) & (xx < cx + bw / 2)
    )[..., None]
    n_in = jnp.maximum(jnp.sum(mask), 1)
    block_mean = jnp.sum(img * mask, axis=(0, 1)) / n_in
    fills = [
        jax.random.uniform(kcol, img.shape),                       # random field
        jnp.broadcast_to(jax.random.uniform(kcol, (c,)), img.shape),  # uniform color
        jnp.zeros_like(img),
        jnp.ones_like(img),
        jnp.broadcast_to(block_mean, img.shape),
    ]
    mode = jax.random.randint(km, (), 0, len(fills))
    fill = lax.switch(mode, [lambda f=f: f for f in fills])
    return jnp.where(mask, fill, img)


__all__ = [s for s in dir() if not s.startswith("_")]


# -- fused single-pass photometric pipeline ----------------------------------


def _sep_gauss_kernel(sigma, taps: int = 9):
    """(taps,) normalized gaussian; sigma→0 degenerates to a delta (identity)."""
    r = taps // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(x / jnp.maximum(sigma, 1e-3)))
    return k / jnp.sum(k)


def _sep_blur(img, sigma_x, sigma_y, taps: int = 9):
    """Separable anisotropic gaussian blur as two depthwise 1-D convs —
    O(taps) per pixel instead of O(taps²), and MXU/VPU-friendly. Covers the
    blur/motion-blur family: isotropic σx=σy, strongly anisotropic ≈ axis-
    aligned motion blur."""
    c = img.shape[-1]
    kx = _sep_gauss_kernel(sigma_x, taps).reshape(1, taps, 1, 1)
    ky = _sep_gauss_kernel(sigma_y, taps).reshape(taps, 1, 1, 1)
    x = img[None]  # NHWC
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    for k_ in (kx, ky):
        kern = jnp.broadcast_to(k_, k_.shape[:2] + (1, c))
        x = lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
        )
    return x[0]


def _hue_rotate_mat(theta):
    """3×3 linear hue rotation about the RGB gray axis (Rodrigues form) —
    one per-pixel matmul instead of an RGB↔HSV round trip."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    a = 1.0 / 3.0
    b = jnp.sqrt(1.0 / 3.0)
    return jnp.asarray(
        [
            [c + (1 - c) * a, a * (1 - c) - b * s, a * (1 - c) + b * s],
            [a * (1 - c) + b * s, c + (1 - c) * a, a * (1 - c) - b * s],
            [a * (1 - c) - b * s, a * (1 - c) + b * s, c + (1 - c) * a],
        ],
        jnp.float32,
    )


def fused_photometric(
    key,
    img,
    *,
    p_brightness: float = 0.5,
    brightness: float = 0.4,
    contrast: float = 0.5,
    p_hsv: float = 0.5,
    hue_deg: float = 20.0,
    sat: float = 0.3,
    val: float = 0.2,
    p_noise: float = 0.5,
    noise_sigma: float = 0.08,
    p_sp: float = 0.15,
    sp_amount: float = 0.02,
    p_blur: float = 0.5,
    blur_sigma: float = 2.0,
    p_erase: float = 0.0,
    erase_scale: tuple = (0.02, 0.2),
    p_tint: float = 0.0,
    tint_ratio: float = 0.3,
    p_fade: float = 0.0,
    fade_ratio: float = 0.33,
    p_sharpen: float = 0.0,
    sharpen_amount: float = 1.0,
):
    """Single-pass photometric degradation — the TPU-native replacement for
    the albumentations-style choice/shuffle pipelines (od_datasets.py:420-512).

    Branchless by construction: every effect is applied exactly once with a
    RANDOM STRENGTH whose distribution has an atom at 0 (prob 1-p = identity).
    A switch/cond pipeline looks cheaper on paper but under vmap every branch
    executes for the whole batch anyway (select semantics) — measured 2.4 s
    per 16×640² batch for the combinator version vs one pass of each effect
    here. Distribution-wise this matches the reference family (each frame
    gets a random subset of {brightness/contrast, HSV, noise, salt&pepper,
    blur} at random magnitudes); only the exact mixture weights differ.

    RGB-only channels are augmented; alpha (if present) passes through.
    """
    rgb = img[..., :3]
    # one key per random draw — NEVER share a key between a gate and a
    # magnitude (bernoulli(key, p) is uniform(key) < p, so sharing couples
    # the two draws and truncates the magnitude distribution)
    ks = jax.random.split(key, 26)
    u = lambda i, lo, hi: jax.random.uniform(ks[i], (), minval=lo, maxval=hi)
    gate = lambda i, p: jax.random.bernoulli(ks[i], p).astype(jnp.float32)

    # brightness/contrast (encoder_datasets.py:187-193 semantics)
    g_bc = gate(0, p_brightness)
    b = u(1, -brightness, brightness) * g_bc
    c = 1.0 + u(2, -contrast, contrast) * g_bc
    rgb = (rgb - 0.5) * c + 0.5 + b

    # hue/sat/value via one 3×3 pixel matmul + gray lerp
    g_hsv = gate(3, p_hsv)
    theta = u(4, -1.0, 1.0) * jnp.deg2rad(hue_deg) * g_hsv
    m = _hue_rotate_mat(theta)
    rgb = jnp.einsum("...c,dc->...d", rgb, m)
    gray = jnp.mean(rgb, axis=-1, keepdims=True)
    s_f = 1.0 + u(5, -sat, sat) * g_hsv
    rgb = gray + (rgb - gray) * s_f
    rgb = rgb * (1.0 + u(6, -val, val) * g_hsv)

    # tint toward a random color (encoder_datasets.py:165-171 semantics)
    if p_tint > 0.0:
        t = u(7, 0.0, tint_ratio) * gate(8, p_tint)
        color = jax.random.uniform(ks[9], (3,))
        rgb = rgb * (1.0 - t) + color * t

    # fade toward white or black (encoder_datasets.py:173-185)
    if p_fade > 0.0:
        f = u(10, 0.0, fade_ratio) * gate(11, p_fade)
        target = jax.random.bernoulli(ks[12], 0.5).astype(jnp.float32)  # 0 or 1
        rgb = rgb * (1.0 - f) + target * f

    # gaussian noise — ONE field, scaled (off w.p. 1-p)
    sigma = u(13, 0.3, 1.0) * noise_sigma * gate(14, p_noise)
    rgb = rgb + jax.random.normal(ks[15], rgb.shape) * sigma

    # salt & pepper from one uniform field
    g_sp = gate(16, p_sp)
    uf = jax.random.uniform(ks[17], rgb.shape[:-1] + (1,))
    amt = sp_amount * g_sp
    rgb = jnp.where(uf < amt * 0.5, 0.0, jnp.where(uf > 1.0 - amt * 0.5, 1.0, rgb))

    # blur: separable anisotropic gaussian (σ→0 = identity); anisotropy
    # stands in for motion blur
    g_bl = gate(18, p_blur)
    sx = u(19, 0.05, 1.0) * blur_sigma * g_bl
    sy = u(20, 0.05, 1.0) * blur_sigma * g_bl
    aniso = jax.random.bernoulli(ks[21], 0.5)
    sx = jnp.where(aniso, sx * 2.0, sx)
    sy = jnp.where(aniso, sy * 0.1, sy)
    rgb = _sep_blur(rgb, sx, sy)

    # sharpen: gated 3×3 unsharp kernel (encoder_datasets.py:242-257)
    if p_sharpen > 0.0:
        amt = u(22, 0.3, 1.0) * sharpen_amount * gate(23, p_sharpen)
        blurred = _sep_blur(rgb, 1.0, 1.0, taps=5)
        rgb = rgb + (rgb - blurred) * amt

    rgb = jnp.clip(rgb, 0.0, 1.0)

    if p_erase > 0.0:
        do = jax.random.bernoulli(ks[24], p_erase)
        er = random_erasing(ks[25], jnp.concatenate([rgb, img[..., 3:]], -1),
                            scale_min_max=erase_scale)
        out = jnp.where(do, er[..., : rgb.shape[-1]], rgb)
        rgb = out

    if img.shape[-1] > 3:
        return jnp.concatenate([rgb, img[..., 3:]], axis=-1)
    return rgb
