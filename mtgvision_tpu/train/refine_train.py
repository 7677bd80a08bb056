"""Refinement-head training: where is the card quad in this crop, and is it
180°-rotated?

Supervises models/refine_head.RefineHead on the same device-side synthetic
stream the encoder trains on, but with a CONTROLLED composite: instead of
make_virtual's free random pose (data/encoder_gen.py:157-178), each card is
warped so its quad lands at ``nominal + noise`` in crop space — simulating a
dewarp driven by imperfect detector corners (the serving-time input
distribution: proto-grid mask corners are ~10 px off in crop units). The
label IS the noise. Flip labels come from an explicit random 180° rotation,
as in train/orient_train.py.

Noise model: per-corner iid N(0,σ) with σ~U(0.5,9) px per sample (detector
error varies wildly with card size/occlusion), plus a shared shift N(0,4)
and the card flipped p=0.5. Everything — sample, composite, photometric,
fwd/bwd, update — is one fused scan chunk; one PRNG key in per chunk.

    python -m mtgvision_tpu.train.refine_train --max-steps 8000 \
        --ckpt-dir artifacts_r2/refine_head
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mtgvision_tpu.models.refine_head import RefineHead, nominal_quad


@dataclasses.dataclass
class RefineConfig:
    seed: int = 42
    batch_size: int = 128
    max_steps: int = 8000
    learning_rate: float = 3e-4  # 1e-3 blows the tanh-bounded regression up
    weight_decay: float = 1e-4
    gradient_clip_val: float = 1.0
    n_cards: int = 4096
    pool_size: int = 4096
    bg_pool_size: int = 256
    scan_steps: int = 10
    ckpt_dir: str = "checkpoints_refine"
    checkpoint: Optional[str] = None
    ckpt_every: int = 1000
    log_every: int = 100
    size_hw: tuple[int, int] = (192, 128)
    # noise model (crop px)
    sigma_min: float = 0.5
    sigma_max: float = 9.0
    shift_sigma: float = 4.0
    # heavy-tail mixture: with p_heavy the quad error is drawn far outside
    # the proto-grid regime (occlusion-corrupted masks measured 20-100 px
    # off in e2e_headline_occhead_details.jsonl) so iterative refinement
    # (pipeline refine_iters + redewarp) can WALK large errors back, 24 px
    # per pass. Labels are clipped to ±label_clip (< RefineHead.max_offset)
    # so the tanh-bounded regression never trains toward saturation.
    p_heavy: float = 0.25
    heavy_sigma_max: float = 18.0
    heavy_shift_sigma: float = 14.0
    label_clip: float = 21.0
    # probability the crop contains a partially-covering neighbour card
    p_occlude: float = 0.3
    # probability the crop simulates a FRAME-EDGE-CLIPPED card (the
    # reference's ACTIVE training regime places cards up to half off-frame,
    # od_datasets.py:861-873). The serving dewarp samples past the frame
    # border with CLAMPED bilinear lookups (ops/warp.bilinear_sample), so the
    # crop shows the boundary line smeared outward from where the frame edge
    # cuts the card. Reproducing that appearance trains (a) the flip logit to
    # stay calibrated on partial cards — measured r3: it collapsed to 0.37
    # e2e flip on the refparity protocol while full-card flip was 0.03 — and
    # (b) amodal corner completion: the quad label is unchanged, so the head
    # learns to extrapolate the card's geometry past the clip line from the
    # visible edges + fixed aspect.
    p_edgeclip: float = 0.0
    # probability the crop simulates a LOW-SOURCE-RESOLUTION card. Serving
    # dewarps of small frame quads are blurry bilinear upsamples (a 700 px²
    # card is ~26 px wide in frame vs the 128 px crop, ~5x magnification);
    # a head trained only on sharp composites fails exactly there
    # (e2e_refdist_iter3_details: sub-4k px² median relative corner error
    # 0.25 of card width vs 0.01 for >10k px²). Down-up resampling at a
    # random integer factor reproduces that appearance; labels unchanged.
    p_lowres: float = 0.0
    # loss
    flip_weight: float = 1.0
    huber_delta: float = 2.0


class RefineTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def make_refine_batch(key, card_pool_u8, bg_pool_u8, batch_size, size_hw,
                      sigma_min=0.5, sigma_max=9.0, shift_sigma=4.0,
                      p_occlude=0.0, p_heavy=0.0, heavy_sigma_max=18.0,
                      heavy_shift_sigma=14.0, label_clip=None, p_lowres=0.0,
                      p_edgeclip=0.0):
    """Device-side batch: card warped to a KNOWN perturbed quad over a bg.

    Returns (x (B,H,W,3) float, offsets (B,4,2) crop-px, flip (B,) float).

    ``p_heavy``: fraction of samples whose error is drawn from a wide
    distribution (σ up to ``heavy_sigma_max``, shift σ ``heavy_shift_sigma``)
    — the occlusion-corrupted-mask regime. When the true offset exceeds
    ``label_clip`` the label is clipped: the best single-pass move for the
    tanh-bounded head is a full step in the right direction, and the
    pipeline's iterative redewarp (refine_iters) takes the next step from
    a closer crop.

    ``p_occlude``: probability another card partially covers the target
    (shifted to leave 55-95% visible, like data/encoder_gen.make_virtual) —
    serving crops contain neighbouring-card pixels whenever scene cards
    overlap, and the head must keep localizing the TARGET's quad and
    orientation under them. Corner/flip labels are unchanged (the card is
    where it is, just partially hidden)."""
    from mtgvision_tpu.data.encoder_gen import (
        _FG_PHOTO, _VRTL_PHOTO, make_bg, make_masked,
    )
    from mtgvision_tpu.ops.augment import fused_photometric
    from mtgvision_tpu.ops.gather import take_rows
    from mtgvision_tpu.ops.image import img_float32, rgba_over_rgb
    from mtgvision_tpu.ops.warp import perspective_from_quads, warp_perspective

    kc, kb, kf, ks, kn, kt, kg, ko, kh, kht, kl1, kl2 = jax.random.split(key, 12)
    p, q = card_pool_u8.shape[0], bg_pool_u8.shape[0]
    ci = jax.random.randint(kc, (batch_size,), 0, p)
    bi = jax.random.randint(kb, (batch_size,), 0, q)
    cards = img_float32(take_rows(card_pool_u8, ci))
    bgs = img_float32(take_rows(bg_pool_u8, bi))
    occs = None
    if p_occlude > 0.0:
        oi = jax.random.randint(ko, (batch_size,), 0, p)
        occs = img_float32(take_rows(card_pool_u8, oi))

    flip = jax.random.bernoulli(kf, 0.5, (batch_size,))
    cards = jnp.where(
        flip[:, None, None, None], jnp.rot90(cards, 2, axes=(1, 2)), cards
    )

    sigma = jax.random.uniform(
        ks, (batch_size, 1, 1), minval=sigma_min, maxval=sigma_max
    )
    shift_s = jnp.full((batch_size, 1, 1), shift_sigma, jnp.float32)
    if p_heavy > 0.0:
        heavy = jax.random.bernoulli(kh, p_heavy, (batch_size,))[:, None, None]
        sigma_hv = jax.random.uniform(
            kht, (batch_size, 1, 1), minval=sigma_min, maxval=heavy_sigma_max
        )
        sigma = jnp.where(heavy, sigma_hv, sigma)
        shift_s = jnp.where(heavy, heavy_shift_sigma, shift_s)
    offsets = (
        jax.random.normal(kn, (batch_size, 4, 2)) * sigma
        + jax.random.normal(kt, (batch_size, 1, 2)) * shift_s
    )
    nom = nominal_quad(size_hw)
    quads = nom[None] + offsets
    labels = offsets
    if label_clip is not None:
        labels = jnp.clip(offsets, -label_clip, label_clip)

    hc, wc = cards.shape[1:3]
    src = jnp.asarray(
        [[0.0, 0.0], [wc - 1.0, 0.0], [wc - 1.0, hc - 1.0], [0.0, hc - 1.0]],
        jnp.float32,
    )
    oh, ow = size_hw

    def one(k, card, bg, quad, occ):
        kfp, kbg, kv, kang, ku, kth, kop, kgt = jax.random.split(k, 8)
        fg = make_masked(card)  # RGBA, rounded card corners
        m = perspective_from_quads(src, quad)
        fgw = warp_perspective(fg, m, size_hw)
        fgw = fused_photometric(kfp, fgw, **_FG_PHOTO)
        canvas = rgba_over_rgb(fgw, make_bg(kbg, bg, size_hw))
        if occ is not None:
            # occluder: another card, target-sized pose, shifted off-centre
            ang = jax.random.uniform(kang, (), maxval=2.0 * jnp.pi)
            u = jax.random.uniform(ku, (), minval=0.55, maxval=0.95)
            theta = jax.random.uniform(kth, (), maxval=2.0 * jnp.pi)
            c, s = jnp.cos(theta), jnp.sin(theta)
            ctr = jnp.asarray([ow / 2.0, oh / 2.0])
            rot = jnp.asarray([[c, s], [-s, c]])
            oq = (nom - ctr) @ rot.T + ctr
            oq = oq + jnp.asarray([jnp.cos(ang) * ow, jnp.sin(ang) * oh]) * u
            mo = perspective_from_quads(src, oq)
            ow_img = warp_perspective(make_masked(occ), mo, size_hw)
            ow_img = fused_photometric(kop, ow_img, **_FG_PHOTO)
            a = ow_img[..., 3:4] * jax.random.bernoulli(kgt, p_occlude)
            canvas = canvas * (1.0 - a) + ow_img[..., :3] * a
        return fused_photometric(kv, canvas, **_VRTL_PHOTO)

    keys = jax.random.split(kg, batch_size)
    if occs is not None:
        x = jax.vmap(one)(keys, cards, bgs, quads, occs)
    else:
        x = jax.vmap(lambda k, c, b, q: one(k, c, b, q, None))(
            keys, cards, bgs, quads
        )

    if p_edgeclip > 0.0:
        # frame-edge clip: the frame border maps to a straight line in crop
        # space (homographies preserve lines; approximated axis-aligned
        # here); past it the serving dewarp's clamped sampling replicates the
        # boundary pixels outward. Implemented as two one-hot selection
        # matmuls (row-replicate · img · col-replicate) — a per-sample
        # dynamic gather would hit the TPU gather pathology, the (H,H)/(W,W)
        # one-hots are MXU-trivial and fuse under vmap. Labels are UNCHANGED
        # (the card is where it is; the head learns amodal completion).
        kside, kfrac, kgate = jax.random.split(kl1, 3)
        side = jax.random.randint(kside, (batch_size,), 0, 4)
        frac = jax.random.uniform(kfrac, (batch_size,), minval=0.10, maxval=0.55)
        gate = jax.random.bernoulli(kgate, p_edgeclip, (batch_size,))
        ar_w = jnp.arange(ow, dtype=jnp.float32)
        ar_h = jnp.arange(oh, dtype=jnp.float32)

        def smear(img, sd, fr, g):
            cx, cy = fr * ow, fr * oh
            xlo = jnp.where(sd == 0, cx, 0.0)
            xhi = jnp.where(sd == 1, ow - 1 - cx, ow - 1.0)
            ylo = jnp.where(sd == 2, cy, 0.0)
            yhi = jnp.where(sd == 3, oh - 1 - cy, oh - 1.0)
            xi = jnp.round(jnp.clip(ar_w, xlo, xhi))
            yi = jnp.round(jnp.clip(ar_h, ylo, yhi))
            py = (yi[:, None] == ar_h[None, :]).astype(img.dtype)  # (oh,oh)
            px = (xi[:, None] == ar_w[None, :]).astype(img.dtype)  # (ow,ow)
            sm = jnp.einsum("ij,jwc->iwc", py, img)
            sm = jnp.einsum("hwc,xw->hxc", sm, px)
            return jnp.where(g, sm, img)

        x = jax.vmap(smear)(x, side, frac, gate)

    if p_lowres > 0.0:
        # whole-crop down-up resample: the serving crop (card + bg + any
        # occluder) all come from the same low-res frame window, so the
        # degradation applies after compositing and photometrics. STATIC
        # batch slices per factor — samples are iid, so fixed slots are a
        # free randomization; a per-sample gather over an (F+1,B,H,W,3)
        # stack measured ~5x slower per train step on CPU. kl1/kl2 stay
        # reserved to keep the key-split layout stable.
        del kl1, kl2
        # factor census matched to the e2e detection-size distribution
        # (e2e_refdist details: log-uniform card areas → crop upsampling
        # roughly log-uniform over 2-8×, with the sub-4k px² failure band at
        # ~5×+); 3 and 5 fill the gaps the r2 mixture (2,4,6,8) left
        factors = (2, 3, 4, 5, 6, 8)
        n_low = int(round(batch_size * p_lowres))
        if n_low:
            # distribute the lowres budget across factors without flooring
            # to zero (B=16, p=0.2 must still degrade ~3 samples, not 0)
            base, rem = divmod(n_low, len(factors))
            counts = [base + (1 if i < rem else 0) for i in range(len(factors))]
            s = batch_size - n_low
            parts = [x[:s]]
            for f, c in zip(factors, counts):
                if not c:
                    continue
                seg = x[s:s + c]
                small = jax.image.resize(
                    seg, (c, oh // f, ow // f, 3), "bilinear"
                )
                parts.append(
                    jax.image.resize(small, (c, oh, ow, 3), "bilinear")
                )
                s += c
            x = jnp.concatenate(parts)
    return x, labels, flip.astype(jnp.float32)


def loss_fn(params, x, offsets, flip, apply_fn, flip_weight=1.0, huber_delta=2.0):
    pred_off, flip_logit = apply_fn({"params": params}, x)
    l_off = optax.huber_loss(pred_off, offsets, delta=huber_delta).mean()
    l_flip = optax.sigmoid_binary_cross_entropy(flip_logit, flip).mean()
    loss = l_off + flip_weight * l_flip
    err = jnp.linalg.norm(pred_off - offsets, axis=-1).mean()  # px/corner
    acc = jnp.mean((flip_logit > 0) == (flip > 0.5))
    return loss, {
        "loss": loss, "loss_off": l_off, "loss_flip": l_flip,
        "corner_err_px": err, "flip_acc": acc,
    }


def create_state(config: RefineConfig, rng) -> RefineTrainState:
    model = RefineHead()
    h, w = config.size_hw
    params = jax.jit(model.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))["params"]
    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip_val),
        optax.adamw(config.learning_rate, weight_decay=config.weight_decay),
    )
    return RefineTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def train_step(state: RefineTrainState, x, offsets, flip, config: RefineConfig):
    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, x, offsets, flip, state.apply_fn,
        config.flip_weight, config.huber_delta,
    )
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params, opt_state=opt_state), logs


def train(config: RefineConfig, catalog=None, backgrounds=None) -> RefineTrainState:
    import numpy as _np

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.encoder_gen import DeviceBgPool, DeviceCardPool
    from mtgvision_tpu.train.checkpoint import CheckpointManager
    from mtgvision_tpu.train.logging_utils import MetricsLogger

    if catalog is None:
        catalog = ProceduralCatalog(n_cards=config.n_cards)
    if backgrounds is None:
        backgrounds = ProceduralBackgrounds()

    rng_np = _np.random.default_rng(config.seed)
    pool = DeviceCardPool(catalog, config.pool_size, rng_np)
    bgp = DeviceBgPool(backgrounds, config.bg_pool_size, rng_np)

    state = create_state(config, jax.random.PRNGKey(config.seed))
    ckpt = CheckpointManager(config.ckpt_dir, keep_top_k=2)
    logger = MetricsLogger(pathlib.Path(config.ckpt_dir) / "logs", "refine_head")

    if config.checkpoint:
        mgr = CheckpointManager(config.checkpoint)
        if mgr.latest_step() is not None:
            state = mgr.restore(target=state)

    # pools ride as jit ARGUMENTS (HLO-literal closures break remote compiles)
    def run(state, key, card_images, bg_images):
        def body(state, k):
            x, offsets, flip = make_refine_batch(
                k, card_images, bg_images, config.batch_size, config.size_hw,
                config.sigma_min, config.sigma_max, config.shift_sigma,
                config.p_occlude, config.p_heavy, config.heavy_sigma_max,
                config.heavy_shift_sigma, config.label_clip, config.p_lowres,
                config.p_edgeclip,
            )
            return train_step(state, x, offsets, flip, config)

        keys = jax.random.split(key, config.scan_steps)
        state, logs = jax.lax.scan(body, state, keys, unroll=True)
        return state, jax.tree.map(lambda v: v.mean(0), logs)

    jitted = jax.jit(run, donate_argnums=0)
    key = jax.random.fold_in(jax.random.PRNGKey(config.seed), 4)
    i = int(jax.device_get(state.step))
    while i < config.max_steps:
        state, logs = jitted(state, jax.random.fold_in(key, i), pool.images, bgp.images)
        prev, i = i, i + config.scan_steps
        if i // config.log_every > prev // config.log_every:
            logger.log(i, jax.device_get(logs))
        if i // config.ckpt_every > prev // config.ckpt_every or i >= config.max_steps:
            ckpt.save(
                i, state, config=dataclasses.asdict(config),
                score=float(jax.device_get(logs["loss"])),
            )
    logger.close()
    return state


def _cli(argv=None):
    from mtgvision_tpu.train.config_cli import parse_config

    config = parse_config(RefineConfig, argv)
    train(config)


if __name__ == "__main__":
    _cli()
