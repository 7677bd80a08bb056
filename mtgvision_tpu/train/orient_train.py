"""Orientation-head training: is this dewarped crop 180°-rotated?

TPU-first replacement for mask-notch orientation (see models/orient_head.py
for the motivation and measurements). Training data is the same device-side
synthetic stream the encoder trains on (data/encoder_gen.make_virtual —
card fills the canvas with pose/photometric jitter, exactly the serving-time
dewarped-crop distribution), labelled by an explicit random 180° rotation.

Whole loop is device-side: one PRNG key in per fused ``scan_steps`` chunk
(compose + augment + rotate + fwd/bwd + update), mirroring
train/encoder_train.make_train_scan.

    python -m mtgvision_tpu.train.orient_train --max-steps 6000 \
        --ckpt-dir artifacts_r2/orient_head
"""

from __future__ import annotations

import dataclasses
import pathlib
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mtgvision_tpu.models.orient_head import OrientHead


@dataclasses.dataclass
class OrientConfig:
    seed: int = 42
    batch_size: int = 128
    max_steps: int = 6000
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    gradient_clip_val: float = 1.0
    n_cards: int = 4096
    pool_size: int = 4096
    bg_pool_size: int = 256
    scan_steps: int = 10
    ckpt_dir: str = "checkpoints_orient"
    checkpoint: Optional[str] = None
    ckpt_every: int = 1000
    log_every: int = 100
    size_hw: tuple[int, int] = (192, 128)


class OrientTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def make_orient_batch(key, card_pool_u8, bg_pool_u8, batch_size, size_hw):
    """Device-side batch: sample cards+bgs → make_virtual → random 180° flip.

    Returns (x (B,H,W,3) float, labels (B,) float {0,1}) — 1 = rotated."""
    from mtgvision_tpu.data.encoder_gen import make_virtual
    from mtgvision_tpu.ops.gather import take_rows
    from mtgvision_tpu.ops.image import img_float32

    kc, kb, kg, kf = jax.random.split(key, 4)
    p, q = card_pool_u8.shape[0], bg_pool_u8.shape[0]
    ci = jax.random.randint(kc, (batch_size,), 0, p)
    bi = jax.random.randint(kb, (batch_size,), 0, q)
    cards = img_float32(take_rows(card_pool_u8, ci))
    bgs = img_float32(take_rows(bg_pool_u8, bi))
    x = jax.vmap(lambda k, c, b: make_virtual(k, c, b, size_hw))(
        jax.random.split(kg, batch_size), cards, bgs
    )
    labels = jax.random.bernoulli(kf, 0.5, (batch_size,))
    x = jnp.where(labels[:, None, None, None], jnp.rot90(x, 2, axes=(1, 2)), x)
    return x, labels.astype(jnp.float32)


def loss_fn(params, x, labels, apply_fn):
    logits = apply_fn({"params": params}, x)
    loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
    acc = jnp.mean((logits > 0) == (labels > 0.5))
    return loss, {"loss": loss, "acc": acc}


def train_step(state: OrientTrainState, x, labels):
    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, x, labels, state.apply_fn
    )
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params, opt_state=opt_state), logs


def create_state(config: OrientConfig, rng) -> OrientTrainState:
    model = OrientHead()
    h, w = config.size_hw
    params = jax.jit(model.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))["params"]
    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip_val),
        optax.adamw(config.learning_rate, weight_decay=config.weight_decay),
    )
    return OrientTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def train(config: OrientConfig, catalog=None, backgrounds=None) -> OrientTrainState:
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
    logger = MetricsLogger(pathlib.Path(config.ckpt_dir) / "logs", "orient_head")

    if config.checkpoint:
        mgr = CheckpointManager(config.checkpoint)
        if mgr.latest_step() is not None:
            state = mgr.restore(target=state)

    # pools ride as jit ARGUMENTS (HLO-literal closures break remote compiles)
    def run(state, key, card_images, bg_images):
        def body(state, k):
            x, labels = make_orient_batch(
                k, card_images, bg_images, config.batch_size, config.size_hw
            )
            return train_step(state, x, labels)

        keys = jax.random.split(key, config.scan_steps)
        state, logs = jax.lax.scan(body, state, keys, unroll=True)
        return state, jax.tree.map(lambda v: v.mean(0), logs)

    jitted = jax.jit(run, donate_argnums=0)
    key = jax.random.fold_in(jax.random.PRNGKey(config.seed), 3)
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

    config = parse_config(OrientConfig, argv)
    train(config)


if __name__ == "__main__":
    _cli()
