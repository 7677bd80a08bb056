"""Encoder training: jitted train step + data-parallel pjit mesh.

Rebuild of the reference Lightning module (mtgvision/encoder_train.py:257-783)
as a functional JAX trainer:

- ``EncoderConfig``   — the reference's pydantic Config (:846-889) as a
  dataclass with the same field names/defaults; auto-CLI in train/config.py.
- ``create_state``    — model + optax chain (clip 0.5 → adam/radam/sgd,
  :449-496 semantics incl. eps=1e-4 for low-precision stability :455).
- ``train_step``      — the :404-447 logic: optional recon loss on
  clamp(y_recon, -0.25, 1.25), contrastive on cat(z, z2) with card-id labels,
  optional set-contrastive on set labels; all under one jit.
- data parallelism: batch sharded over a 1-D mesh, params replicated, XLA
  all-reduces grads over ICI (replaces the reference's single-device trainer,
  SURVEY.md §2.5).

Model registry mirrors encoder_train.py:52-67 (12 AE variants, Z_SIZE=768).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtgvision_tpu.models.convnextv2ae import AE_SIZES, ConvNeXtV2Ae
from mtgvision_tpu.train import losses as L

Z_SIZE = 768  # encoder_train.py:41
NUM_CLASSES = 120_000  # arcface class count, encoder_train.py:381-392


@dataclasses.dataclass
class EncoderConfig:
    """Field-parity with the reference pydantic Config (encoder_train.py:846-889)."""

    seed: int = 42
    # data
    img_type: str = "small"
    predownload: bool = False
    similar_neg_prob: float = 0.2
    target_is_input_prob: float = 0.05
    # probability an x view is overlapped by another card (scene-overlap
    # robustness; no reference counterpart — its encoder never sees
    # occlusion and occluded detections measured 0.12 top-1 e2e)
    p_occlude: float = 0.25
    # model
    model_name: str = "cnvnxt2ae_nano"
    head_type: str = "conv+linear"
    # optimizer
    optimizer: str = "radam"
    learning_rate: float = 1e-3
    weight_decay: float = 1e-7
    gradient_clip_val: float = 0.5
    accumulate_grad_batches: int = 1
    # losses
    loss_recon: str = "ssim5+l1"
    scale_loss_recon: float = 1.0
    loss_contrastive: str = "circle"
    scale_loss_contrastive: float = 1.0
    loss_set_contrastive: str = ""
    scale_loss_set_contrastive: float = 0.3
    # trainer
    batch_size: int = 64
    max_steps: int = 100_000
    precision: str = "bf16"  # TPU-native (reference: fp16 on cuda, :745)
    # warm-start: tolerant-merge params from a SLIM export dir (or train
    # ckpt dir) into the fresh state — step 0, fresh optimizer. This is how
    # a continuation resumes across rounds where only the committed slim
    # artifacts survive (train dirs are gitignored). ``checkpoint`` still
    # wins when it holds a real train state.
    init_params: str = ""
    checkpoint: Optional[str] = None
    ckpt_dir: str = "checkpoints"
    ckpt_every: int = 2500
    log_every: int = 100
    img_log_every: int = 2500
    # data loading
    num_workers: int = 6
    # parallelism (new — reference is single-device)
    n_devices: int = 0  # 0 = all local devices
    # procedural-catalog census size when no catalog is passed (the reference
    # trains over the full Scryfall census; more ids = harder metric problem)
    n_cards: int = 512
    # confusable printings: same-name cards differ ONLY in the ~1% set-symbol
    # glyph (data/catalog.py ProceduralCatalog confusable=True — the real-
    # Scryfall difficulty the de-saturated retrieval benchmark measures).
    # Training on this census with similar_neg hard negatives is what forces
    # glyph-level discrimination; the legacy census never needed it (r3:
    # virtual top-1 0.739 on confusable vs 1.0 legacy).
    confusable: bool = False
    # Fuse this many optimizer steps into ONE jitted lax.scan program —
    # device-side pool sampling (data/encoder_gen.py make_pair_batch_sampled)
    # makes the whole sample→augment→fwd/bwd→update loop host-free. Critical
    # when per-dispatch latency is high (tunneled TPUs). 0/1 = per-step
    # dispatch (the test/path-parity default).
    scan_steps: int = 0

    @property
    def x_size_hw(self) -> tuple[int, int]:
        return (192, 128)

    @property
    def y_size_hw(self) -> tuple[int, int]:
        return (192, 128)


# model registry (encoder_train.py:52-67): name → AE size key
MODELS: dict[str, str] = {
    "cnvnxt2ae_atto": "atto",
    "cnvnxt2ae_femto": "femto",
    "cnvnxt2ae_pico": "pico",
    "cnvnxt2ae_nano": "nano",
    "cnvnxt2ae_tiny": "tiny",
    "cnvnxt2ae_tiny_9_128": "tiny_9_128",
    "cnvnxt2ae_tiny_12_128": "tiny_12_128",
    "cnvnxt2ae_base_9": "base_9",
    "cnvnxt2ae_base_12": "base_12",
    "cnvnxt2ae_base": "base",
    "cnvnxt2ae_large": "large",
    "cnvnxt2ae_huge": "huge",
}


def build_model(config: EncoderConfig) -> ConvNeXtV2Ae:
    size = MODELS[config.model_name]
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    return ConvNeXtV2Ae(
        image_hw=config.x_size_hw,
        z_size=Z_SIZE,
        head_type=config.head_type,
        decoder_enabled=bool(config.loss_recon),
        dtype=dtype,
        **AE_SIZES[size],
    )


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # learned class-weight matrices for arcface-style losses (None otherwise)
    loss_weights: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def make_optimizer(config: EncoderConfig) -> optax.GradientTransformation:
    """clip(0.5) → {adam|radam|sgd} with eps=1e-4 (encoder_train.py:449-496)."""
    opt = {
        "adam": partial(optax.adam, eps=1e-4),
        "radam": partial(optax.radam, eps=1e-4),
        "sgd": optax.sgd,
        # reference's deepspeed_cpu_adam is a single-device CPU-offload adam
        # (encoder_train.py:472-479) — meaningless on TPU; alias to adam.
        "deepspeed_cpu_adam": partial(optax.adam, eps=1e-4),
    }[config.optimizer](learning_rate=config.learning_rate)
    chain = [optax.clip_by_global_norm(config.gradient_clip_val), opt]
    if config.weight_decay:
        chain.insert(1, optax.add_decayed_weights(config.weight_decay))
    tx = optax.chain(*chain)
    if config.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, config.accumulate_grad_batches)
    return tx


def create_state(config: EncoderConfig, rng: jax.Array) -> TrainState:
    model = build_model(config)
    h, w = config.x_size_hw
    params = jax.jit(model.init, static_argnums=2)(rng, jnp.zeros((1, h, w, 3), jnp.float32), True)["params"]

    loss_weights = {}
    for name in (config.loss_contrastive, config.loss_set_contrastive):
        if name in L.CLASS_WEIGHT_LOSSES and name not in loss_weights:
            k = 3 if name == "sub_center_arc_face" else 1
            loss_weights[name] = jax.random.normal(
                jax.random.fold_in(rng, 7), (NUM_CLASSES * k, Z_SIZE), jnp.float32
            ) * 0.01
    loss_weights = loss_weights or None

    tx = make_optimizer(config)
    trainable = {"params": params, "loss_weights": loss_weights}
    opt_state = tx.init(trainable)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        loss_weights=loss_weights,
        tx=tx,
        apply_fn=model.apply,
    )


def _metric_loss(name: str, loss_weights, z, labels):
    if name in L.CLASS_WEIGHT_LOSSES:
        w = loss_weights[name]
        if name == "arc_face":
            return L.arcface_loss(z, w, labels)
        return L.subcenter_arcface_loss(z, w, labels)
    return L.METRIC_LOSSES[name](z, labels)


def loss_fn(params, loss_weights, batch, config: EncoderConfig, apply_fn):
    """encoder_train.py:404-447 as a pure function. Batch keys: y, x, x_labels,
    x2, x2_labels (BatchHintNumpy, encoder_train.py:74-88); labels are (B, 3)
    int32 [card_id, name_id, set_id]."""
    logs = {}
    loss = 0.0

    variables = {"params": params}
    if not config.loss_recon:
        z = apply_fn(variables, batch["x"], method="encode")
    else:
        z, (y_recon, *_) = apply_fn(variables, batch["x"])
        y_recon = jnp.clip(y_recon, -0.25, 1.25)  # grad-explosion guard (:412)
        recon = L.recon_loss_fn(config.loss_recon)(
            y_recon[: batch["y"].shape[0]], batch["y"]
        )
        logs["loss_recon"] = recon
        loss = loss + recon * config.scale_loss_recon

    if config.loss_contrastive or config.loss_set_contrastive:
        z2 = apply_fn(variables, batch["x2"], method="encode")
        z_all = jnp.concatenate([z, z2], axis=0)
        labels_all = jnp.concatenate([batch["x_labels"], batch["x2_labels"]], axis=0)

    if config.loss_contrastive:
        lc = _metric_loss(config.loss_contrastive, loss_weights, z_all, labels_all[:, 0])
        logs["loss_metric"] = lc
        loss = loss + lc * config.scale_loss_contrastive

    if config.loss_set_contrastive:
        ls = _metric_loss(config.loss_set_contrastive, loss_weights, z_all, labels_all[:, 2])
        logs["loss_set_metric"] = ls
        loss = loss + ls * config.scale_loss_set_contrastive

    logs["loss"] = loss
    return loss, logs


def train_step(state: TrainState, batch, config: EncoderConfig):
    """One optimization step (pure; jit/pjit-wrapped by ``make_train_step``)."""

    def wrapped(trainable):
        return loss_fn(
            trainable["params"], trainable["loss_weights"], batch, config, state.apply_fn
        )

    trainable = {"params": state.params, "loss_weights": state.loss_weights}
    (loss, logs), grads = jax.value_and_grad(wrapped, has_aux=True)(trainable)
    # Non-finite guard: one bad batch (circle loss is spiky on hard batches)
    # must not poison the params — the r2 100k run hit NaN at step 38130 and
    # trained on NaN thereafter. Skip the update (params AND opt_state) when
    # loss or any grad is non-finite; surface the skip in the logs.
    finite = jnp.isfinite(loss) & jax.tree.reduce(
        lambda a, g: a & jnp.isfinite(g).all(), grads, jnp.asarray(True)
    )
    safe_grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
    updates, opt_state = state.tx.update(safe_grads, state.opt_state, trainable)
    new = optax.apply_updates(trainable, updates)
    keep = lambda n, o: jax.tree.map(  # noqa: E731
        lambda a, b: jnp.where(finite, a, b), n, o
    )
    logs["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
    # sanitize with a LARGE sentinel (not 0): chunk-mean losses feed the
    # keep-top-k checkpoint score, where 0 would rank a NaN chunk "best"
    logs = {k: jnp.where(jnp.isfinite(v), v, 1e6) for k, v in logs.items()}
    return (
        state.replace(
            step=state.step + 1,
            params=keep(new["params"], state.params),
            loss_weights=keep(new["loss_weights"], state.loss_weights),
            opt_state=keep(opt_state, state.opt_state),
        ),
        logs,
    )


def train(
    config: EncoderConfig,
    catalog=None,
    backgrounds=None,
    max_steps: int | None = None,
    profile_steps: tuple[int, int] | None = None,
) -> "TrainState":
    """Full training loop — the reference's ``train(config)``
    (encoder_train.py:671-783) rebuilt: seeded init, device-pool datagen,
    pjit DP over all local devices, top-3 checkpointing by loss every
    ``ckpt_every`` steps, arch-tolerant resume, metrics JSONL (+wandb when
    available), image grids, optional jax.profiler trace window.
    """
    import numpy as _np

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.encoder_gen import EncoderDataset
    from mtgvision_tpu.parallel.mesh import make_mesh, shard_batch
    from mtgvision_tpu.train.checkpoint import CheckpointManager
    from mtgvision_tpu.train.logging_utils import MetricsLogger

    if catalog is None:
        catalog = ProceduralCatalog(
            n_cards=config.n_cards, confusable=config.confusable
        )
    if backgrounds is None:
        backgrounds = ProceduralBackgrounds()

    rng = jax.random.PRNGKey(config.seed)
    state = create_state(config, rng)

    n_dev = config.n_devices or jax.local_device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn = make_train_step(config, mesh)

    dataset = EncoderDataset.from_config(config, catalog, backgrounds)
    ckpt = CheckpointManager(config.ckpt_dir, keep_top_k=3)
    run_name = f"{config.model_name}_{config.head_type}_{config.loss_contrastive}"
    logger = MetricsLogger(pathlib.Path(config.ckpt_dir) / "logs", run_name)

    if config.checkpoint:
        resume_mgr = CheckpointManager(config.checkpoint)
        # tolerate an empty dir so crash-supervised runs can point --checkpoint
        # at their own ckpt-dir before the first save exists
        if resume_mgr.latest_step() is not None:
            state = resume_mgr.restore(target=state)

    if config.init_params and int(jax.device_get(state.step)) == 0:
        # warm-start from slim-export params (see the config field note)
        from mtgvision_tpu.eval.system import _restore_tree
        from mtgvision_tpu.train.checkpoint import merge_compatible

        tree = _restore_tree(config.init_params)
        params = merge_compatible(jax.device_get(state.params), tree["params"])
        state = state.replace(params=params)
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))

    total = max_steps or config.max_steps
    start = int(jax.device_get(state.step))

    if (
        config.scan_steps > 1
        and dataset.use_device_pool
        and dataset.device_sampling
        and profile_steps is None
    ):
        scan_fn = make_train_scan(config, dataset, mesh)
        key = jax.random.fold_in(jax.random.PRNGKey(config.seed), 2)
        i = start
        while i < total:
            state, logs = scan_fn(state, jax.random.fold_in(key, i))
            prev, i = i, i + config.scan_steps
            logger.log(i, jax.device_get(logs))
            if config.img_log_every and i // config.img_log_every > prev // config.img_log_every:
                vis_batch = dataset.random_batch(8)
                logger.log_images(i, "x", _np.asarray(vis_batch["x"]))
                if "y" in vis_batch:
                    logger.log_images(i, "y", _np.asarray(vis_batch["y"]))
            if i // config.ckpt_every > prev // config.ckpt_every or i >= total:
                ckpt.save(
                    i, state, config=dataclasses.asdict(config),
                    score=float(jax.device_get(logs["loss"])),
                )
        logger.close()
        return state

    for i in range(start, total):
        if profile_steps and i == profile_steps[0]:
            jax.profiler.start_trace(str(pathlib.Path(config.ckpt_dir) / "trace"))
        batch = dataset.random_batch()
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, logs = step_fn(state, batch)
        if profile_steps and i == profile_steps[1]:
            jax.block_until_ready(logs["loss"])
            jax.profiler.stop_trace()
        if i % config.log_every == 0 or i == total - 1:
            logger.log(i, jax.device_get(logs))
        if config.img_log_every and i % config.img_log_every == 0:
            vis = {"x": _np.asarray(batch["x"][:8])}
            if "y" in batch:
                vis["y"] = _np.asarray(batch["y"][:8])
            for name, imgs in vis.items():
                logger.log_images(i, name, imgs)
        if (i + 1) % config.ckpt_every == 0 or i == total - 1:
            ckpt.save(
                i + 1, state, config=dataclasses.asdict(config),
                score=float(jax.device_get(logs["loss"])),
            )
    logger.close()
    return state


def _cli(argv=None):
    """python -m mtgvision_tpu.train.encoder_train --model-name … — the
    auto-generated flag surface (encoder_train.py:786-843)."""
    from mtgvision_tpu.train.config_cli import parse_config

    config = parse_config(EncoderConfig, argv)
    return train(config)


import pathlib  # noqa: E402  (used by train())


def make_train_scan(config: EncoderConfig, dataset, mesh: Mesh | None = None):
    """``config.scan_steps`` steps fused into one jitted program (see
    DetectorConfig.scan_steps for rationale). ``dataset`` must be an
    EncoderDataset with device pools + device sampling; the pools are closed
    over as HBM-resident constants. Returns jitted
    ``(state, key) -> (state, chunk-mean logs)``."""
    from mtgvision_tpu.data.encoder_gen import make_pair_batch_sampled

    pool, bgp = dataset._pools()
    step = partial(train_step, config=config)
    shard = NamedSharding(mesh, P(mesh.axis_names[0])) if mesh is not None else None

    # Pool arrays MUST be jit ARGUMENTS, not closure constants (closed-over
    # arrays become HLO literals — GBs of constants break remote compiles).
    def run(state, key, card_images, bg_images, slot_labels, similar_table):
        def body(state, key):
            out = make_pair_batch_sampled(
                key,
                card_images,
                bg_images,
                slot_labels,
                similar_table,
                batch_size=config.batch_size,
                similar_neg_prob=config.similar_neg_prob if dataset.paired else 0.0,
                target_is_input_prob=config.target_is_input_prob,
                x_size_hw=dataset.x_size_hw,
                y_size_hw=dataset.y_size_hw,
                half_upsidedown=dataset.half_upsidedown,
                p_occlude=config.p_occlude,
            )
            batch = {"x": out["x"], "x_labels": out["x_labels"]}
            if dataset.targets:
                batch["y"] = out["y"]
            if dataset.paired:
                batch["x2"] = out["x2"]
                batch["x2_labels"] = out["x2_labels"]
            if shard is not None:
                batch = {k: jax.lax.with_sharding_constraint(v, shard) for k, v in batch.items()}
            return step(state, batch)

        keys = jax.random.split(key, config.scan_steps)
        # unroll: XLA while-loop iterations execute as separate host round-trips
        # on remote-dispatch runtimes (each ~= a full dispatch), defeating the
        # point of the fused chunk; unrolled, the chunk is ONE straight-line
        # program
        state, logs = jax.lax.scan(body, state, keys, unroll=True)
        return state, jax.tree.map(lambda x: x.mean(0), logs)

    if mesh is None:
        jitted = jax.jit(run, donate_argnums=0)
    else:
        repl = NamedSharding(mesh, P())
        jitted = jax.jit(
            run,
            in_shardings=(repl,) + (None,) * 5,
            out_shardings=(repl, repl),
            donate_argnums=0,
        )
    return lambda state, key: jitted(
        state, key, pool.images, bgp.images, pool.slot_labels_dev, pool.similar_table
    )


def make_train_step(config: EncoderConfig, mesh: Mesh | None = None):
    """Jit (single-chip) or pjit-DP (mesh) train step.

    With a mesh: batch sharded on the leading axis, state replicated; XLA
    inserts the grad all-reduce over ICI automatically.
    """
    step = partial(train_step, config=config)
    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))

    # Shard whatever batch keys actually arrive (configs without recon have
    # no "y"; unpaired configs no "x2") instead of a hard-coded key set — a
    # fixed in_shardings dict mismatches those pytrees and throws.
    def sharded_step(state, batch):
        batch = {
            k: jax.lax.with_sharding_constraint(v, shard) for k, v in batch.items()
        }
        return step(state, batch)

    return jax.jit(sharded_step, in_shardings=(repl, None), out_shardings=(repl, repl))


if __name__ == "__main__":
    _cli()
