"""Detector training: pooled scene batches + jitted YOLO-seg train step.

Replaces mtgvision/od_train.py (a thin ultralytics wrapper: model.train on a
pre-written YOLO dataset) with an in-repo TPU loop:

- scene batches are assembled ON DEVICE from HBM-resident card/background
  pools (data/scene_gen.py compositor); the host only runs the cheap
  placement rejection-sampler and ships (3,3) matrices + indices,
- ground truth is computed analytically from the placement homographies — the
  notched seg polygon and its mask are rendered on device by inverse-mapping
  pixels into the card frame (two half-plane box tests), no rasterization,
- the loss is the YOLO-seg objective (train/od_losses.py), jitted with
  data-parallel sharding over a mesh like the encoder trainer.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtgvision_tpu.data.catalog import Backgrounds, CardCatalog
from mtgvision_tpu.data.encoder_gen import DeviceBgPool, DeviceCardPool
from mtgvision_tpu.data.scene_gen import (
    BG_HEAVY,
    BG_LIGHT,
    CARD_AUG,
    MAX_CARDS,
    apply_m,
    card_bbox,
    cover_rotate_matrix,
    place_card,
)
from mtgvision_tpu.models.yolo import YoloSeg
from mtgvision_tpu.ops import image as I
from mtgvision_tpu.ops import warp as W
from mtgvision_tpu.train.od_losses import detection_loss


@dataclasses.dataclass
class DetectorConfig:
    """Mirror of the active od_train args (od_train.py:73-151)."""

    seed: int = 42
    model_size: str = "s"  # yolo11s (od_train.py:139)
    kind: str = "seg"
    img_size: int = 640
    batch_size: int = 16
    max_steps: int = 10_000
    learning_rate: float = 1e-3
    weight_decay: float = 5e-4
    warmup_steps: int = 500
    precision: str = "bf16"
    pool_size: int = 1024
    bg_pool_size: int = 128
    # Reference-parity placement regime (the ACTIVE seg config,
    # od_datasets.py:861-873): 10% pure-background scenes so the detector
    # learns what "no card" looks like, corner jitter 0.7, and NO extra
    # edge-visibility floor (0.0 is clamped up to min_visible=0.5 inside
    # place_card, exactly like the reference's max() at od_datasets.py:313-315
    # — cards may hang half off-frame).
    ratio_bg: float = 0.1
    jitter_ratio: float = 0.7
    min_visible_edge: float = 0.0
    # placement size range (linear scale, od_datasets.py:330-336 convention:
    # card area = ch·cw·ratio², log-uniform) — a fine-tune pool can emphasize
    # the small-card band (e.g. max 0.2) where recall is hardest, or the
    # dense-occlusion band via num_cards_max
    min_area_ratio: float = 0.02
    max_area_ratio: float = 0.9
    num_cards_min: int = 1
    num_cards_max: int = MAX_CARDS
    ckpt_dir: str = "checkpoints_od"
    n_devices: int = 0
    # HBM-resident pregenerated scene pool (0 = compose scenes per step).
    # Full per-step composition costs ~100 perspective warps/batch — XLA
    # gathers make that ~7 s on a v5e chip — while the reference itself
    # trains ~100 epochs over a FIXED 10k-image dataset (od_train.py:142-146,
    # od_datasets.py:861-868). The pool reproduces that regime natively:
    # compose once on device, then per-step sample + photometric-only augs.
    scene_pool: int = 2048
    # Fuse this many optimizer steps into ONE dispatched program via lax.scan
    # (pool sampling + augs + fwd/bwd all inside). With high per-dispatch
    # latency (tunneled TPUs: ~0.85 s/dispatch) this is the difference
    # between 1.7 s/step and ~ms/step. Requires scene_pool > 0; 0/1 = plain
    # per-step dispatch.
    scan_steps: int = 50
    # Resume from the latest checkpoint in ckpt_dir when present.
    resume: bool = True
    # Warm-start params (+batch_stats) from a SLIM export dir when no
    # resume checkpoint exists — step 0, fresh optimizer. Cross-round
    # continuations only have the committed slim artifacts to start from
    # (train dirs are gitignored and do not survive rounds).
    init_params: str = ""
    # Cache the composed scene pool here (.npz) — rebuilding it costs
    # ~15 min of warp compute; reloading is seconds.
    pool_cache: str = ""
    # Re-place + recompose this many batches of pool slots every
    # ``pool_refresh_steps`` optimizer steps (0 = frozen pool). Refreshing
    # keeps scene GEOMETRY moving so the detector can't overfit the pool's
    # fixed card layouts — the reference's analog is regenerating the YOLO
    # dataset (od_datasets.py:732), which it never does mid-run either, but a
    # live pool makes it nearly free.
    pool_refresh_steps: int = 1000
    pool_refresh_batches: int = 2

    @property
    def num_classes(self) -> int:
        return 1 if self.kind == "seg" else 3


# ---------------------------------------------------------------------------
# device scene assembly + analytic GT
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_hw", "final_aug"))
def build_scene_batch(
    key,
    card_pool_u8: jnp.ndarray,  # (P, Hc, Wc, 3) uint8
    bg_pool_u8: jnp.ndarray,  # (Q, Hb, Wb, 3) uint8
    card_idx: jnp.ndarray,  # (B, K) int32
    card_ms: jnp.ndarray,  # (B, K, 3, 3)
    valid: jnp.ndarray,  # (B, K) f32
    bg_idx: jnp.ndarray,  # (B,) int32
    bg_ms: jnp.ndarray,  # (B, 3, 3)
    out_hw: tuple[int, int] = (640, 640),
    final_aug: bool = True,
):
    """(B,H,W,3) scenes + (B,K,4) gt xyxy + (B,K,Hp,Wp) gt notch masks.

    Everything from pools + matrices; proto-res masks come from exact
    inverse-homography box tests (card rect minus bottom notch,
    od_datasets.py:258-268 geometry).
    """
    from mtgvision_tpu.ops.gather import take_rows

    b, k = card_idx.shape
    hc, wc = card_pool_u8.shape[1:3]
    h, w = out_hw
    hp, wp = h // 4, w // 4

    # pre-fetch all rows OUTSIDE the vmap with unrolled dynamic slices —
    # pool indexing inside a vmapped function becomes a batched gather,
    # which hits TPU gather pathology (~20 ms/row)
    scene_cards_u8 = take_rows(card_pool_u8, card_idx.reshape(-1)).reshape(
        b, k, hc, wc, 3
    )
    scene_bgs_u8 = take_rows(bg_pool_u8, bg_idx)

    def one_scene(kkey, cards_u8, cms, val, bg_u8, bm):
        k1, k2, k3, k4 = jax.random.split(kkey, 4)
        bg = bg_u8.astype(jnp.float32) / 255.0
        bg = W.warp_perspective(bg, bm, out_hw)
        bg = BG_LIGHT(k1, bg)
        cards = cards_u8.astype(jnp.float32) / 255.0  # (K,Hc,Wc,3)
        cards = jax.vmap(CARD_AUG)(jax.random.split(k2, k), cards)
        mask = I.round_rect_mask((hc, wc), radius_ratio=0.046)
        rgba = jnp.concatenate(
            [cards, jnp.broadcast_to(mask[None, :, :, None], (k, hc, wc, 1))], -1
        )
        canvas = bg
        for i in range(k - 1, -1, -1):
            warped = W.warp_perspective(rgba[i], cms[i], out_hw)
            a = warped[..., 3:4] * val[i]
            canvas = canvas * (1.0 - a) + warped[..., :3] * a
        canvas = jnp.clip(canvas, 0.0, 1.0)
        return BG_HEAVY(k4, canvas) if final_aug else canvas

    keys = jax.random.split(key, b)
    images = jax.vmap(one_scene)(
        keys, scene_cards_u8, card_ms, valid, scene_bgs_u8, bg_ms
    )

    # GT boxes: warped card-rect extents
    rect = jnp.asarray(
        [[0.0, 0.0], [wc, 0.0], [wc, hc], [0.0, hc]], jnp.float32
    )
    warped_pts = W.apply_transform_points(card_ms, rect)  # (B,K,4,2)
    gt_x1 = jnp.min(warped_pts[..., 0], -1)
    gt_y1 = jnp.min(warped_pts[..., 1], -1)
    gt_x2 = jnp.max(warped_pts[..., 0], -1)
    gt_y2 = jnp.max(warped_pts[..., 1], -1)
    gt_boxes = jnp.stack(
        [
            jnp.clip(gt_x1, 0, w), jnp.clip(gt_y1, 0, h),
            jnp.clip(gt_x2, 0, w), jnp.clip(gt_y2, 0, h),
        ],
        -1,
    )

    # GT notch masks at proto res: pixel → card frame via M⁻¹ → box tests
    minv = jnp.linalg.inv(card_ms)  # (B, K, 3, 3)
    yy = (jnp.arange(hp, dtype=jnp.float32) + 0.5) * 4.0
    xx = (jnp.arange(wp, dtype=jnp.float32) + 0.5) * 4.0
    gx, gy = jnp.meshgrid(xx, yy)
    pix = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (Hp·Wp, 2)

    def mask_for(minv_one):
        q = W.apply_transform_points(minv_one, pix)  # (Hp·Wp, 2) card coords
        qx, qy = q[:, 0], q[:, 1]
        in_rect = (qx >= 0) & (qx <= wc) & (qy >= 0) & (qy <= hc)
        in_notch = (qx >= 0.4 * wc) & (qx <= 0.6 * wc) & (qy >= 0.5 * hc)
        return (in_rect & ~in_notch).astype(jnp.float32).reshape(hp, wp)

    gt_masks = jax.vmap(jax.vmap(mask_for))(minv)
    gt_masks = gt_masks * valid[..., None, None]
    return images, gt_boxes, gt_masks


@functools.partial(jax.jit, static_argnames=("card_hw", "out_hw"))
def obb_gt_from_ms(
    card_ms: jnp.ndarray,  # (B, K, 3, 3)
    valid: jnp.ndarray,  # (B, K) f32
    card_hw: tuple[int, int],
    out_hw: tuple[int, int],
):
    """OBB-kind ground truth: 3 keypoint boxes per card — card / top region /
    bottom region (od_datasets.py:244-256) — warped by the placement
    homographies and reduced to xyxy extents. → ((B, 3K, 4) boxes,
    (B, 3K) labels, (B, 3K) valid)."""
    import numpy as _np

    from mtgvision_tpu.data.scene_gen import obb_keypoints

    b, k = card_ms.shape[:2]
    h, w = out_hw
    kps = jnp.asarray(_np.asarray(obb_keypoints(card_hw), _np.float32))  # (3,4,2)
    # (B,K,3,4,2): batch the 3 class polygons through each card's homography
    pts = W.apply_transform_points(card_ms[:, :, None], kps)
    x1 = jnp.clip(jnp.min(pts[..., 0], -1), 0, w)
    y1 = jnp.clip(jnp.min(pts[..., 1], -1), 0, h)
    x2 = jnp.clip(jnp.max(pts[..., 0], -1), 0, w)
    y2 = jnp.clip(jnp.max(pts[..., 1], -1), 0, h)
    boxes = jnp.stack([x1, y1, x2, y2], -1).reshape(b, k * 3, 4)
    labels = jnp.tile(jnp.arange(3, dtype=jnp.int32)[None, None], (b, k, 1)).reshape(b, k * 3)
    v = jnp.repeat(valid > 0.5, 3, axis=1)
    return boxes, labels, v


class DetectorDataset:
    """Host placement + device assembly; yields full train batches."""

    def __init__(
        self,
        catalog: CardCatalog,
        backgrounds: Backgrounds,
        config: DetectorConfig,
        num_cards_min: int | None = None,
        num_cards_max: int | None = None,
    ):
        self.catalog = catalog
        self.config = config
        self.rng = np.random.default_rng(config.seed)
        self.key = jax.random.PRNGKey(config.seed)
        self.card_pool = DeviceCardPool(catalog, config.pool_size, self.rng)
        self.bg_pool = DeviceBgPool(backgrounds, config.bg_pool_size, self.rng)
        self.bg_hw_native = self.bg_pool.images.shape[1:3]
        if num_cards_min is None:
            num_cards_min = config.num_cards_min
        if num_cards_max is None:
            num_cards_max = config.num_cards_max
        self.num_cards_min = num_cards_min
        self.num_cards_max = min(num_cards_max, MAX_CARDS)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def random_batch(self, final_aug: bool = True):
        cfg = self.config
        b = cfg.batch_size
        out_hw = (cfg.img_size, cfg.img_size)
        card_hw = self.catalog.card_hw
        k = MAX_CARDS

        card_idx = np.zeros((b, k), np.int32)
        ms = np.tile(np.eye(3, dtype=np.float32), (b, k, 1, 1))
        valid = np.zeros((b, k), np.float32)
        bg_idx = self.rng.integers(0, self.bg_pool.pool_size, b).astype(np.int32)
        bg_ms = np.stack(
            [
                cover_rotate_matrix(self.rng, self.bg_hw_native, out_hw).astype(np.float32)
                for _ in range(b)
            ]
        )
        for bi in range(b):
            polys = []
            # ratio_bg: pure-background scene with zero cards (od_datasets.py:686)
            n_cards = (
                0
                if self.rng.random() < cfg.ratio_bg
                else int(self.rng.integers(self.num_cards_min, self.num_cards_max + 1))
            )
            slot = 0
            for _ in range(n_cards):
                m = place_card(
                    self.rng, card_hw, out_hw, polys,
                    jitter_ratio=cfg.jitter_ratio,
                    min_visible_edge=cfg.min_visible_edge,
                    min_area_ratio=cfg.min_area_ratio,
                    max_area_ratio=cfg.max_area_ratio,
                )
                if m is None:
                    continue
                card_idx[bi, slot] = self.rng.integers(0, self.card_pool.pool_size)
                ms[bi, slot] = m.astype(np.float32)
                valid[bi, slot] = 1.0
                polys.append(apply_m(card_bbox(card_hw), m))
                slot += 1

        images, gt_boxes, gt_masks = build_scene_batch(
            self._next_key(),
            self.card_pool.images,
            self.bg_pool.images,
            jnp.asarray(card_idx),
            jnp.asarray(ms),
            jnp.asarray(valid),
            jnp.asarray(bg_idx),
            jnp.asarray(bg_ms),
            out_hw=out_hw,
            final_aug=final_aug,
        )
        if cfg.kind == "obb":
            # 3-class keypoint-box targets, no mask loss (detect-only kind)
            ob, ol, ov = obb_gt_from_ms(
                jnp.asarray(ms), jnp.asarray(valid), card_hw, out_hw
            )
            return {
                "images": images,
                "gt_boxes": ob,
                "gt_labels": ol,
                "gt_valid": ov,
            }
        return {
            "images": images,
            "gt_boxes": gt_boxes,
            "gt_labels": jnp.zeros((b, k), jnp.int32),
            "gt_valid": jnp.asarray(valid) > 0.5,
            "gt_masks": gt_masks,
        }


@functools.partial(jax.jit, static_argnames=("with_masks",))
def _pool_sample(key, idx, images_u8, boxes, labels, valid, masks_u8, with_masks: bool):
    """Fetch pool scenes by index and apply fresh photometric augs (the only
    per-step randomness; geometry is frozen at pool build time). Row fetches
    use ops.gather.take_rows — a dynamic `jnp.take` on big rows hits TPU
    gather pathology (~20 ms/row)."""
    from mtgvision_tpu.ops.gather import take_rows

    imgs = take_rows(images_u8, idx).astype(jnp.float32) / 255.0
    imgs = jax.vmap(BG_HEAVY)(jax.random.split(key, idx.shape[0]), imgs)
    batch = {
        "images": imgs,
        "gt_boxes": take_rows(boxes, idx),
        "gt_labels": take_rows(labels, idx),
        "gt_valid": take_rows(valid, idx),
    }
    if with_masks:
        batch["gt_masks"] = take_rows(masks_u8, idx).astype(jnp.float32)
    return batch


class ScenePoolDataset:
    """Pregenerated device-resident scene pool (see DetectorConfig.scene_pool).

    Build: compose ``n_scenes`` synthetic scenes WITHOUT the final heavy
    photometric augs and keep them in HBM as uint8 (≈1.2 MB/scene at 640²)
    with their analytic GT. Sample: jitted gather + BG_HEAVY — fresh
    photometric noise per visit, exactly the reference's fixed-dataset
    regime where only ultralytics' runtime augs vary across epochs.
    """

    def __init__(self, base: DetectorDataset, n_scenes: int, cache_path: str = ""):
        self.base = base
        self.cfg = base.config
        self.rng = base.rng
        b = self.cfg.batch_size
        n_scenes = (n_scenes // b) * b or b
        self._refresh_pos = 0
        import pathlib as _pl

        cache = _pl.Path(cache_path) if cache_path else None
        cache_key = self._cache_key(n_scenes)
        if cache is not None and cache.exists():
            z = np.load(cache)
            # validate against the FULL geometry-relevant config, not just the
            # scene count — a stale pool for a different img_size/kind/seed/
            # catalog silently trains on wrong geometry/labels otherwise
            if str(z.get("cache_key", "")) == cache_key:
                self.images_u8 = jnp.asarray(z["images_u8"])
                self.boxes = jnp.asarray(z["boxes"])
                self.labels = jnp.asarray(z["labels"])
                self.valid = jnp.asarray(z["valid"])
                self.masks_u8 = jnp.asarray(z["masks_u8"])
                self.with_masks = bool(z["with_masks"])
                self.n_scenes = n_scenes
                return
        imgs, boxes, labels, valids, masks = [], [], [], [], []
        for _ in range(n_scenes // b):
            batch = base.random_batch(final_aug=False)
            imgs.append((batch["images"] * 255.0).astype(jnp.uint8))
            boxes.append(batch["gt_boxes"])
            labels.append(batch["gt_labels"])
            valids.append(batch["gt_valid"])
            if "gt_masks" in batch:
                masks.append(batch["gt_masks"].astype(jnp.uint8))
        self.images_u8 = jnp.concatenate(imgs)
        self.boxes = jnp.concatenate(boxes)
        self.labels = jnp.concatenate(labels)
        self.valid = jnp.concatenate(valids)
        self.masks_u8 = jnp.concatenate(masks) if masks else jnp.zeros((1,), jnp.uint8)
        self.with_masks = bool(masks)
        self.n_scenes = n_scenes
        jax.block_until_ready(self.images_u8)
        if cache is not None:
            cache.parent.mkdir(parents=True, exist_ok=True)
            np.savez(
                cache,
                images_u8=np.asarray(self.images_u8),
                boxes=np.asarray(self.boxes),
                labels=np.asarray(self.labels),
                valid=np.asarray(self.valid),
                masks_u8=np.asarray(self.masks_u8),
                with_masks=self.with_masks,
                cache_key=cache_key,
            )

    def _cache_key(self, n_scenes: int) -> str:
        """Hash of every config field that shapes pool geometry/labels."""
        cfg = self.cfg
        cat = self.base.catalog
        parts = (
            # placement-algorithm version: bump when place_card's proposal/
            # rejection behavior changes (v2 = scaled-diagonal center pad)
            "place-v2",
            n_scenes, cfg.img_size, cfg.kind, cfg.seed, cfg.batch_size,
            cfg.pool_size, cfg.bg_pool_size, type(cat).__name__,
            tuple(cat.card_hw), len(cat),
            self.base.num_cards_min, self.base.num_cards_max,
            # distribution fields (reference-parity regime, r3)
            cfg.ratio_bg, cfg.jitter_ratio, cfg.min_visible_edge,
            # r4: placement size band (defaults preserve the r3 cache key
            # semantics only if hashed — include unconditionally; old caches
            # simply rebuild once)
            cfg.min_area_ratio, cfg.max_area_ratio,
        )
        import hashlib

        return hashlib.sha256(repr(parts).encode()).hexdigest()[:16]

    def refresh(self, n_batches: int = 1):
        """Recompose ``n_batches × batch_size`` pool slots with FRESH host
        placement geometry (rotating cursor), mirroring
        ``DeviceCardPool.refresh`` (data/encoder_gen.py:396-416). The arrays
        are rebound (functional update), so jitted samplers that take the
        pool arrays as arguments pick the new contents up on the next call
        with no recompilation."""
        b = self.cfg.batch_size
        for _ in range(n_batches):
            batch = self.base.random_batch(final_aug=False)
            s = self._refresh_pos
            upd = jax.lax.dynamic_update_slice
            self.images_u8 = upd(
                self.images_u8,
                (batch["images"] * 255.0).astype(jnp.uint8),
                (s, 0, 0, 0),
            )
            self.boxes = upd(self.boxes, batch["gt_boxes"], (s, 0, 0))
            self.labels = upd(self.labels, batch["gt_labels"], (s, 0))
            self.valid = upd(self.valid, batch["gt_valid"], (s, 0))
            if self.with_masks:
                self.masks_u8 = upd(
                    self.masks_u8, batch["gt_masks"].astype(jnp.uint8), (s, 0, 0, 0)
                )
            self._refresh_pos = (s + b) % self.n_scenes

    def random_batch(self):
        idx = jnp.asarray(
            self.rng.integers(0, self.n_scenes, self.cfg.batch_size), jnp.int32
        )
        return _pool_sample(
            self.base._next_key(), idx, self.images_u8, self.boxes, self.labels,
            self.valid, self.masks_u8, self.with_masks,
        )


# ---------------------------------------------------------------------------
# train state + step
# ---------------------------------------------------------------------------


class DetTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    model: YoloSeg = struct.field(pytree_node=False)


def create_det_state(config: DetectorConfig, rng: jax.Array) -> DetTrainState:
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    model = YoloSeg(num_classes=config.num_classes, size=config.model_size, dtype=dtype)
    # jit the init: eager flax init dispatches every conv separately — over a
    # tunneled TPU that is minutes of per-op round-trips; jitted it is one
    # (cacheable) program
    variables = jax.jit(model.init, static_argnums=2)(
        rng, jnp.zeros((1, config.img_size, config.img_size, 3)), True
    )
    sched = optax.warmup_cosine_decay_schedule(
        0.0, config.learning_rate, config.warmup_steps, config.max_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(config.weight_decay),
        optax.sgd(sched, momentum=0.937, nesterov=True),
    )
    return DetTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        model=model,
    )


def det_train_step(state: DetTrainState, batch, config: DetectorConfig):
    img_hw = (config.img_size, config.img_size)

    def loss_fn(params):
        out, mutated = state.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"],
            True,
            mutable=["batch_stats"],
        )
        loss, logs = detection_loss(
            out,
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_valid"],
            batch.get("gt_masks"),  # absent for the obb (detect-only) kind
            img_hw,
            num_classes=config.num_classes,
        )
        return loss, (logs, mutated["batch_stats"])

    (loss, (logs, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        state.replace(
            step=state.step + 1, params=params, batch_stats=new_bs, opt_state=opt_state
        ),
        logs,
    )


def make_det_train_step(config: DetectorConfig, mesh: Mesh | None = None):
    step = partial(det_train_step, config=config)
    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    def sharded_step(state, batch):
        batch = {k: jax.lax.with_sharding_constraint(v, shard) for k, v in batch.items()}
        return step(state, batch)

    return jax.jit(sharded_step, in_shardings=(repl, None), out_shardings=(repl, repl))


def make_det_train_scan(
    config: DetectorConfig, pool: "ScenePoolDataset", mesh: Mesh | None = None
):
    """``config.scan_steps`` optimizer steps fused into ONE jitted program.

    The scene pool lives in HBM, sampling is `jax.random` — so the whole
    sample→augment→fwd/bwd→update loop runs under a single `lax.scan` with no
    host round-trips. Over a high-latency dispatch path (tunneled TPU,
    ~0.85 s/dispatch) this turns 1.7 s/step into ~ms/step; on local hardware
    it removes per-step dispatch overhead entirely. Returns jitted
    ``(state, key) -> (state, chunk-mean logs)``.
    """
    step = partial(det_train_step, config=config)
    shard = (
        NamedSharding(mesh, P(mesh.axis_names[0])) if mesh is not None else None
    )
    with_masks, n_scenes = pool.with_masks, pool.n_scenes

    # Pool arrays MUST be jit ARGUMENTS, not closure constants: closed-over
    # arrays are baked into the HLO as literals, and a 2.5 GB constant blob
    # breaks remote compile services (HTTP 413) and bloats the executable.
    def run(state, key, images, boxes, labels, valid, masks):
        def body(state, key):
            ki, ka = jax.random.split(key)
            idx = jax.random.randint(ki, (config.batch_size,), 0, n_scenes)
            batch = _pool_sample(ka, idx, images, boxes, labels, valid, masks, with_masks)
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
            in_shardings=(repl,) + (None,) * 6,
            out_shardings=(repl, repl),
            donate_argnums=0,
        )
    return lambda state, key: jitted(
        state, key, pool.images_u8, pool.boxes, pool.labels, pool.valid, pool.masks_u8
    )


def train(config: DetectorConfig, catalog=None, backgrounds=None, max_steps=None):
    """Detector training loop — replaces od_train.py:14-70's ultralytics
    model.train call with the in-repo step; checkpoints + metrics like the
    encoder loop."""
    import dataclasses as _dc
    import pathlib as _pl

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.parallel.mesh import make_mesh, shard_batch
    from mtgvision_tpu.train.checkpoint import CheckpointManager
    from mtgvision_tpu.train.logging_utils import MetricsLogger

    if catalog is None:
        catalog = ProceduralCatalog(n_cards=512)
    if backgrounds is None:
        backgrounds = ProceduralBackgrounds()

    state = create_det_state(config, jax.random.PRNGKey(config.seed))
    n_dev = config.n_devices or jax.local_device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))

    ckpt = CheckpointManager(config.ckpt_dir, keep_top_k=3)
    if config.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(target=state)
    elif config.init_params:
        # warm-start from slim-export params (see the config field note)
        from mtgvision_tpu.eval.system import _restore_tree
        from mtgvision_tpu.train.checkpoint import merge_compatible

        tree = _restore_tree(config.init_params)
        state = state.replace(
            params=merge_compatible(jax.device_get(state.params), tree["params"]),
            batch_stats=merge_compatible(
                jax.device_get(state.batch_stats), tree.get("batch_stats", {})
            ),
        )
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))

    ds = DetectorDataset(catalog, backgrounds, config)
    if config.scene_pool:
        ds = ScenePoolDataset(ds, config.scene_pool, cache_path=config.pool_cache)
    logger = MetricsLogger(_pl.Path(config.ckpt_dir) / "logs", f"yolo{config.model_size}-{config.kind}")

    total = max_steps or config.max_steps
    start = int(jax.device_get(state.step))
    key = jax.random.fold_in(jax.random.PRNGKey(config.seed), 1)

    rs = config.pool_refresh_steps

    if config.scan_steps > 1 and config.scene_pool:
        scan_fn = make_det_train_scan(config, ds, mesh)
        i = start
        while i < total:
            state, logs = scan_fn(state, jax.random.fold_in(key, i))
            prev, i = i, i + config.scan_steps
            logger.log(i, jax.device_get(logs))
            if rs and i // rs > prev // rs:
                ds.refresh(config.pool_refresh_batches)
            if i // 1000 > prev // 1000 or i >= total:
                ckpt.save(i, state, config=_dc.asdict(config),
                          score=float(jax.device_get(logs["loss"])))
        logger.close()
        return state

    step_fn = make_det_train_step(config, mesh)
    for i in range(start, total):
        batch = ds.random_batch()
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, logs = step_fn(state, batch)
        if rs and i > start and i % rs == 0 and isinstance(ds, ScenePoolDataset):
            ds.refresh(config.pool_refresh_batches)
        if i % 50 == 0 or i == total - 1:
            logger.log(i, jax.device_get(logs))
        if (i + 1) % 1000 == 0 or i == total - 1:
            ckpt.save(i + 1, state, config=_dc.asdict(config),
                      score=float(jax.device_get(logs["loss"])))
    logger.close()
    return state


def _cli(argv=None):
    from mtgvision_tpu.train.config_cli import parse_config

    return train(parse_config(DetectorConfig, argv))


if __name__ == "__main__":
    _cli()
