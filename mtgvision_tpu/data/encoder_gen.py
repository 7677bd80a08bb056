"""Encoder synthetic pair generation — batched, device-side.

Rebuild of the reference compositor (mtgvision/encoder_datasets.py:669-834:
``_RAN_BG``/``_RAN_FG``/``_RAN_VRTL`` pipelines, ``make_cropped``/
``make_masked``/``make_bg``/``make_virtual``/``make_virtual_pair``) and the
training dataset (mtgvision/encoder_train.py:90-250 ``RanMtgEncDecDataset``).

TPU-first restructuring: the reference generates one pair at a time on the CPU
(~95 pairs/s, encoder_datasets.py:858); here the host only gathers raw card /
background pixels into batches, and the entire augment→mask→composite→degrade
chain runs as ONE jitted, vmapped XLA program on device. The per-sample
``target_is_input`` swap (encoder_train.py:178-186) becomes an on-device
select, and the ``similar_neg`` swap (:217-226) stays host-side (it's an index
choice into the catalog).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mtgvision_tpu.data.catalog import Backgrounds, CardCatalog
from mtgvision_tpu.ops import augment as A
from mtgvision_tpu.ops import image as I
from mtgvision_tpu.utils.random import ApplyChoice, ApplyOrdered, ApplyShuffled  # noqa: F401  (combinator DSL re-exported for user pipelines)

# ---------------------------------------------------------------------------
# augmentation pipelines (encoder_datasets.py:669-731, structure preserved)
# ---------------------------------------------------------------------------

# TPU-native restructuring of the reference pipelines: the combinator trees
# (_RAN_BG/_RAN_FG/_RAN_VRTL, encoder_datasets.py:669-731) chain 2-3 full
# bilinear warps per image and, under vmap, execute EVERY choice branch for
# the whole batch. Here each image gets exactly ONE composed homography
# (geometry) and ONE fused photometric pass per stage — same effect families
# and magnitudes, ~two orders of magnitude cheaper on TPU.

# photometric parameter sets per stage
_BG_PHOTO = dict(
    p_brightness=0.5, brightness=0.3, contrast=0.3,
    p_hsv=0.0, p_noise=0.0, p_sp=0.0, p_blur=0.0,
    p_tint=0.5, tint_ratio=0.3, p_fade=0.5, fade_ratio=0.33,
)
_FG_PHOTO = dict(
    p_brightness=0.5, brightness=0.3, contrast=0.3,
    p_hsv=0.0, p_noise=0.0, p_sp=0.0,
    p_blur=0.25, blur_sigma=1.5,  # downscale_upscale proxy (:142-163)
    p_tint=0.5, tint_ratio=0.3, p_fade=0.5, fade_ratio=0.33,
)
_VRTL_PHOTO = dict(
    p_brightness=0.5, brightness=0.3, contrast=0.3,
    p_hsv=0.0,
    p_noise=0.6, noise_sigma=0.08,
    p_sp=0.2, sp_amount=0.02,
    p_blur=0.4, blur_sigma=2.0,
    p_sharpen=0.3, sharpen_amount=1.0,
    p_tint=0.5, tint_ratio=0.25, p_fade=0.3, fade_ratio=0.25,
    p_erase=0.3, erase_scale=(0.02, 0.25),
)

from mtgvision_tpu.ops import warp as W  # noqa: E402


def _fg_geom_matrix(key, card_hw, size_hw):
    """ONE homography for the foreground card: center-in-canvas composed with
    a random member of the warp/affine/perspective family
    (encoder_datasets.py:94-116 corner warp, :353-375 affine, :377-400
    perspective). Magnitude gates reproduce the reference's 3-in-4
    apply-probability; all families collapse into one matrix so the card is
    resampled exactly once."""
    hc, wc = card_hw
    h, w = size_hw
    ks = jax.random.split(key, 8)
    g = jax.random.bernoulli(ks[0], 0.75).astype(jnp.float32)

    # scale-to-fill the canvas (make_cropped resize semantics; the detector's
    # dewarped crops are full cards at (192,128), so train inputs must be too
    # — a center-crop here would train on card centers only)
    center = W.compose(
        W.scale_matrix_2d(w / wc, h / hc),
    )
    rot = jax.random.uniform(ks[1], (), minval=-0.15, maxval=0.15) * g
    scale = 1.0 + jax.random.uniform(ks[2], (), minval=-0.1, maxval=0.1) * g
    shx = jax.random.uniform(ks[3], (), minval=-0.05, maxval=0.05) * g
    tx = jax.random.uniform(ks[4], (), minval=-0.06, maxval=0.06) * w * g
    ty = jax.random.uniform(ks[5], (), minval=-0.06, maxval=0.06) * h * g
    aff = W.affine_matrix(rot=rot, tx=tx, ty=ty, sx=scale, shx=shx, shy=0.0,
                          center=(w / 2.0, h / 2.0))

    # corner-displacement perspective (Mutate.warp envelope ~±12% of dims)
    pg = jax.random.bernoulli(ks[6], 0.5).astype(jnp.float32) * g
    quad = jnp.asarray([[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]], jnp.float32)
    disp = (jax.random.uniform(ks[7], (4, 2)) - 0.5) * 0.24 * jnp.asarray([w, h]) * pg
    persp = W.perspective_from_quads(quad, quad + disp)
    return W.compose(persp, aff, center)


def _bg_geom_matrix(key, bg_hw, size_hw):
    """ONE homography for the background: random flip × 360° rotation ×
    cover-scale × crop jitter × mild perspective — the composed equivalent of
    _RAN_BG's flip→rotate_bounded→warp_inv then crop-to-cover
    (encoder_datasets.py:669-683, :774-785)."""
    hb, wb = bg_hw
    h, w = size_hw
    ks = jax.random.split(key, 6)
    theta = jax.random.uniform(ks[0], (), minval=0.0, maxval=2.0 * jnp.pi)
    fx = jnp.where(jax.random.bernoulli(ks[1]), 1.0, -1.0)
    fy = jnp.where(jax.random.bernoulli(ks[2]), 1.0, -1.0)
    # cover any rotation: background must span the canvas diagonal
    diag = float(np.hypot(h, w))
    s = diag / min(hb, wb) * (1.0 + jax.random.uniform(ks[3], (), maxval=0.4))
    m = W.compose(
        W.translation_matrix_2d(w / 2.0, h / 2.0),
        W.rotation_matrix_2d(theta),
        W.scale_matrix_2d(s * fx, s * fy),
        W.translation_matrix_2d(-wb / 2.0, -hb / 2.0),
    )
    # mild outward corner displacement (warp_inv flavor)
    quad = jnp.asarray([[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]], jnp.float32)
    disp = (jax.random.uniform(ks[4], (4, 2)) - 0.5) * 0.12 * jnp.asarray([w, h])
    persp = W.perspective_from_quads(quad, quad + disp)
    return W.compose(persp, m)


# ---------------------------------------------------------------------------
# single-sample programs (vmapped below)
# ---------------------------------------------------------------------------


def make_cropped(card_img: jnp.ndarray, size_hw: tuple[int, int]) -> jnp.ndarray:
    """2% border crop + resize — the clean target y (encoder_datasets.py:733-755)."""
    h, w = card_img.shape[:2]
    border = math.ceil(max(0.02 * h, 0.02 * w))
    return I.remove_border_resized(card_img, border, size_hw)


def make_masked(card_img: jnp.ndarray) -> jnp.ndarray:
    """RGBA with rounded-rect alpha (encoder_datasets.py:755-773)."""
    mask = I.round_rect_mask(card_img.shape[:2], radius_ratio=0.05)
    return jnp.concatenate([card_img, mask[..., None]], axis=-1)


def make_bg(key, bg_img: jnp.ndarray, size_hw: tuple[int, int]) -> jnp.ndarray:
    """Augment then crop-to-cover (encoder_datasets.py:774-785) — one composed
    homography + one fused photometric pass."""
    kg, kp = jax.random.split(key)
    m = _bg_geom_matrix(kg, bg_img.shape[:2], size_hw)
    bg = W.warp_perspective(bg_img, m, size_hw)
    return A.fused_photometric(kp, bg, **_BG_PHOTO)


def make_virtual(
    key,
    card_img: jnp.ndarray,
    bg_img: jnp.ndarray,
    size_hw: tuple[int, int],
    half_upsidedown: bool = False,
    occ_img: jnp.ndarray | None = None,
    p_occlude: float = 0.0,
) -> jnp.ndarray:
    """Mask card → ONE composed warp into canvas → FG photometric → composite
    over warped+photometric BG → virtual photometric
    (encoder_datasets.py:786-814 semantics, single-resample design).

    ``occ_img``/``p_occlude``: with probability ``p_occlude`` another card is
    composited OVER the target, shifted to cover one side (~5-45% of the
    card, matching the scene generator's ``min_visible=0.5`` overlap regime,
    od_datasets.py:354-371). The reference's encoder never sees occlusion —
    and the measured e2e failure mode says so: detections >15% occluded score
    0.12 top-1 vs 0.81 clear (artifacts_r2/e2e_headline_details.jsonl). The
    target y stays the clean crop, so the encoder learns to embed the card
    UNDER the occluder."""
    kud, kg, kfp, kbg, kv, ko = jax.random.split(key, 6)
    if half_upsidedown:
        card_img = jnp.where(
            jax.random.bernoulli(kud), jnp.rot90(card_img, 2, (0, 1)), card_img
        )
    fg = make_masked(card_img)
    m = _fg_geom_matrix(kg, card_img.shape[:2], size_hw)
    fg = W.warp_perspective(fg, m, size_hw)
    fg = A.fused_photometric(kfp, fg, **_FG_PHOTO)
    bg = make_bg(kbg, bg_img, size_hw)
    virt = I.rgba_over_rgb(fg, bg)
    if occ_img is not None and p_occlude > 0.0:
        kth, ksh, ku, kfp2, kgate = jax.random.split(ko, 5)
        h, w = occ_img.shape[:2]
        # occluder pose: the target's own canvas pose composed with (a) a
        # free spin about the occluder's centre and (b) a shift along a
        # random direction big enough to leave 55-95% of the target visible
        theta = jax.random.uniform(kth, (), minval=0.0, maxval=2.0 * jnp.pi)
        ang = jax.random.uniform(ksh, (), minval=0.0, maxval=2.0 * jnp.pi)
        u = jax.random.uniform(ku, (), minval=0.55, maxval=0.95)
        dx = jnp.cos(ang) * w * u
        dy = jnp.sin(ang) * h * u
        spin = W.compose(
            W.translation_matrix_2d(w / 2.0, h / 2.0),
            W.rotation_matrix_2d(theta),
            W.translation_matrix_2d(-w / 2.0, -h / 2.0),
        )
        mo = W.compose(m, W.translation_matrix_2d(dx, dy), spin)
        occ = W.warp_perspective(make_masked(occ_img), mo, size_hw)
        occ = A.fused_photometric(kfp2, occ, **_FG_PHOTO)
        gate = jax.random.bernoulli(kgate, p_occlude)
        a = occ[..., 3:4] * gate
        virt = virt * (1.0 - a) + occ[..., :3] * a
    return A.fused_photometric(kv, virt, **_VRTL_PHOTO)


def make_virtual_pair(
    key,
    card_img: jnp.ndarray,
    bg_img: jnp.ndarray,
    x_size_hw: tuple[int, int],
    y_size_hw: tuple[int, int],
    half_upsidedown: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(x, y) training pair (encoder_datasets.py:815-834)."""
    x = make_virtual(key, card_img, bg_img, x_size_hw, half_upsidedown)
    y = make_cropped(card_img, y_size_hw)
    return x, y


# ---------------------------------------------------------------------------
# batched jitted programs
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("x_size_hw", "y_size_hw", "half_upsidedown", "p_occlude"),
)
def make_pair_batch(
    key,
    card_imgs: jnp.ndarray,  # (B, Hc, Wc, 3) clean card scans
    pair_imgs: jnp.ndarray,  # (B, Hc, Wc, 3) x2 source (same or similar card)
    bg0: jnp.ndarray,  # (B, Hb, Wb, 3)
    bg1: jnp.ndarray,  # (B, Hb, Wb, 3)
    target_is_input_mask: jnp.ndarray,  # (B,) bool — swap x for clean crop
    x_size_hw: tuple[int, int] = (192, 128),
    y_size_hw: tuple[int, int] = (192, 128),
    half_upsidedown: bool = False,
    occ_imgs: jnp.ndarray | None = None,  # (B, Hc, Wc, 3) occluder cards
    p_occlude: float = 0.0,
):
    """One fused device program: y, x, x2 for the whole batch."""
    b = card_imgs.shape[0]
    k1, k2 = jax.random.split(key)
    keys1 = jax.random.split(k1, b)
    keys2 = jax.random.split(k2, b)

    if occ_imgs is not None and p_occlude > 0.0:
        def one_x(k, card, bg, occ):
            return make_virtual(
                k, card, bg, x_size_hw, half_upsidedown, occ, p_occlude
            )

        x_virWar = jax.vmap(one_x)(keys1, card_imgs, bg0, occ_imgs)
    else:
        def one_x(k, card, bg):
            return make_virtual(k, card, bg, x_size_hw, half_upsidedown)

        x_virWar = jax.vmap(one_x)(keys1, card_imgs, bg0)
    y = jax.vmap(lambda c: make_cropped(c, y_size_hw))(card_imgs)
    x_clean = (
        y
        if x_size_hw == y_size_hw
        else jax.vmap(lambda c: make_cropped(c, x_size_hw))(card_imgs)
    )
    x = jnp.where(target_is_input_mask[:, None, None, None], x_clean, x_virWar)
    if occ_imgs is not None and p_occlude > 0.0:
        # second view gets its own occluder pairing (reversed batch) so the
        # two positives never share an occluder
        x2 = jax.vmap(one_x)(keys2, pair_imgs, bg1, occ_imgs[::-1])
    else:
        x2 = jax.vmap(one_x)(keys2, pair_imgs, bg1)
    return {"y": y, "x": x, "x2": x2}


@functools.partial(jax.jit, static_argnames=("size_hw",))
def make_cropped_batch(card_imgs: jnp.ndarray, size_hw: tuple[int, int] = (192, 128)):
    """Batched clean crops — the index-population input (qdrant_populate.py:84-90)."""
    return jax.vmap(lambda c: make_cropped(c, size_hw))(card_imgs)


@functools.partial(jax.jit, static_argnames=("size_hw", "half_upsidedown"))
def make_virtual_batch(
    key, card_imgs, bg_imgs, size_hw: tuple[int, int] = (192, 128),
    half_upsidedown: bool = False,
):
    keys = jax.random.split(key, card_imgs.shape[0])
    return jax.vmap(lambda k, c, b: make_virtual(k, c, b, size_hw, half_upsidedown))(
        keys, card_imgs, bg_imgs
    )


@functools.partial(
    jax.jit,
    static_argnames=("x_size_hw", "y_size_hw", "half_upsidedown", "p_occlude"),
)
def make_pair_batch_pooled(
    key,
    card_pool_u8: jnp.ndarray,  # (P, Hc, Wc, 3) uint8, device-resident
    bg_pool_u8: jnp.ndarray,  # (Q, Hb, Wb, 3) uint8, device-resident
    card_idx: jnp.ndarray,  # (B,) int32 slots into card pool
    pair_idx: jnp.ndarray,  # (B,) int32
    bg0_idx: jnp.ndarray,  # (B,) int32 slots into bg pool
    bg1_idx: jnp.ndarray,  # (B,) int32
    target_is_input_mask: jnp.ndarray,  # (B,) bool
    x_size_hw: tuple[int, int] = (192, 128),
    y_size_hw: tuple[int, int] = (192, 128),
    half_upsidedown: bool = False,
    occ_idx: jnp.ndarray | None = None,  # (B,) int32 occluder slots
    p_occlude: float = 0.0,
):
    """Pool-gather variant of :func:`make_pair_batch` — the production path.

    Host→device traffic per batch is just the index vectors (~1 KB); pixels
    live in HBM as uint8 (4× smaller than f32) and are fetched + converted
    on device. This is the TPU-first answer to the reference's per-sample CPU
    compositor (encoder_datasets.py:858 ~95 pairs/s): the tunnel/PCIe never
    sees an image. Row fetches use ops.gather.take_rows (dynamic `take` on
    big rows hits TPU gather pathology, ~20 ms/row).
    """
    from mtgvision_tpu.ops.gather import take_rows

    to_f32 = lambda u8: u8.astype(jnp.float32) / 255.0
    return make_pair_batch(
        key,
        to_f32(take_rows(card_pool_u8, card_idx)),
        to_f32(take_rows(card_pool_u8, pair_idx)),
        to_f32(take_rows(bg_pool_u8, bg0_idx)),
        to_f32(take_rows(bg_pool_u8, bg1_idx)),
        target_is_input_mask,
        x_size_hw=x_size_hw,
        y_size_hw=y_size_hw,
        half_upsidedown=half_upsidedown,
        occ_imgs=(
            to_f32(take_rows(card_pool_u8, occ_idx)) if occ_idx is not None else None
        ),
        p_occlude=p_occlude,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "batch_size", "x_size_hw", "y_size_hw", "half_upsidedown",
        "similar_neg_prob", "target_is_input_prob", "p_occlude",
    ),
)
def make_pair_batch_sampled(
    key,
    card_pool_u8: jnp.ndarray,  # (P, Hc, Wc, 3) uint8
    bg_pool_u8: jnp.ndarray,  # (Q, Hb, Wb, 3) uint8
    slot_labels: jnp.ndarray,  # (P, 3) int32 [card, name, set]
    similar_table: jnp.ndarray,  # (P,) int32 — same-name other slot (or self)
    batch_size: int = 64,
    similar_neg_prob: float = 0.2,
    target_is_input_prob: float = 0.05,
    x_size_hw: tuple[int, int] = (192, 128),
    y_size_hw: tuple[int, int] = (192, 128),
    half_upsidedown: bool = False,
    p_occlude: float = 0.0,
):
    """Fully device-side batch sampling + generation: ONE scalar key in,
    whole training batch out. Eliminates all per-step host→device index
    traffic (critical when dispatch latency is high — e.g. tunneled TPUs;
    on-device randint/bernoulli replace the host RNG draws of
    encoder_train.py:189-230)."""
    kc, ks, kb0, kb1, kt, kgen, kocc = jax.random.split(key, 7)
    p = card_pool_u8.shape[0]
    q = bg_pool_u8.shape[0]
    card_idx = jax.random.randint(kc, (batch_size,), 0, p)
    use_sim = jax.random.bernoulli(ks, similar_neg_prob, (batch_size,))
    pair_idx = jnp.where(use_sim, similar_table[card_idx], card_idx)
    bg0 = jax.random.randint(kb0, (batch_size,), 0, q)
    bg1 = jax.random.randint(kb1, (batch_size,), 0, q)
    t_mask = jax.random.bernoulli(kt, target_is_input_prob, (batch_size,))
    occ_idx = (
        jax.random.randint(kocc, (batch_size,), 0, p) if p_occlude > 0.0 else None
    )
    out = make_pair_batch_pooled(
        kgen, card_pool_u8, bg_pool_u8, card_idx, pair_idx, bg0, bg1, t_mask,
        x_size_hw=x_size_hw, y_size_hw=y_size_hw, half_upsidedown=half_upsidedown,
        occ_idx=occ_idx, p_occlude=p_occlude,
    )
    out["x_labels"] = slot_labels[card_idx]
    out["x2_labels"] = slot_labels[pair_idx]
    return out


class DeviceCardPool:
    """HBM-resident uint8 card library with host-side label/name indexes.

    Holds up to ``pool_size`` catalog cards on device; ``refresh`` swaps a
    chunk of slots for freshly sampled cards (round-robin) so arbitrarily
    large catalogs stream through a bounded HBM footprint.
    """

    def __init__(self, catalog: CardCatalog, pool_size: int, rng: np.random.Generator):
        self.catalog = catalog
        n = len(catalog)
        self.pool_size = min(pool_size, n)
        # initial fill: a random permutation prefix (whole catalog if it fits)
        self._slot_card = list(rng.permutation(n)[: self.pool_size])
        imgs = np.stack(
            [
                np.asarray(catalog.get_image(catalog.card_by_index(int(i))) * 255, np.uint8)
                for i in self._slot_card
            ]
        )
        self.images = jnp.asarray(imgs)  # (P, Hc, Wc, 3) uint8 on device
        self._rebuild_indexes()
        self._refresh_cursor = 0

    def _rebuild_indexes(self):
        self.slot_labels = np.asarray(
            [
                self.catalog.card_get_labels(self.catalog.card_by_index(int(i)))
                for i in self._slot_card
            ],
            np.int32,
        )
        self._name_slots: dict[int, list[int]] = {}
        for s, lab in enumerate(self.slot_labels):
            self._name_slots.setdefault(int(lab[1]), []).append(s)
        # device-side sampling tables: labels + a random same-name partner per
        # slot (self when the name has a single pooled printing)
        rng = np.random.default_rng(len(self._slot_card))
        table = np.arange(self.pool_size, dtype=np.int32)
        for s in range(self.pool_size):
            cands = [c for c in self._name_slots[int(self.slot_labels[s][1])] if c != s]
            if cands:
                table[s] = cands[int(rng.integers(len(cands)))]
        self.similar_table = jnp.asarray(table)
        self.slot_labels_dev = jnp.asarray(self.slot_labels)

    def card_at(self, slot: int):
        return self.catalog.card_by_index(int(self._slot_card[slot]))

    def similar_slot(self, slot: int, rng: np.random.Generator) -> int:
        """Another pool slot with the same card *name* (hard negative), or the
        same slot if no other printing is pooled (encoder_datasets.py:619-630)."""
        cands = self._name_slots.get(int(self.slot_labels[slot][1]), [slot])
        if len(cands) <= 1:
            return slot
        pick = slot
        while pick == slot:
            pick = cands[int(rng.integers(len(cands)))]
        return pick

    def refresh(self, rng: np.random.Generator, chunk: int):
        """Swap ``chunk`` round-robin slots for fresh random catalog cards."""
        n = len(self.catalog)
        if self.pool_size >= n or chunk <= 0:
            return
        slots = [(self._refresh_cursor + i) % self.pool_size for i in range(chunk)]
        self._refresh_cursor = (self._refresh_cursor + chunk) % self.pool_size
        new_cards = rng.integers(0, n, len(slots))
        imgs = np.stack(
            [
                np.asarray(
                    self.catalog.get_image(self.catalog.card_by_index(int(i))) * 255,
                    np.uint8,
                )
                for i in new_cards
            ]
        )
        self.images = self.images.at[jnp.asarray(slots)].set(jnp.asarray(imgs))
        for s, c in zip(slots, new_cards):
            self._slot_card[s] = int(c)
        self._rebuild_indexes()


class DeviceBgPool:
    """HBM-resident uint8 background pool."""

    def __init__(self, backgrounds: Backgrounds, pool_size: int, rng: np.random.Generator):
        imgs = np.stack(
            [
                np.asarray(backgrounds.ran_image(rng) * 255, np.uint8)
                for _ in range(pool_size)
            ]
        )
        self.images = jnp.asarray(imgs)
        self.pool_size = pool_size


# ---------------------------------------------------------------------------
# host-side dataset (encoder_train.py:90-250)
# ---------------------------------------------------------------------------


class EncoderDataset:
    """Infinite random pair batches; API parity with RanMtgEncDecDataset.

    Batch dict keys: y, x, x_labels, x2, x2_labels (BatchHintNumpy,
    encoder_train.py:74-88). Labels (B, 3) int32 [card, name, set].
    """

    def __init__(
        self,
        catalog: CardCatalog,
        backgrounds: Backgrounds,
        default_batch_size: int = 64,
        *,
        paired: bool = True,
        targets: bool = True,
        x_size_hw: tuple[int, int] = (192, 128),
        y_size_hw: tuple[int, int] = (192, 128),
        half_upsidedown: bool = False,
        target_is_input_prob: float = 0.05,
        similar_neg_prob: float = 0.2,
        seed: int = 0,
        cache_images: bool = True,
        use_device_pool: bool = True,
        device_sampling: bool = True,
        pool_size: int = 4096,
        bg_pool_size: int = 256,
        pool_refresh_per_batch: int = 0,
        p_occlude: float = 0.0,
    ):
        self.catalog = catalog
        self.backgrounds = backgrounds
        self.default_batch_size = default_batch_size
        self.paired = paired
        self.targets = targets
        self.x_size_hw = tuple(x_size_hw)
        self.y_size_hw = tuple(y_size_hw)
        self.half_upsidedown = half_upsidedown
        self.target_is_input_prob = target_is_input_prob
        self.similar_neg_prob = similar_neg_prob
        self.p_occlude = p_occlude
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self._img_cache: Optional[dict] = {} if cache_images else None
        self.use_device_pool = use_device_pool
        self.device_sampling = device_sampling
        self.pool_refresh_per_batch = pool_refresh_per_batch
        self._card_pool: Optional[DeviceCardPool] = None
        self._bg_pool: Optional[DeviceBgPool] = None
        self._pool_size = pool_size
        self._bg_pool_size = bg_pool_size

    def _pools(self):
        if self._card_pool is None:
            self._card_pool = DeviceCardPool(self.catalog, self._pool_size, self.rng)
            self._bg_pool = DeviceBgPool(self.backgrounds, self._bg_pool_size, self.rng)
        return self._card_pool, self._bg_pool

    def _card_image(self, card) -> np.ndarray:
        if self._img_cache is not None:
            im = self._img_cache.get(card.id)
            if im is None:
                im = self.catalog.get_image(card)
                self._img_cache[card.id] = im
            return im
        return self.catalog.get_image(card)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def __iter__(self):
        while True:
            yield self.random_batch()

    def random_batch(self, n: int | None = None) -> dict:
        n = n or self.default_batch_size
        if self.use_device_pool:
            return self._random_batch_pooled(n)
        cards = [self.catalog.ran_card(self.rng) for _ in range(n)]
        return self.batch_for_cards(cards)

    def _random_batch_pooled(self, n: int) -> dict:
        """Production path: device-side sampling — only a PRNG key crosses
        the host/device boundary per batch."""
        pool, bgp = self._pools()
        if self.pool_refresh_per_batch:
            pool.refresh(self.rng, self.pool_refresh_per_batch)
        if self.device_sampling:
            out = make_pair_batch_sampled(
                self._next_key(),
                pool.images,
                bgp.images,
                pool.slot_labels_dev,
                pool.similar_table,
                batch_size=n,
                similar_neg_prob=self.similar_neg_prob if self.paired else 0.0,
                target_is_input_prob=self.target_is_input_prob,
                x_size_hw=self.x_size_hw,
                y_size_hw=self.y_size_hw,
                half_upsidedown=self.half_upsidedown,
                p_occlude=self.p_occlude,
            )
            batch = {"x": out["x"], "x_labels": out["x_labels"]}
            if self.targets:
                batch["y"] = out["y"]
            if self.paired:
                batch["x2"] = out["x2"]
                batch["x2_labels"] = out["x2_labels"]
            return batch
        card_idx = self.rng.integers(0, pool.pool_size, n)
        pair_idx = np.asarray(
            [
                pool.similar_slot(int(s), self.rng)
                if (self.paired and self.rng.random() < self.similar_neg_prob)
                else int(s)
                for s in card_idx
            ],
            np.int32,
        )
        bg0 = self.rng.integers(0, bgp.pool_size, n)
        bg1 = self.rng.integers(0, bgp.pool_size, n)
        t_mask = self.rng.random(n) < self.target_is_input_prob
        occ_idx = (
            jnp.asarray(self.rng.integers(0, pool.pool_size, n), jnp.int32)
            if self.p_occlude > 0.0
            else None
        )
        out = make_pair_batch_pooled(
            self._next_key(),
            pool.images,
            bgp.images,
            jnp.asarray(card_idx, jnp.int32),
            jnp.asarray(pair_idx, jnp.int32),
            jnp.asarray(bg0, jnp.int32),
            jnp.asarray(bg1, jnp.int32),
            jnp.asarray(t_mask),
            x_size_hw=self.x_size_hw,
            y_size_hw=self.y_size_hw,
            half_upsidedown=self.half_upsidedown,
            occ_idx=occ_idx,
            p_occlude=self.p_occlude,
        )
        batch = {"x": out["x"], "x_labels": pool.slot_labels[card_idx]}
        if self.targets:
            batch["y"] = out["y"]
        if self.paired:
            batch["x2"] = out["x2"]
            batch["x2_labels"] = pool.slot_labels[pair_idx]
        return batch

    def image_batch_by_ids(
        self, ids, *, force_target_input: bool = False, force_similar_neg: bool = False
    ) -> dict:
        """Deterministic vis batches (encoder_train.py:122-140)."""
        if isinstance(ids, str):
            ids = [ids]
        cards = [self.catalog.get_card_by_id(i) for i in ids]
        return self.batch_for_cards(
            cards,
            target_in_prob=1.0 if force_target_input else 0.0,
            similar_neg_prob=1.0 if force_similar_neg else 0.0,
        )

    def batch_for_cards(
        self,
        cards,
        target_in_prob: float | None = None,
        similar_neg_prob: float | None = None,
    ) -> dict:
        n = len(cards)
        t_prob = self.target_is_input_prob if target_in_prob is None else target_in_prob
        s_prob = self.similar_neg_prob if similar_neg_prob is None else similar_neg_prob

        card_imgs = np.stack([self._card_image(c) for c in cards])
        x_labels = np.asarray(
            [self.catalog.card_get_labels(c) for c in cards], np.int32
        )

        # x2 source: same card, or a similar (same-name) negative with prob s
        pair_cards = []
        for c in cards:
            if self.paired and self.rng.random() < s_prob:
                pair_cards.append(self.catalog.get_similar_card(c, self.rng))
            else:
                pair_cards.append(c)
        pair_imgs = np.stack([self._card_image(c) for c in pair_cards])
        x2_labels = np.asarray(
            [self.catalog.card_get_labels(c) for c in pair_cards], np.int32
        )

        bg0 = np.stack([self.backgrounds.ran_image(self.rng) for _ in range(n)])
        bg1 = np.stack([self.backgrounds.ran_image(self.rng) for _ in range(n)])
        t_mask = self.rng.random(n) < t_prob

        out = make_pair_batch(
            self._next_key(),
            jnp.asarray(card_imgs),
            jnp.asarray(pair_imgs),
            jnp.asarray(bg0),
            jnp.asarray(bg1),
            jnp.asarray(t_mask),
            x_size_hw=self.x_size_hw,
            y_size_hw=self.y_size_hw,
            half_upsidedown=self.half_upsidedown,
        )
        batch = {"x": out["x"], "x_labels": x_labels}
        if self.targets:
            batch["y"] = out["y"]
        if self.paired:
            batch["x2"] = out["x2"]
            batch["x2_labels"] = x2_labels
        return batch

    @classmethod
    def from_config(cls, config, catalog: CardCatalog, backgrounds: Backgrounds):
        """Mirror of RanMtgEncDecDataset.from_hparams (encoder_train.py:235-249)."""
        return cls(
            catalog,
            backgrounds,
            default_batch_size=config.batch_size,
            paired=bool(config.loss_contrastive or config.loss_set_contrastive),
            targets=bool(config.loss_recon),
            x_size_hw=config.x_size_hw,
            y_size_hw=config.y_size_hw,
            target_is_input_prob=config.target_is_input_prob,
            similar_neg_prob=config.similar_neg_prob,
            seed=config.seed,
            p_occlude=getattr(config, "p_occlude", 0.0),
        )
