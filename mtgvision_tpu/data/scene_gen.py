"""Detector synthetic scene generation (multi-card compositor).

Rebuild of mtgvision/od_datasets.py:
- card sample construction with orientation-notch seg polygons / obb keypoint
  boxes (:218-282),
- rejection-sampled placement with visibility/overlap/containment tests
  (:287-377) — host-side numpy with in-repo polygon clipping
  (ops/polygon.py) instead of shapely/GEOS,
- albumentations-style bg/card photometric pipelines (:420-512) rebuilt from
  the jittable aug kernels (ops/augment.py + Maybe/ApplySome combinators),
- scene assembly with reverse-order painting (:520-611),
- the ``Gen`` generator facade (:619-729) and the YOLO dataset writer
  (:732-832).

TPU-first split: placement (data-dependent control flow, tiny math) stays on
host; ALL pixel work — bg cover-rotate, bg/card augs, K-card warp+mask+
composite, post augs — is one jitted device program with a fixed card-slot
count and validity mask (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools
import math
import pathlib
from functools import partial
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mtgvision_tpu.data.catalog import Backgrounds, CardCatalog
from mtgvision_tpu.ops import augment as A
from mtgvision_tpu.ops import image as I
from mtgvision_tpu.ops import warp as W
from mtgvision_tpu.ops.polygon import (
    poly_area,
    poly_contains,
    poly_intersection_area,
)
from mtgvision_tpu.utils.random import ApplyChoice, ApplySome, Maybe  # noqa: F401  (re-exported: combinator pipelines remain API for user augs)

MAX_CARDS = 10  # num_cards_max (od_datasets.py:527)


# ---------------------------------------------------------------------------
# card keypoint geometry (od_datasets.py:218-282)
# ---------------------------------------------------------------------------


def seg_notch_polygon(card_hw: tuple[int, int]) -> np.ndarray:
    """Card rect minus a bottom-center notch — the orientation cutout
    (od_datasets.py:258-268). The shapely difference of rect(0,0,w,h) and
    rect(.4w,.5h,.6w,1.1h) is this fixed 8-gon, written out analytically."""
    h, w = card_hw
    return np.asarray(
        [
            (0.0, 0.0),
            (w, 0.0),
            (w, h),
            (0.6 * w, h),
            (0.6 * w, 0.5 * h),
            (0.4 * w, 0.5 * h),
            (0.4 * w, h),
            (0.0, h),
        ],
        np.float64,
    )


def obb_keypoints(card_hw: tuple[int, int], margin_ratio: float = 0.03, size_ratio: float = 0.5):
    """3 keypoint boxes: card / top region / bottom region (od_datasets.py:244-256)."""
    h, w = card_hw
    m = margin_ratio * max(w, h)
    r = size_ratio

    def box(l, t, rr, b, ml=0.0, mr=0.0, mt=0.0, mb=0.0):
        return [(l + ml, t + mt), (rr - mr, t + mt), (rr - mr, b - mb), (l + ml, b - mb)]

    return np.asarray(
        [
            box(0, 0, w, h),
            box(0, 0, w, r * h, ml=m, mr=m, mt=m, mb=0.5 * m),
            box(0, (1 - r) * h, w, h, ml=m, mr=m, mt=0.5 * m, mb=m),
        ],
        np.float64,
    )


def card_bbox(card_hw: tuple[int, int]) -> np.ndarray:
    h, w = card_hw
    return np.asarray([(0, 0), (w, 0), (w, h), (0, h)], np.float64)


# ---------------------------------------------------------------------------
# host placement (od_datasets.py:287-377)
# ---------------------------------------------------------------------------


def corner_jitter(rng: np.random.Generator, pts: np.ndarray, jitter_ratio: float) -> np.ndarray:
    """Radial corner jitter about the centroid (od_datasets.py:29-48)."""
    center = pts.mean(0)
    rel = pts - center
    deltas = np.linalg.norm(rel, axis=-1)
    deltas = deltas * rng.uniform(1 - jitter_ratio, 1 + jitter_ratio, len(pts))
    ang = np.arctan2(rel[:, 1], rel[:, 0])
    return np.stack([center[0] + deltas * np.cos(ang), center[1] + deltas * np.sin(ang)], -1)


def _perspective_np(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """4-point homography, host numpy (same DLT as ops.warp.perspective_from_quads)."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    z, o = np.zeros(4), np.ones(4)
    ru = np.stack([x, y, o, z, z, z, -u * x, -u * y], -1)
    rv = np.stack([z, z, z, x, y, o, -v * x, -v * y], -1)
    a = np.concatenate([ru, rv], 0)
    b = np.concatenate([u, v])[:, None]
    hcoef = np.linalg.solve(a, b)[:, 0]
    return np.concatenate([hcoef, [1.0]]).reshape(3, 3)


def apply_m(pts: np.ndarray, m: np.ndarray) -> np.ndarray:
    ones = np.ones((*pts.shape[:-1], 1))
    p = np.concatenate([pts, ones], -1) @ m.T
    return p[..., :2] / p[..., 2:3]


def place_card(
    rng: np.random.Generator,
    card_hw: tuple[int, int],
    bg_hw: tuple[int, int],
    existing: list[np.ndarray],
    *,
    min_area_ratio: float = 0.02,
    max_area_ratio: float = 0.9,
    size_sample_mode: Literal["uniform", "log_uniform"] = "log_uniform",
    min_visible: float = 0.5,
    min_visible_edge: float = 1.0,
    no_contains: bool = True,
    jitter_ratio: float = 0.3,
    max_attempts: int = 10,
    use_native: bool = True,
) -> Optional[np.ndarray]:
    """Rejection-sample a placement homography or give up (od_datasets.py:287-377).

    Dispatches to the native C++ sampler (native/mtgv_place.cpp, ~µs per
    attempt) when built; the numpy path below is the reference
    implementation/fallback. Tests per attempt:
    - visible fraction inside the frame ≥ min_visible_edge,
    - vs every placed card: both diff-area ratios ≥ min_visible,
    - no full containment either way.
    """
    if use_native:
        from mtgvision_tpu.utils import native as _n

        m = _n.place_card_native(
            rng, card_hw, bg_hw, existing,
            min_area_ratio=min_area_ratio, max_area_ratio=max_area_ratio,
            size_sample_mode=size_sample_mode, min_visible=min_visible,
            min_visible_edge=min_visible_edge, no_contains=no_contains,
            jitter_ratio=jitter_ratio, max_attempts=max_attempts,
        )
        if _n.HAVE_NATIVE:
            return m  # None = native sampler gave up (same contract)
    bh, bw = bg_hw
    ch, cw = card_hw
    diag = math.hypot(ch, cw)
    min_visible_edge = max(min_visible, min_visible_edge)
    frame = np.asarray([(0, 0), (bw, 0), (bw, bh), (0, bh)], np.float64)

    for _ in range(max_attempts):
        deg = rng.uniform(0, 360)
        min_area, max_area = bh * bw * min_area_ratio, bh * bw * max_area_ratio
        if size_sample_mode == "log_uniform":
            area = math.exp(rng.uniform(math.log(min_area), math.log(max_area)))
        else:
            area = rng.uniform(min_area, max_area)
        scale = area / (ch * cw)
        # center-proposal bounds from the SCALED card footprint (+ jitter
        # slack). The reference (od_datasets.py:321) pads by the NATIVE card
        # diagonal — with large native card images that confines centers to
        # the middle of the frame (448x320 cards at 640: a 90x90 box) and
        # cannot place at all once the native diagonal exceeds the frame
        # (every 320px scene trained with zero cards). The exact visibility
        # test below is the authority either way; this only fixes the
        # proposal distribution.
        sdiag = diag * scale * (1.0 + jitter_ratio)
        pad = int(sdiag // 2)
        ovr = int(sdiag * (1 - min_visible_edge))
        lo_x, hi_x = pad - ovr, bw - pad + ovr
        lo_y, hi_y = pad - ovr, bh - pad + ovr
        if hi_x <= lo_x or hi_y <= lo_y:
            continue
        cx = rng.integers(lo_x, hi_x)
        cy = rng.integers(lo_y, hi_y)

        src = card_bbox(card_hw)
        dst = corner_jitter(rng, src.copy(), jitter_ratio)
        th = math.radians(deg)
        rot = np.asarray([[math.cos(th), math.sin(th)], [-math.sin(th), math.cos(th)]])
        ctr = np.asarray([cw / 2, ch / 2])
        dst = (dst - ctr) @ rot.T * scale + ctr * scale
        dst = dst + np.asarray([cx, cy]) - ctr * scale
        m = _perspective_np(src, dst)

        quad = apply_m(src, m)
        qa = poly_area(quad)
        if qa <= 1:
            continue
        visible_poly = quad  # clip against frame
        vis_area = poly_intersection_area(quad, frame)
        if vis_area / qa < min_visible_edge:
            continue
        ok = True
        for p in existing:
            inter = poly_intersection_area(quad, _hullify(p))
            pa = poly_area(p)
            if (vis_area - inter) / qa < min_visible:
                ok = False
                break
            if (pa - poly_intersection_area(p, _hullify(quad))) / max(pa, 1e-9) < min_visible:
                ok = False
                break
            if no_contains and (
                poly_contains(_hullify(p), quad) or poly_contains(_hullify(quad), p)
            ):
                ok = False
                break
        if ok:
            return m
    return None


def _hullify(p: np.ndarray) -> np.ndarray:
    """Jittered quads can go slightly concave; clip against their hull."""
    from mtgvision_tpu.ops.polygon import convex_hull

    return convex_hull(p)


def cover_rotate_matrix(
    rng: np.random.Generator, in_hw: tuple[int, int], out_hw: tuple[int, int]
) -> np.ndarray:
    """Random-rotation cover transform for the background
    (od_datasets.py:85-118 'cover' mode + :195-215 make_background)."""
    h, w = in_hw
    oh, ow = out_hw
    deg = rng.uniform(0, 360)
    scale = math.hypot(oh / max(ow, oh), ow / max(ow, oh)) * max(oh, ow) / min(h, w)
    th = math.radians(deg)
    c, s = math.cos(th), math.sin(th)
    m0 = np.asarray([[c * scale, s * scale, 0], [-s * scale, c * scale, 0], [0, 0, 1.0]])
    # rotate about input center then move to output center
    t0 = np.asarray([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1.0]])
    t1 = np.asarray([[1, 0, ow / 2], [0, 1, oh / 2], [0, 0, 1.0]])
    return t1 @ m0 @ t0


# ---------------------------------------------------------------------------
# device pipelines (od_datasets.py:420-512 rebuilt on ops.augment)
# ---------------------------------------------------------------------------

# Each pipeline is ONE branchless pass (ops/augment.fused_photometric): a
# choice/shuffle combinator tree looks like the reference's albumentations
# stack (od_datasets.py:420-512) but under vmap EVERY branch executes for the
# whole batch — measured 2.4 s per 16×640² batch vs ~ms fused. Same effect
# family and magnitudes; only the mixture weights differ.
BG_LIGHT = partial(
    A.fused_photometric,
    p_brightness=0.5, brightness=0.4, contrast=0.4,
    p_hsv=0.0,
    p_noise=0.2, noise_sigma=0.05,
    p_sp=0.0,
    p_blur=0.2, blur_sigma=1.5,
    p_erase=0.4,
)

BG_HEAVY = partial(
    A.fused_photometric,
    p_brightness=0.5, brightness=0.4, contrast=0.5,
    p_hsv=0.5,
    p_noise=0.5, noise_sigma=0.1,
    p_sp=0.15, sp_amount=0.02,
    p_blur=0.5, blur_sigma=2.5,
)

CARD_AUG = partial(
    A.fused_photometric,
    p_brightness=0.8, brightness=0.2, contrast=0.4,
    p_hsv=0.8, hue_deg=15.0, sat=0.25, val=0.2,
    p_noise=0.0, p_sp=0.0, p_blur=0.0,
    p_erase=0.3,
)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def compose_scene(
    key,
    bg_img: jnp.ndarray,  # (Hb, Wb, 3) raw background
    bg_m: jnp.ndarray,  # (3,3) cover-rotate transform
    cards: jnp.ndarray,  # (K, Hc, Wc, 3)
    card_ms: jnp.ndarray,  # (K, 3, 3) placement homographies
    valid: jnp.ndarray,  # (K,) bool
    out_hw: tuple[int, int] = (640, 640),
):
    """One fused device program: bg warp+augs, per-card augs, reverse-order
    masked painting, post augs (od_datasets.py:520-611)."""
    k_bg1, k_cards, k_paint, k_bg2 = jax.random.split(key, 4)
    k = cards.shape[0]

    bg = W.warp_perspective(bg_img, bg_m, out_hw)
    bg = BG_LIGHT(k_bg1, bg)

    card_keys = jax.random.split(k_cards, k)
    cards = jax.vmap(CARD_AUG)(card_keys, cards)

    mask = I.round_rect_mask(cards.shape[1:3], radius_ratio=0.046)
    rgba = jnp.concatenate(
        [cards, jnp.broadcast_to(mask[None, :, :, None], (k, *mask.shape, 1))], -1
    )

    # reverse-order painting: later-placed cards go on top → paint first-placed last?
    # (reference paints in REVERSE list order so later cards end up underneath
    # earlier... see od_datasets.py:589-601: reversed(zip) → later cards painted
    # first, earlier cards painted after → earlier ON TOP.)
    canvas = bg
    for i in range(k - 1, -1, -1):
        warped = W.warp_perspective(rgba[i], card_ms[i], out_hw)
        a = warped[..., 3:4] * valid[i]
        canvas = canvas * (1.0 - a) + warped[..., :3] * a

    canvas = BG_HEAVY(k_bg2, jnp.clip(canvas, 0.0, 1.0))
    return canvas


# ---------------------------------------------------------------------------
# generator facade (od_datasets.py:619-729)
# ---------------------------------------------------------------------------


class SceneGenerator:
    """``Gen`` equivalent: random synthetic detector scenes with labels."""

    def __init__(
        self,
        catalog: CardCatalog,
        backgrounds: Backgrounds,
        *,
        bg_size_hw: tuple[int, int] = (640, 640),
        num_cards_min: int = 1,
        num_cards_max: int = MAX_CARDS,
        kind: Literal["obb", "seg"] = "seg",
        ratio_bg: float = 0.0,
        seed: int = 0,
        card_min_area_ratio: float = 0.02,
        card_max_area_ratio: float = 0.9,
        card_jitter_ratio: float = 0.3,
        # min fraction of the card that must stay inside the frame; clamped
        # up to min_visible (0.5) by place_card like the reference
        # (od_datasets.py:313-315). The reference's ACTIVE seg config trains
        # with edges=0.0 → effective 0.5 (od_datasets.py:861-866): cards may
        # hang half off-frame.
        card_min_visible_edge: float = 1.0,
    ):
        self.catalog = catalog
        self.backgrounds = backgrounds
        self.bg_size_hw = tuple(bg_size_hw)
        self.num_cards_min = num_cards_min
        self.num_cards_max = min(num_cards_max, MAX_CARDS)
        self.kind = kind
        self.ratio_bg = ratio_bg
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.card_min_area_ratio = card_min_area_ratio
        self.card_max_area_ratio = card_max_area_ratio
        self.card_jitter_ratio = card_jitter_ratio
        self.card_min_visible_edge = card_min_visible_edge

    @property
    def class_names(self) -> list[str]:
        return ["card"] if self.kind == "seg" else ["card", "card_top", "card_bottom"]

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def random(self, return_cards: bool = False) -> dict:
        """One scene: {image (H,W,3) f32, keypoints [(Ni,2)…], keypoints_labels}.

        ``return_cards=True`` adds ``"cards"``: the placed [(card, M), …]
        pairs — the GT hook used by eval (eval/e2e_eval._scene_with_gt), kept
        inside random() so eval scenes consume the exact same RNG stream and
        placement logic as training scenes."""
        card_hw = self.catalog.card_hw
        bg_hw = self.bg_size_hw
        n_cards = (
            0
            if self.rng.random() < self.ratio_bg
            else int(self.rng.integers(self.num_cards_min, self.num_cards_max + 1))
        )

        # host: placement
        ms, polys, cards_np, card_objs = [], [], [], []
        for _ in range(n_cards):
            m = place_card(
                self.rng,
                card_hw,
                bg_hw,
                polys,
                min_area_ratio=self.card_min_area_ratio,
                max_area_ratio=self.card_max_area_ratio,
                jitter_ratio=self.card_jitter_ratio,
                min_visible_edge=self.card_min_visible_edge,
            )
            if m is None:
                continue
            card = self.catalog.ran_card(self.rng)
            cards_np.append(self.catalog.get_image(card))
            card_objs.append(card)
            ms.append(m)
            polys.append(apply_m(card_bbox(card_hw), m))

        k = len(ms)
        cards_arr = np.zeros((MAX_CARDS, *card_hw, 3), np.float32)
        ms_arr = np.tile(np.eye(3, dtype=np.float32), (MAX_CARDS, 1, 1))
        valid = np.zeros(MAX_CARDS, np.float32)
        for i in range(k):
            cards_arr[i] = cards_np[i]
            ms_arr[i] = ms[i]
            valid[i] = 1.0

        bg = self.backgrounds.ran_image(self.rng)
        bg_m = cover_rotate_matrix(self.rng, bg.shape[:2], bg_hw).astype(np.float32)

        img = compose_scene(
            self._next_key(),
            jnp.asarray(bg),
            jnp.asarray(bg_m),
            jnp.asarray(cards_arr),
            jnp.asarray(ms_arr),
            jnp.asarray(valid),
            out_hw=bg_hw,
        )

        # labels: warped keypoints per placed card (paint order = list order,
        # earlier cards on top — labels keep list order like the reference)
        kps, kls = [], []
        base = (
            [seg_notch_polygon(card_hw)]
            if self.kind == "seg"
            else list(obb_keypoints(card_hw))
        )
        for m in ms:
            for ci, pts in enumerate(base):
                kps.append(apply_m(pts, m).astype(np.float32))
                kls.append(ci)
        out = {
            "image": np.asarray(img),
            "keypoints": kps,
            "keypoints_labels": np.asarray(kls, np.int64),
        }
        if return_cards:
            out["cards"] = list(zip(card_objs, ms))
        return out


def create_yolo_dataset(
    gen: SceneGenerator,
    out_dir: str | pathlib.Path,
    num_train: int = 100,
    num_val: int = 10,
) -> pathlib.Path:
    """Write a YOLO-format polygon dataset + data.yaml
    (od_datasets.py:732-832: images/*.png + labels/*.txt with normalized
    polygon rows `cls x0 y0 x1 y1 …`)."""
    from PIL import Image

    out = pathlib.Path(out_dir)
    h, w = gen.bg_size_hw
    for split, n in (("train", num_train), ("val", num_val)):
        (out / "images" / split).mkdir(parents=True, exist_ok=True)
        (out / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            s = gen.random()
            img = (np.clip(s["image"], 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img).save(out / "images" / split / f"{i:06d}.png")
            lines = []
            for pts, cls in zip(s["keypoints"], s["keypoints_labels"]):
                norm = np.clip(pts / np.asarray([w, h]), 0.0, 1.0).reshape(-1)
                lines.append(
                    str(int(cls)) + " " + " ".join(f"{v:.6f}" for v in norm)
                )
            (out / "labels" / split / f"{i:06d}.txt").write_text("\n".join(lines))
    names = "\n".join(f"  {i}: {n}" for i, n in enumerate(gen.class_names))
    (out / "data.yaml").write_text(
        f"path: {out.resolve()}\ntrain: images/train\nval: images/val\nnames:\n{names}\n"
    )
    return out / "data.yaml"
