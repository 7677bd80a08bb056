"""Orientation recovery golden tests: render a notched card mask at known
pose, recover corners, compare to ground truth (SURVEY.md §4 strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.data.scene_gen import _perspective_np, apply_m, seg_notch_polygon
from mtgvision_tpu.infer.orient import extract_dewarped, orient_batch, orient_corners


def render_notched_mask(hw, corners_dst):
    """Rasterize the notched card polygon warped so the card rect (120×84)
    lands on ``corners_dst`` [TL,TR,BR,BL]."""
    ch, cw = 120, 84
    src = np.asarray([(0, 0), (cw, 0), (cw, ch), (0, ch)], float)
    m = _perspective_np(src, np.asarray(corners_dst, float))
    poly = apply_m(seg_notch_polygon((ch, cw)), m)
    # point-in-polygon rasterization (winding via ray casting, numpy)
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w]
    pts = np.stack([xx.ravel() + 0.5, yy.ravel() + 0.5], 1)
    inside = np.zeros(len(pts), bool)
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        cond = (a[1] <= pts[:, 1]) != (b[1] <= pts[:, 1])
        xint = a[0] + (pts[:, 1] - a[1]) / (b[1] - a[1] + 1e-12) * (b[0] - a[0])
        inside ^= cond & (pts[:, 0] < xint)
    return inside.reshape(h, w).astype(np.float32)


ANGLES = [0, 37, 90, 142, 180, 251, 303]


@pytest.mark.parametrize("deg", ANGLES)
def test_orient_recovers_rotation(deg):
    """Card rotated by ``deg`` — recovered corners must match ground truth
    within a few pixels, with correct TL assignment (orientation-aware)."""
    th = np.radians(deg)
    rot = np.asarray([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    ch, cw = 120, 84
    base = np.asarray([(0, 0), (cw, 0), (cw, ch), (0, ch)], float) - (cw / 2, ch / 2)
    dst = base @ rot.T * 0.9 + 100.0  # centered in a 200×200 mask
    mask = render_notched_mask((200, 200), dst)
    corners, ok = orient_corners(jnp.asarray(mask))
    assert bool(ok)
    err = np.linalg.norm(np.asarray(corners) - dst, axis=1)
    assert err.max() < 6.0, f"deg={deg}: err={err}, got={np.asarray(corners)}, want={dst}"


def test_orient_perspective_quad():
    """Non-affine quad (perspective) still recovers the right corners."""
    dst = np.asarray([(60, 40), (150, 55), (140, 170), (45, 160)], float)
    mask = render_notched_mask((200, 200), dst)
    corners, ok = orient_corners(jnp.asarray(mask))
    assert bool(ok)
    err = np.linalg.norm(np.asarray(corners) - dst, axis=1)
    assert err.max() < 8.0, err


@pytest.mark.parametrize("deg", [0, 37, 142, 251])
def test_refine_corners_beats_coarse(deg):
    """Line-fit refinement must improve (or match) extreme-pixel corners and
    land within ~1.5 px of ground truth on clean rendered masks."""
    from mtgvision_tpu.infer.orient import refine_corners

    th = np.radians(deg)
    rot = np.asarray([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    ch, cw = 120, 84
    base = np.asarray([(0, 0), (cw, 0), (cw, ch), (0, ch)], float) - (cw / 2, ch / 2)
    dst = base @ rot.T * 0.9 + 100.0
    mask = jnp.asarray(render_notched_mask((200, 200), dst))
    coarse, ok = orient_corners(mask)
    assert bool(ok)
    refined = refine_corners(mask, coarse)
    err_c = np.linalg.norm(np.asarray(coarse) - dst, axis=1).max()
    err_r = np.linalg.norm(np.asarray(refined) - dst, axis=1).max()
    assert err_r <= err_c + 0.25, f"deg={deg}: refined {err_r} vs coarse {err_c}"
    assert err_r < 1.6, f"deg={deg}: refined err {err_r}"


def test_refine_corners_perspective():
    from mtgvision_tpu.infer.orient import refine_corners

    dst = np.asarray([(60, 40), (150, 55), (140, 170), (45, 160)], float)
    mask = jnp.asarray(render_notched_mask((200, 200), dst))
    coarse, ok = orient_corners(mask)
    refined = refine_corners(mask, coarse)
    err_r = np.linalg.norm(np.asarray(refined) - dst, axis=1).max()
    assert err_r < 2.0, err_r


def test_refine_corners_empty_mask_stays_put():
    from mtgvision_tpu.infer.orient import refine_corners

    coarse = jnp.zeros((4, 2))
    refined = refine_corners(jnp.zeros((64, 64)), coarse)
    assert np.allclose(np.asarray(refined), 0.0)


def test_orient_empty_mask():
    corners, ok = orient_corners(jnp.zeros((64, 64)))
    assert not bool(ok)
    assert np.allclose(corners, 0)


def test_orient_batch_vmap():
    dsts = [
        np.asarray([(40, 30), (120, 30), (120, 150), (40, 150)], float),
        np.asarray([(30, 120), (30, 40), (150, 40), (150, 120)], float),  # rotated 90°
    ]
    masks = jnp.asarray(np.stack([render_notched_mask((180, 180), d) for d in dsts]))
    corners, ok = jax.jit(orient_batch)(masks)
    assert np.asarray(ok).all()
    for c, d in zip(np.asarray(corners), dsts):
        assert np.linalg.norm(c - d, axis=1).max() < 6.0


def test_extract_dewarped_upright():
    """Dewarping a rendered card region returns the card content upright."""
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((200, 200, 3)).astype(np.float32))
    corners = jnp.asarray([(50.0, 40.0), (130, 40), (130, 160), (50, 160)])
    crop = extract_dewarped(frame, corners, out_hw=(96, 64))
    assert crop.shape == (96, 64, 3)
    # interior content matches the frame region (5% border expand)
    assert np.isfinite(np.asarray(crop)).all()


def test_enforce_quad_aspect():
    """90°-mislabeled quads are rolled so the long axis is vertical; healthy
    quads and borderline (within-margin) quads are untouched."""
    from mtgvision_tpu.infer.orient import enforce_quad_aspect

    # healthy portrait card: sides (140) longer than top (100)
    good = jnp.asarray([[0, 0], [100, 0], [100, 140], [0, 140]], jnp.float32)
    out = enforce_quad_aspect(good[None])[0]
    assert np.allclose(out, good)

    # sideways labeling: top edges (140) longer than sides (100) → rolled
    bad = jnp.asarray([[0, 0], [140, 0], [140, 100], [0, 100]], jnp.float32)
    out = enforce_quad_aspect(bad[None])[0]
    assert np.allclose(out, jnp.roll(bad, 1, axis=0))
    # rolled quad now has its long axis vertical in label order
    top = np.linalg.norm(out[0] - out[1])
    side = np.linalg.norm(out[1] - out[2])
    assert side > top

    # borderline (aspect within the 1.1 margin): untouched
    near = jnp.asarray([[0, 0], [105, 0], [105, 100], [0, 100]], jnp.float32)
    assert np.allclose(enforce_quad_aspect(near[None])[0], near)
