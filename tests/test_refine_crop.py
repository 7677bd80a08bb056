"""refine_quad_from_crop: crop-space edge snap recovers perturbed corners."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.infer.orient import extract_dewarped, refine_quad_from_crop


def _framed_card(rng, frame_hw=(640, 640), quad=None):
    """Dark background + bright bordered 'card' at a known quad."""
    from mtgvision_tpu.data.catalog import ProceduralCatalog
    from mtgvision_tpu.ops.warp import perspective_from_quads, warp_perspective

    catalog = ProceduralCatalog(n_cards=4)
    card = jnp.asarray(catalog.get_image(list(catalog)[0]))  # (Hc,Wc,3) [0,1]
    hc, wc = card.shape[:2]
    src = jnp.asarray([[0, 0], [wc, 0], [wc, hc], [0, hc]], jnp.float32)
    m = perspective_from_quads(src, jnp.asarray(quad, jnp.float32))
    rgba = jnp.concatenate([card, jnp.ones((hc, wc, 1))], -1)
    warped = warp_perspective(rgba, m, frame_hw)
    bg = jnp.full((*frame_hw, 3), 0.18) + 0.04 * jax.random.uniform(
        jax.random.PRNGKey(0), (*frame_hw, 3)
    )
    a = warped[..., 3:]
    frame = warped[..., :3] * a + bg * (1 - a)
    return frame


QUADS = [
    [[200, 140], [330, 150], [320, 345], [190, 335]],  # slight rotation
    [[240, 120], [380, 180], [330, 380], [200, 320]],  # strong rotation
    [[210, 150], [350, 140], [360, 330], [205, 340]],  # perspective-ish
]


@pytest.mark.parametrize("quad", QUADS)
def test_recovers_perturbed_corners(quad):
    rng = np.random.default_rng(3)
    frame = _framed_card(rng, quad=quad)
    true_q = np.asarray(quad, np.float32)
    pert = true_q + rng.uniform(-6, 6, size=(4, 2)).astype(np.float32)

    crop = extract_dewarped(frame, jnp.asarray(pert))
    refined = np.asarray(
        jax.jit(refine_quad_from_crop)(crop, jnp.asarray(pert))
    )

    err_before = np.linalg.norm(pert - true_q, axis=1).mean()
    err_after = np.linalg.norm(refined - true_q, axis=1).mean()
    assert err_after < err_before * 0.6, (err_before, err_after)
    assert err_after < 3.5, err_after


def test_noop_when_corners_exact():
    rng = np.random.default_rng(5)
    quad = QUADS[0]
    frame = _framed_card(rng, quad=quad)
    true_q = jnp.asarray(quad, jnp.float32)
    crop = extract_dewarped(frame, true_q)
    refined = np.asarray(jax.jit(refine_quad_from_crop)(crop, true_q))
    err = np.linalg.norm(refined - np.asarray(quad), axis=1).mean()
    assert err < 2.5, err


def test_flat_crop_falls_back():
    crop = jnp.zeros((192, 128, 3))
    q = jnp.asarray([[10, 10], [110, 10], [110, 160], [10, 160]], jnp.float32)
    refined = np.asarray(jax.jit(refine_quad_from_crop)(crop, q))
    # featureless crop → weak peaks → per-edge fallback keeps margins → the
    # back-projection reproduces the input quad
    assert np.linalg.norm(refined - np.asarray(q), axis=1).mean() < 2.0
