"""Metric-loss + recon-loss tests (semantics vs pytorch-metric-learning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.train import losses as L

KEY = jax.random.PRNGKey(0)


def _clustered_emb(sep=10.0):
    """Two tight clusters → tiny loss; shuffled labels → big loss."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 16)) * 0.01 + np.asarray([sep] + [0] * 15)
    b = rng.standard_normal((4, 16)) * 0.01 - np.asarray([sep] + [0] * 15)
    emb = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    labels = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    bad_labels = jnp.asarray([0, 1, 0, 1, 0, 1, 0, 1])
    return emb, labels, bad_labels


@pytest.mark.parametrize("name", ["circle", "ntxent", "sup_con", "triplet", "triplet_smooth"])
def test_pair_losses_discriminate(name):
    emb, good, bad = _clustered_emb()
    fn = L.METRIC_LOSSES[name]
    lo = float(fn(emb, good))
    hi = float(fn(emb, bad))
    assert np.isfinite(lo) and np.isfinite(hi)
    assert lo < hi


@pytest.mark.parametrize("name", ["circle", "ntxent", "sup_con", "triplet"])
def test_pair_losses_have_grads(name):
    # small separation so margin-based losses have active (violating) triplets
    emb, good, _ = _clustered_emb(sep=0.02)
    g = jax.grad(lambda e: L.METRIC_LOSSES[name](e, good))(emb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_arcface():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((10, 16)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7])
    loss = L.arcface_loss(emb, w, labels)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # aligned weights → much lower loss
    w_aligned = w.at[:8].set(emb * 10)
    assert float(L.arcface_loss(emb, w_aligned, labels)) < float(loss)
    g = jax.grad(lambda e, ww: L.arcface_loss(e, ww, labels), argnums=(0, 1))(emb, w)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


def test_subcenter_arcface():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((10 * 3, 16)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 4, 5])
    loss = L.subcenter_arcface_loss(emb, w, labels, sub_centers=3)
    assert np.isfinite(float(loss))


def test_circle_degenerate_single_class():
    """All same label → no negatives → loss must be finite (0)."""
    emb = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    labels = jnp.zeros(4, jnp.int32)
    assert np.isfinite(float(L.circle_loss(emb, labels)))


@pytest.mark.parametrize(
    "name", ["mse", "l1", "ssim5", "ssim7", "ssim9", "ssim5+mse", "ssim5+l1", "ssim7+l1", "ms_ssim"]
)
def test_recon_losses(name):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 192, 128, 3)), jnp.float32)
    noisy = jnp.clip(x + 0.1 * jnp.asarray(rng.standard_normal(x.shape)), 0, 1)
    fn = L.recon_loss_fn(name)
    same = float(fn(x, x))
    diff = float(fn(noisy, x))
    assert same < 1e-3
    assert diff > same


def test_ssim_bounds():
    from mtgvision_tpu.ops.ssim import ssim

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-4
    y = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    assert float(ssim(x, y)) < 0.5
