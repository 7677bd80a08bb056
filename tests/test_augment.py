"""Augmentation kernels + combinator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.ops import augment as A
from mtgvision_tpu.utils.random import ApplyChoice, ApplyOrdered, ApplyShuffled

ALL_AUGS = [
    A.flip,
    A.upsidedown,
    A.rotate_bounded,
    A.warp,
    A.warp_inv,
    A.affine_transform,
    A.perspective_transform,
    A.noise,
    A.blur,
    A.sharpen,
    A.downscale_upscale,
    A.gaussian_noise,
    A.salt_pepper_noise,
    A.tint,
    A.fade_white,
    A.fade_black,
    A.brightness_contrast,
    A.rgb_jitter_add,
    A.rgb_jitter_mul,
    A.cutout,
    A.random_erasing,
]


@pytest.mark.parametrize("fn", ALL_AUGS, ids=lambda f: f.__name__)
def test_aug_shape_range_determinism(fn, key, rng):
    img = jnp.asarray(rng.random((48, 32, 3), np.float32))
    out = fn(key, img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= -1e-6 and float(out.max()) <= 1.0 + 1e-6
    assert np.allclose(out, fn(key, img))  # deterministic per key


@pytest.mark.parametrize("fn", ALL_AUGS, ids=lambda f: f.__name__)
def test_aug_jit_vmap(fn, key, rng):
    imgs = jnp.asarray(rng.random((3, 48, 32, 3), np.float32))
    keys = jax.random.split(key, 3)
    out = jax.jit(jax.vmap(fn))(keys, imgs)
    assert out.shape == imgs.shape
    # different keys → different outputs (except none should be identical for
    # these stochastic augs on random content)
    if fn is not A.upsidedown and fn is not A.sharpen and fn is not A.blur:
        assert not np.allclose(out[0], out[1])


def test_rgba_alpha_preserved_photometric(key, rng):
    img = jnp.asarray(rng.random((32, 32, 4), np.float32))
    for fn in (A.tint, A.fade_white, A.fade_black, A.rgb_jitter_mul, A.noise):
        out = fn(key, img)
        assert np.allclose(out[..., 3], img[..., 3]), fn.__name__


def test_upsidedown():
    img = jnp.arange(12.0).reshape(2, 2, 3) / 12.0
    out = A.upsidedown(jax.random.PRNGKey(0), img)
    assert np.allclose(out, np.asarray(img)[::-1, ::-1])


def test_cutout_darkens(key, rng):
    img = jnp.ones((64, 64, 3), jnp.float32)
    out = A.cutout(key, img)
    assert float(out.mean()) < 1.0
    assert float(out.min()) == 0.0


def test_random_erasing_erases(key, rng):
    img = jnp.full((64, 64, 3), 0.5, jnp.float32)
    out = A.random_erasing(key, img)
    changed = np.mean(~np.isclose(np.asarray(out), 0.5))
    assert 0.0 < changed  # some block got filled


def test_combinators_jit(key, rng):
    img = jnp.asarray(rng.random((32, 32, 3), np.float32))
    pipe = ApplyShuffled(
        ApplyOrdered(A.flip, A.tint),
        ApplyChoice(A.fade_black, A.fade_white, None),
        ApplyChoice(A.blur, None),
    )
    out = jax.jit(pipe.__call__)(key, img)
    assert out.shape == img.shape
    assert np.allclose(out, pipe(key, img))
    k2 = jax.random.PRNGKey(99)
    assert not np.allclose(out, pipe(k2, img))


def test_choice_none_identity(rng):
    img = jnp.asarray(rng.random((8, 8, 3), np.float32))
    pipe = ApplyChoice(None)
    assert np.allclose(pipe(jax.random.PRNGKey(0), img), img)


class TestFusedPhotometric:
    def _img(self, c=3):
        import numpy as np
        rng = np.random.default_rng(0)
        return jnp.asarray(rng.random((32, 24, c), np.float32))

    def test_identity_when_all_off(self):
        from mtgvision_tpu.ops.augment import fused_photometric

        img = self._img()
        out = fused_photometric(
            jax.random.PRNGKey(0), img,
            p_brightness=0.0, p_hsv=0.0, p_noise=0.0, p_sp=0.0, p_blur=0.0,
        )
        # blur at sigma->0 is a near-delta kernel; everything else gated off
        assert float(jnp.abs(out - img).max()) < 1e-2

    def test_range_and_shape(self):
        from mtgvision_tpu.ops.augment import fused_photometric

        img = self._img()
        for seed in range(4):
            out = fused_photometric(
                jax.random.PRNGKey(seed), img,
                p_noise=1.0, p_sp=1.0, p_blur=1.0, p_tint=1.0, p_fade=1.0,
                p_sharpen=1.0, p_erase=1.0,
            )
            assert out.shape == img.shape
            assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
            assert bool(jnp.isfinite(out).all())

    def test_alpha_passthrough(self):
        from mtgvision_tpu.ops.augment import fused_photometric

        img = self._img(c=4)
        out = fused_photometric(jax.random.PRNGKey(1), img, p_noise=1.0, p_blur=1.0)
        assert jnp.allclose(out[..., 3], img[..., 3])

    def test_randomness_differs_by_key(self):
        from mtgvision_tpu.ops.augment import fused_photometric

        img = self._img()
        a = fused_photometric(jax.random.PRNGKey(1), img, p_noise=1.0)
        b = fused_photometric(jax.random.PRNGKey(2), img, p_noise=1.0)
        assert float(jnp.abs(a - b).max()) > 1e-3

    def test_gate_magnitude_decoupled(self):
        """Gates and magnitudes draw from DISTINCT keys (ADVICE r1): sharing
        one key makes magnitude = u·1[u<p], capping applied strength at
        p·ratio. With p_fade=0.5, fade_ratio=0.33 the applied fade must
        exceed the bug's 0.165 cap for some keys."""
        from mtgvision_tpu.ops.augment import fused_photometric

        img = jnp.full((8, 8, 3), 0.5, jnp.float32)

        def fade_strength(seed):
            out = fused_photometric(
                jax.random.PRNGKey(seed), img,
                p_brightness=0.0, p_hsv=0.0, p_noise=0.0, p_sp=0.0,
                p_blur=0.0, p_fade=0.5, fade_ratio=0.33,
            )
            # out = 0.5(1-f) + t·f with t∈{0,1} → |out-0.5| = f/2
            return 2.0 * float(jnp.abs(out - 0.5).max())

        strengths = [fade_strength(s) for s in range(64)]
        assert max(strengths) > 0.5 * 0.33 + 0.02  # beats the coupled cap
        assert any(s < 1e-3 for s in strengths)  # gate still turns it off

    def test_vmap_batches(self):
        from mtgvision_tpu.ops.augment import fused_photometric

        imgs = jnp.stack([self._img()] * 4)
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        out = jax.vmap(fused_photometric)(keys, imgs)
        assert out.shape == imgs.shape
        # different keys → different outputs across the batch
        assert float(jnp.abs(out[0] - out[1]).max()) > 1e-3
