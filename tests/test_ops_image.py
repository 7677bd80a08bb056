"""Unit tests for ops.image vs numpy-reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.ops import image as I


def test_img_clip_float():
    x = jnp.asarray([-0.5, 0.5, 1.5])
    assert np.allclose(I.img_clip(x), [0.0, 0.5, 1.0])


def test_img_float32_uint8_roundtrip(rng):
    u8 = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    f = I.img_float32(u8)
    assert f.dtype == jnp.float32
    assert float(f.max()) <= 1.0
    back = I.img_uint8(f)
    assert np.abs(np.asarray(back).astype(int) - u8.astype(int)).max() <= 1


def test_flips(rng):
    x = jnp.asarray(rng.random((2, 4, 6, 3), np.float32))
    assert np.allclose(I.flip_vert(x), np.asarray(x)[:, ::-1])
    assert np.allclose(I.flip_horr(x), np.asarray(x)[:, :, ::-1])


def test_resize_shapes(rng):
    x = jnp.asarray(rng.random((2, 32, 24, 3), np.float32))
    out = I.resize(x, (16, 12))
    assert out.shape == (2, 16, 12, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_crop_to_size_crop_and_pad(rng):
    x = jnp.asarray(rng.random((40, 20, 3), np.float32))
    # crop mode: fills the target, cropping the longer axis
    out = I.crop_to_size(x, (16, 16), pad=False)
    assert out.shape == (16, 16, 3)
    # pad mode: letterboxes with zeros
    out = I.crop_to_size(x, (16, 16), pad=True)
    assert out.shape == (16, 16, 3)
    o = np.asarray(out)
    assert np.allclose(o[:, :3], 0)  # left letterbox columns are black
    assert np.allclose(o[:, -3:], 0)


def test_crop_to_size_identity(rng):
    x = jnp.asarray(rng.random((16, 16, 3), np.float32))
    assert np.allclose(I.crop_to_size(x, (16, 16)), x)


def test_round_rect_mask():
    m = np.asarray(I.round_rect_mask((64, 48), radius=8))
    assert m.shape == (64, 48)
    # centers/edges inside, extreme corners cut
    assert m[32, 24] == 1.0
    assert m[0, 24] == 1.0
    assert m[0, 0] == 0.0
    assert m[63, 47] == 0.0
    # point on the quarter-circle interior kept
    assert m[8, 8] == 1.0


def test_compositing(rng):
    fg = jnp.asarray(rng.random((8, 8, 4), np.float32))
    bg = jnp.asarray(rng.random((8, 8, 3), np.float32))
    out = I.rgba_over_rgb(fg, bg)
    expect = np.asarray(fg[..., :3]) * np.asarray(fg[..., 3:]) + np.asarray(bg) * (
        1 - np.asarray(fg[..., 3:])
    )
    assert np.allclose(out, np.clip(expect, 0, 1), atol=1e-6)


@pytest.mark.parametrize(
    "fn,kw",
    [
        (I.noise_speckle, dict(strength=0.1)),
        (I.noise_gaussian, dict(var=0.05)),
        (I.noise_salt_pepper, dict(strength=0.1)),
        (I.noise_poisson, dict(peak=10.0, amount=0.25)),
    ],
)
def test_noise_family(key, rng, fn, kw):
    x = jnp.asarray(rng.random((16, 16, 3), np.float32))
    out = fn(key, x, **kw)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # deterministic under the same key
    assert np.allclose(out, fn(key, x, **kw))
    # actually perturbs
    assert not np.allclose(out, x)


def test_noise_preserves_alpha(key, rng):
    x = jnp.asarray(rng.random((16, 16, 4), np.float32))
    out = I.noise_gaussian(key, x, var=0.5)
    assert np.allclose(out[..., 3], x[..., 3])


def test_take_rows_matches_take():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mtgvision_tpu.ops.gather import take_rows

    pool = jnp.asarray(np.random.default_rng(0).integers(0, 255, (32, 8, 6, 3), np.uint8))
    idx = jnp.asarray([5, 0, 31, 5], jnp.int32)
    out = jax.jit(take_rows)(pool, idx)
    ref = jnp.take(pool, idx, axis=0)
    assert out.shape == (4, 8, 6, 3)
    assert np.array_equal(np.asarray(out), np.asarray(ref))
