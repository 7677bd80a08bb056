"""Orientation head: model, trainer smoke, pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.models.orient_head import OrientHead


class TestModel:
    def test_shapes_and_dtype(self):
        m = OrientHead()
        x = jnp.zeros((4, 192, 128, 3), jnp.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        y = jax.jit(m.apply)(v, x)
        assert y.shape == (4,)
        assert y.dtype == jnp.float32

    def test_param_count_is_tiny(self):
        m = OrientHead()
        v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 192, 128, 3)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert n < 500_000  # orders below the encoder


class TestTrainer:
    def test_smoke_and_checkpoint(self, tmp_path):
        from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
        from mtgvision_tpu.train.orient_train import OrientConfig, train

        cfg = OrientConfig(
            batch_size=4, max_steps=4, scan_steps=2, n_cards=8, pool_size=8,
            bg_pool_size=4, ckpt_dir=str(tmp_path / "ck"), ckpt_every=2,
            log_every=2, size_hw=(48, 32),
        )
        state = train(
            cfg,
            catalog=ProceduralCatalog(n_cards=8),
            backgrounds=ProceduralBackgrounds(bg_hw=(64, 64)),
        )
        assert int(state.step) == 4
        assert (tmp_path / "ck" / "step_00000004").exists()

    def test_batch_labels_rotate(self):
        from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
        from mtgvision_tpu.data.encoder_gen import DeviceBgPool, DeviceCardPool
        from mtgvision_tpu.train.orient_train import make_orient_batch

        rng = np.random.default_rng(0)
        pool = DeviceCardPool(ProceduralCatalog(n_cards=8), 8, rng)
        bgp = DeviceBgPool(ProceduralBackgrounds(bg_hw=(64, 64)), 4, rng)
        x, labels = jax.jit(
            lambda k: make_orient_batch(k, pool.images, bgp.images, 16, (48, 32))
        )(jax.random.PRNGKey(1))
        assert x.shape == (16, 48, 32, 3)
        assert labels.shape == (16,)
        assert set(np.unique(np.asarray(labels))) <= {0.0, 1.0}
        assert bool(jnp.isfinite(x).all())


class TestPipelineIntegration:
    def test_head_unrotates_before_encode(self):
        """A crop the head calls 'flipped' must be rotated back before the
        encoder, its corners rolled, and flipped reported."""
        from mtgvision_tpu.infer import pipeline as P

        class FakeEnc:
            def apply(self, vars_, x, method=None):
                top = x[:, : x.shape[1] // 2].mean(axis=(1, 2, 3))
                bot = x[:, x.shape[1] // 2 :].mean(axis=(1, 2, 3))
                return jnp.stack([top - bot, jnp.ones_like(top)], -1)

        class FakeHead:
            def apply(self, vars_, x):
                # "upright" = bright top; positive logit = flipped
                top = x[:, : x.shape[1] // 2].mean(axis=(1, 2, 3))
                bot = x[:, x.shape[1] // 2 :].mean(axis=(1, 2, 3))
                return bot - top

        pipe = P.FramePipeline.__new__(P.FramePipeline)
        pipe.encoder = FakeEnc()
        pipe.enc_variables = {}
        pipe.max_det = 2
        pipe.crop_hw = (8, 6)
        pipe.top_k = 1
        pipe.both_orientations = False
        pipe.orient_head = FakeHead()
        pipe.orient_head_vars = {}
        pipe.refine = False
        pipe.fast_dewarp = False
        pipe.orient_sign = "notch"
        pipe.dewarp_impl = "xla"

        b, d = 1, 2
        crops = np.zeros((b * d, 8, 6, 3), np.float32)
        crops[0, :4] = 1.0  # upright (bright top)
        crops[1, 4:] = 1.0  # flipped (bright bottom)
        corners = jnp.tile(
            jnp.asarray([[0, 0], [6, 0], [6, 8], [0, 8]], jnp.float32), (b, d, 1, 1)
        )

        flat = jnp.asarray(crops)
        logits = pipe.orient_head.apply({}, flat)
        flip = logits > 0
        assert not bool(flip[0]) and bool(flip[1])

        # emulate the head branch of _rectify_embed_stage
        fixed = jnp.where(
            flip[:, None, None, None], jnp.rot90(flat, 2, axes=(1, 2)), flat
        )
        # after un-rotation, every crop is upright (bright top)
        top = fixed[:, :4].mean(axis=(1, 2, 3))
        bot = fixed[:, 4:].mean(axis=(1, 2, 3))
        assert float((top - bot).min()) > 0.5
