"""Geometry tests: matrices, homographies, warps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.ops import warp as W


def test_rotation_matrix_points():
    m = W.rotation_matrix_2d(jnp.pi / 2)
    pts = jnp.asarray([[1.0, 0.0]])
    out = W.apply_transform_points(m, pts)
    assert np.allclose(out, [[0.0, 1.0]], atol=1e-6)


def test_affine_compose_identity():
    m = W.affine_matrix(rot=0.3, tx=5, ty=-2, sx=1.5, center=(10, 20))
    minv = jnp.linalg.inv(m)
    pts = jnp.asarray([[0.0, 0.0], [3.0, 4.0], [-7.0, 2.0]])
    assert np.allclose(W.apply_transform_points(minv, W.apply_transform_points(m, pts)), pts, atol=1e-4)


def test_perspective_from_quads_maps_corners():
    src = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [10.0, 20.0], [0.0, 20.0]])
    dst = jnp.asarray([[1.0, 2.0], [12.0, 1.0], [11.0, 22.0], [-1.0, 19.0]])
    h = W.perspective_from_quads(src, dst)
    out = W.apply_transform_points(h, src)
    assert np.allclose(out, dst, atol=1e-4)


def test_perspective_from_quads_batched():
    src = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0], [10.0, 0.0], [10.0, 20.0], [0.0, 20.0]]), (3, 4, 2)
    )
    dst = src + jnp.arange(3, dtype=jnp.float32)[:, None, None]
    h = W.perspective_from_quads(src, dst)
    assert h.shape == (3, 3, 3)
    out = W.apply_transform_points(h, src)
    assert np.allclose(out, dst, atol=1e-4)


def test_warp_identity(rng):
    img = jnp.asarray(rng.random((16, 12, 3), np.float32))
    out = W.warp_perspective(img, jnp.eye(3), (16, 12))
    assert np.allclose(out, img, atol=1e-5)


def test_warp_translation_fill(rng):
    img = jnp.asarray(rng.random((8, 8, 3), np.float32))
    m = W.translation_matrix_2d(4.0, 0.0)  # shift right 4 px
    out = np.asarray(W.warp_perspective(img, m, (8, 8)))
    assert np.allclose(out[:, :4], 0.0)  # fill on the left
    assert np.allclose(out[:, 4:], np.asarray(img)[:, :4], atol=1e-5)


def test_warp_batched(rng):
    imgs = jnp.asarray(rng.random((4, 8, 8, 3), np.float32))
    ms = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    out = W.warp_perspective(imgs, ms, (8, 8))
    assert out.shape == (4, 8, 8, 3)
    assert np.allclose(out, imgs, atol=1e-5)


def test_warp_dewarp_roundtrip(rng):
    """Warping a card to a quad and back recovers the interior — the
    extract_dewarped invariant (od_export.py:95-110)."""
    # smooth gradient content — white noise would be destroyed by double
    # bilinear resampling regardless of geometric correctness
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 24), indexing="ij")
    img = jnp.asarray(
        np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32)
    )
    src = jnp.asarray([[0.0, 0.0], [23.0, 0.0], [23.0, 31.0], [0.0, 31.0]])
    dst = jnp.asarray([[5.0, 3.0], [40.0, 6.0], [38.0, 50.0], [3.0, 47.0]])
    h = W.perspective_from_quads(src, dst)
    scene = W.warp_perspective(img, h, (64, 48))
    back = W.warp_perspective(scene, jnp.linalg.inv(h), (32, 24))
    a = np.asarray(back)[4:-4, 4:-4]
    b = np.asarray(img)[4:-4, 4:-4]
    assert np.abs(a - b).mean() < 0.03


def test_rotate_bounded_90(rng):
    img = jnp.asarray(rng.random((20, 10, 3), np.float32))
    out = W.rotate_bounded(img, 90.0, out_hw=(20, 10))
    assert out.shape == (20, 10, 3)
    # energy is conserved-ish in the visible region (content scaled to fit)
    assert float(jnp.mean(out)) > 0.05


def test_warp_onto_composite(rng):
    bg = jnp.asarray(rng.random((16, 16, 3), np.float32))
    fg = jnp.ones((8, 8, 4), jnp.float32)
    m = W.translation_matrix_2d(4.0, 4.0)
    out = np.asarray(W.warp_perspective_onto(fg, m, bg))
    assert np.allclose(out[6:10, 6:10], 1.0, atol=1e-5)  # pasted region white
    assert np.allclose(out[0, 0], np.asarray(bg)[0, 0], atol=1e-5)


class TestDewarpTwoPass:
    """Gather-free two-pass dewarp vs the reference-equivalent gather warp."""

    def _frame(self):
        rng = np.random.default_rng(3)
        # smooth-ish test pattern: low-freq sinusoids + a grid
        h = w = 640
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img = np.stack(
            [
                0.5 + 0.5 * np.sin(xx / 23.0 + c) * np.cos(yy / 31.0 - c)
                for c in range(3)
            ],
            -1,
        ).astype(np.float32)
        img += 0.2 * ((xx // 16 + yy // 16) % 2)[..., None]
        return jnp.asarray(np.clip(img, 0, 1))

    def _quad(self, deg, cx, cy, ch=180, cw_=126, persp=0.0):
        th = np.radians(deg)
        rot = np.asarray([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        base = np.asarray(
            [(0, 0), (cw_, 0), (cw_, ch), (0, ch)], float
        ) - (cw_ / 2, ch / 2)
        q = base @ rot.T + (cx, cy)
        q[0] += (persp * cw_, persp * ch)  # mild perspective skew
        return q.astype(np.float32)

    @pytest.mark.parametrize("deg", [0, 25, 90, 137, 180, 262])
    def test_matches_gather_warp(self, deg):
        from mtgvision_tpu.infer.orient import extract_dewarped
        from mtgvision_tpu.ops.warp import dewarp_quads_batch

        frame = self._frame()
        q = self._quad(deg, 320, 330)
        ref = np.asarray(extract_dewarped(frame, jnp.asarray(q)))
        out = np.asarray(dewarp_quads_batch(frame, jnp.asarray(q)[None])[0])
        assert out.shape == ref.shape
        d = np.abs(out - ref)
        # interior comparison (borders differ by fill/AA policy)
        di = d[4:-4, 4:-4]
        assert di.mean() < 0.035, (deg, di.mean())
        assert np.quantile(di, 0.95) < 0.15, (deg, np.quantile(di, 0.95))

    def test_large_card_uses_pyramid(self):
        """A card bigger than the window resolves via a coarser level and
        still roughly matches the full-res gather warp (AA differences OK)."""
        from mtgvision_tpu.infer.orient import extract_dewarped
        from mtgvision_tpu.ops.warp import dewarp_quads_batch

        frame = self._frame()
        q = self._quad(15, 320, 320, ch=420, cw_=294)
        ref = np.asarray(extract_dewarped(frame, jnp.asarray(q)))
        out = np.asarray(dewarp_quads_batch(frame, jnp.asarray(q)[None])[0])
        di = np.abs(out - ref)[8:-8, 8:-8]
        assert di.mean() < 0.06, di.mean()

    def test_perspective_quad(self):
        from mtgvision_tpu.infer.orient import extract_dewarped
        from mtgvision_tpu.ops.warp import dewarp_quads_batch

        frame = self._frame()
        q = self._quad(40, 300, 300, persp=0.12)
        ref = np.asarray(extract_dewarped(frame, jnp.asarray(q)))
        out = np.asarray(dewarp_quads_batch(frame, jnp.asarray(q)[None])[0])
        di = np.abs(out - ref)[4:-4, 4:-4]
        assert di.mean() < 0.045, di.mean()

    def test_batch_and_jit(self):
        from mtgvision_tpu.ops.warp import dewarp_quads_batch

        frame = self._frame()
        qs = jnp.asarray(
            np.stack([self._quad(d, 250 + d, 300) for d in (0, 30, 60, 110)])
        )
        fn = jax.jit(lambda f, q: dewarp_quads_batch(f, q))
        out = fn(frame, qs)
        assert out.shape == (4, 192, 128, 3)
        assert bool(jnp.isfinite(out).all())
        assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0


class TestDewarpPallas(TestDewarpTwoPass):
    """Fused Pallas kernel (interpret mode on CPU) vs the XLA two-pass path.

    Same math modulo precision (kernel accumulates f32, XLA path bf16), so
    the tolerance is much tighter than vs the gather warp."""

    @pytest.mark.parametrize("deg", [0, 25, 90, 137, 180, 262])
    def test_matches_xla_two_pass(self, deg):
        from mtgvision_tpu.ops.dewarp_pallas import dewarp_quads_pallas
        from mtgvision_tpu.ops.warp import dewarp_quads_batch

        frame = self._frame()
        q = jnp.asarray(self._quad(deg, 320, 330))[None]
        ref = np.asarray(dewarp_quads_batch(frame, q)[0])
        out = np.asarray(dewarp_quads_pallas(frame, q, interpret=True)[0])
        assert out.shape == ref.shape
        d = np.abs(out - ref)[2:-2, 2:-2]
        assert d.mean() < 6e-3, (deg, d.mean())
        assert d.max() < 0.08, (deg, d.max())

    def test_perspective_and_pyramid(self):
        from mtgvision_tpu.ops.dewarp_pallas import dewarp_quads_pallas
        from mtgvision_tpu.ops.warp import dewarp_quads_batch

        frame = self._frame()
        qs = jnp.asarray(
            np.stack(
                [
                    self._quad(40, 300, 300, persp=0.12),
                    self._quad(15, 320, 320, ch=420, cw_=294),  # coarser level
                ]
            )
        )
        ref = np.asarray(dewarp_quads_batch(frame, qs))
        out = np.asarray(dewarp_quads_pallas(frame, qs, interpret=True))
        d = np.abs(out - ref)[:, 2:-2, 2:-2]
        assert d.mean() < 8e-3, d.mean()

    def test_degenerate_quad_is_finite(self):
        from mtgvision_tpu.ops.dewarp_pallas import dewarp_quads_pallas

        frame = self._frame()
        qs = jnp.zeros((1, 4, 2), jnp.float32)  # invalid slot (ok=False)
        out = dewarp_quads_pallas(frame, qs, interpret=True)
        assert out.shape == (1, 192, 128, 3)
        assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0
