"""RefineHead: model shapes/bounds, training-batch labels, back-projection
geometry, and pipeline integration (tiny sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.models.refine_head import RefineHead, nominal_quad
from mtgvision_tpu.train.refine_train import (
    RefineConfig,
    create_state,
    make_refine_batch,
    train_step,
)


def test_refine_head_shapes_and_bounds():
    model = RefineHead(max_offset=24.0)
    x = jnp.asarray(np.random.default_rng(0).random((3, 192, 128, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    offsets, flip_logit = model.apply({"params": params}, x)
    assert offsets.shape == (3, 4, 2)
    assert flip_logit.shape == (3,)
    assert np.all(np.abs(np.asarray(offsets)) <= 24.0)


def test_make_refine_batch_shapes_and_labels():
    rng = np.random.default_rng(0)
    cards = jnp.asarray(rng.integers(0, 255, (8, 64, 48, 3), np.uint8))
    bgs = jnp.asarray(rng.integers(0, 255, (4, 96, 96, 3), np.uint8))
    x, offsets, flip = jax.jit(
        lambda k: make_refine_batch(k, cards, bgs, 6, (96, 64))
    )(jax.random.PRNGKey(1))
    assert x.shape == (6, 96, 64, 3)
    assert offsets.shape == (6, 4, 2)
    assert flip.shape == (6,)
    x, offsets, flip = map(np.asarray, (x, offsets, flip))
    assert np.isfinite(x).all() and x.min() >= 0.0 and x.max() <= 1.0
    assert np.isfinite(offsets).all()
    assert set(np.unique(flip)) <= {0.0, 1.0}


def test_refine_batch_quad_matches_label():
    """The card really lands at nominal+offsets: compare the rendered card's
    bbox against the labeled quad's bbox. Photometrics jitter brightness and
    tint BOTH layers, so geometry is read through red-dominance (red card on
    black bg): R − (G+B)/2 survives brightness/contrast/fade shifts."""
    red = jnp.zeros((4, 64, 48, 3), jnp.uint8).at[..., 0].set(255)
    black = jnp.zeros((2, 96, 96, 3), jnp.uint8)
    x, offsets, _ = make_refine_batch(
        jax.random.PRNGKey(3), red, black, 4, (96, 64),
        sigma_min=0.5, sigma_max=3.0, shift_sigma=1.0,
    )
    quads = np.asarray(nominal_quad((96, 64))[None] + offsets)
    for i in range(4):
        xi = np.asarray(x[i])
        redness = xi[..., 0] - 0.5 * (xi[..., 1] + xi[..., 2])
        ys, xs = np.nonzero(redness > 0.2)
        if len(xs) < 50:  # photometric fade can crush a sample; skip it
            continue
        # rendered bbox ≈ label-quad bbox (tolerance: aug blur + rounding)
        assert abs(xs.min() - quads[i, :, 0].min()) < 6.0
        assert abs(xs.max() - quads[i, :, 0].max()) < 6.0
        assert abs(ys.min() - quads[i, :, 1].min()) < 6.0
        assert abs(ys.max() - quads[i, :, 1].max()) < 6.0


def test_backprojection_recovers_true_quad():
    """If the head predicted the TRUE crop-space offsets, the pipeline's
    back-projection must recover the card's true frame-space quad exactly
    (the invariant the serving path relies on)."""
    from mtgvision_tpu.ops.warp import (
        apply_transform_points,
        perspective_from_quads,
    )

    crop_hw = (96, 64)
    nom = nominal_quad(crop_hw)
    q_true = jnp.asarray(
        [[100.0, 50.0], [210.0, 62.0], [205.0, 240.0], [95.0, 228.0]]
    )
    q_coarse = q_true + jnp.asarray(
        [[6.0, -4.0], [-5.0, 3.0], [4.0, 6.0], [-6.0, -5.0]]
    )
    m = perspective_from_quads(q_coarse, nom)  # frame→crop (coarse dewarp)
    true_in_crop = apply_transform_points(m, q_true)
    offsets = true_in_crop - nom  # the perfect head prediction
    recovered = apply_transform_points(jnp.linalg.inv(m), nom + offsets)
    assert np.allclose(np.asarray(recovered), np.asarray(q_true), atol=1e-2)


def test_train_step_learns():
    cfg = RefineConfig(batch_size=8, size_hw=(96, 64))
    state = create_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    cards = jnp.asarray(rng.integers(0, 255, (16, 64, 48, 3), np.uint8))
    bgs = jnp.asarray(rng.integers(0, 255, (4, 96, 96, 3), np.uint8))

    # ONE fixed batch, reused: a healthy train step must overfit it fast.
    # (Fresh random batches each step are noise-dominated at this scale —
    # each draws a new σ∈[0.5,9] so per-batch loss varies ±30%.)
    x, off, flip = make_refine_batch(
        jax.random.PRNGKey(7), cards, bgs, cfg.batch_size, cfg.size_hw
    )
    step = jax.jit(lambda s: train_step(s, x, off, flip, cfg))
    losses = []
    for _ in range(50):
        state, logs = step(state)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0]


def test_pipeline_with_refine_head():
    from mtgvision_tpu.index import VectorPoint, VectorStore
    from mtgvision_tpu.infer.pipeline import FramePipeline
    from mtgvision_tpu.models.convnextv2ae import ConvNeXtV2Encoder
    from mtgvision_tpu.models.yolo import YoloSeg

    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="n")
    det_vars = det.init(rng, jnp.zeros((1, 128, 128, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(96, 64), z_size=96, head_type="conv+linear",
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    enc_vars = {"params": enc.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]}
    rhead = RefineHead(widths=(8, 16), max_offset=8.0)
    rh_vars = {
        "params": rhead.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]
    }
    store = VectorStore(dim=96)
    vecs = np.random.default_rng(0).standard_normal((20, 96)).astype(np.float32)
    store.save_points(
        [VectorPoint(id=f"c{i}", vector=v, payload={}) for i, v in enumerate(vecs)]
    )
    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=4, crop_hw=(96, 64),
        top_k=3, refine_head=rhead, refine_head_vars=rh_vars,
    )
    assert pipe.both_orientations is False  # head supersedes dual-orientation
    frames = jnp.asarray(np.random.default_rng(0).random((2, 128, 128, 3), np.float32))
    out = pipe(frames)
    assert out["corners"].shape == (2, 4, 4, 2)
    assert out["crops"].shape == (2, 4, 96, 64, 3)
    assert out["z"].shape == (2, 4, 96)
    assert np.isfinite(np.asarray(out["corners"])).all()
    assert np.isfinite(np.asarray(out["z"])).all()

    # refine_head_flip=False: head corrects corners but orientation falls
    # back to dual-orientation embedding + match selection
    pipe2 = FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=4, crop_hw=(96, 64),
        top_k=3, refine_head=rhead, refine_head_vars=rh_vars,
        refine_head_flip=False,
    )
    assert pipe2.both_orientations is True
    out2 = pipe2(frames)
    assert out2["corners"].shape == (2, 4, 4, 2)
    assert np.isfinite(np.asarray(out2["z"])).all()


def test_make_refine_batch_occluded():
    """p_occlude>0 keeps shapes/labels and composites extra card pixels."""
    import numpy as np

    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.encoder_gen import DeviceBgPool, DeviceCardPool
    from mtgvision_tpu.train.refine_train import make_refine_batch

    rng = np.random.default_rng(0)
    pool = DeviceCardPool(ProceduralCatalog(n_cards=8, card_hw=(112, 80)), 8, rng)
    bgp = DeviceBgPool(ProceduralBackgrounds(bg_hw=(128, 128)), 4, rng)
    k = jax.random.PRNGKey(7)
    x0, off0, fl0 = make_refine_batch(
        k, pool.images, bgp.images, 4, (96, 64), p_occlude=0.0
    )
    x1, off1, fl1 = make_refine_batch(
        k, pool.images, bgp.images, 4, (96, 64), p_occlude=1.0
    )
    assert x1.shape == (4, 96, 64, 3)
    assert np.isfinite(np.asarray(x1)).all()
    # same key -> same labels either way; only pixels change
    assert np.allclose(np.asarray(off0), np.asarray(off1))
    assert np.allclose(np.asarray(fl0), np.asarray(fl1))
    assert not np.allclose(np.asarray(x0), np.asarray(x1))


def test_make_refine_batch_heavy_tail_clipped_labels():
    """p_heavy=1 draws wide errors; labels come back clipped to ±label_clip
    (the tanh-bounded head must never train toward saturation) while the
    composite still renders finite in-range pixels."""
    rng = np.random.default_rng(5)
    cards = jnp.asarray(rng.integers(0, 255, (8, 64, 48, 3), np.uint8))
    bgs = jnp.asarray(rng.integers(0, 255, (4, 96, 96, 3), np.uint8))
    x, labels, flip = jax.jit(
        lambda k: make_refine_batch(
            k, cards, bgs, 32, (96, 64),
            p_heavy=1.0, heavy_sigma_max=18.0, heavy_shift_sigma=14.0,
            label_clip=21.0,
        )
    )(jax.random.PRNGKey(2))
    labels = np.asarray(labels)
    assert np.abs(labels).max() <= 21.0 + 1e-5
    # the heavy mixture must actually produce saturating errors sometimes
    assert (np.abs(labels) > 15.0).any()
    x = np.asarray(x)
    assert np.isfinite(x).all() and x.min() >= 0.0 and x.max() <= 1.0


def test_make_refine_batch_lowres():
    """p_lowres=1 down-up resamples the whole crop (blurry tiny-card serving
    appearance): labels/flips identical for the same key, pixels smoother."""
    rng = np.random.default_rng(9)
    cards = jnp.asarray(rng.integers(0, 255, (8, 64, 48, 3), np.uint8))
    bgs = jnp.asarray(rng.integers(0, 255, (4, 96, 96, 3), np.uint8))
    k = jax.random.PRNGKey(3)
    x0, off0, fl0 = jax.jit(
        lambda kk: make_refine_batch(kk, cards, bgs, 16, (96, 64), p_lowres=0.0)
    )(k)
    x1, off1, fl1 = jax.jit(
        lambda kk: make_refine_batch(kk, cards, bgs, 16, (96, 64), p_lowres=1.0)
    )(k)
    assert x1.shape == x0.shape
    assert np.allclose(np.asarray(off0), np.asarray(off1))
    assert np.allclose(np.asarray(fl0), np.asarray(fl1))
    x0, x1 = np.asarray(x0), np.asarray(x1)
    assert np.isfinite(x1).all() and x1.min() >= 0.0 and x1.max() <= 1.0 + 1e-6
    # degraded crops lose high-frequency content: mean |dx| strictly drops
    g0 = np.abs(np.diff(x0, axis=2)).mean()
    g1 = np.abs(np.diff(x1, axis=2)).mean()
    assert g1 < g0 * 0.8, (g0, g1)


def test_make_refine_batch_lowres_small_budget():
    """Regression: round(B*p) below the number of factors must still degrade
    ~B*p samples (the old per-factor floor silently disabled the mixture)."""
    rng = np.random.default_rng(11)
    cards = jnp.asarray(rng.integers(0, 255, (8, 64, 48, 3), np.uint8))
    bgs = jnp.asarray(rng.integers(0, 255, (4, 96, 96, 3), np.uint8))
    k = jax.random.PRNGKey(5)
    x0, _, _ = jax.jit(
        lambda kk: make_refine_batch(kk, cards, bgs, 16, (96, 64), p_lowres=0.0)
    )(k)
    x1, _, _ = jax.jit(
        lambda kk: make_refine_batch(kk, cards, bgs, 16, (96, 64), p_lowres=0.2)
    )(k)
    changed = (
        np.abs(np.asarray(x1) - np.asarray(x0)).reshape(16, -1).max(1) > 1e-4
    )
    assert changed.sum() == 3, changed.sum()  # round(16*0.2) = 3 samples


def test_pipeline_sel_redewarp():
    """Selective redewarp (r5): the k highest-offset slots per frame are
    re-dewarped + refined a second time before embedding; shapes and
    finiteness hold, and non-selected slots keep their stage-1 crops."""
    from mtgvision_tpu.index import VectorPoint, VectorStore
    from mtgvision_tpu.infer.pipeline import FramePipeline
    from mtgvision_tpu.models.convnextv2ae import ConvNeXtV2Encoder
    from mtgvision_tpu.models.yolo import YoloSeg

    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="n")
    det_vars = det.init(rng, jnp.zeros((1, 128, 128, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(96, 64), z_size=96, head_type="conv+linear",
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    enc_vars = {"params": enc.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]}
    rhead = RefineHead(widths=(8, 16), max_offset=8.0)
    rh_vars = {"params": rhead.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]}
    store = VectorStore(dim=96)
    vecs = np.random.default_rng(0).standard_normal((20, 96)).astype(np.float32)
    store.save_points(
        [VectorPoint(id=f"c{i}", vector=v, payload={}) for i, v in enumerate(vecs)]
    )
    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=4, crop_hw=(96, 64),
        top_k=3, refine_head=rhead, refine_head_vars=rh_vars,
        refine_head_flip=False, sel_redewarp=2,
    )
    assert pipe.sel_redewarp == 2
    frames = jnp.asarray(np.random.default_rng(0).random((2, 128, 128, 3), np.float32))
    out = pipe(frames)
    assert out["corners"].shape == (2, 4, 4, 2)
    assert out["crops"].shape == (2, 4, 96, 64, 3)
    assert np.isfinite(np.asarray(out["corners"])).all()
    assert np.isfinite(np.asarray(out["z"])).all()

    # full redewarp wins over selective (sel ignored, no double work)
    pipe2 = FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=4, crop_hw=(96, 64),
        top_k=3, refine_head=rhead, refine_head_vars=rh_vars,
        refine_head_flip=False, refine_redewarp=True, sel_redewarp=2,
    )
    assert pipe2.sel_redewarp == 0
    out2 = pipe2(frames)
    assert np.isfinite(np.asarray(out2["z"])).all()

    # sel_redewarp is clamped to max_det
    pipe3 = FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=2, crop_hw=(96, 64),
        top_k=3, refine_head=rhead, refine_head_vars=rh_vars,
        refine_head_flip=False, sel_redewarp=8,
    )
    assert pipe3.sel_redewarp == 2
