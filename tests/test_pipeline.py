"""End-to-end frame pipeline test (tiny sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.index import VectorPoint, VectorStore
from mtgvision_tpu.infer.pipeline import FramePipeline
from mtgvision_tpu.models.convnextv2ae import ConvNeXtV2Encoder
from mtgvision_tpu.models.yolo import YoloSeg


@pytest.fixture(scope="module")
def pipeline():
    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="n")
    det_vars = det.init(rng, jnp.zeros((1, 128, 128, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(96, 64), z_size=96, head_type="conv+linear",
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    enc_vars = {"params": enc.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]}
    store = VectorStore(dim=96)
    vecs = np.random.default_rng(0).standard_normal((50, 96)).astype(np.float32)
    store.save_points(
        [VectorPoint(id=f"c{i}", vector=v, payload={"i": i}) for i, v in enumerate(vecs)]
    )
    return FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=4, crop_hw=(96, 64), top_k=3
    )


def test_frame_program_shapes(pipeline):
    frames = jnp.asarray(np.random.default_rng(0).random((2, 128, 128, 3), np.float32))
    out = pipeline(frames)
    assert out["boxes"].shape == (2, 4, 4)
    assert out["corners"].shape == (2, 4, 4, 2)
    assert out["crops"].shape == (2, 4, 96, 64, 3)
    assert out["z"].shape == (2, 4, 96)
    assert out["match_idx"].shape == (2, 4, 3)
    assert np.isfinite(np.asarray(out["z"])).all()


def test_detect_frame_host_api(pipeline):
    frame = np.random.default_rng(1).random((128, 128, 3)).astype(np.float32)
    dets = pipeline.detect_frame(frame)
    # untrained detector → no valid detections, but the API returns cleanly
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) >= {"box", "score", "corners", "crop", "z", "matches"}


def test_bench_harness_builds():
    from mtgvision_tpu.infer.pipeline import build_e2e_pipeline

    run, frames = build_e2e_pipeline(
        batch=1, frame_hw=(128, 128), n_index=100, det_size="n", enc_size="atto", max_det=2
    )
    idx, valid = run(frames)
    assert idx.shape == (1, 2, 3)
    run_f, frames_f = build_e2e_pipeline(
        batch=1, frame_hw=(128, 128), n_index=100, det_size="n",
        enc_size="atto", max_det=2, layout="fused",
    )
    idx_f, _ = run_f(frames_f)
    assert idx_f.shape == (1, 2, 3)
    run_2, frames_2 = build_e2e_pipeline(
        batch=1, frame_hw=(128, 128), n_index=100, det_size="n",
        enc_size="atto", max_det=2, layout="2prog",
    )
    idx_2, _ = run_2(frames_2)
    assert idx_2.shape == (1, 2, 3)


def test_e2e_eval_harness():
    """Harness runs end-to-end (untrained models → low/zero recall is fine)."""
    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.scene_gen import SceneGenerator
    from mtgvision_tpu.eval.e2e_eval import evaluate_e2e
    from mtgvision_tpu.index import VectorPoint, VectorStore

    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="n")
    det_vars = det.init(rng, jnp.zeros((1, 160, 160, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(96, 64), z_size=96, head_type="conv+linear",
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    enc_vars = {"params": enc.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]}
    cat = ProceduralCatalog(n_cards=8, card_hw=(112, 80))
    store = VectorStore(dim=96)
    store.save_points(
        [VectorPoint(id=c.id, vector=np.random.default_rng(i).standard_normal(96))
         for i, c in enumerate(cat)]
    )
    pipe = FramePipeline(det, det_vars, enc, enc_vars, store=store, max_det=4, crop_hw=(96, 64))
    gen = SceneGenerator(
        cat, ProceduralBackgrounds(bg_hw=(96, 96)), bg_size_hw=(160, 160),
        num_cards_min=1, num_cards_max=2, seed=5,
    )
    stats = evaluate_e2e(pipe, gen, n_scenes=3)
    assert stats.n_gt >= 3
    assert 0.0 <= stats.recall <= 1.0
    # precision bookkeeping: every valid detection is either matched or FP
    assert stats.n_frames == 3
    assert stats.n_fp == stats.n_valid_det - stats.n_detected
    assert 0.0 <= stats.precision <= 1.0
    assert str(stats)

    # pure-background scenes (ratio_bg=1.0): all GT-centric counters stay 0,
    # every valid detection is a background false positive
    gen_bg = SceneGenerator(
        cat, ProceduralBackgrounds(bg_hw=(96, 96)), bg_size_hw=(160, 160),
        ratio_bg=1.0, seed=6,
    )
    s_bg = evaluate_e2e(pipe, gen_bg, n_scenes=2)
    assert s_bg.n_gt == 0 and s_bg.n_bg_frames == 2
    assert s_bg.n_bg_fp == s_bg.n_valid_det == s_bg.n_fp
    assert "bg_fp/frame" in str(s_bg)


def test_dual_orientation_match_selects_flip():
    """A flipped-better detection should report flipped=True, rolled corners,
    and the flipped orientation's matches."""
    import numpy as np
    import jax.numpy as jnp
    from mtgvision_tpu.infer import pipeline as P

    class FakeEnc:
        def apply(self, vars_, x, method=None):
            # embedding = mean brightness of top half minus bottom half →
            # rot180 negates it; 2-d embedding space
            top = x[:, : x.shape[1] // 2].mean(axis=(1, 2, 3))
            bot = x[:, x.shape[1] // 2 :].mean(axis=(1, 2, 3))
            return jnp.stack([top - bot, jnp.ones_like(top)], -1)

    class FakeDet:
        pass

    pipe = P.FramePipeline.__new__(P.FramePipeline)
    pipe.encoder = FakeEnc()
    pipe.enc_variables = {}
    pipe.max_det = 2
    pipe.crop_hw = (8, 6)
    pipe.top_k = 1
    pipe.both_orientations = True
    pipe.mesh = None
    import functools
    import jax
    from mtgvision_tpu.ops.topk import cosine_topk
    pipe._match = jax.jit(functools.partial(cosine_topk, k=1))

    b, d = 1, 2
    # crops: det0 bright-top (upright), det1 bright-bottom (looks flipped)
    crops = np.zeros((b, d, 8, 6, 3), np.float32)
    crops[0, 0, :4] = 1.0
    crops[0, 1, 4:] = 1.0
    corners = np.tile(np.asarray([[0, 0], [6, 0], [6, 8], [0, 8]], np.float32), (b, d, 1, 1))
    ok = np.ones((b, d), bool)

    flat = jnp.asarray(crops).reshape(b * d, 8, 6, 3)
    flat_flip = jnp.rot90(flat, 2, axes=(1, 2))
    z = pipe.encoder.apply({}, jnp.concatenate([flat, flat_flip])).reshape(2, b, d, -1)

    # index: single "upright" card embedding [positive, 1]
    db = jnp.asarray([[1.0, 1.0]]) / np.sqrt(2.0)

    # the real fused match+select program (stage 3)
    pipe._match_select = jax.jit(pipe._match_select_stage)
    match_scores, match_idx, corners_out, flipped, z_sel = pipe._match_select(
        z, jnp.asarray(corners), db
    )
    assert not bool(flipped[0, 0])  # upright crop stays
    assert bool(flipped[0, 1])  # flipped crop wins rotated
    # corners of the flipped detection are rolled 180° (TL↔BR, TR↔BL)
    np.testing.assert_allclose(
        np.asarray(corners_out[0, 0]), corners[0, 0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(corners_out[0, 1]), np.roll(corners[0, 1], 2, axis=0), atol=1e-6
    )
    # z_sel carries the embedding of the SELECTED orientation
    np.testing.assert_allclose(np.asarray(z_sel[0, 0]), np.asarray(z[0, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_sel[0, 1]), np.asarray(z[1, 0, 1]), atol=1e-6)
    # and the reported match score is the better orientation's
    assert float(match_scores[0, 1, 0]) >= float(match_scores[0, 0, 0]) - 1e-6


def test_obb_pipeline_mode():
    """det_kind="obb": 3-class detector → analytic quads (infer/obb.py) →
    shared dewarp/embed/match tail; per-card outputs re-indexed from the
    3x raw detection slots."""
    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=3, size="n")
    det_vars = det.init(rng, jnp.zeros((1, 128, 128, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(96, 64), z_size=96, head_type="conv+linear",
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    enc_vars = {"params": enc.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]}
    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=None, max_det=2,
        crop_hw=(96, 64), det_kind="obb",
    )
    assert pipe._det_slots == 6
    frames = jnp.asarray(np.random.default_rng(2).random((1, 128, 128, 3), np.float32))
    out = pipe.run(frames)
    assert out["boxes"].shape == (1, 2, 4)
    assert out["corners"].shape == (1, 2, 4, 2)
    assert out["crops"].shape == (1, 2, 96, 64, 3)
    assert out["z"].shape == (1, 2, 96)
    assert out["valid"].shape == (1, 2)
    assert np.isfinite(np.asarray(out["corners"])).all()


def test_run_fused_matches_chained(pipeline):
    """run_fused (one jitted program) must agree with the 3-program chained
    path on every output that run() produces."""
    frames = jnp.asarray(
        np.random.default_rng(3).random((2, 128, 128, 3), np.float32)
    )
    mat = pipeline.store._matrix()
    a = pipeline.run(frames, mat)
    b = pipeline.run_fused(frames, mat)
    assert set(b) == set(a)
    np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
    np.testing.assert_allclose(
        np.asarray(a["corners"]), np.asarray(b["corners"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(a["match_scores"]), np.asarray(b["match_scores"]), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(a["match_idx"]), np.asarray(b["match_idx"])
    )


def test_run_2prog_matches_chained(pipeline):
    """run_2prog (detect + one rectify/embed/match program) must agree with
    the 3-program chained path on every output that run() produces."""
    frames = jnp.asarray(
        np.random.default_rng(3).random((2, 128, 128, 3), np.float32)
    )
    mat = pipeline.store._matrix()
    a = pipeline.run(frames, mat)
    b = pipeline.run_2prog(frames, mat)
    assert set(b) == set(a)
    np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
    np.testing.assert_allclose(
        np.asarray(a["corners"]), np.asarray(b["corners"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(a["match_scores"]), np.asarray(b["match_scores"]), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(a["match_idx"]), np.asarray(b["match_idx"])
    )


def test_oracle_corners_eval():
    """GT-corner oracle (run_corners + evaluate_oracle): recall is 1.0 by
    construction, every GT card is scored, and the match/detail fields are
    populated end-to-end (tiny untrained models, CPU)."""
    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.data.scene_gen import SceneGenerator
    from mtgvision_tpu.eval.e2e_eval import evaluate_oracle

    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="n")
    det_vars = det.init(rng, jnp.zeros((1, 160, 160, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(96, 64), z_size=96, head_type="conv+linear",
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    enc_vars = {"params": enc.init(rng, jnp.zeros((1, 96, 64, 3)))["params"]}
    cat = ProceduralCatalog(n_cards=8, card_hw=(112, 80))
    imgs = jnp.stack([
        jax.image.resize(jnp.asarray(cat.get_image(c)), (96, 64, 3), "linear")
        for c in cat
    ])
    zs = np.asarray(enc.apply(enc_vars, imgs))
    store = VectorStore(dim=96)
    store.save_points(
        [VectorPoint(id=c.id, vector=z) for c, z in zip(cat, zs)]
    )
    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=4, crop_hw=(96, 64),
        both_orientations=False,
    )
    gen = SceneGenerator(
        cat, ProceduralBackgrounds(bg_hw=(96, 96)), bg_size_hw=(160, 160),
        num_cards_min=1, num_cards_max=2, seed=5,
    )
    details = []
    stats = evaluate_oracle(pipe, gen, n_scenes=3, details=details)
    assert stats.recall == 1.0
    assert stats.n_detected == stats.n_gt >= 3
    assert len(details) == stats.n_gt
    assert all(np.isfinite(d["corner_err"]) for d in details)
    # ranks populated (untrained-net top-k itself is meaningless: the scene
    # compositor's photometric augs move random-net embeddings arbitrarily)
    assert all(d["rank"] >= -1 and d["score0"] is not None for d in details)


def test_box_snap_quads():
    """Occlusion shrinks the mask quad toward the visible half; the amodal
    box restores scale+center. Clean quads (AABB == box) are a no-op."""
    from mtgvision_tpu.infer.pipeline import box_snap_quads

    # true rotated card quad
    theta = 0.5
    c, s = np.cos(theta), np.sin(theta)
    r = np.asarray([[c, -s], [s, c]])
    half = np.asarray([[-70, -100], [70, -100], [70, 100], [-70, 100]], np.float64)
    true_q = half @ r.T + np.asarray([320.0, 240.0])
    box = np.asarray(
        [true_q[:, 0].min(), true_q[:, 1].min(), true_q[:, 0].max(), true_q[:, 1].max()]
    )
    # occlusion bias: quad shrunk 35% toward its top-left corner
    biased = true_q * 0.65 + true_q[0] * 0.35
    snapped = np.asarray(
        box_snap_quads(jnp.asarray(biased[None]), jnp.asarray(box[None]))
    )[0]
    err_before = np.linalg.norm(biased - true_q, axis=-1).mean()
    err_after = np.linalg.norm(snapped - true_q, axis=-1).mean()
    assert err_after < 0.35 * err_before, (err_before, err_after)
    # clean quad: no-op
    clean = np.asarray(
        box_snap_quads(jnp.asarray(true_q[None]), jnp.asarray(box[None]))
    )[0]
    assert np.abs(clean - true_q).max() < 1e-3


def test_degenerate_quad_yields_finite_scores(pipeline):
    """A collinear/degenerate quad must not leak NaN into match scores or the
    payload (json.dumps would emit NaN, which JS JSON.parse rejects); the
    slot is marked invalid instead."""
    frames = jnp.asarray(np.random.default_rng(1).random((1, 128, 128, 3), np.float32))
    corners = jnp.zeros((1, 4, 4, 2), jnp.float32)  # all-identical points
    corners = corners.at[0, 1].set(
        jnp.asarray([[10.0, 10.0], [60.0, 10.0], [60.0, 90.0], [10.0, 90.0]])
    )
    ok = jnp.ones((1, 4), bool)
    out = pipeline.run_corners(frames, corners, ok)
    assert np.isfinite(np.asarray(out["match_scores"])).all()
    assert np.isfinite(np.asarray(out["z"])).all()
    # the healthy slot survives; at least the degenerate ones may be dropped
    assert bool(out["valid"][0, 1])


def test_match_select_sharded_store(mesh8):
    """FramePipeline._match_select over a mesh-sharded store matrix must
    agree with the replicated path (SURVEY §2.5 plan b: sharded serving)."""
    from mtgvision_tpu.index import VectorPoint, VectorStore

    rng = np.random.default_rng(3)
    d = 32
    vecs = rng.standard_normal((40, d)).astype(np.float32)
    pts = [VectorPoint(id=f"c{i}", vector=v) for i, v in enumerate(vecs)]

    def mk_pipe(mesh):
        store = VectorStore(dim=d, capacity=16, mesh=mesh)
        store.save_points(pts)
        det = YoloSeg(num_classes=1, size="n")
        enc = ConvNeXtV2Encoder(
            image_hw=(32, 32), z_size=d, depths=(1, 1, 1, 1), dims=(8, 8, 8, 8)
        )
        return FramePipeline(det, None, enc, None, store=store, max_det=4, top_k=3)

    pipe_sh = mk_pipe(mesh8)
    pipe_re = mk_pipe(None)
    assert pipe_sh.mesh is mesh8 and pipe_re.mesh is None

    z = jnp.asarray(rng.random((2, 2, 4, d)), jnp.float32)
    corners = jnp.asarray(rng.random((2, 4, 4, 2)), jnp.float32)
    ms_s, mi_s, c_s, fl_s, _ = pipe_sh._match_select(
        z, corners, pipe_sh.store._matrix()
    )
    ms_r, mi_r, c_r, fl_r, _ = pipe_re._match_select(
        z, corners, pipe_re.store._matrix()
    )
    # top-1 row must agree exactly; scores to bf16-matmul tolerance
    np.testing.assert_array_equal(np.asarray(mi_s)[..., 0], np.asarray(mi_r)[..., 0])
    np.testing.assert_allclose(np.asarray(ms_s), np.asarray(ms_r), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(fl_s), np.asarray(fl_r))
    assert int(np.asarray(mi_s)[..., 0].max()) < 40
