"""Track-level eval harness tests (tiny models, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
from mtgvision_tpu.data.scene_gen import SceneGenerator
from mtgvision_tpu.eval.track_eval import (
    TrackStats,
    camera_walk,
    evaluate_tracked,
    scene_sequence,
)


def test_camera_walk_identity_start_and_smooth():
    rng = np.random.default_rng(0)
    mats = camera_walk(rng, 6, (128, 128))
    assert len(mats) == 6
    assert np.allclose(mats[0], np.eye(3))
    # successive transforms stay small (webcam wobble, not teleportation):
    # a frame-center point moves only a few px per step
    c = np.asarray([64.0, 64.0, 1.0])
    prev = c[:2]
    for m in mats[1:]:
        p = (m @ c)[:2]
        assert np.linalg.norm(p - prev) < 25.0
        prev = p


def test_scene_sequence_shapes_and_gt_motion():
    catalog = ProceduralCatalog(n_cards=8, card_hw=(112, 80))
    gen = SceneGenerator(
        catalog, ProceduralBackgrounds(), bg_size_hw=(128, 128),
        num_cards_min=1, num_cards_max=2, seed=3,
        card_min_area_ratio=0.2,
    )
    frames, gt = scene_sequence(gen, 4)
    assert frames.shape == (4, 128, 128, 3)
    assert np.isfinite(frames).all()
    for card, ms in gt:
        assert len(ms) == 4  # one placement matrix per frame
        # frame-0 matrix is the base placement; later ones drift smoothly
        base = ms[0]
        for m in ms[1:]:
            assert np.abs(m - base).max() < 50.0


@pytest.mark.slow
def test_evaluate_tracked_runs():
    """Harness runs end-to-end on untrained models (zero tracks is fine) and
    returns coherent counters."""
    from mtgvision_tpu.infer.pipeline import FramePipeline
    from mtgvision_tpu.index import VectorPoint, VectorStore
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
    store = VectorStore(dim=96)
    vecs = np.random.default_rng(0).standard_normal((10, 96)).astype(np.float32)
    store.save_points(
        [VectorPoint(id=f"c{i}", vector=v) for i, v in enumerate(vecs)]
    )
    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=store, max_det=4,
        crop_hw=(96, 64), top_k=3, score_thresh=0.0,
    )
    catalog = ProceduralCatalog(n_cards=8, card_hw=(112, 80))
    gen = SceneGenerator(
        catalog, ProceduralBackgrounds(), bg_size_hw=(128, 128),
        num_cards_min=1, num_cards_max=2, seed=1, card_min_area_ratio=0.2,
    )
    details: list = []
    stats = evaluate_tracked(
        pipe, gen, n_scenes=2, n_frames=4, min_track_frames=2,
        details=details,
    )
    assert isinstance(stats, TrackStats)
    assert stats.n_gt >= 2
    assert 0 <= stats.n_tracked <= stats.n_gt
    assert stats.n_top1_ewma <= stats.n_tracked
    assert len(details) == stats.n_gt
    str(stats)  # formats without crashing
