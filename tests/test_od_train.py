"""Detector loss + training tests (tiny shapes, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
from mtgvision_tpu.models.yolo import YoloSeg
from mtgvision_tpu.train.od_losses import (
    anchor_points,
    detection_loss,
    dfl_loss,
    pairwise_ciou,
    task_aligned_assign,
)
from mtgvision_tpu.train.od_train import (
    DetectorConfig,
    DetectorDataset,
    create_det_state,
    make_det_train_step,
)

IMG = 64  # tiny frames for CPU


def test_anchor_points():
    pts, strides = anchor_points((64, 64))
    assert pts.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
    assert float(pts[0, 0]) == 4.0  # first P3 anchor center
    assert float(strides[0]) == 8.0 and float(strides[-1]) == 32.0


def test_ciou_identity_and_disjoint():
    a = jnp.asarray([10.0, 10, 20, 20])
    assert float(pairwise_ciou(a, a)) == pytest.approx(1.0, abs=1e-5)
    b = jnp.asarray([100.0, 100, 120, 120])
    assert float(pairwise_ciou(a, b)) < 0.0  # disjoint → negative CIoU


def test_dfl_loss_peak():
    # distribution peaked exactly at the target bin → low loss
    logits = jnp.full((1, 4, 16), -10.0).at[:, :, 5].set(10.0)
    lo = float(dfl_loss(logits, jnp.full((1, 4), 5.0)).mean())
    hi = float(dfl_loss(logits, jnp.full((1, 4), 10.0)).mean())
    assert lo < 0.01 < hi


def test_task_aligned_assign_picks_matching_anchor():
    n, m = 84, 2
    anchors, _ = anchor_points((IMG, IMG))
    gt_boxes = jnp.asarray([[[4.0, 4, 28, 28], [40.0, 40, 60, 60]]])
    gt_labels = jnp.zeros((1, m), jnp.int32)
    gt_valid = jnp.asarray([[True, True]])
    # pred boxes == anchor-centered small boxes; score high inside gt0 region
    pred_boxes = jnp.concatenate(
        [anchors - 6.0, anchors + 6.0], -1
    )[None]
    scores = jnp.full((1, n, 1), 0.5)
    assigned, fg, ts = task_aligned_assign(
        scores, pred_boxes, anchors, gt_boxes, gt_labels, gt_valid
    )
    fg = np.asarray(fg[0])
    assigned = np.asarray(assigned[0])
    assert fg.sum() > 0
    # anchors inside gt0 assigned to gt 0, inside gt1 to gt 1
    a = np.asarray(anchors)
    for i in np.where(fg)[0]:
        gi = assigned[i]
        gb = np.asarray(gt_boxes[0, gi])
        assert gb[0] < a[i, 0] < gb[2] and gb[1] < a[i, 1] < gb[3]


@pytest.fixture(scope="module")
def det_setup():
    config = DetectorConfig(
        model_size="n", img_size=IMG, batch_size=2, pool_size=8, bg_pool_size=4,
        precision="fp32", max_steps=100, warmup_steps=0, learning_rate=5e-3,
    )
    cat = ProceduralCatalog(n_cards=8, card_hw=(48, 32))
    ds = DetectorDataset(
        cat, ProceduralBackgrounds(bg_hw=(64, 64)), config, num_cards_max=2
    )
    return config, ds


def test_detector_dataset_batch(det_setup):
    config, ds = det_setup
    b = ds.random_batch()
    assert b["images"].shape == (2, IMG, IMG, 3)
    assert b["gt_boxes"].shape == (2, 10, 4)
    assert b["gt_masks"].shape == (2, 10, IMG // 4, IMG // 4)
    assert np.isfinite(np.asarray(b["images"])).all()
    # valid gts have positive area and nonzero masks
    valid = np.asarray(b["gt_valid"])
    boxes = np.asarray(b["gt_boxes"])
    masks = np.asarray(b["gt_masks"])
    for bi in range(2):
        for k in np.where(valid[bi])[0]:
            assert boxes[bi, k, 2] > boxes[bi, k, 0]
            assert masks[bi, k].sum() > 0


def test_det_train_step_runs_and_improves(det_setup):
    config, ds = det_setup
    state = create_det_state(config, jax.random.PRNGKey(0))
    step = make_det_train_step(config)
    batch = ds.random_batch()
    losses = []
    for _ in range(8):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    assert all(np.isfinite(losses))
    # same batch, 8 SGD steps → average loss falls
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
    assert {"loss_box", "loss_cls", "loss_dfl", "loss_mask"} <= set(logs)


def test_det_train_step_dp_mesh(det_setup, mesh8):
    config, ds = det_setup
    state = create_det_state(config, jax.random.PRNGKey(0))
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec())
    )
    step = make_det_train_step(config, mesh8)
    from mtgvision_tpu.parallel.mesh import shard_batch

    # batch of 8 for the 8-device mesh
    cfg8 = DetectorConfig(
        model_size="n", img_size=IMG, batch_size=8, pool_size=8, bg_pool_size=4,
        precision="fp32",
    )
    cat = ProceduralCatalog(n_cards=8, card_hw=(48, 32))
    ds8 = DetectorDataset(cat, ProceduralBackgrounds(bg_hw=(64, 64)), cfg8, num_cards_max=2)
    batch = shard_batch(mesh8, ds8.random_batch())
    state, logs = step(state, batch)
    assert np.isfinite(float(logs["loss"]))


def test_obb_kind_training():
    """OBB kind: 3-class keypoint-box GT, no mask loss, step runs."""
    config = DetectorConfig(
        model_size="n", kind="obb", img_size=IMG, batch_size=2, pool_size=8,
        bg_pool_size=4, precision="fp32", warmup_steps=0,
    )
    assert config.num_classes == 3
    cat = ProceduralCatalog(n_cards=8, card_hw=(48, 32))
    ds = DetectorDataset(cat, ProceduralBackgrounds(bg_hw=(64, 64)), config, num_cards_max=2)
    b = ds.random_batch()
    assert b["gt_boxes"].shape == (2, 30, 4)
    assert b["gt_labels"].shape == (2, 30)
    assert "gt_masks" not in b
    valid = np.asarray(b["gt_valid"])
    labels = np.asarray(b["gt_labels"])
    boxes = np.asarray(b["gt_boxes"])
    # the batch must contain real placements — an all-invalid batch trains
    # the detector to predict nothing (the pre-fix scaled-pad bug did
    # exactly that at img sizes below the native card diagonal)
    assert valid.any()
    for bi in range(2):
        vs = np.where(valid[bi])[0]
        if len(vs):
            assert set(labels[bi, vs]) <= {0, 1, 2}
            # top (1) and bottom (2) boxes sit inside the card (0) box
            for base in vs[::3]:
                card = boxes[bi, base]
                for sub in (base + 1, base + 2):
                    assert boxes[bi, sub, 0] >= card[0] - 1
                    assert boxes[bi, sub, 2] <= card[2] + 1
    state = create_det_state(config, jax.random.PRNGKey(0))
    step = make_det_train_step(config)
    state, logs = step(state, b)
    assert np.isfinite(float(logs["loss"]))
    assert "loss_mask" not in logs


def test_scene_pool_dataset(det_setup):
    from mtgvision_tpu.train.od_train import ScenePoolDataset

    config, ds = det_setup
    pool = ScenePoolDataset(ds, n_scenes=4)
    assert pool.n_scenes == 4
    assert pool.images_u8.shape == (4, IMG, IMG, 3)
    assert pool.images_u8.dtype == jnp.uint8
    b = pool.random_batch()
    assert b["images"].shape == (2, IMG, IMG, 3)
    assert b["images"].dtype == jnp.float32
    assert b["gt_boxes"].shape == (2, 10, 4)
    assert b["gt_masks"].shape == (2, 10, IMG // 4, IMG // 4)
    v = np.asarray(b["images"])
    assert np.isfinite(v).all() and v.min() >= 0.0 and v.max() <= 1.0
    # two draws share pool geometry but differ photometrically
    b2 = pool.random_batch()
    assert b2["images"].shape == b["images"].shape


def test_scene_pool_cache_roundtrip(det_setup, tmp_path):
    from mtgvision_tpu.train.od_train import ScenePoolDataset

    config, ds = det_setup
    cache = str(tmp_path / "pool.npz")
    p1 = ScenePoolDataset(ds, n_scenes=4, cache_path=cache)
    p2 = ScenePoolDataset(ds, n_scenes=4, cache_path=cache)
    assert np.array_equal(np.asarray(p1.images_u8), np.asarray(p2.images_u8))
    assert np.array_equal(np.asarray(p1.boxes), np.asarray(p2.boxes))
    assert p2.with_masks == p1.with_masks


def test_scene_pool_refresh(det_setup):
    """refresh() swaps in fresh geometry at the rotating cursor and leaves
    shapes/dtypes (and the untouched slots) intact."""
    from mtgvision_tpu.train.od_train import ScenePoolDataset

    config, ds = det_setup
    pool = ScenePoolDataset(ds, n_scenes=4)
    before_imgs = np.asarray(pool.images_u8).copy()
    before_boxes = np.asarray(pool.boxes).copy()
    pool.refresh(1)  # one batch (batch_size=2) → slots 0..1 replaced
    after_imgs = np.asarray(pool.images_u8)
    after_boxes = np.asarray(pool.boxes)
    assert after_imgs.shape == before_imgs.shape
    assert after_imgs.dtype == np.uint8
    assert not np.array_equal(before_imgs[:2], after_imgs[:2])
    assert not np.array_equal(before_boxes[:2], after_boxes[:2])
    assert np.array_equal(before_imgs[2:], after_imgs[2:])  # untouched slots
    assert pool._refresh_pos == 2
    b = pool.random_batch()  # sampling still works post-refresh
    assert np.isfinite(np.asarray(b["images"])).all()
    pool.refresh(1)
    assert pool._refresh_pos == 0  # cursor wraps


def test_scene_pool_cache_invalidated_by_config(det_setup, tmp_path):
    """A pool cached for one config must NOT be reused for a different
    geometry config (ADVICE r1: count-only validation reused stale pools)."""
    from mtgvision_tpu.train.od_train import ScenePoolDataset

    config, ds = det_setup
    cache = str(tmp_path / "pool.npz")
    p1 = ScenePoolDataset(ds, n_scenes=4, cache_path=cache)
    cfg2 = dataclasses.replace(config, seed=config.seed + 1)
    ds2 = DetectorDataset(
        ProceduralCatalog(n_cards=8, card_hw=(48, 32)),
        ProceduralBackgrounds(bg_hw=(64, 64)),
        cfg2,
        num_cards_max=2,
    )
    p2 = ScenePoolDataset(ds2, n_scenes=4, cache_path=cache)  # rebuilds
    assert not np.array_equal(np.asarray(p1.images_u8), np.asarray(p2.images_u8))


def test_det_train_scan(det_setup):
    from mtgvision_tpu.train.od_train import ScenePoolDataset, make_det_train_scan

    config, ds = det_setup
    import dataclasses

    cfg = dataclasses.replace(config, scan_steps=3)
    pool = ScenePoolDataset(ds, n_scenes=4)
    state = create_det_state(cfg, jax.random.PRNGKey(0))
    scan = make_det_train_scan(cfg, pool)
    state, logs = scan(state, jax.random.PRNGKey(1))
    assert int(jax.device_get(state.step)) == 3
    assert np.isfinite(float(logs["loss"]))
    state, logs = scan(state, jax.random.PRNGKey(2))
    assert int(jax.device_get(state.step)) == 6


def test_reference_parity_distribution():
    """The ACTIVE reference training regime (od_datasets.py:861-873):
    ~ratio_bg pure-background scenes, jitter 0.7, effective edge visibility
    0.5 — edge-clipped cards (quad extending past the frame) must occur."""
    config = DetectorConfig(
        seed=0, img_size=IMG, batch_size=8, pool_size=8, bg_pool_size=4,
        precision="fp32",
    )
    assert config.ratio_bg == 0.1
    assert config.jitter_ratio == 0.7
    assert config.min_visible_edge == 0.0
    cat = ProceduralCatalog(n_cards=8, card_hw=(48, 32))
    ds = DetectorDataset(cat, ProceduralBackgrounds(bg_hw=(64, 64)), config)
    n_empty = n_scenes = n_clipped = 0
    for _ in range(8):
        b = ds.random_batch()
        valid = np.asarray(b["gt_valid"])
        boxes = np.asarray(b["gt_boxes"])
        for bi in range(valid.shape[0]):
            n_scenes += 1
            if not valid[bi].any():
                n_empty += 1
                continue
            # clipped GT boxes touching the frame border ⇒ edge-clipped card
            for k in np.where(valid[bi])[0]:
                x1, y1, x2, y2 = boxes[bi, k]
                if x1 <= 0.5 or y1 <= 0.5 or x2 >= IMG - 0.5 or y2 >= IMG - 0.5:
                    n_clipped += 1
    # binomial(64, 0.1): P(0 empty) ≈ 0.1%; placement can also fail, adding
    # empties — accept any nonzero count up to half
    assert 0 < n_empty < n_scenes // 2
    # with effective edge visibility 0.5, border-touching cards are common
    assert n_clipped >= 3
