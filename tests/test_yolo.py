"""Detector tests: model shapes, decode, NMS, full jitted inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.models.yolo import (
    NM,
    REG_MAX,
    YoloSeg,
    _box_iou,
    decode_predictions,
    detect,
    nms_fixed,
)

RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def tiny_model():
    model = YoloSeg(num_classes=1, size="n")
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(RNG, x, False)
    return model, variables


def test_model_output_shapes(tiny_model):
    model, variables = tiny_model
    x = jnp.zeros((2, 128, 128, 3))
    out = model.apply(variables, x, False)
    assert len(out["preds"]) == 3
    for p, s in zip(out["preds"], (8, 16, 32)):
        assert p.shape == (2, 128 // s, 128 // s, 4 * REG_MAX + 1 + NM)
    assert out["protos"].shape == (2, 32, 32, NM)


def test_decode_shapes(tiny_model):
    model, variables = tiny_model
    x = jnp.zeros((2, 128, 128, 3))
    out = model.apply(variables, x, False)
    flat = decode_predictions(out, (128, 128), 1)
    n = 16 * 16 + 8 * 8 + 4 * 4
    assert flat.shape == (2, n, 4 + 1 + NM)
    boxes = np.asarray(flat[..., :4])
    # class probs are sigmoid → (0,1); with -4.6 bias init ≈ 0.01
    probs = np.asarray(flat[..., 4])
    assert (probs > 0).all() and (probs < 1).all()
    assert probs.mean() < 0.15
    # DFL distances are non-negative → valid box ordering always holds
    assert (boxes[..., 2] >= boxes[..., 0]).all()
    assert (boxes[..., 3] >= boxes[..., 1]).all()
    assert np.isfinite(boxes).all()


def test_box_iou():
    a = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(_box_iou(a, b))
    assert np.isclose(iou[0, 0], 1.0)
    assert np.isclose(iou[0, 1], 25 / 175, atol=1e-5)
    assert iou[0, 2] == 0.0


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [100, 100, 110, 110]]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.1])
    classes = jnp.zeros(4, jnp.int32)
    sel, val = nms_fixed(boxes, scores, classes, max_det=4, score_thresh=0.25)
    sel, val = np.asarray(sel), np.asarray(val)
    kept = set(sel[val].tolist())
    assert kept == {0, 2}  # box1 suppressed by box0; box3 below threshold


def test_nms_class_aware():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [1, 1, 11, 11]])
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 1], jnp.int32)
    sel, val = nms_fixed(boxes, scores, classes, max_det=4)
    assert np.asarray(val).sum() == 2  # different classes → both kept


def test_detect_jits(tiny_model):
    model, variables = tiny_model
    x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3), np.float32))
    fn = jax.jit(lambda v, im: detect(v, model, im, max_det=8))
    boxes, scores, classes, masks, valid = fn(variables, x)
    assert boxes.shape == (1, 8, 4)
    assert scores.shape == (1, 8)
    assert masks.shape == (1, 8, 32, 32)
    assert valid.dtype == bool
    # untrained net with 0.01-prior cls bias → no detections above 0.25
    assert not np.asarray(valid).any()


def test_model_sizes_param_scale():
    xs = jnp.zeros((1, 64, 64, 3))
    n_params = {}
    for size in ("n", "s"):
        m = YoloSeg(num_classes=1, size=size)
        v = m.init(RNG, xs, False)
        n_params[size] = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n_params["s"] > 2 * n_params["n"]
