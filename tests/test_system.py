"""eval/system.py checkpoint-loading round-trips (tiny models, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
import pytest

from mtgvision_tpu.eval.system import _restore_tree, load_detector

RNG = jax.random.PRNGKey(0)


def test_restore_tree_slim_params(tmp_path):
    tree = {"Dense_0": {"kernel": np.ones((4, 4), np.float32)}}
    ocp.PyTreeCheckpointer().save(tmp_path / "ck", tree)
    out = _restore_tree(tmp_path / "ck")
    assert set(out) == {"params"}
    assert np.allclose(out["params"]["Dense_0"]["kernel"], 1.0)


def test_restore_tree_train_state(tmp_path):
    tree = {
        "step": np.int32(5),
        "params": {"w": np.zeros(3, np.float32)},
        "batch_stats": {"m": np.ones(3, np.float32)},
        "opt_state": {"count": np.int32(5)},
    }
    ocp.PyTreeCheckpointer().save(tmp_path / "ck", tree)
    out = _restore_tree(tmp_path / "ck")
    assert set(out) == {"params", "batch_stats"}


def test_restore_tree_manager_dir_picks_latest(tmp_path):
    for step in (1, 2):
        ocp.PyTreeCheckpointer().save(
            tmp_path / f"step_{step:08d}", {"params": {"w": np.full(2, float(step))}}
        )
    out = _restore_tree(tmp_path)
    assert np.allclose(out["params"]["w"], 2.0)


def test_load_detector_roundtrip(tmp_path):
    from mtgvision_tpu.models.yolo import YoloSeg

    model = YoloSeg(num_classes=1, size="n")
    variables = model.init(RNG, jnp.zeros((1, 64, 64, 3)), False)
    ocp.PyTreeCheckpointer().save(
        tmp_path / "det", jax.device_get({k: variables[k] for k in variables})
    )
    det, det_vars = load_detector(tmp_path / "det", size="n", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    a = model.apply(variables, x, False)
    b = det.apply(det_vars, x, False)
    assert jnp.allclose(a["protos"], b["protos"], atol=1e-5)


def test_restore_tree_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        _restore_tree(tmp_path / "nope")
