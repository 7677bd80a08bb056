"""Checkpoint manager + config CLI + short train-loop smoke tests."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.train.checkpoint import CheckpointManager, merge_compatible
from mtgvision_tpu.train.config_cli import parse_config
from mtgvision_tpu.train.encoder_train import EncoderConfig, create_state


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck", keep_top_k=3)
    state = {"a": np.arange(6.0).reshape(2, 3), "b": {"c": np.ones(4)}}
    mgr.save(100, state, config={"x": 1}, score=0.5)
    out = mgr.restore(100)
    assert np.allclose(out["a"], state["a"])
    assert np.allclose(out["b"]["c"], 1.0)
    assert mgr.load_config(100) == {"x": 1}
    assert mgr.latest_step() == 100


def test_keep_top_k_eviction(tmp_path):
    mgr = CheckpointManager(tmp_path / "ck", keep_top_k=2)
    s = {"a": np.zeros(2)}
    mgr.save(1, s, score=5.0)
    mgr.save(2, s, score=1.0)
    mgr.save(3, s, score=3.0)
    # worst (score 5.0 at step 1) evicted
    assert not mgr.step_dir(1).exists()
    assert mgr.step_dir(2).exists() and mgr.step_dir(3).exists()


def test_keep_top_k_never_evicts_newest(tmp_path):
    """The most recent checkpoint is exempt from score eviction — resume
    restores latest_step(), so evicting the newest save would roll a
    crashed run back (ADVICE r1: final high-loss saves were deletable)."""
    mgr = CheckpointManager(tmp_path / "ck", keep_top_k=2)
    s = {"a": np.zeros(2)}
    mgr.save(1, s, score=1.0)
    mgr.save(2, s, score=2.0)
    mgr.save(3, s, score=99.0)  # newest AND worst — must survive
    assert mgr.step_dir(3).exists()
    assert mgr.latest_step() == 3
    # the worst among the NON-newest (step 2) was evicted instead
    assert mgr.step_dir(1).exists() and not mgr.step_dir(2).exists()
    # a fresh save makes step 3 evictable again (now newest = 4)
    mgr.save(4, s, score=0.5)
    assert mgr.step_dir(4).exists() and not mgr.step_dir(3).exists()


def test_merge_compatible_tolerant():
    target = {"w": np.zeros((2, 3)), "new": np.full(4, 7.0)}
    restored = {"w": np.ones((2, 3)), "old": np.zeros(9), "shape_moved": np.zeros(1)}
    out = merge_compatible(target, restored)
    assert np.allclose(out["w"], 1.0)  # restored where compatible
    assert np.allclose(out["new"], 7.0)  # fresh init kept


def test_restore_into_train_state(tmp_path):
    config = EncoderConfig(model_name="cnvnxt2ae_atto", precision="fp32",
                           loss_recon="", loss_contrastive="circle")
    state = create_state(config, jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(5, {"params": state.params}, score=1.0)
    # perturb, then restore merges back
    fresh = create_state(config, jax.random.PRNGKey(1))
    merged = mgr.restore(target={"params": fresh.params})
    a = jax.tree.leaves(merged["params"])[0]
    b = jax.tree.leaves(state.params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_config_cli_bool_and_none():
    cfg = parse_config(
        EncoderConfig,
        ["--model-name", "cnvnxt2ae_tiny", "--predownload", "y",
         "--loss-recon", "none", "--learning-rate", "3e-4"],
    )
    assert cfg.model_name == "cnvnxt2ae_tiny"
    assert cfg.predownload is True
    assert cfg.loss_recon == ""
    assert cfg.learning_rate == pytest.approx(3e-4)


def test_config_cli_scale_disables_loss():
    cfg = parse_config(EncoderConfig, ["--scale-loss-contrastive", "0"])
    assert cfg.loss_contrastive == ""


def test_train_loop_smoke(tmp_path):
    """2-step full train() loop: logs written, checkpoint saved."""
    from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
    from mtgvision_tpu.train.encoder_train import train

    config = EncoderConfig(
        model_name="cnvnxt2ae_atto", precision="fp32", loss_recon="mse",
        loss_contrastive="circle", batch_size=2, max_steps=2, ckpt_every=2,
        log_every=1, img_log_every=0, ckpt_dir=str(tmp_path / "run"), n_devices=1,
    )
    cat = ProceduralCatalog(n_cards=8, card_hw=(224, 160))
    state = train(config, cat, ProceduralBackgrounds(bg_hw=(224, 224)))
    assert int(state.step) == 2
    lines = (tmp_path / "run" / "logs" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) >= 2
    assert "loss" in json.loads(lines[0])
    mgr = CheckpointManager(tmp_path / "run")
    assert mgr.latest_step() == 2


def test_supervisor_retries_until_success():
    from mtgvision_tpu.train.supervisor import supervise

    calls = []
    rcs = iter([1, 1, 0])

    def fake_run(cmd):
        calls.append(list(cmd))
        return next(rcs)

    slept = []
    rc = supervise(
        ["train", "--x"], attempts=5, backoff_sec=7,
        run=fake_run, sleep=slept.append, log=lambda *_: None,
    )
    assert rc == 0
    assert len(calls) == 3
    assert slept == [7, 7]


def test_supervisor_gives_up():
    from mtgvision_tpu.train.supervisor import supervise

    rc = supervise(
        ["x"], attempts=3, backoff_sec=0,
        run=lambda c: 9, sleep=lambda s: None, log=lambda *_: None,
    )
    assert rc == 9


def test_supervisor_cli_parsing(monkeypatch):
    from mtgvision_tpu.train import supervisor

    seen = {}

    def fake_supervise(cmd, attempts, backoff_sec):
        seen.update(cmd=cmd, attempts=attempts, backoff=backoff_sec)
        return 0

    monkeypatch.setattr(supervisor, "supervise", fake_supervise)
    assert supervisor._cli(["--attempts", "4", "--", "echo", "hi"]) == 0
    assert seen == {"cmd": ["echo", "hi"], "attempts": 4, "backoff": 90.0}


def test_restore_into_struct_train_state(tmp_path):
    """Regression: struct.PyTreeNode targets flatten to GetAttrKey paths while
    orbax restores DictKey dicts — the merge must match them by NAME, else
    resume silently restores nothing."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import struct
    from typing import Any

    class S(struct.PyTreeNode):
        step: jnp.ndarray
        params: Any
        opt_state: Any

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    params = {"w": jnp.ones(3)}
    saved = S(step=jnp.asarray(77, jnp.int32), params={"w": jnp.full(3, 5.0)},
              opt_state=tx.init(params))
    mgr = CheckpointManager(tmp_path)
    mgr.save(77, saved)

    fresh = S(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))
    merged = mgr.restore(target=fresh)
    assert int(merged.step) == 77
    assert np.allclose(np.asarray(merged.params["w"]), 5.0)
