"""Checkpoint/resume via orbax — Lightning ModelCheckpoint parity.

Reference behavior being matched (mtgvision/encoder_train.py):
- periodic checkpoints, keep top-k by loss (:735-740),
- resume from a path (:760-763), final model save (:767),
- architecture-tolerant restore: missing/new params keep their fresh init
  (`strict_loading = False` :757) and optimizer state is skipped when shapes
  moved (`skip_first_optimizer_load_state` :484-493),
- checkpoints are self-describing: the config dict rides along (:265-266).
"""

from __future__ import annotations

import json
import pathlib
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Keep-top-k checkpoint manager over orbax PyTreeCheckpointer."""

    def __init__(self, directory: str | pathlib.Path, keep_top_k: int = 3):
        self.dir = pathlib.Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_top_k = keep_top_k
        self._ckpt = ocp.PyTreeCheckpointer()
        self._scores: dict[int, float] = {}
        self._load_meta()

    def _meta_path(self) -> pathlib.Path:
        return self.dir / "manager.json"

    def _load_meta(self):
        if self._meta_path().exists():
            meta = json.loads(self._meta_path().read_text())
            self._scores = {int(k): v for k, v in meta.get("scores", {}).items()}

    def _save_meta(self):
        self._meta_path().write_text(json.dumps({"scores": self._scores}))

    def step_dir(self, step: int) -> pathlib.Path:
        return self.dir / f"step_{step:08d}"

    def save(self, step: int, state: Any, config: dict | None = None, score: float = 0.0):
        """Save state; evict the worst checkpoint beyond keep_top_k (top =
        lowest score, matching ModelCheckpoint monitor='loss' mode='min').

        The MOST RECENT checkpoint is exempt from score eviction (Lightning's
        top-k + final-save behavior): resume paths restore ``latest_step()``,
        so evicting the newest save would roll a crashed/supervised run back
        to an older step and could drop the final trained state entirely.
        """
        path = self.step_dir(step)
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(state))
        if config is not None:
            (path / "config.json").write_text(json.dumps(config))
        self._scores[step] = float(score)
        newest = max(self._scores)
        while len(self._scores) > self.keep_top_k:
            evictable = [s for s in self._scores if s != newest]
            worst = max(evictable, key=self._scores.get)
            self._scores.pop(worst)
            sp = self.step_dir(worst)
            if sp.exists():
                shutil.rmtree(sp)
        self._save_meta()

    def latest_step(self) -> Optional[int]:
        steps = [
            int(p.name.split("_")[1]) for p in self.dir.glob("step_*") if p.is_dir()
        ]
        return max(steps) if steps else None

    def restore(self, step: int | None = None, target: Any = None) -> Any:
        """Restore a checkpoint. With ``target``, performs ARCH-TOLERANT
        merging: leaves present in both (and shape-compatible) come from the
        checkpoint, everything else keeps the target's fresh value — the
        strict_loading=False semantics."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        raw = self._ckpt.restore(self.step_dir(step))
        if target is None:
            return raw
        return merge_compatible(target, raw)

    def load_config(self, step: int | None = None) -> dict | None:
        step = step if step is not None else self.latest_step()
        p = self.step_dir(step) / "config.json"
        return json.loads(p.read_text()) if p.exists() else None


def _norm_path(path) -> str:
    """Container-agnostic path key: orbax restores every record as nested
    dicts (DictKey), while live TrainStates flatten to GetAttrKey (struct
    fields) / SequenceKey (optax tuples). Normalizing each entry to its NAME
    makes ``.step`` and ``['step']`` the same path — without this the
    tolerant merge silently restores nothing into dataclass states."""
    parts = []
    for e in path:
        if hasattr(e, "name"):  # GetAttrKey
            parts.append(str(e.name))
        elif hasattr(e, "key"):  # DictKey
            parts.append(str(e.key))
        elif hasattr(e, "idx"):  # SequenceKey
            parts.append(str(e.idx))
        else:
            parts.append(str(e))
    return "/".join(parts)


def merge_compatible(target: Any, restored: Any) -> Any:
    """Merge restored leaves into target where paths+shapes match (tolerant
    restore — encoder_train.py:757 strict_loading=False equivalent)."""
    t_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    r_paths, _ = jax.tree_util.tree_flatten_with_path(restored)
    r_map = {_norm_path(k): v for k, v in r_paths}
    out = []
    for k, v in t_paths:
        rv = r_map.get(_norm_path(k))
        if rv is not None and getattr(rv, "shape", None) == getattr(v, "shape", None):
            out.append(np.asarray(rv).astype(v.dtype) if hasattr(v, "dtype") else rv)
        else:
            out.append(v)
    return jax.tree_util.tree_unflatten(treedef, out)
