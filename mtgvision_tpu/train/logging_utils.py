"""Metrics + image-grid logging — wandb/ImageLoggingCallback parity.

The reference logs scalars with WandbLogger (encoder_train.py:721-725, :444)
and input/recon image grids every 2500 steps (ImageLoggingCallback :531-628).
Here: JSONL scalars (always), wandb when importable, PNG image grids on disk.
"""

from __future__ import annotations

import json
import pathlib
import time
import numpy as np


class MetricsLogger:
    def __init__(self, run_dir: str | pathlib.Path, run_name: str = "run", use_wandb: bool = True):
        self.dir = pathlib.Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa

                self._wandb = wandb
                wandb.init(project="mtgvision-tpu", name=run_name, dir=str(self.dir))
            except Exception:
                self._wandb = None

    def log(self, step: int, scalars: dict):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_images(self, step: int, name: str, images: np.ndarray, ncol: int = 8):
        """Save a (N,H,W,3) [0,1] grid as PNG (ImageLoggingCallback :560-624)."""
        from PIL import Image

        images = np.clip(np.asarray(images), 0, 1)
        n, h, w, c = images.shape
        ncol = min(ncol, n)
        nrow = (n + ncol - 1) // ncol
        grid = np.zeros((nrow * h, ncol * w, c), np.float32)
        for i in range(n):
            r, cc = divmod(i, ncol)
            grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = images[i]
        out = self.dir / "images"
        out.mkdir(exist_ok=True)
        Image.fromarray((grid * 255).astype(np.uint8)).save(
            out / f"{name}_{step:08d}.png"
        )

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
