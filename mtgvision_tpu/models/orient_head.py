"""Tiny pixel-space orientation classifier for dewarped card crops.

TPU-first redesign of orientation disambiguation. The reference derives
card top/bottom from the U-mask notch (od_export.py:52-93, shapely buffer
trick). That signal lives in the segmentation mask — but at TPU serving
resolution the proto masks are H/4 (a ~25 px card renders the notch at
2-3 px) and measurement shows it is essentially unreadable there:
scripts/orient_diag.py on predicted masks → initial-guess flip rate 0.30-0.32
for BOTH the notch-coverage and centroid-extent heuristics (random = 0.5).

The pixels of the rectified crop carry a far stronger signal (title bar at
the top, text box at the bottom — invariant across Magic frames), so a
4-conv/GAP head classifies "is this crop 180° rotated" directly from the
(192,128) dewarped crop. Cost: ~0.1 GFLOP/crop ≈ 1% of the encoder pass; in
exchange the pipeline can run a SINGLE encoder pass (the dual-orientation
fallback costs a full 2×) — see infer/pipeline.py ``orient_mode``.

Trained on the same device-side synthetic stream as the encoder
(data/encoder_gen.make_virtual) with random 180° rotations as labels —
train/orient_train.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class OrientHead(nn.Module):
    """(B, H, W, 3) float [0,1] crops → (B,) flip logits (>0 ⇒ 180°-rotated).

    Straight conv-SiLU column (no BN — batch-stat-free so serving needs no
    extra state), GAP, linear. Default widths give ~90k params.
    """

    widths: tuple[int, ...] = (24, 48, 96, 192)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for w in self.widths:
            h = nn.Conv(w, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
            h = nn.silu(h)
        h = jnp.mean(h, axis=(1, 2))  # GAP
        logit = nn.Dense(1, dtype=jnp.float32)(h.astype(jnp.float32))
        return logit[..., 0]
