"""Learned corner refinement + orientation from the dewarped crop.

Why a learned head. The e2e accuracy gap is GEOMETRY, not embeddings: the
trained encoder scores 100% top-1 on the clean retrieval protocol
(eval/validate.py, artifacts_r2/enc_validate_watch.jsonl) while the full
system sits at ~0.60 — the mask-moment corners quantize on the H/4 proto
grid (~12 px quad error at frame res) so the encoder sees misregistered
crops, and the notch heuristic mis-orients ~10-15% of near-symmetric cards.
Two non-learned fixes were built and measured first: subpixel mask line
fits (orient.refine_corners — neutral-to-harmful on predicted sigmoid
masks) and image-gradient edge snapping in crop space
(orient.refine_quad_from_crop — no gain: the true edge often falls outside
its stable search window, artifacts_r2/ablate_rc_{y,n}.json). The failure
mode is ambiguity — card art is full of lines that look like edges — which
is exactly what a small supervised net resolves.

One head, two outputs, from the (192,128) crop the pipeline already made:
  * per-corner offsets (4,2) in crop px — where the card's physical quad
    actually sits relative to the nominal 5% margin rectangle the dewarp
    aimed for (extract_dewarped/od_export.py:95-110 convention). The
    pipeline back-projects ``nominal+offsets`` through the known crop→frame
    homography and re-dewarps: sub-proto-grid corners without full-res
    masks or gathers.
  * a 180°-flip logit (the OrientHead signal, models/orient_head.py) —
    replacing the 2× dual-orientation encoder fallback with one pass.

The reference has no counterpart (it trusts ultralytics full-res masks +
approxPolyN, od_export.py:75-93); this is the TPU-native route: fixed
shapes, one small conv program, batched over all detections.

Trained fully device-side on the synthetic stream with known perturbed
quads — train/refine_train.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def nominal_quad(out_hw: tuple[int, int] = (192, 128), expand_ratio: float = 0.05):
    """The dst rectangle every dewarp aims the card's quad at — [TL,TR,BR,BL]
    crop-space px (extract_dewarped's dst, orient.py:241-249)."""
    oh, ow = out_hw
    e = expand_ratio
    return jnp.asarray(
        [[ow * e, oh * e], [ow * (1 - e), oh * e],
         [ow * (1 - e), oh * (1 - e)], [ow * e, oh * (1 - e)]],
        jnp.float32,
    )


class RefineHead(nn.Module):
    """(B, H, W, 3) float [0,1] crops → ((B,4,2) corner offsets crop-px,
    (B,) flip logits, >0 ⇒ crop is 180°-rotated).

    Conv-SiLU column (stride-2 ×4 → 12×8 at 192×128), then FLATTENED dense —
    corner localization needs the spatial layout a GAP would destroy; the
    flip logit shares the trunk. Offsets are tanh-bounded to ±``max_offset``
    so a confused head can never fling a quad across the frame.
    """

    widths: tuple[int, ...] = (24, 48, 96, 128)
    max_offset: float = 24.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = x.astype(self.dtype)
        for w in self.widths:
            h = nn.Conv(w, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
            h = nn.silu(h)
        h = h.reshape(h.shape[0], -1)  # keep spatial layout (12·8·128)
        h = nn.silu(nn.Dense(256, dtype=self.dtype)(h))
        # zero-init output: the untrained head predicts ZERO offsets (an
        # identity refinement), so training starts stable instead of tanh-
        # saturated — standard for residual geometric-refinement heads
        out = nn.Dense(
            9, dtype=jnp.float32, kernel_init=nn.initializers.zeros
        )(h.astype(jnp.float32))
        offsets = jnp.tanh(out[:, :8]).reshape(-1, 4, 2) * self.max_offset
        return offsets, out[:, 8]
