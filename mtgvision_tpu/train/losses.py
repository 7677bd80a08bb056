"""Metric-learning + reconstruction losses, pure JAX.

Replaces pytorch-metric-learning and kornia losses used by the reference
trainer (mtgvision/encoder_train.py:290-311 recon registry, :364-402 metric
registry). Semantics follow pytorch-metric-learning's defaults so a config
written for the reference behaves identically:

- ``ntxent``              NTXentLoss(temperature=0.07)
- ``triplet``             TripletMarginLoss(margin=0.05), mean over non-zero
- ``triplet_smooth``      … with softplus smoothing
- ``arc_face``            ArcFaceLoss(margin=28.6°, scale=64)
- ``sub_center_arc_face`` SubCenterArcFaceLoss(sub_centers=3)
- ``sup_con``             SupConLoss(temperature=0.1)
- ``circle``              CircleLoss(m=0.25, γ=256)  ← reference default (:400)

All take (B, D) embeddings + (B,) integer labels; positives are same-label
pairs excluding self. Everything is fixed-shape and mask-based (XLA-friendly);
pairwise matrices hit the MXU as one matmul.

Recon losses (``recon_loss_fn``) mirror encoder_train.py:295-308:
mse | l1 | ssim5 | ssim7 | ssim9 | ssim5+mse | ssim5+l1 | ssim7+l1 | ms_ssim.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from mtgvision_tpu.ops.ssim import ms_ssim_loss, ssim_loss
from mtgvision_tpu.ops.topk import l2_normalize

_NEG_INF = -1e9


def _pair_masks(labels: jnp.ndarray):
    """(B,B) float masks of positive (same label, off-diag) and negative pairs."""
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos = jnp.logical_and(same, ~eye)
    neg = ~same
    return pos.astype(jnp.float32), neg.astype(jnp.float32)


def _cos_sim(emb: jnp.ndarray) -> jnp.ndarray:
    e = l2_normalize(emb.astype(jnp.float32))
    return jnp.dot(e, e.T, preferred_element_type=jnp.float32)


def _masked_logsumexp(x, mask):
    """logsumexp over masked entries; -inf rows → _NEG_INF sentinel."""
    x = jnp.where(mask > 0, x, _NEG_INF)
    return jax.nn.logsumexp(x, axis=1)


# ---------------------------------------------------------------------------
# pair-based losses
# ---------------------------------------------------------------------------


def circle_loss(emb, labels, m: float = 0.25, gamma: float = 256.0):
    """CircleLoss (Sun et al. 2020), pml semantics. Reference default metric
    (encoder_train.py:395-400)."""
    sim = _cos_sim(emb)
    pos, neg = _pair_masks(labels)
    ap = jax.nn.relu(-jax.lax.stop_gradient(sim) + 1.0 + m)
    an = jax.nn.relu(jax.lax.stop_gradient(sim) + m)
    delta_p, delta_n = 1.0 - m, m
    logit_p = -ap * (sim - delta_p) * gamma
    logit_n = an * (sim - delta_n) * gamma
    lse_p = _masked_logsumexp(logit_p, pos)
    lse_n = _masked_logsumexp(logit_n, neg)
    has_both = (jnp.sum(pos, 1) > 0) & (jnp.sum(neg, 1) > 0)
    per = jax.nn.softplus(lse_p + lse_n)
    return jnp.sum(per * has_both) / jnp.maximum(jnp.sum(has_both), 1)


def ntxent_loss(emb, labels, temperature: float = 0.07):
    """NT-Xent over all positive pairs (pml NTXentLoss)."""
    sim = _cos_sim(emb) / temperature
    pos, neg = _pair_masks(labels)
    b = emb.shape[0]
    eye = jnp.eye(b, dtype=bool)
    # denominator per anchor-positive pair: that positive + all negatives of anchor
    neg_lse_terms = jnp.where(neg > 0, sim, _NEG_INF)  # (B,B) anchor × neg
    # for each (i,j) positive pair: -log( e^{s_ij} / (e^{s_ij} + Σ_k∈neg(i) e^{s_ik}) )
    denom = jnp.logaddexp(sim, jax.nn.logsumexp(neg_lse_terms, axis=1)[:, None])
    per_pair = -(sim - denom)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return jnp.sum(per_pair * pos) / n_pos


def supcon_loss(emb, labels, temperature: float = 0.1):
    """Supervised contrastive loss (Khosla et al. 2020 / pml SupConLoss)."""
    sim = _cos_sim(emb) / temperature
    pos, _ = _pair_masks(labels)
    b = emb.shape[0]
    not_self = 1.0 - jnp.eye(b)
    denom = _masked_logsumexp(sim, not_self)  # all pairs except self
    per_pair = -(sim - denom[:, None])
    n_pos_per = jnp.sum(pos, axis=1)
    per_anchor = jnp.sum(per_pair * pos, axis=1) / jnp.maximum(n_pos_per, 1.0)
    has_pos = n_pos_per > 0
    return jnp.sum(per_anchor * has_pos) / jnp.maximum(jnp.sum(has_pos), 1)


def triplet_loss(emb, labels, margin: float = 0.05, smooth: bool = False):
    """All-triplet margin loss on L2 distances of normalized embeddings,
    averaged over non-zero (active) triplets — pml AvgNonZeroReducer."""
    e = l2_normalize(emb.astype(jnp.float32))
    sq = jnp.sum(e * e, 1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (e @ e.T), 0.0)
    d = jnp.sqrt(d2 + 1e-16)
    pos, neg = _pair_masks(labels)
    # triplet tensor: d_ap (a,p) broadcast over n, d_an (a,n) over p
    viol = d[:, :, None] - d[:, None, :] + margin  # (A, P, N)
    valid = pos[:, :, None] * neg[:, None, :]
    if smooth:
        per = jax.nn.softplus(viol)
        active = valid
    else:
        per = jax.nn.relu(viol)
        active = valid * (per > 0)
    return jnp.sum(per * valid) / jnp.maximum(jnp.sum(active), 1.0)


# ---------------------------------------------------------------------------
# classification-style losses (learned class weight matrices)
# ---------------------------------------------------------------------------


def arcface_logits(emb, weights, labels, margin_deg: float = 28.6, scale: float = 64.0):
    """ArcFace scaled logits; ``weights`` (num_classes, D) [, or (C·k, D) for
    sub-centers — use :func:`subcenter_arcface_loss`]."""
    e = l2_normalize(emb.astype(jnp.float32))
    w = l2_normalize(weights.astype(jnp.float32))
    cos = jnp.clip(e @ w.T, -1.0 + 1e-7, 1.0 - 1e-7)
    m = math.radians(margin_deg)
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, weights.shape[0], dtype=cos.dtype)
    cos_m = jnp.cos(theta + m)
    return scale * (onehot * cos_m + (1.0 - onehot) * cos)


def arcface_loss(emb, weights, labels, margin_deg: float = 28.6, scale: float = 64.0):
    """ArcFaceLoss(margin=28.6, scale=64) — encoder_train.py:381-385."""
    logits = arcface_logits(emb, weights, labels, margin_deg, scale)
    return jnp.mean(
        -jnp.take_along_axis(jax.nn.log_softmax(logits, -1), labels[:, None], 1)
    )


def subcenter_arcface_loss(
    emb, weights, labels, margin_deg: float = 28.6, scale: float = 64.0, sub_centers: int = 3
):
    """SubCenterArcFaceLoss (encoder_train.py:386-392): weights (C·k, D);
    per-class cos = max over the k sub-centers."""
    e = l2_normalize(emb.astype(jnp.float32))
    w = l2_normalize(weights.astype(jnp.float32))
    cos_all = e @ w.T  # (B, C·k)
    b = emb.shape[0]
    c = weights.shape[0] // sub_centers
    cos = jnp.max(cos_all.reshape(b, c, sub_centers), axis=-1)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    m = math.radians(margin_deg)
    onehot = jax.nn.one_hot(labels, c, dtype=cos.dtype)
    logits = scale * (onehot * jnp.cos(jnp.arccos(cos) + m) + (1.0 - onehot) * cos)
    return jnp.mean(
        -jnp.take_along_axis(jax.nn.log_softmax(logits, -1), labels[:, None], 1)
    )


# ---------------------------------------------------------------------------
# registries (reference: encoder_train.py:290-311, :364-402)
# ---------------------------------------------------------------------------

METRIC_LOSSES: dict[str, Callable] = {
    "ntxent": partial(ntxent_loss, temperature=0.07),
    "triplet": partial(triplet_loss, margin=0.05, smooth=False),
    "triplet_smooth": partial(triplet_loss, margin=0.05, smooth=True),
    "sup_con": partial(supcon_loss, temperature=0.1),
    "circle": partial(circle_loss, m=0.25, gamma=256.0),
    # arc_face / sub_center_arc_face need a class-weight param — handled by the
    # trainer, which owns those weights (see train/encoder_train.py).
}

# losses that require a (num_classes[, ·k], D) learned weight matrix
CLASS_WEIGHT_LOSSES = ("arc_face", "sub_center_arc_face")


def recon_loss_fn(name: str) -> Callable:
    """Reconstruction-loss registry (encoder_train.py:295-308)."""
    fns = {
        "mse": lambda x, y: jnp.mean((x - y) ** 2),
        "l1": lambda x, y: jnp.mean(jnp.abs(x - y)),
        "ssim5": lambda x, y: ssim_loss(x, y, 5),
        "ssim7": lambda x, y: ssim_loss(x, y, 7),
        "ssim9": lambda x, y: ssim_loss(x, y, 9),
        "ssim5+mse": lambda x, y: ssim_loss(x, y, 5) * 0.5 + jnp.mean((x - y) ** 2) * 0.5,
        "ssim5+l1": lambda x, y: ssim_loss(x, y, 5) * 0.5 + jnp.mean(jnp.abs(x - y)) * 0.5,
        "ssim7+l1": lambda x, y: ssim_loss(x, y, 7) * 0.5 + jnp.mean(jnp.abs(x - y)) * 0.5,
        "ms_ssim": ms_ssim_loss,
    }
    return fns[name]
