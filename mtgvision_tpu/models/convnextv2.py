"""ConvNeXt-V2 building blocks + classifier, Flax/NHWC, TPU-first.

Functional rebuild of the reference's torch blocks
(mtgvision/models/convnextv2.py:133-343): dual-format LayerNorm collapses to a
single channels-last LayerNorm because everything here is NHWC (the TPU conv
layout) — no permutes anywhere, unlike the NCHW torch original which permutes
twice per block. The 7×7 depthwise conv + LN + 1×1 expand + act + GRN + 1×1
project + residual structure and the GRN math match the reference exactly.

Compute dtype is configurable (bfloat16 recommended on TPU — MXU-native);
params stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# truncated-normal(std=0.02) kernels + zero bias, matching the reference init
# (mtgvision/models/convnextv2.py:62-130 trunc_normal_, convnextv2ae.py:144-147)
kernel_init = nn.initializers.truncated_normal(stddev=0.02)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation (reference uses nn.Mish for AE blocks, convnextv2ae.py:17)."""
    return x * jnp.tanh(jax.nn.softplus(x))


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps=1e-6.

    The reference needs a channels_first variant (convnextv2.py:133-160) because
    torch convs are NCHW; in NHWC both collapse to normalizing the last axis.
    """

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)


class GRN(nn.Module):
    """Global Response Normalization (convnextv2.py:163-174).

    Gx = ||x||₂ over spatial dims per channel; Nx = Gx / (mean_c Gx + 1e-6);
    out = γ·(x·Nx) + β + x.  Input NHWC.
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        # spatial L2 norm in float32 for stability under bf16 compute
        gx = jnp.sqrt(
            jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(-3, -2), keepdims=True)
        )
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        nx = nx.astype(x.dtype)
        return gamma.astype(x.dtype) * (x * nx) + beta.astype(x.dtype) + x


class DropPath(nn.Module):
    """Stochastic depth per sample (convnextv2.py:16-59)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Block(nn.Module):
    """ConvNeXt-V2 block (convnextv2.py:177-224): 7×7 depthwise conv → LN →
    1×1 expand (4×, as Dense) → act → GRN → 1×1 project (Dense) → droppath →
    residual.  All in NHWC — the two permutes of the torch original vanish."""

    dim: int
    drop_path: float = 0.0
    act: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inp = x
        x = nn.Conv(
            self.dim,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=self.dim,
            kernel_init=kernel_init,
            dtype=self.dtype,
        )(x)
        x = LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(4 * self.dim, kernel_init=kernel_init, dtype=self.dtype)(x)
        x = self.act(x)
        x = GRN(4 * self.dim, dtype=self.dtype)(x)
        x = nn.Dense(self.dim, kernel_init=kernel_init, dtype=self.dtype)(x)
        x = DropPath(self.drop_path)(x, deterministic)
        return inp + x


class ConvNeXtV2(nn.Module):
    """ConvNeXt-V2 image classifier (convnextv2.py:227-303).

    Stem 4×4/s4 → 4 stages with 2×2/s2 downsampling between → global pool →
    LN → linear head.  Input NHWC float, output (B, num_classes).
    """

    num_classes: int = 1000
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rates = jnp.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    self.dims[0], (4, 4), strides=(4, 4),
                    kernel_init=kernel_init, dtype=self.dtype,
                )(x)
                x = LayerNorm(dtype=self.dtype)(x)
            else:
                x = LayerNorm(dtype=self.dtype)(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2),
                    kernel_init=kernel_init, dtype=self.dtype,
                )(x)
            for j in range(self.depths[i]):
                x = Block(
                    self.dims[i], drop_path=float(rates[cur + j]), dtype=self.dtype
                )(x, deterministic)
            cur += self.depths[i]
        x = jnp.mean(x, axis=(-3, -2))  # global average pool → (B, C)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return nn.Dense(self.num_classes, kernel_init=kernel_init, dtype=self.dtype)(x)


# size factories (convnextv2.py:306-343)
def convnextv2_atto(**kw):
    return ConvNeXtV2(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320), **kw)


def convnextv2_femto(**kw):
    return ConvNeXtV2(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384), **kw)


def convnextv2_pico(**kw):
    return ConvNeXtV2(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512), **kw)


def convnextv2_nano(**kw):
    return ConvNeXtV2(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640), **kw)


def convnextv2_tiny(**kw):
    return ConvNeXtV2(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnextv2_base(**kw):
    return ConvNeXtV2(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), **kw)


def convnextv2_large(**kw):
    return ConvNeXtV2(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), **kw)


def convnextv2_huge(**kw):
    return ConvNeXtV2(depths=(3, 3, 27, 3), dims=(352, 704, 1408, 2816), **kw)
