"""ConvNeXt-V2 autoencoder (encoder z=768 + mirror decoder), Flax/NHWC.

Rebuild of mtgvision/models/convnextv2ae.py (geometry :102-150, encoder
:159-266, decoder :286-398, AE :419-477, factories :484-541) and the AeBase
contract (mtgvision/models/ae_base.py:8-57):

- input (B, H, W, 3) float [0,1] with (H, W) = (192, 128) by default; rescaled
  to [-1, 1] at the boundary when ``scale_io`` (convnextv2ae.py:257, :396-397),
- 4 encoder stages: stem 4×4/s4 then three LN + 2×2/s2 downsamples, each
  followed by ``depths[i]`` ConvNeXt-V2 blocks with **Mish** activation
  (convnextv2ae.py:17, :34-35),
- internal grid = (H/32, W/32) = (6, 4); z_size must divide evenly by 24,
- 5 head types (convnextv2ae.py:156): "conv+linear", "conv+mlp",
  "conv+act+mlp", "pool+linear", "pool+mlp",
- decoder mirrors with ConvTranspose upsampling, and for pool heads an extra
  LayerNorm before the un-pool ConvTranspose (convnextv2ae.py:341-351),
- ``ConvNeXtV2Ae.__call__`` returns ``(z, [recon])`` matching
  AeBase.forward (ae_base.py:28-57).

All 12 size factories are provided (convnextv2ae.py:484-541).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mtgvision_tpu.models.convnextv2 import Block, LayerNorm, kernel_init, mish

Dtype = Any

HEAD_TYPES = ("conv+linear", "conv+mlp", "conv+act+mlp", "pool+linear", "pool+mlp")

INTERNAL_SCALE = 4 * 2 * 2 * 2  # stem s4 + three s2 downsamples (convnextv2ae.py:131-134)


def _internal_hw(image_hw: tuple[int, int]) -> tuple[int, int]:
    h, w = image_hw
    assert h % INTERNAL_SCALE == 0 and w % INTERNAL_SCALE == 0, (h, w)
    return h // INTERNAL_SCALE, w // INTERNAL_SCALE


class MLP(nn.Module):
    """Dense → Mish → Dense (convnextv2ae.py:59-72)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=kernel_init, dtype=self.dtype)(x)
        x = mish(x)
        return nn.Dense(self.out, kernel_init=kernel_init, dtype=self.dtype)(x)


def _ae_block(dim: int, dtype) -> Block:
    # AE blocks use Mish + LayerNorm (convnextv2ae.py:34-35)
    return Block(dim, act=mish, dtype=dtype)


class ConvNeXtV2Encoder(nn.Module):
    """Image (B,H,W,3) → embedding (B, z_size). convnextv2ae.py:159-266."""

    image_hw: tuple[int, int] = (192, 128)
    in_chans: int = 3
    z_size: int = 768
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    head_type: str = "conv+linear"
    scale_io: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert self.head_type in HEAD_TYPES, self.head_type
        # guard: flax Conv would silently treat H as batch on rank-3 input
        assert x.ndim == 4 and x.shape[-1] == self.in_chans, (
            f"expected (B,H,W,{self.in_chans}) input, got {x.shape}"
        )
        ih, iw = _internal_hw(self.image_hw)
        internal_num = ih * iw
        assert self.z_size % internal_num == 0, (self.z_size, internal_num)
        dt = self.dtype

        x = x.astype(dt)
        if self.scale_io:
            x = x * 2.0 - 1.0

        # stage 0: stem 4×4/s4 + LN + blocks (convnextv2ae.py:193-197)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), kernel_init=kernel_init, dtype=dt)(x)
        x = LayerNorm(dtype=dt)(x)
        for _ in range(self.depths[0]):
            x = _ae_block(self.dims[0], dt)(x, deterministic)
        # stages 1-3: LN + 2×2/s2 + blocks (convnextv2ae.py:199-215)
        for i in range(1, 4):
            x = LayerNorm(dtype=dt)(x)
            x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2), kernel_init=kernel_init, dtype=dt)(x)
            for _ in range(self.depths[i]):
                x = _ae_block(self.dims[i], dt)(x, deterministic)

        # head (convnextv2ae.py:217-251)
        if self.head_type.startswith("conv"):
            c = self.z_size // internal_num
            x = nn.Conv(c, (1, 1), kernel_init=kernel_init, dtype=dt)(x)
            if "+act" in self.head_type:
                x = mish(x)
            x = LayerNorm(dtype=dt)(x)
            x = x.reshape(x.shape[0], self.z_size)
            if self.head_type.endswith("mlp"):
                x = MLP(self.z_size, self.z_size, dtype=dt)(x)
            else:
                x = nn.Dense(self.z_size, kernel_init=kernel_init, dtype=dt)(x)
        else:  # pool heads
            x = jnp.mean(x, axis=(-3, -2))  # (B, dims[-1])
            x = nn.LayerNorm(epsilon=1e-6, dtype=dt)(x)
            if self.head_type.endswith("mlp"):
                x = MLP(self.z_size, self.z_size, dtype=dt)(x)
            else:
                x = nn.Dense(self.z_size, kernel_init=kernel_init, dtype=dt)(x)
        return x.astype(jnp.float32)


class ConvNeXtV2Decoder(nn.Module):
    """Embedding (B, z_size) → image (B,H,W,3). convnextv2ae.py:286-398."""

    image_hw: tuple[int, int] = (192, 128)
    in_chans: int = 3
    z_size: int = 768
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    head_type: str = "conv+linear"
    scale_io: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        assert z.ndim == 2, z.shape
        ih, iw = _internal_hw(self.image_hw)
        internal_num = ih * iw
        dt = self.dtype
        x = z.astype(dt)

        # un-head (convnextv2ae.py:316-351)
        if self.head_type.startswith("conv"):
            c = self.z_size // internal_num
            if self.head_type.endswith("mlp"):
                x = MLP(self.z_size, self.z_size, dtype=dt)(x)
            else:
                x = nn.Dense(self.z_size, kernel_init=kernel_init, dtype=dt)(x)
            x = x.reshape(x.shape[0], ih, iw, c)  # NHWC internal grid
            x = LayerNorm(dtype=dt)(x)
            if "+act" in self.head_type:
                x = mish(x)
            x = nn.ConvTranspose(self.dims[-1], (1, 1), kernel_init=kernel_init, dtype=dt)(x)
        else:  # pool heads: Dense → 1×1 grid → LN → ConvTranspose to (ih,iw)
            if self.head_type.endswith("mlp"):
                x = MLP(self.z_size, self.dims[-1], dtype=dt)(x)
            else:
                x = nn.Dense(self.dims[-1], kernel_init=kernel_init, dtype=dt)(x)
            x = x[:, None, None, :]  # (B,1,1,C)
            x = LayerNorm(dtype=dt)(x)
            x = nn.ConvTranspose(
                self.dims[-1], (ih, iw), strides=(ih, iw), kernel_init=kernel_init, dtype=dt
            )(x)

        # upsample stages, mirror of the encoder (convnextv2ae.py:360-383)
        for i in (3, 2, 1):
            for _ in range(self.depths[i]):
                x = _ae_block(self.dims[i], dt)(x, deterministic)
            x = nn.ConvTranspose(
                self.dims[i - 1], (2, 2), strides=(2, 2), kernel_init=kernel_init, dtype=dt
            )(x)
            x = LayerNorm(dtype=dt)(x)
        for _ in range(self.depths[0]):
            x = _ae_block(self.dims[0], dt)(x, deterministic)
        x = LayerNorm(dtype=dt)(x)
        x = nn.ConvTranspose(
            self.in_chans, (4, 4), strides=(4, 4), kernel_init=kernel_init, dtype=dt
        )(x)

        x = x.astype(jnp.float32)
        if self.scale_io:
            x = (x + 1.0) / 2.0
        return x


class ConvNeXtV2Ae(nn.Module):
    """Encoder+decoder AE; ``__call__`` → (z, [recon]) per AeBase (ae_base.py:28-57)."""

    image_hw: tuple[int, int] = (192, 128)
    in_chans: int = 3
    z_size: int = 768
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    head_type: str = "conv+linear"
    encoder_enabled: bool = True
    decoder_enabled: bool = True
    scale_io: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(
            image_hw=self.image_hw,
            in_chans=self.in_chans,
            z_size=self.z_size,
            depths=self.depths,
            dims=self.dims,
            head_type=self.head_type,
            scale_io=self.scale_io,
            dtype=self.dtype,
        )
        self.encoder = ConvNeXtV2Encoder(**kw) if self.encoder_enabled else None
        self.decoder = ConvNeXtV2Decoder(**kw) if self.decoder_enabled else None

    def encode(self, x, deterministic: bool = True):
        assert self.encoder is not None, "encoder is not enabled"
        return self.encoder(x, deterministic)

    def decode(self, z, deterministic: bool = True):
        assert self.decoder is not None, "decoder is not enabled"
        return self.decoder(z, deterministic)

    def __call__(self, x, deterministic: bool = True):
        z = self.encode(x, deterministic)
        outs = [self.decode(z, deterministic)] if self.decoder_enabled else []
        return z, outs


# ---------------------------------------------------------------------------
# size factories (convnextv2ae.py:484-541)
# ---------------------------------------------------------------------------

AE_SIZES: dict[str, dict] = {
    "atto": dict(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320)),
    "femto": dict(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384)),
    "pico": dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512)),
    "nano": dict(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640)),
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "tiny_9_128": dict(depths=(3, 3, 9, 3), dims=(128, 256, 384, 768)),
    "tiny_12_128": dict(depths=(3, 3, 12, 3), dims=(128, 256, 384, 768)),
    "base_9": dict(depths=(3, 3, 9, 3), dims=(128, 256, 512, 1024)),
    "base_12": dict(depths=(3, 3, 12, 3), dims=(128, 256, 512, 1024)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "huge": dict(depths=(3, 3, 27, 3), dims=(352, 704, 1408, 2816)),
}


def make_ae(size: str, **kw) -> ConvNeXtV2Ae:
    return ConvNeXtV2Ae(**AE_SIZES[size], **kw)


def convnextv2ae_atto(**kw):
    return make_ae("atto", **kw)


def convnextv2ae_femto(**kw):
    return make_ae("femto", **kw)


def convnextv2ae_pico(**kw):
    return make_ae("pico", **kw)


def convnextv2ae_nano(**kw):
    return make_ae("nano", **kw)


def convnextv2ae_tiny(**kw):
    return make_ae("tiny", **kw)


def convnextv2ae_tiny_9_128(**kw):
    return make_ae("tiny_9_128", **kw)


def convnextv2ae_tiny_12_128(**kw):
    return make_ae("tiny_12_128", **kw)


def convnextv2ae_base_9(**kw):
    return make_ae("base_9", **kw)


def convnextv2ae_base_12(**kw):
    return make_ae("base_12", **kw)


def convnextv2ae_base(**kw):
    return make_ae("base", **kw)


def convnextv2ae_large(**kw):
    return make_ae("large", **kw)


def convnextv2ae_huge(**kw):
    return make_ae("huge", **kw)
