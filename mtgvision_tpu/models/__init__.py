"""Flax model families: ConvNeXt-V2 (classifier + autoencoder) and YOLO-seg.

Everything is NHWC (TPU-native conv layout), float32 params with optional
bfloat16 compute, and jit/pjit-friendly (static shapes, no data-dependent
Python control flow).
"""

from mtgvision_tpu.models.convnextv2 import (  # noqa: F401
    Block,
    GRN,
    LayerNorm,
    DropPath,
    ConvNeXtV2,
    convnextv2_atto,
    convnextv2_femto,
    convnextv2_pico,
    convnextv2_nano,
    convnextv2_tiny,
    convnextv2_base,
    convnextv2_large,
    convnextv2_huge,
)
from mtgvision_tpu.models.convnextv2ae import (  # noqa: F401
    ConvNeXtV2Encoder,
    ConvNeXtV2Decoder,
    ConvNeXtV2Ae,
    HEAD_TYPES,
    AE_SIZES,
    make_ae,
    convnextv2ae_atto,
    convnextv2ae_femto,
    convnextv2ae_pico,
    convnextv2ae_nano,
    convnextv2ae_tiny,
    convnextv2ae_tiny_9_128,
    convnextv2ae_tiny_12_128,
    convnextv2ae_base_9,
    convnextv2ae_base_12,
    convnextv2ae_base,
    convnextv2ae_large,
    convnextv2ae_huge,
)
