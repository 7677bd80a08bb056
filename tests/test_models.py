"""Model family tests: shapes, heads, sizes, AE contract, param parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.models import (
    AE_SIZES,
    HEAD_TYPES,
    ConvNeXtV2Ae,
    ConvNeXtV2Decoder,
    ConvNeXtV2Encoder,
    convnextv2_atto,
    make_ae,
)

RNG = jax.random.PRNGKey(0)
X = jnp.zeros((2, 192, 128, 3), jnp.float32)


def _n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.mark.parametrize("head", HEAD_TYPES)
def test_encoder_heads(head):
    enc = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, head_type=head,
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    variables = enc.init(RNG, X)
    z = enc.apply(variables, X)
    assert z.shape == (2, 768)
    assert z.dtype == jnp.float32


@pytest.mark.parametrize("head", HEAD_TYPES)
def test_decoder_heads(head):
    dec = ConvNeXtV2Decoder(
        image_hw=(192, 128), z_size=768, head_type=head,
        depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
    )
    z = jnp.zeros((2, 768))
    variables = dec.init(RNG, z)
    x = dec.apply(variables, z)
    assert x.shape == (2, 192, 128, 3)


def test_ae_contract():
    ae = ConvNeXtV2Ae(
        image_hw=(192, 128), z_size=768, depths=(1, 1, 1, 1), dims=(8, 16, 24, 32)
    )
    vars_ = ae.init(RNG, X)
    z, outs = ae.apply(vars_, X)
    assert z.shape == (2, 768)
    assert len(outs) == 1 and outs[0].shape == (2, 192, 128, 3)
    # encode/decode methods
    z2 = ae.apply(vars_, X, method="encode")
    assert np.allclose(z, z2)
    rec = ae.apply(vars_, z, method="decode")
    assert rec.shape == (2, 192, 128, 3)


def test_ae_encoder_only():
    ae = ConvNeXtV2Ae(
        image_hw=(192, 128), z_size=768, depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
        decoder_enabled=False,
    )
    vars_ = ae.init(RNG, X)
    z, outs = ae.apply(vars_, X)
    assert z.shape == (2, 768) and outs == []


def test_all_size_factories_build():
    for name, cfg in AE_SIZES.items():
        assert len(cfg["depths"]) == 4 and len(cfg["dims"]) == 4
    # smallest size end-to-end
    ae = make_ae("atto", image_hw=(192, 128), z_size=768)
    vars_ = ae.init(RNG, X)
    z, (rec,) = ae.apply(vars_, X)
    assert z.shape == (2, 768) and rec.shape == (2, 192, 128, 3)


def test_classifier():
    m = convnextv2_atto(num_classes=10)
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(RNG, x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 10)


def test_grn_math(rng):
    """GRN: zero-init γ/β → identity at init (out = x)."""
    from mtgvision_tpu.models.convnextv2 import GRN

    x = jnp.asarray(rng.random((2, 4, 4, 8), np.float32))
    grn = GRN(8)
    params = grn.init(RNG, x)
    out = grn.apply(params, x)
    assert np.allclose(out, x, atol=1e-6)


def test_encoder_param_count_parity_with_reference():
    """Param-count parity vs the torch reference (mtgvision/models/convnextv2ae.py).

    The architectures are independently implemented but must agree exactly on
    parameter counts (same shapes everywhere). Skipped if torch/reference
    unavailable.
    """
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from mtgvision.models.convnextv2ae import ConvNeXtV2Encoder as RefEnc
    except Exception:
        pytest.skip("reference import failed")
    finally:
        sys.path.remove("/root/reference")

    ref = RefEnc(
        image_wh=(128, 192), z_size=768, depths=(2, 2, 6, 2),
        dims=(40, 80, 160, 320), head_type="conv+linear",
    )
    n_ref = sum(p.numel() for p in ref.parameters())

    enc = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, depths=(2, 2, 6, 2),
        dims=(40, 80, 160, 320), head_type="conv+linear",
    )
    params = enc.init(RNG, X)["params"]
    assert _n_params(params) == n_ref
