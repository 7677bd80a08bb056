"""Model micro-benchmarks — AeBase.quick_test parity (mtgvision/models/
ae_base.py:60-110 and the convnextv2ae.py:549-609 size sweep).

``quick_test`` times jitted fwd for an AE (enc+dec, enc-only, dec-only) and
reports it/s + parameter counts; ``sweep`` runs it over size factories.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _n_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _time(fn, *args, warmup: int = 2, iters: int = 20) -> float:
    """it/s with a value-fetch barrier: on remote-dispatch runtimes
    block_until_ready can resolve before execution finishes (bench.py), and
    repeated identical dispatches may overlap — the final float() of a
    reduction over the last output is the only hard barrier."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return iters / (time.perf_counter() - t0)


def quick_test(ae_model, batch_size: int = 1, seed: int = 0) -> dict:
    """it/s for ae / encoder / decoder + param counts (ae_base.py:60-110)."""
    rng = jax.random.PRNGKey(seed)
    h, w = ae_model.image_hw
    x = jax.random.uniform(rng, (batch_size, h, w, 3))
    z = jax.random.normal(rng, (batch_size, ae_model.z_size))
    variables = ae_model.init(rng, x)

    # params as ARGUMENTS — closure constants get baked into the shipped HLO
    # and break size-limited remote compile for large models
    ae_fn_v = jax.jit(lambda v, xx: ae_model.apply(v, xx))
    enc_fn_v = jax.jit(lambda v, xx: ae_model.apply(v, xx, method="encode"))
    dec_fn_v = jax.jit(lambda v, zz: ae_model.apply(v, zz, method="decode"))
    ae_fn = lambda xx: ae_fn_v(variables, xx)
    enc_fn = lambda xx: enc_fn_v(variables, xx)
    dec_fn = lambda zz: dec_fn_v(variables, zz)

    enc_p = _n_params(variables["params"].get("encoder", {}))
    dec_p = _n_params(variables["params"].get("decoder", {}))
    return {
        "params_total": enc_p + dec_p,
        "params_encoder": enc_p,
        "params_decoder": dec_p,
        "ips_ae": _time(ae_fn, x),
        "ips_encode": _time(enc_fn, x),
        "ips_decode": _time(dec_fn, z),
        "batch_size": batch_size,
    }


def sweep(sizes=("atto", "femto", "pico", "nano", "tiny"), batch_size: int = 1, **kw):
    """Size-factory benchmark sweep (convnextv2ae.py:549-609 __main__)."""
    from mtgvision_tpu.models.convnextv2ae import make_ae

    out = {}
    for s in sizes:
        ae = make_ae(s, image_hw=(192, 128), z_size=768, **kw)
        r = quick_test(ae, batch_size)
        out[s] = r
        print(
            f"{s}: {r['params_total']/1e6:.2f}M params, "
            f"ae {r['ips_ae']:.1f} it/s, enc {r['ips_encode']:.1f} it/s, "
            f"dec {r['ips_decode']:.1f} it/s (bs={batch_size})"
        )
    return out


if __name__ == "__main__":
    sweep()
