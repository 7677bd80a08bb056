"""Per-op breakdown of the two dominant pipeline stages (detect, rectify+
embed) — which sub-op owns the time, so perf work aims at data, not folklore.

Everything is timed as its own jitted program with chained iterations and a
final value fetch (see bench.py for why). Run on a QUIET chip:

    python scripts/detect_breakdown.py >> artifacts_r2/perf_sprint.jsonl
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mtgvision_tpu.models.yolo import YoloSeg, decode_predictions, detect


def timed(fn, iters=20, warmup=2):
    c = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        c = fn(c)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c)
    float(c)
    return (time.perf_counter() - t0) / iters


def log(name, **kw):
    print(json.dumps({"exp": name, **kw}), flush=True)


def main():
    rng = jax.random.PRNGKey(0)
    B, HW = 8, (640, 640)
    det = YoloSeg(num_classes=1, size="s", dtype=jnp.bfloat16)
    det_vars = jax.jit(det.init, static_argnums=2)(
        rng, jnp.zeros((1, *HW, 3)), False
    )
    frames = jax.random.uniform(jax.random.PRNGKey(1), (B, *HW, 3))

    # (a) backbone+neck+heads only — raw multi-scale predictions
    @jax.jit
    def backbone(c):
        out = det.apply(det_vars, frames + c)
        return sum(p.astype(jnp.float32).sum() for p in out["preds"]) * 0.0

    log("det_backbone", batch=B, ms=round(timed(backbone) * 1e3, 2))

    # (b) + DFL decode to flat boxes/scores
    @jax.jit
    def decode(c):
        out = det.apply(det_vars, frames + c)
        flat = decode_predictions(out, HW, 1)
        return flat.sum() * 0.0

    log("det_decode", batch=B, ms=round(timed(decode) * 1e3, 2))

    # (c) full detect: + NMS + proto-mask synthesis
    @jax.jit
    def full(c):
        bx, sc, cl, m, val = detect(det_vars, det, frames + c, max_det=8)
        return bx.sum() * 0.0 + m.sum() * 0.0

    log("det_full", batch=B, max_det=8, ms=round(timed(full) * 1e3, 2))

    # rectify+embed sub-ops on 64 synthetic crops / masks
    from mtgvision_tpu.infer.orient import orient_corners
    from mtgvision_tpu.models.convnextv2ae import AE_SIZES, ConvNeXtV2Encoder
    from mtgvision_tpu.models.refine_head import RefineHead
    from mtgvision_tpu.ops.warp import dewarp_quads_batch

    D = 8  # per-frame det slots; 64 crops total
    masks = jax.random.uniform(jax.random.PRNGKey(2), (B, D, 160, 160))
    quads = (
        jnp.asarray([[100.0, 80.0], [420.0, 90.0], [430.0, 520.0], [110.0, 510.0]])
        + jax.random.normal(jax.random.PRNGKey(3), (B, D, 4, 2)) * 20.0
    )

    @jax.jit
    def orient(c):
        def per_frame(fm):
            return jax.vmap(lambda m: orient_corners(m)[0])(fm)

        corners = jax.vmap(per_frame)(masks + c * 0.0)
        return corners.sum() * 0.0

    log("orient_64", ms=round(timed(orient) * 1e3, 2))

    for win in (192, 160, 128):

        @jax.jit
        def dewarp(c, win=win):
            crops = jax.vmap(
                lambda f, q: dewarp_quads_batch(f, q, out_hw=(192, 128), window=win)
            )(frames + c, quads)
            return crops.sum() * 0.0

        log("dewarp_64", window=win, ms=round(timed(dewarp) * 1e3, 2))

    enc = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, head_type="conv+linear",
        dtype=jnp.bfloat16, **AE_SIZES["nano"],
    )
    crops = jax.random.uniform(jax.random.PRNGKey(4), (B * D, 192, 128, 3))
    enc_vars = {"params": jax.jit(enc.init)(rng, crops[:1])["params"]}

    @jax.jit
    def embed(c):
        z = enc.apply(enc_vars, crops + c)
        return z.sum() * 0.0

    log("encoder_64", ms=round(timed(embed) * 1e3, 2))

    rhead = RefineHead()
    rh_vars = jax.jit(rhead.init)(rng, crops[:1])

    @jax.jit
    def refine(c):
        off, logit = rhead.apply(rh_vars, crops + c)
        return off.sum() * 0.0 + logit.sum() * 0.0

    log("refine_head_64", ms=round(timed(refine) * 1e3, 2))


if __name__ == "__main__":
    main()
