"""Per-stage e2e pipeline timing — honest (serialized, value-fetched).

Times each stage of the frame program separately and chained end-to-end:

    detect          YOLO-seg fwd + fixed-shape NMS          (models/yolo.py)
    rectify+embed   orient → dewarp → encoder (both orients) (infer/)
    match           fused cosine top-k vs the index          (ops/topk.py)

Methodology matters on remote-dispatch runtimes: iterations are data-chained
(the next input depends on the previous output) and every measurement ends in
a VALUE fetch — `block_until_ready` alone can resolve before execution
finishes, inflating naive numbers ~30×. See bench.py.

    python -m mtgvision_tpu.eval.pipeline_bench [--batch 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _timed(fn, feed, iters: int = 10):
    """fn: scalar -> scalar chain value; feed: initial scalar. Returns s/iter."""
    c = fn(feed)
    float(c)  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c)
    float(c)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n-index", type=int, default=60_000)
    args = ap.parse_args(argv)

    from mtgvision_tpu.infer.pipeline import FramePipeline, build_e2e_pipeline
    from mtgvision_tpu.models.convnextv2ae import AE_SIZES, ConvNeXtV2Encoder
    from mtgvision_tpu.models.yolo import YoloSeg

    b = args.batch
    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="s", dtype=jnp.bfloat16)
    det_vars = jax.jit(det.init, static_argnums=2)(rng, jnp.zeros((1, 640, 640, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, head_type="conv+linear",
        dtype=jnp.bfloat16, **AE_SIZES["nano"],
    )
    enc_vars = {"params": jax.jit(enc.init)(rng, jnp.zeros((1, 192, 128, 3)))["params"]}
    pipe = FramePipeline(det, det_vars, enc, enc_vars)
    db = jax.random.normal(jax.random.PRNGKey(1), (args.n_index, 768), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    frames = jax.random.uniform(jax.random.PRNGKey(2), (b, 640, 640, 3))

    out = {}

    # stage 1: detect
    def s_detect(c):
        boxes, scores, classes, masks, valid = pipe._detect(pipe.det_variables, frames + c)
        return 0.0 * boxes[0, 0, 0]

    out["detect_s"] = _timed(s_detect, jnp.zeros((), jnp.float32), args.iters)

    # fixed detect outputs for downstream stages
    boxes, scores, classes, masks, valid = pipe._detect(pipe.det_variables, frames)

    # stage 2: orient + dewarp + embed (both orientations)
    def s_rectify(c):
        crops, corners, ok, z, _hf = pipe._rectify_embed(
            pipe.enc_variables, frames + c, masks, valid
        )
        return 0.0 * z[0, 0, 0, 0]

    out["rectify_embed_s"] = _timed(s_rectify, jnp.zeros((), jnp.float32), args.iters)

    # stage 3: match
    _, _, _, z, _hf = pipe._rectify_embed(pipe.enc_variables, frames, masks, valid)
    zf = z.reshape(-1, z.shape[-1])

    def s_match(c):
        ms, mi = pipe._match(zf + c, db)
        return 0.0 * ms[0, 0]

    out["match_s"] = _timed(s_match, jnp.zeros((), jnp.float32), args.iters)

    # full chain
    run, fr = build_e2e_pipeline(batch=b, n_index=args.n_index)

    def full(c):
        idx, vv = run(fr + c)
        return 0.0 * idx[0, 0, 0].astype(jnp.float32)

    out["e2e_s"] = _timed(full, jnp.zeros((), jnp.float32), args.iters)

    rec = {
        "batch": b,
        "detect_ms": round(out["detect_s"] * 1e3, 1),
        "rectify_embed_ms": round(out["rectify_embed_s"] * 1e3, 1),
        "match_ms": round(out["match_s"] * 1e3, 1),
        "e2e_ms": round(out["e2e_s"] * 1e3, 1),
        "e2e_fps": round(b / out["e2e_s"], 1),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
