"""Round-2 perf sprint: honest measurements for every serving-path lever.

Chained iterations + final value fetch throughout (see bench.py for why).
Prints one JSON line per experiment; run on a QUIET chip.

    python scripts/perf_sprint.py > perf_sprint.log 2>&1
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mtgvision_tpu.infer.pipeline import FramePipeline
from mtgvision_tpu.models.convnextv2ae import AE_SIZES, ConvNeXtV2Encoder
from mtgvision_tpu.models.yolo import YoloSeg


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


def timed2(fn, iters=20, warmup=2):
    """Two independent chains — overlaps host dispatch with device compute.
    Returns seconds per fn-call (each call = one batch)."""
    c1 = jnp.zeros((), jnp.float32)
    c2 = jnp.ones((), jnp.float32) * 1e-6
    for _ in range(warmup):
        c1, c2 = fn(c1), fn(c2)
    float(c1); float(c2)
    t0 = time.perf_counter()
    for _ in range(iters):
        c1 = fn(c1)
        c2 = fn(c2)
    float(c1); float(c2)
    return (time.perf_counter() - t0) / (2 * iters)


def log(name, **kw):
    print(json.dumps({"exp": name, **kw}), flush=True)


def main():
    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="s", dtype=jnp.bfloat16)
    det_vars = jax.jit(det.init, static_argnums=2)(
        rng, jnp.zeros((1, 640, 640, 3)), False
    )
    enc = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, head_type="conv+linear",
        dtype=jnp.bfloat16, **AE_SIZES["nano"],
    )
    enc_vars = {
        "params": jax.jit(enc.init)(rng, jnp.zeros((1, 192, 128, 3)))["params"]
    }
    db = jax.random.normal(jax.random.PRNGKey(1), (60_000, 768), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)

    pipes = {
        "dual": FramePipeline(det, det_vars, enc, enc_vars),
        "single": FramePipeline(
            det, det_vars, enc, enc_vars, both_orientations=False
        ),
    }

    def e2e_fn(pipe, frames):
        def step(c):
            out = pipe.run(frames + c, db)
            return 0.0 * out["match_idx"][0, 0, 0].astype(jnp.float32)
        return step

    for b in (8, 32):
        frames = jax.random.uniform(jax.random.PRNGKey(2), (b, 640, 640, 3))

        # per-stage (dual pipe)
        pipe = pipes["dual"]

        def s_detect(c):
            boxes, *_ = pipe._detect(pipe.det_variables, frames + c)
            return 0.0 * boxes[0, 0, 0]

        dt = timed(s_detect)
        log("detect", batch=b, ms=round(dt * 1e3, 2))

        boxes, scores, classes, masks, valid = pipe._detect(
            pipe.det_variables, frames
        )

        for name, pipe in pipes.items():
            def s_rect(c, pipe=pipe):
                crops, corners, ok, z, _hf = pipe._rectify_embed(
                    pipe.enc_variables, frames + c, masks, valid
                )
                return 0.0 * z[0, 0, 0, 0]

            dt = timed(s_rect)
            log("rectify_embed", batch=b, orient=name, ms=round(dt * 1e3, 2))

            dt = timed(e2e_fn(pipe, frames))
            log("e2e_1chain", batch=b, orient=name,
                ms=round(dt * 1e3, 2), fps=round(b / dt, 1))
            dt = timed2(e2e_fn(pipe, frames))
            log("e2e_2chain", batch=b, orient=name,
                ms=round(dt * 1e3, 2), fps=round(b / dt, 1))

        # match stage (dual z shape)
        pipe = pipes["dual"]
        _, _, _, z, _hf = pipe._rectify_embed(pipe.enc_variables, frames, masks, valid)
        zf = z.reshape(-1, z.shape[-1])

        def s_match(c):
            ms_, mi = pipe._match(zf + c, db)
            return 0.0 * ms_[0, 0]

        dt = timed(s_match)
        log("match", batch=b, rows=int(zf.shape[0]), ms=round(dt * 1e3, 2))

        # NOTE: fusing rectify+embed+match into ONE program was measured and
        # rejected — the combined HLO exceeds the remote compile service's
        # request size limit (HTTP 413)

    # ---- top-k shootout: XLA two-stage vs Pallas streaming ----------------
    from mtgvision_tpu.ops.topk import cosine_topk, cosine_topk_pallas

    for n in (60_000, 262_144):
        dbn = jax.random.normal(jax.random.PRNGKey(3), (n, 768), jnp.float32)
        dbn = dbn / jnp.linalg.norm(dbn, axis=1, keepdims=True)
        q = jax.random.normal(jax.random.PRNGKey(4), (128, 768), jnp.float32)

        f_x = jax.jit(lambda qq, dd: cosine_topk(qq, dd, k=3))
        def s_x(c):
            v, i = f_x(q + c, dbn)
            return 0.0 * v[0, 0]
        dt = timed(s_x, iters=10)
        log("topk_xla", n=n, ms=round(dt * 1e3, 2))

        try:
            f_p = jax.jit(lambda qq, dd: cosine_topk_pallas(qq, dd, k=3))
            def s_p(c):
                v, i = f_p(q + c, dbn)
                return 0.0 * v[0, 0]
            dt = timed(s_p, iters=10)
            log("topk_pallas", n=n, ms=round(dt * 1e3, 2))
        except Exception as e:  # noqa: BLE001
            log("topk_pallas", n=n, error=str(e)[:200])


if __name__ == "__main__":
    main()
