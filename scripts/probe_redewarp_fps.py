"""Probe: fps cost of refine_redewarp variants at the serving bench config.

The r4 unified config reports refine-corrected corners but embeds the
PRE-refine crop (refine_redewarp n). e2e_headline_details shows clear cards
with 3 px reported corner error failing to match (score ~0.34): the embedded
crop was misregistered. This probes what re-dewarping before embedding costs
at the bench operating point (batch 96, 2prog, bf16 frames, 8 chains).

Usage: python scripts/probe_redewarp_fps.py [variant ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from mtgvision_tpu.infer.pipeline import FramePipeline
from mtgvision_tpu.models.convnextv2ae import AE_SIZES, ConvNeXtV2Encoder
from mtgvision_tpu.models.refine_head import RefineHead
from mtgvision_tpu.models.yolo import YoloSeg


def build(batch=96, redewarp=False, iters=1, sel_redewarp=0, frame_dtype="bf16",
          dewarp_window=192):
    rng = jax.random.PRNGKey(0)
    det = YoloSeg(num_classes=1, size="s", dtype=jnp.bfloat16)
    det_vars = jax.jit(det.init, static_argnums=2)(rng, jnp.zeros((1, 640, 640, 3)), False)
    enc = ConvNeXtV2Encoder(
        image_hw=(192, 128), z_size=768, head_type="conv+linear",
        dtype=jnp.bfloat16, **AE_SIZES["nano"],
    )
    enc_vars = {"params": jax.jit(enc.init)(rng, jnp.zeros((1, 192, 128, 3)))["params"]}
    rhead = RefineHead()
    rhead_vars = jax.jit(rhead.init)(rng, jnp.zeros((1, 192, 128, 3)))
    kw = {}
    if sel_redewarp:
        kw["sel_redewarp"] = sel_redewarp
    pipe = FramePipeline(
        det, det_vars, enc, enc_vars, store=None, max_det=8,
        refine_head=rhead, refine_head_vars=rhead_vars,
        refine_head_flip=False, both_orientations=False,
        score_thresh=0.15, refine_redewarp=redewarp, refine_iters=iters,
        dewarp_window=dewarp_window,
        **kw,
    )
    pipe.index_half = 60_000
    db = jax.random.normal(jax.random.PRNGKey(1), (120_000, 768), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    frames = jax.random.uniform(jax.random.PRNGKey(2), (batch, 640, 640, 3))
    if frame_dtype == "bf16":
        frames = frames.astype(jnp.bfloat16)
    return pipe, db, frames


def bench(pipe, db, frames, chains=8, iters=12):
    def step(c):
        out = pipe.run_2prog(frames + c.astype(frames.dtype), db)
        return 0.0 * out["match_idx"][0, 0, 0].astype(jnp.float32)

    cs = [jnp.full((), i * 1e-6, jnp.float32) for i in range(chains)]
    cs = [step(c) for c in cs]
    [float(c) for c in cs]
    t0 = time.perf_counter()
    for _ in range(iters):
        cs = [step(c) for c in cs]
    [float(c) for c in cs]
    dt = (time.perf_counter() - t0) / (chains * iters)
    return frames.shape[0] / dt


VARIANTS = {
    "baseline": dict(redewarp=False, iters=1),
    "rdw1": dict(redewarp=True, iters=1),
    "rdw2": dict(redewarp=True, iters=2),
    "sel2": dict(redewarp=False, iters=1, sel_redewarp=2),
    "sel4": dict(redewarp=False, iters=1, sel_redewarp=4),
    "w160": dict(redewarp=False, iters=1, dewarp_window=160),
    "sel2w160": dict(redewarp=False, iters=1, sel_redewarp=2,
                     dewarp_window=160),
    "sel2w144": dict(redewarp=False, iters=1, sel_redewarp=2,
                     dewarp_window=144),
    "sel3w144": dict(redewarp=False, iters=1, sel_redewarp=3,
                     dewarp_window=144),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["baseline", "rdw1", "rdw2"]
    for name in names:
        pipe, db, frames = build(**VARIANTS[name])
        fps = bench(pipe, db, frames)
        print(f"{name}: {fps:.1f} fps", flush=True)
