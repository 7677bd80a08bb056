"""Headline benchmark: end-to-end frames/s/chip, detect→rectify→embed→match.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.md): the reference's implied single-stream rate is bounded
by its 15 FPS client target / ~47 it/s nano encoder on Apple MPS; the driver
north star is ≥500 frames/s/chip at 640 px on v5e-1. ``vs_baseline`` is
value / 500 (fraction of the north-star target).

Falls back to encoder+match throughput until the detector lands end-to-end.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# reuse cached programs across runs — remote TPU compiles cost minutes each
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

NORTH_STAR_FPS = 500.0


def _bench_chained(fn, x0, warmup=3, iters=20) -> float:
    """Time fn with a data dependency between iterations AND a final VALUE
    fetch. Chaining forces true serialization; fetching the scalar's value
    (not just block_until_ready, which some remote-dispatch runtimes resolve
    before execution finishes) forces the whole chain to really run."""
    chain = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        chain = fn(x0 + chain)
    float(chain)
    t0 = time.perf_counter()
    for _ in range(iters):
        chain = fn(x0 + chain)
    float(chain)  # value fetch = hard execution barrier
    return (time.perf_counter() - t0) / iters


def _probe_devices(timeout_s: float = 600.0) -> None:
    """Fail fast if the device backend is unreachable.

    ``jax.devices()`` on a dead remote-TPU tunnel hangs forever (observed:
    >300 s with no progress). Probing in a subprocess with a hard timeout
    turns an indefinite hang into a quick, clearly-reported failure so the
    caller's own timeout budget isn't silently consumed.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(f"bench: device probe hung >{timeout_s:.0f}s "
              "(backend tunnel down?); aborting", file=sys.stderr)
        raise SystemExit(3)
    if r.returncode != 0:
        print("bench: device probe failed:\n" + (r.stderr or "")[-2000:],
              file=sys.stderr)
        raise SystemExit(3)
    print(f"bench: backend ok ({r.stdout.strip()})", file=sys.stderr)


def main():
    _probe_devices()
    try:
        from mtgvision_tpu.infer.pipeline import build_e2e_pipeline  # noqa

        have_e2e = True
    except Exception:
        have_e2e = False

    if have_e2e:
        import sys

        from mtgvision_tpu.infer.pipeline import bench_e2e

        # measure candidate serving configs and serve the fastest. Device
        # compute is ~20 ms per 8 frames single-orientation (detect 9.6 +
        # rectify/embed 12.6, overlap-adjusted → ~400 fps compute bound);
        # what separates the configs is dispatch count × how much of the
        # ~5 ms/program RTT the chain interleave hides. Configs,
        # cheapest-compile first:
        #   3prog ×2/×4 chains — baseline programs, deeper overlap
        #   2prog ×4 chains    — rectify+embed+match fused: 2 RTTs/batch
        #   fused ×2/×4        — single mega-program (can trip remote
        #                        compile-service limits; must never take
        #                        down bench)
        #   batch 16 variants  — amortize dispatch over more frames
        # (batch, layout) pairs compile once and are memoized, so chain-depth
        # variants of an already-built pipeline cost only measurement time.
        # New compiles are attempted in cheapest-first order under a global
        # deadline: if the compile cache is cold (fresh container / libtpu
        # bump) we stop *starting* new compiles past the budget and report
        # the best config measured so far rather than risk the bench window.
        results = {}
        t_start = time.perf_counter()
        compile_budget_s = 1500.0
        built: set = set()
        # batch/layout/frame_dtype are passed EXPLICITLY in every config so
        # the memo key below can never drift from bench_e2e's defaults
        # (ADVICE r2). The r3 sweep found the winners: batch is the big lever
        # (serving 64-96 frames/batch amortizes per-program overhead; 128
        # collapses under HBM pressure — 344 fps), bf16/u8 frame ingest cuts
        # frame-read bandwidth, chains saturate at ~4. Full curve (v5e-1):
        # b8 3prog c2 = 335 · b16 2prog c4 = 433 · b32f = 446 · b64f = 495 ·
        # b96f = 550 · b128f = 345. The list keeps one config per regime so
        # a cold-cache driver run still finishes inside the compile budget.
        for name, kw in [
            ("3prog_c2", {"batch": 8, "layout": "3prog"}),
            ("b16_2prog_c4", {"batch": 16, "layout": "2prog", "chains": 4}),
            ("b32f_2prog_c8", {"batch": 32, "layout": "2prog", "chains": 8,
                               "frame_dtype": "bf16"}),
            ("b64f_2prog_c8", {"batch": 64, "layout": "2prog", "chains": 8,
                               "frame_dtype": "bf16"}),
            ("b96f_2prog_c4", {"batch": 96, "layout": "2prog", "chains": 4,
                               "frame_dtype": "bf16"}),
            ("b96f_2prog_c8", {"batch": 96, "layout": "2prog", "chains": 8,
                               "frame_dtype": "bf16"}),
            ("b96u_2prog_c8", {"batch": 96, "layout": "2prog", "chains": 8,
                               "frame_dtype": "u8"}),
        ]:
            key = (kw["batch"], kw["layout"], kw.get("frame_dtype", "f32"))
            is_new_compile = key not in built
            elapsed = time.perf_counter() - t_start
            measured_any = any(v > 0 for v in results.values())
            if is_new_compile and elapsed > compile_budget_s and measured_any:
                print(f"{name} skipped (deadline: {elapsed:.0f}s elapsed)",
                      file=sys.stderr)
                continue
            try:
                results[name] = bench_e2e(**kw)
            except Exception as e:
                print(f"{name} failed ({type(e).__name__}: {e})",
                      file=sys.stderr)
                results[name] = 0.0
            # mark the (batch, layout) pair built only once the compiled
            # pipeline actually landed in bench_e2e's memo: a failure during
            # MEASUREMENT must not re-classify same-key configs as new
            # compiles (ADVICE r2), but a failure during BUILD (e.g. OOM)
            # must not let a later same-key config bypass the compile-budget
            # deadline and pay a full unbudgeted compile (ADVICE r3)
            from mtgvision_tpu.infer.pipeline import _BENCH_PIPES
            if key in _BENCH_PIPES:
                built.add(key)
        fps = max(results.values())
        if fps <= 0.0:
            # every config failed — that's a benchmark failure, not a
            # measurement of 0 fps; don't emit a valid-looking JSON line
            print("all bench configs failed", file=sys.stderr)
            sys.exit(1)
        print(
            " ".join(f"{k}={v:.1f}" for k, v in results.items()) + " fps",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "e2e_frames_per_sec_per_chip_640px",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
        }))
        return

    # fallback: embed→match throughput (encoder nano batch + 60k-card index)
    from mtgvision_tpu.models.convnextv2ae import convnextv2ae_nano
    from mtgvision_tpu.ops.topk import cosine_topk

    batch = 64
    model = convnextv2ae_nano(
        image_hw=(192, 128), z_size=768, head_type="conv+linear",
        decoder_enabled=False, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).random((batch, 192, 128, 3), np.float32))
    params = model.init(rng, x, True)["params"]
    db = jnp.asarray(np.random.default_rng(1).standard_normal((60_000, 768), np.float32))
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)

    @jax.jit
    def embed_match(x, db):
        # db as an ARGUMENT — closing over it bakes the matrix into the HLO
        # shipped to size-limited remote compile services
        z = model.apply({"params": params}, x, method="encode")
        s, i = cosine_topk(z, db, k=3)
        return 0.0 * s[0, 0]  # scalar chain value

    dt = _bench_chained(lambda xx: embed_match(xx, db), x)
    ips = batch / dt
    print(json.dumps({
        "metric": "embed_match_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/s",
        "vs_baseline": round(ips / NORTH_STAR_FPS, 4),
    }))


if __name__ == "__main__":
    main()
