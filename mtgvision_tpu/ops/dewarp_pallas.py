"""Pallas TPU kernel for the serving-path quad dewarp (benchmarked alternative).

Fully-fused rewrite of the XLA two-pass resample (`ops/warp.py:dewarp_quad`).
The XLA version materializes the per-pass hat-weight tensors ((OH,W,W) and
(OH,OW,W) per detection — ~24 MB bf16 each round trip to HBM) because XLA
cannot fuse elementwise producers INTO a dot operand. Here both passes run
inside one kernel with every intermediate VMEM-resident.

HONEST RESULT (v5e-1, 64 crops from 8×640² frames, chained value-fetch):
XLA bf16 two-pass 6.5 ms; this kernel 8.8-10 ms (VPU rate-bound: the dense
per-row accumulation runs ~0.6-1.0 Tops against a ~1.9 Tops f32 VPU peak,
and the MXU can't help because the hat weight couples (v,x,y) through the
perspective map, so no (v,y)×(y,x) factorization exists). An int8 XLA
variant (quantization scales cancel in the normalize ratio) measured
10.0 ms — conversion VPU work outweighs the traffic saved. The serving
pipeline therefore defaults to the XLA path (infer/pipeline.py); this
kernel is kept as the measured alternative and exercised by
tests/test_ops_warp.py in interpret mode:

    grid = (D,)  — one program per detection
      pass 1 (vertical):   t(c,v,x)  = Σ_y hat(y − y*(v,x)) · win(c,y,x)
      transpose t          (lane→sublane so pass 2 broadcasts stay on lanes)
      pass 2 (horizontal): oT(c,u,v) = Σ_x hat(x − x*(v,u)) · t(c,x,v)

    hat weights are (re)generated on the VPU per loop row and never leave
    VMEM; a 4th accumulator channel carries the normalizing Σhat.

Reference op this replaces: cv2.getPerspectiveTransform + warpPerspective
(od_export.py:95-110). Window/pyramid selection and the inverse homography
are shared XLA prep (cheap, bandwidth-light); see `ops/warp.py:232-257` for
the pyramid rationale.

Parity: `tests/test_ops_warp.py` checks this kernel (interpret mode on CPU)
against `dewarp_quad` to ~1e-2 (the XLA path computes in bf16, this in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtgvision_tpu.ops.warp import PYR_SCALES, perspective_from_quads


# ---------------------------------------------------------------------------
# shared XLA prep: planar pyramid → per-detection window + inverse homography
# ---------------------------------------------------------------------------


def frame_pyramid_planar(frame: jnp.ndarray) -> list[jnp.ndarray]:
    """(H,W,3) frame → √2-step planar (3,h,w) pyramid (see frame_pyramid)."""
    planar = jnp.transpose(frame, (2, 0, 1))
    h, w = frame.shape[0], frame.shape[1]
    out = [planar]
    for s in PYR_SCALES[1:]:
        out.append(
            jax.image.resize(
                planar, (planar.shape[0], round(h / s), round(w / s)), method="linear"
            )
        )
    return out


def _window_and_params(
    pyramid: list[jnp.ndarray],
    corners: jnp.ndarray,
    out_hw: tuple[int, int],
    window: int,
    expand_ratio: float,
):
    """One detection quad → (planar window (3,W,W), params (16,)).

    params = [a00..a22 (inverse homography, output px → window px),
              1/wy, 1/wx (reciprocal anti-alias hat half-widths), pad…].
    Mirrors the level/window/transpose logic of warp.py:dewarp_quad.
    """
    oh, ow = out_hw
    e = expand_ratio
    w_win = window

    bbmin = jnp.min(corners, axis=0)
    bbmax = jnp.max(corners, axis=0)
    size = jnp.max(bbmax - bbmin) * 1.2 + 8.0
    center = 0.5 * (bbmin + bbmax)

    lvl = jnp.zeros((), jnp.int32)
    for s in PYR_SCALES[:-1]:
        lvl = lvl + (size > s * w_win).astype(jnp.int32)

    wins, offs, scales = [], [], []
    for li, img in enumerate(pyramid):
        s = PYR_SCALES[li]
        h_l, w_l = img.shape[1], img.shape[2]
        c_l = center / s
        off = jnp.clip(
            jnp.round(c_l - w_win / 2).astype(jnp.int32),
            0,
            jnp.asarray([max(w_l - w_win, 0), max(h_l - w_win, 0)], jnp.int32),
        )  # (x, y)
        sl = jax.lax.dynamic_slice(
            jnp.pad(img, ((0, 0), (0, max(0, w_win - h_l)), (0, max(0, w_win - w_l)))),
            (0, off[1], off[0]),
            (img.shape[0], w_win, w_win),
        )
        wins.append(sl)
        offs.append(off)
        scales.append(s)
    win = wins[-1]
    off = offs[-1]
    scale = jnp.full((), scales[-1], jnp.float32)
    for li in range(len(pyramid) - 2, -1, -1):
        sel = lvl == li
        win = jnp.where(sel, wins[li], win)
        off = jnp.where(sel, offs[li], off)
        scale = jnp.where(sel, scales[li], scale)
    cw = corners / scale - off[None].astype(jnp.float32)

    # near-90° cards: transpose the window (two-pass bottleneck fix)
    down = cw[3] - cw[0]
    sideways = jnp.abs(down[0]) > jnp.abs(down[1])
    win = jnp.where(sideways, jnp.swapaxes(win, 1, 2), win)
    cw = jnp.where(sideways, cw[:, ::-1], cw)

    dst = jnp.asarray(
        [[ow * e, oh * e], [ow * (1 - e), oh * e],
         [ow * (1 - e), oh * (1 - e)], [ow * e, oh * (1 - e)]],
        jnp.float32,
    )
    m = perspective_from_quads(cw.astype(jnp.float32), dst)
    a = jnp.linalg.inv(m)
    a = a / a[2, 2]

    wy = jnp.maximum(1.0, jnp.linalg.norm(cw[3] - cw[0]) / oh)
    wx = jnp.maximum(1.0, jnp.linalg.norm(cw[1] - cw[0]) / ow)

    params = jnp.concatenate(
        [a.reshape(9), 1.0 / wy[None], 1.0 / wx[None], jnp.zeros((5,), jnp.float32)]
    )
    # degenerate quads (padded invalid slots) produce a singular DLT solve;
    # sanitize so the kernel stays finite (output is masked by valid anyway)
    return win.astype(jnp.float32), jnp.nan_to_num(params, posinf=0.0, neginf=0.0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _dewarp_kernel(
    params_ref, win_ref, out_ref, tt_ref, *, oh: int, ow: int, w_win: int
):
    """One detection: win (1,3,W,W) + params (1,1,16) → outT (1,3,OW,OH).

    params ride in SMEM shaped (1,1,16) — Mosaic requires SMEM block trailing
    dims to equal the array's, so the per-detection row keeps a dummy axis.
    ``tt_ref`` is VMEM scratch holding the pass-1 result transposed (3,W,OH):
    pass 2 row-slices it with dynamic indices, which Mosaic only supports on
    refs, and the (x→sublane, v→lane) layout keeps every pass-2 broadcast on
    the lanes.
    """
    a00 = params_ref[0, 0, 0]
    a01 = params_ref[0, 0, 1]
    a02 = params_ref[0, 0, 2]
    a10 = params_ref[0, 0, 3]
    a11 = params_ref[0, 0, 4]
    a12 = params_ref[0, 0, 5]
    a20 = params_ref[0, 0, 6]
    a21 = params_ref[0, 0, 7]
    a22 = params_ref[0, 0, 8]
    iwy = params_ref[0, 0, 9]
    iwx = params_ref[0, 0, 10]

    # --- y*(v,x): solve x(u,v)=x for u, evaluate y(u,v) -------------------
    # (Mosaic iota is integer-only; cast after)
    vv = jax.lax.broadcasted_iota(jnp.int32, (oh, w_win), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (oh, w_win), 1).astype(jnp.float32)
    den_u = a00 - xx * a20
    den_u = jnp.where(jnp.abs(den_u) < 1e-6, 1e-6, den_u)
    u_sol = (xx * (a21 * vv + a22) - a01 * vv - a02) / den_u
    den_y = a20 * u_sol + a21 * vv + a22
    den_y = jnp.where(jnp.abs(den_y) < 1e-6, 1e-6, den_y)
    ystar = (a10 * u_sol + a11 * vv + a12) / den_y  # (OH, W)

    # --- pass 1 (vertical): hat rows regenerated on the VPU, acc in VMEM --
    # fori iterations carry real Mosaic loop overhead (~hundreds of cycles):
    # chunk the source loop and unroll CHUNK rows per iteration (v1 with one
    # row per iteration ran 2× slower than the XLA path; chunked it wins)
    chunk = 8
    assert w_win % chunk == 0

    def body1(yc, acc):
        t0, t1, t2, t3 = acc
        y0 = yc * chunk
        for j in range(chunk):
            yf = (y0 + j).astype(jnp.float32)
            wrow = jnp.maximum(0.0, 1.0 - jnp.abs(yf - ystar) * iwy)
            t0 = t0 + wrow * win_ref[0, 0, pl.ds(y0 + j, 1), :]
            t1 = t1 + wrow * win_ref[0, 1, pl.ds(y0 + j, 1), :]
            t2 = t2 + wrow * win_ref[0, 2, pl.ds(y0 + j, 1), :]
            t3 = t3 + wrow
        return t0, t1, t2, t3

    z = jnp.zeros((oh, w_win), jnp.float32)
    t0, t1, t2, t3 = jax.lax.fori_loop(0, w_win // chunk, body1, (z, z, z, z))
    keep = t3 > 1e-4
    den = jnp.maximum(t3, 1e-6)
    # transpose (v,x) → (x,v): pass 2's per-x broadcasts then ride the lanes
    tt_ref[0] = jnp.where(keep, t0 / den, 0.0).T
    tt_ref[1] = jnp.where(keep, t1 / den, 0.0).T
    tt_ref[2] = jnp.where(keep, t2 / den, 0.0).T

    # --- x*(u,v) computed directly transposed ----------------------------
    uuT = jax.lax.broadcasted_iota(jnp.int32, (ow, oh), 0).astype(jnp.float32)
    vvT = jax.lax.broadcasted_iota(jnp.int32, (ow, oh), 1).astype(jnp.float32)
    den_x = a20 * uuT + a21 * vvT + a22
    den_x = jnp.where(jnp.abs(den_x) < 1e-6, 1e-6, den_x)
    xstarT = (a00 * uuT + a01 * vvT + a02) / den_x  # (OW, OH)

    # --- pass 2 (horizontal), transposed output ---------------------------
    def body2(xc, acc):
        o0, o1, o2, o3 = acc
        x0 = xc * chunk
        for j in range(chunk):
            xf = (x0 + j).astype(jnp.float32)
            wrow = jnp.maximum(0.0, 1.0 - jnp.abs(xf - xstarT) * iwx)
            o0 = o0 + wrow * tt_ref[0, pl.ds(x0 + j, 1), :]
            o1 = o1 + wrow * tt_ref[1, pl.ds(x0 + j, 1), :]
            o2 = o2 + wrow * tt_ref[2, pl.ds(x0 + j, 1), :]
            o3 = o3 + wrow
        return o0, o1, o2, o3

    zo = jnp.zeros((ow, oh), jnp.float32)
    o0, o1, o2, o3 = jax.lax.fori_loop(0, w_win // chunk, body2, (zo, zo, zo, zo))
    keep_o = o3 > 1e-4
    den_o = jnp.maximum(o3, 1e-6)
    out_ref[0, 0] = jnp.clip(jnp.where(keep_o, o0 / den_o, 0.0), 0.0, 1.0)
    out_ref[0, 1] = jnp.clip(jnp.where(keep_o, o1 / den_o, 0.0), 0.0, 1.0)
    out_ref[0, 2] = jnp.clip(jnp.where(keep_o, o2 / den_o, 0.0), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("out_hw", "window", "interpret"))
def _dewarp_pallas_call(
    windows: jnp.ndarray,  # (D, 3, W, W) f32 planar
    params: jnp.ndarray,  # (D, 16) f32
    out_hw: tuple[int, int] = (192, 128),
    window: int = 192,
    interpret: bool = False,
) -> jnp.ndarray:  # (D, OH, OW, 3)
    d = windows.shape[0]
    oh, ow = out_hw
    kernel = functools.partial(_dewarp_kernel, oh=oh, ow=ow, w_win=window)
    outT = pl.pallas_call(
        kernel,
        grid=(d,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, window, window), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, ow, oh), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((d, 3, ow, oh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, window, oh), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=d * (oh * window * window + ow * oh * window) * 9,
            bytes_accessed=d * (3 * window * window + 3 * oh * ow) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(params[:, None, :], windows)
    return jnp.transpose(outT, (0, 3, 2, 1))  # (D, OH, OW, 3)


def dewarp_quads_pallas(
    frame: jnp.ndarray,
    corners: jnp.ndarray,
    out_hw: tuple[int, int] = (192, 128),
    window: int = 192,
    expand_ratio: float = 0.05,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H,W,3) frame + (D,4,2) quads → (D,OH,OW,3) rectified crops.

    Drop-in for `warp.dewarp_quads_batch`, fused-kernel edition.
    """
    pyr = frame_pyramid_planar(frame)
    windows, params = jax.vmap(
        lambda q: _window_and_params(pyr, q, out_hw, window, expand_ratio)
    )(corners)
    return _dewarp_pallas_call(windows, params, out_hw, window, interpret=interpret)


def dewarp_quads_pallas_frames(
    frames: jnp.ndarray,
    corners: jnp.ndarray,
    out_hw: tuple[int, int] = (192, 128),
    window: int = 192,
    expand_ratio: float = 0.05,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B,H,W,3) frames + (B,D,4,2) quads → (B,D,OH,OW,3).

    Window prep is vmapped XLA; the kernel runs ONCE over the flattened B·D
    grid (a pallas_call under vmap would re-trace per batching level and
    stress Mosaic's block rules — flattening keeps one clean (N,) grid).
    """
    b, d = corners.shape[0], corners.shape[1]

    def prep(frame, qs):
        pyr = frame_pyramid_planar(frame)
        return jax.vmap(
            lambda q: _window_and_params(pyr, q, out_hw, window, expand_ratio)
        )(qs)

    windows, params = jax.vmap(prep)(frames, corners)
    crops = _dewarp_pallas_call(
        windows.reshape(b * d, *windows.shape[2:]),
        params.reshape(b * d, params.shape[-1]),
        out_hw,
        window,
        interpret=interpret,
    )
    return crops.reshape(b, d, *out_hw, 3)
