"""Fused cosine-similarity top-k over an HBM-resident embedding matrix.

This is the compute core of the Qdrant replacement (reference: external Rust
server, mtgvision/qdrant.py:17-109 — 768-d COSINE collection, k=3 serve /
k=5 validate). TPU-native design:

- the database is a pre-L2-normalized (N, D) matrix resident in HBM,
- a query batch is normalized, cast to bf16, and hits the MXU as one matmul,
- top-k uses a chunked two-stage reduction: per-chunk ``lax.top_k`` over the
  score matrix then a final merge — O(N log k) instead of a full sort, and the
  (B, N) score matrix never leaves HBM,
- a Pallas streaming kernel (``cosine_topk_pallas``) tiles the database through
  VMEM with double-buffered DMA and keeps the running top-k in VMEM scratch, so
  scores are never materialized in HBM at all. HONEST BENCHMARK (v5e-1, quiet
  chip, chained value-fetch, 128 queries, k=3): XLA path 5.2 ms vs kernel
  6.2 ms at N=60k; 5.3 vs 6.4 ms at N=262k — both dispatch-dominated, the XLA
  path wins at every realistic census size, so serving uses the XLA path
  unconditionally and the kernel remains a tested, benchmarked alternative
  (scripts/perf_sprint.py).

Sharding: ``index.store.VectorStore`` shards N over the mesh and psum-merges
per-shard top-k (SURVEY.md §2.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x * lax.rsqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


def topk_small(scores: jnp.ndarray, k: int):
    """Top-k via ``k`` masked argmax passes — no sort.

    For the serving k (3-5), k full-row max/argmax sweeps beat `lax.top_k`'s
    sort-based lowering ~2× on TPU (measured 3.5 ms vs 7.3 ms for
    (128, 60k) scores on v5e) and each pass is a pure VPU reduction.
    """
    col = jnp.arange(scores.shape[1], dtype=jnp.int32)[None, :]
    vs, idx = [], []
    for _ in range(k):
        i = jnp.argmax(scores, axis=1).astype(jnp.int32)
        vs.append(jnp.max(scores, axis=1))
        idx.append(i)
        scores = jnp.where(col == i[:, None], -jnp.inf, scores)
    return jnp.stack(vs, 1), jnp.stack(idx, 1)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def topk_scores(scores: jnp.ndarray, k: int, chunk: int = 8192):
    """Top-k over the last axis of (B, N) scores.

    Small k (≤8, the serve/validate regime) uses ``topk_small`` masked-argmax
    passes; larger k falls back to a chunked two-stage `lax.top_k` (top-k per
    chunk, then top-k over survivors). Returns (values, indices).
    """
    b, n = scores.shape
    if k <= 8:
        return topk_small(scores, k)
    if n <= max(chunk, 2 * k):
        return lax.top_k(scores, k)
    # pad N to a multiple of chunk with -inf
    pad = (-n) % chunk
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    c = scores.shape[1] // chunk
    s = scores.reshape(b, c, chunk)
    v, i = lax.top_k(s, k)  # (B, C, k)
    base = (jnp.arange(c, dtype=i.dtype) * chunk)[None, :, None]
    i = i + base
    v = v.reshape(b, c * k)
    i = i.reshape(b, c * k)
    vf, sel = lax.top_k(v, k)
    idx = jnp.take_along_axis(i, sel, axis=1)
    return vf, idx


@functools.partial(jax.jit, static_argnames=("k", "normalized"))
def cosine_topk(
    queries: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    normalized: bool = True,
    n_valid: jnp.ndarray | int | None = None,
    row_valid: jnp.ndarray | None = None,
):
    """Top-k cosine similarity of (B, D) queries against an (N, D) database.

    ``db`` should be pre-normalized (store it that way — see VectorStore);
    queries are always normalized here. The matmul runs in bf16 on the MXU with
    float32 accumulation (preferred_element_type), scores stay f32.

    ``n_valid``: rows >= n_valid are capacity/shard padding (zero vectors);
    masking them to -inf keeps them out of the top-k even when every real
    score is <= 0 (see cosine_topk_sharded).

    Returns (scores (B,k) f32, indices (B,k) i32).
    """
    # nan_to_num: a NaN/Inf query row (degenerate upstream crop) must yield
    # finite (zero) scores, not NaN rows that poison argmax and JSON output
    q = jnp.nan_to_num(l2_normalize(queries.astype(jnp.float32)))
    d = db if normalized else l2_normalize(db.astype(jnp.float32))
    scores = jnp.dot(
        q.astype(jnp.bfloat16),
        d.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    if row_valid is not None:
        # explicit per-row validity (flip-aware stores interleave padding
        # inside the matrix, so a prefix count can't describe it)
        scores = jnp.where(row_valid[None, :], scores, -jnp.inf)
    elif n_valid is not None:
        col = jnp.arange(scores.shape[1], dtype=jnp.int32)[None, :]
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
    v, i = topk_scores(scores, k)
    # bf16 rounding of unit vectors can push a perfect match ~0.3% above 1.0;
    # clamp so cosine-score semantics (≤ 1.0, thresholds) stay exact
    return jnp.clip(v, -1.0, 1.0), i


def cosine_topk_sharded(
    queries: jnp.ndarray,
    db_sharded: jnp.ndarray,
    k: int,
    mesh,
    axis: str | None = None,
    n_valid: jnp.ndarray | int | None = None,
    row_valid: jnp.ndarray | None = None,
):
    """Multi-chip exact top-k: database rows sharded over a 1-D mesh.

    Explicit collective layout (SURVEY.md §2.5 plan): each chip computes a
    LOCAL matmul + top-k over its row shard (queries replicated), then only
    the (B, k) candidates are all-gathered over ICI and merged — the score
    matrix never crosses chips, so inter-chip traffic is O(B·k·n_dev) instead
    of O(B·N).

    ``db_sharded``: (N, D) with N sharded on ``axis``; returns global row
    indices.

    ``n_valid``: number of REAL database rows. The store pads its matrix
    with zero rows up to a multiple of the mesh size; a zero row scores
    exactly 0, so when every real cosine score for a query is <= 0 a padded
    row could enter the top-k and surface an out-of-range index to
    consumers. Masking those rows to -inf here makes that impossible
    (ADVICE r3); when k > n_valid the overflow slots still carry index >=
    n_valid, which callers already treat as empty.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    n_total = db_sharded.shape[0]
    shard_rows = n_total // n_dev

    def local(q, db_local, nv, rv):
        qn = l2_normalize(q.astype(jnp.float32))
        scores = jnp.dot(
            qn.astype(jnp.bfloat16),
            db_local.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        shard_id = jax.lax.axis_index(axis)
        row_global = shard_id * shard_rows + jnp.arange(shard_rows, dtype=jnp.int32)
        if rv is not None:
            scores = jnp.where(rv[None, :], scores, -jnp.inf)
        elif nv is not None:
            scores = jnp.where(row_global[None, :] < nv, scores, -jnp.inf)
        v, i = topk_scores(scores, k)
        # local → global row indices
        i = i + shard_id * shard_rows
        # gather all shards' candidates: (B, n_dev·k) each
        v_all = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        vf, sel = lax.top_k(v_all, k)
        return jnp.clip(vf, -1.0, 1.0), jnp.take_along_axis(i_all, sel, axis=1)

    if row_valid is not None:
        fn = shard_map(
            lambda q, db, rv: local(q, db, None, rv),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(queries, db_sharded, row_valid)
    if n_valid is None:
        fn = shard_map(
            lambda q, db: local(q, db, None, None),
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(queries, db_sharded)
    fn = shard_map(
        lambda q, db, nv: local(q, db, nv, None),
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, db_sharded, jnp.asarray(n_valid, jnp.int32))


# ---------------------------------------------------------------------------
# Pallas streaming kernel — scores never touch HBM
# ---------------------------------------------------------------------------


def _merge_topk(run_v, run_i, tile_v, tile_i, k: int):
    """Merge running (B,k) top-k with a new tile's (B,T) scores.

    Mosaic has no top_k/sort lowering, so the merge is k passes of masked
    max + argmax over the concatenated candidates — k is small (≤16) and each
    pass is a cheap VPU row reduction, so this stays fast.
    """
    v = jnp.concatenate([run_v, tile_v], axis=1)
    i = jnp.concatenate([run_i, tile_i], axis=1)
    b, m = v.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    out_v = []
    out_i = []
    for _ in range(k):
        best = jnp.max(v, axis=1, keepdims=True)  # (B,1)
        # first column achieving the max
        is_best = v >= best
        first = jnp.min(jnp.where(is_best, col, m), axis=1, keepdims=True)
        picked_i = jnp.sum(jnp.where(col == first, i, 0), axis=1)
        out_v.append(best[:, 0])
        out_i.append(picked_i)
        v = jnp.where(col == first, -jnp.inf, v)
    return jnp.stack(out_v, axis=1), jnp.stack(out_i, axis=1)


def cosine_topk_pallas(
    queries: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    tile_n: int = 2048,
    interpret: bool = False,
):
    """Streaming fused normalize→matmul→top-k in a single Pallas kernel.

    Grid iterates over database tiles; each step multiplies the full (B, D)
    query block (VMEM-resident) with a (T, D) database tile and folds the tile
    scores into a running (B, K) top-k held in VMEM scratch. K is padded to the
    128-lane boundary for layout friendliness; callers slice [:, :k].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = queries.shape
    n = db.shape[0]
    kp = k  # running top-k width == k (merge is k masked-max passes)
    pad_n = (-n) % tile_n
    if pad_n:
        db = jnp.pad(db, ((0, pad_n), (0, 0)))
    nt = db.shape[0] // tile_n

    q = l2_normalize(queries.astype(jnp.float32)).astype(jnp.bfloat16)

    def kernel(q_ref, db_ref, v_out, i_out, vs, is_):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            vs[:] = jnp.full((b, kp), -jnp.inf, jnp.float32)
            is_[:] = jnp.zeros((b, kp), jnp.int32)

        scores = jax.lax.dot_general(
            q_ref[:],
            db_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, T)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1) + t * tile_n
        # mask out padded rows
        valid = col < n
        scores = jnp.where(valid, scores, -jnp.inf)
        nv, ni = _merge_topk(vs[:], is_[:], scores, col, kp)
        vs[:] = nv
        is_[:] = ni

        @pl.when(t == nt - 1)
        def _():
            v_out[:] = vs[:]
            i_out[:] = is_[:]

    v, i = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, kp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, kp), jnp.float32),
            pltpu.VMEM((b, kp), jnp.int32),
        ],
        interpret=interpret,
    )(q, db.astype(jnp.bfloat16))
    return jnp.clip(v[:, :k], -1.0, 1.0), i[:, :k]
