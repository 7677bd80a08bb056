"""Row gathers from large device-resident pools.

XLA lowers `jnp.take(pool, idx, axis=0)` with dynamic indices to a general
gather, which on TPU degenerates to per-element scalar addressing for large
rows — measured ~20 ms PER 1.2 MB ROW on v5e (327 ms to fetch 16 scenes from
a 2.5 GB uint8 pool). The same fetch as an unrolled chain of
`lax.dynamic_slice` ops is ~1 ms total: each slice is a contiguous DMA.

``take_rows`` is the framework-wide primitive for "index a HBM pool by a
small batch of random rows" — the hot operation of every device-resident
dataset (data/encoder_gen.py pools, train/od_train.py scene pool). The
unroll count equals the (static) batch size, so HLO growth is bounded and
there is no while-loop (which would cost a host round-trip per iteration on
remote-dispatch runtimes).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def take_rows(pool: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``pool[idx]`` along axis 0 via unrolled dynamic slices.

    ``idx`` must have a static 1-D shape (the batch size); values may be
    traced. Equivalent to ``jnp.take(pool, idx, axis=0)`` but avoids TPU
    gather pathology for big rows.
    """
    n = int(idx.shape[0])
    rows = [lax.dynamic_index_in_dim(pool, idx[i], axis=0, keepdims=False)
            for i in range(n)]
    return jnp.stack(rows)
