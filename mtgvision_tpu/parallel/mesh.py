"""Device-mesh + sharding helpers (pjit over ICI).

The reference is single-device (SURVEY.md §2.5); here multi-chip scaling is
first-class: a 1-D "data" mesh axis carries batch data-parallelism for
training and shards the vector-index rows for retrieval; model params are
replicated (all models here are ≤100M params). XLA inserts the all-reduce /
all-gather collectives over ICI from the sharding annotations alone.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch / row) dim over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of host arrays with the leading dim sharded."""
    s = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
