"""Device-mesh construction and sharding helpers.

The reference scales by forking one OS process per position (joblib loky,
``examples/01:141-144``) with zero inter-worker communication. The TPU
equivalent is SPMD over a ``jax.sharding.Mesh``:

- ``dp`` — data parallel over positions/tiles (the reference's only axis);
- ``sp`` — spatial partitioning of image rows for fields too large for one
  chip's VMEM-friendly tiling (XLA inserts conv halo exchanges).

Weights are tiny (a U-Net), so tensor/pipeline parallelism would only add
collective latency — the mesh deliberately has no ``tp``/``pp`` axes
(SURVEY.md §5.7-5.8: batch, don't ring-pass).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    dp: int | None = None,
    sp: int | None = None,
) -> Mesh:
    """Mesh over (dp, sp). Defaults: all devices on dp, sp=1."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"dp({dp}) * sp({sp}) != n_devices({n})")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (position/tile) axis over dp, rows over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a batch pytree with batch-over-dp sharding (rank-aware)."""
    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        if x.ndim >= 1:
            spec[0] = "dp"
        if x.ndim >= 3:
            spec[1 if x.ndim == 3 else 1] = None
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)
