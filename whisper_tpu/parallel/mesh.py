"""Device mesh construction for multi-chip scale-out.

The reference's distribution stack (meta backend TP state machine, NCCL
allreduce, RPC remote devices — SURVEY.md §5) collapses on TPU into a
`jax.sharding.Mesh` + NamedSharding: XLA GSPMD inserts the ICI collectives.
Axes: 'dp' shards independent audio windows/requests; 'tp' shards attention
heads / MLP hidden / KV-cache state within one model replica.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int = 1, n_tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (dp, tp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tp is None:
        n_tp = len(devices) // n_dp
    assert n_dp * n_tp == len(devices), (
        f"mesh {n_dp}x{n_tp} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
