"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL layer (config.py:229-235, train.py:67-77).

One 1-D `data` mesh axis spans all chips (ICI within a slice, DCN across
hosts). The train step is a single jitted graph with batch inputs sharded on
`data` and parameters replicated; XLA inserts the gradient all-reduce that
DDP did by hand. `process 0` gating replaces rank-0 gating.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=('data',))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_main_process() -> bool:
    """Rank-0 analog for logging/checkpointing (reference train.py:73)."""
    return jax.process_index() == 0


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis sharded over `data`."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
