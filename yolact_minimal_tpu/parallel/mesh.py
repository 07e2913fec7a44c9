"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL layer (config.py:229-235, train.py:67-77).

One 1-D `data` mesh axis spans all chips (ICI within a slice, DCN across
hosts). The train step is a single jitted graph with batch inputs sharded on
`data` and parameters replicated; XLA inserts the gradient all-reduce that
DDP did by hand. `process 0` gating replaces rank-0 gating.

Multi-host: `initialize_distributed()` is the env:// analog of the
reference's `dist.init_process_group` (config.py:229-230) — it joins the
JAX distributed runtime so `jax.devices()` spans every host's chips. Each
process then contributes its `global_bs / process_count` batch rows via
`shard_batch`, which assembles the global sharded array with
`jax.make_array_from_process_local_data` (no host ever materializes the
full global batch). Verified by the 2-process x 4-virtual-device CPU
harness in tests/test_multihost.py.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Join the JAX distributed runtime for multi-host training — the
    env:// analog of the reference's NCCL process-group init
    (config.py:229-230). Returns True if a multi-process world was joined.

    Configuration, by precedence:
      * explicit arguments;
      * YOLACT_COORDINATOR / YOLACT_NUM_PROCESSES / YOLACT_PROCESS_ID env
        vars (the MASTER_ADDR-style contract);
      * on a real multi-host TPU pod, `jax.distributed.initialize()` with
        no arguments auto-detects everything from the TPU metadata — pass
        coordinator='auto' (or set YOLACT_COORDINATOR=auto) to use it.
    With no configuration at all this is a no-op (single-process)."""
    coordinator = coordinator or os.environ.get('YOLACT_COORDINATOR')
    if coordinator is None:
        return False
    if coordinator == 'auto':
        jax.distributed.initialize()
        return True
    if num_processes is None:
        num_processes = int(os.environ.get('YOLACT_NUM_PROCESSES', '1'))
    if process_id is None:
        process_id = int(os.environ.get('YOLACT_PROCESS_ID', '0'))
    jax.distributed.initialize(coordinator, num_processes, process_id)
    return True


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
    """Build the globally-sharded batch from this process's rows.

    Single-process: a plain device_put with the leading axis split over
    `data`. Multi-process: `batch` holds only this process's
    `global_bs / process_count` rows (the TrainLoader contract), and the
    global array is assembled with jax.make_array_from_process_local_data —
    each host uploads exactly its shard, the DistributedSampler analog of
    reference train.py:77."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
