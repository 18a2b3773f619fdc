"""Device mesh + data-parallel sharding.

The TPU-native replacement for the reference's NCCL/DDP stack (SURVEY §2.3,
§5): a 1-D `Mesh(('data',))`; batches are sharded on 'data', the train state
is replicated, and XLA inserts the gradient all-reduce when the jitted step
runs under the mesh — there is no explicit collective code to maintain.
Multi-host (the reference's `launch(num_machines=...)`) maps to
`jax.distributed.initialize` + the same single-program step.

The mesh is 1-D on purpose: the workload is a ~140M-param CNN detector (no
attention, no long sequences — SURVEY §2.3), so DP saturates ICI long before
parameter sharding would pay; adding 'model' as a second axis is a local
change here if a future backbone needs TP.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None, num_processes: int = 1, process_id: int = 0):
    """Multi-host init (DCN). No-op single-process."""
    if num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(data_axis: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices) if data_axis in (-1, 0) else data_axis
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def shard_batch(mesh: Mesh, tree: Any, axis: int = 0) -> Any:
    """Place arrays sharded over the data axis at dimension `axis` (0 for a
    plain [B, ...] batch; 1 for chunked [K, B, ...] multi-step stacks)."""
    if mesh.devices.size == 1:
        return tree

    def put(x):
        if x.ndim > axis:
            spec = P(*([None] * axis), "data", *([None] * (x.ndim - axis - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (train state) over the mesh."""
    if mesh.devices.size == 1:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
