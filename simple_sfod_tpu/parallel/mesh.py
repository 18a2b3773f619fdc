"""Device mesh + data/tensor-parallel sharding.

The TPU-native replacement for the reference's NCCL/DDP stack (SURVEY §2.3,
§5): a `Mesh(('data',))` (optionally `('data', 'model')`); batches are
sharded on 'data', the train state is replicated (or its box-head fc
parameters tensor-sharded on 'model'), and XLA inserts the gradient
all-reduce / TP collectives when the jitted step runs under the mesh —
there is no explicit collective code to maintain. Multi-host (the
reference's `launch(num_machines=...)`) maps to
`jax.distributed.initialize` + the same single-program step.

DP is the right default for this workload: a ~140M-param CNN detector (no
attention, no long sequences — SURVEY §2.3) saturates ICI with data
parallelism long before parameter sharding pays. TPU.MESH_MODEL > 1 adds a
'model' axis that Megatron-shards the two box-head fc layers (the largest
matmuls: fc0 column-parallel, fc1 row-parallel — XLA inserts the reduce
after fc1); useful when per-chip batch is 1 and the head dominates, and it
is the pattern a future attention backbone would extend.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None, num_processes: int = 1, process_id: int = 0):
    """Multi-host init (DCN). No-op single-process.

    After init, one throwaway global barrier establishes the cross-process
    collective context (gloo on CPU, ICI/DCN cliques on TPU) while every
    process is still in lockstep. Without it the context rendezvous happens
    at the first REAL collective — which can sit behind a long, contention-
    skewed compile on each process, and the rendezvous window (30 s for
    gloo's GetKeyValue) is easy to miss. Paying it here, where skew is
    microseconds, makes the first training/eval collective reuse the
    already-built clique."""
    if num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("simple_sfod_tpu:init")


def make_mesh(data_axis: int = -1, model_axis: int = 1, devices=None) -> Mesh:
    """model_axis=1 keeps the historical 1-D ('data',) mesh (and therefore
    the compiled-step cache keys); model_axis>1 builds ('data', 'model')."""
    devices = devices if devices is not None else jax.devices()
    m = max(int(model_axis), 1)
    if m == 1:
        n = len(devices) if data_axis in (-1, 0) else data_axis
        return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))
    n = (len(devices) // m) if data_axis in (-1, 0) else data_axis
    if n * m > len(devices):
        raise ValueError(
            f"mesh {n}x{m} needs {n * m} devices, have {len(devices)}"
        )
    return Mesh(np.asarray(devices[: n * m]).reshape(n, m), ("data", "model"))


def _tp_spec(names, shape, model_size: int) -> P:
    """Tensor-parallel placement for one state leaf, by pytree path.

    Megatron MLP pattern on the box head (models/heads.py FastRCNNConvFCHead):
    fc0 kernel column-parallel [in, out/m] + bias sharded, fc1 kernel
    row-parallel [in/m, out] + bias replicated; XLA inserts the psum after
    fc1. Matching by path SUFFIX means the rule also catches the same
    parameter inside optimizer momentum and the EMA teacher tree (both
    mirror the params structure). Anything non-divisible or unmatched stays
    replicated."""
    if "box_head" not in names:
        return P()
    leaf = names[-1] if names else ""
    if "fc0" in names:
        spec = P(None, "model") if leaf == "kernel" else P("model")
    elif "fc1" in names:
        spec = P("model", None) if leaf == "kernel" else P()
    else:
        return P()
    if len(spec) > len(shape):
        return P()
    for dim, axis in zip(shape, spec):
        if axis == "model" and dim % model_size:
            return P()
    return spec


def shard_batch(mesh: Mesh, tree: Any, axis: int = 0, spatial: bool = False) -> Any:
    """Place arrays sharded over the data axis at dimension `axis` (0 for a
    plain [B, ...] batch; 1 for chunked [K, B, ...] multi-step stacks).

    spatial=True additionally shards the image HEIGHT dimension (axis+1 of
    [..., B, H, W, C] canvases, identified as the leaves with >= 3 dims past
    the batch) over the 'model' mesh axis — spatial partitioning: each chip
    owns a horizontal band of every image and GSPMD inserts the halo
    exchanges the convolutions need. This is the parallelism that still
    helps at per-chip batch 1, where the step is bandwidth-bound in the
    early conv layers (BENCH_NOTES device trace)."""
    if mesh.devices.size == 1:
        return tree
    sp = spatial and "model" in mesh.axis_names and mesh.shape["model"] > 1

    def put(x):
        if x.ndim > axis:
            rest = [None] * (x.ndim - axis - 1)
            if sp and x.ndim >= axis + 4:  # [..., B, H, W, C] canvas
                rest[0] = "model"
            spec = P(*([None] * axis), "data", *rest)
        else:
            spec = P()
        return _place(mesh, x, spec)

    return jax.tree.map(put, tree)


def _place(mesh: Mesh, x, spec: P):
    """Place one host array under `spec` on a possibly MULTI-PROCESS mesh.

    Single-process: plain device_put. Multi-process: device_put cannot
    target a sharding that spans non-addressable devices, so each process
    serves its own addressable shards out of the (identical) full host array
    via make_array_from_callback — the multi-host loader contract is that
    every process holds the same global batch (deterministic loaders), and
    each process uploads only its slice. Numerics are therefore identical to
    the single-process full-batch dispatch (tests/test_multihost.py)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (train state) over the mesh."""
    if mesh.devices.size == 1:
        return tree
    return jax.tree.map(lambda x: _place(mesh, x, P()), tree)


def shard_state(mesh: Mesh, tree: Any) -> Any:
    """Place a train-state pytree on the mesh: replicated everywhere except
    the box-head fc parameters, which are tensor-sharded over 'model' when
    that axis exists (see _tp_spec). On a 1-D mesh this IS replicate()."""
    if mesh.devices.size == 1:
        return tree
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return replicate(mesh, tree)
    m = mesh.shape["model"]

    def put(path, x):
        names = []
        for k in path:
            name = getattr(k, "key", None)
            if name is None:
                name = getattr(k, "name", None)
            if name is not None:
                names.append(str(name))
        spec = _tp_spec(names, np.shape(x), m)
        return _place(mesh, x, spec)

    return jax.tree_util.tree_map_with_path(put, tree)
