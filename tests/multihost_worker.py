"""Worker for the multi-host (multi-process) distribution test.

Run by tests/test_multihost.py in N separate processes, each with ONE CPU
device, to exercise the reference's multi-machine DDP contract
(train_net.py:92-99 launch(num_machines=...)) through this repo's actual
helpers: parallel.mesh.initialize_distributed + make_mesh + a jitted
data-parallel gradient step whose all-reduce crosses PROCESS boundaries.

Asserts the cross-process-averaged gradient equals the full-batch gradient
computed locally — i.e. multi-host DP is mathematically identical to
single-host training on the combined batch.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# devices per process: argv[4] (default 1) -> a num_procs x D global mesh
_DEV = int(sys.argv[4]) if len(sys.argv) > 4 else 1
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={_DEV}"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from simple_sfod_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    assert mesh.devices.size == num_procs * _DEV

    # full batch, identical on every process; each process feeds ITS shard
    rs = np.random.RandomState(0)
    per_proc = 2 * _DEV  # 2 rows per device
    full_x = rs.randn(num_procs * per_proc, 8).astype(np.float32)
    full_y = rs.randn(num_procs * per_proc, 1).astype(np.float32)
    w = jnp.asarray(rs.randn(8, 1).astype(np.float32))

    local_x = full_x[pid * per_proc : (pid + 1) * per_proc]
    local_y = full_y[pid * per_proc : (pid + 1) * per_proc]
    xs = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), jnp.asarray(local_x))
    ys = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), jnp.asarray(local_y))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    rep = NamedSharding(mesh, P())
    grad = jax.jit(jax.grad(loss), out_shardings=rep)(w, xs, ys)  # cross-process psum
    want = jax.grad(loss)(w, jnp.asarray(full_x), jnp.asarray(full_y))
    np.testing.assert_allclose(
        np.asarray(jax.device_get(grad)), np.asarray(want), rtol=1e-5, atol=1e-6
    )
    print(f"MULTIHOST_OK proc={pid}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
