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
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

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
    assert mesh.devices.size == num_procs  # one device per process

    # full batch, identical on every process; each process feeds ITS shard
    rs = np.random.RandomState(0)
    full_x = rs.randn(num_procs * 2, 8).astype(np.float32)
    full_y = rs.randn(num_procs * 2, 1).astype(np.float32)
    w = jnp.asarray(rs.randn(8, 1).astype(np.float32))

    local_x = full_x[pid * 2 : (pid + 1) * 2]
    local_y = full_y[pid * 2 : (pid + 1) * 2]
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
