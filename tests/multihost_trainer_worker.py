"""Worker for multi-process REAL-TRAINER tests (tests/test_multihost.py).

Modes (argv: coordinator nproc pid mode outdir steps):
  train  — build the real `base` trainer over the cross-process mesh, run
           `steps` jitted steps on deterministic global batches, save a
           checkpoint (single-writer: process 0), dump final params.
  resume — resume_or_load(resume=True) from the same OUTPUT_DIR, assert the
           restored step count, continue `steps` more steps, dump params.
  adabn  — reset BN stats, refine_bn_stats over deterministic batches on the
           cross-process mesh, dump the recomputed batch_stats.

The pytest side compares every dump against a SINGLE-process run of the
identical step sequence: multi-process DP must be numerically the
single-host computation (reference launch(num_machines=...) + DDP contract,
train_net.py:92-99; AdaBN under DDP base.py:281-337).

The batch stream helpers live at module level with lazy imports so the test
process can import them WITHOUT this module touching the JAX backend config.
"""

from __future__ import annotations

import os
import sys

CANVAS = (32, 64)
GT_CAP = 8


def make_batch(i: int, n: int):
    """Deterministic global batch #i with n images (identical on every
    process — the multi-host loader contract shard_batch relies on)."""
    import numpy as np

    rs = np.random.RandomState(100 + i)
    images = rs.randint(0, 256, (n, *CANVAS, 3)).astype(np.uint8)
    bx = np.zeros((n, GT_CAP, 4), np.float32)
    cl = np.zeros((n, GT_CAP), np.int32)
    vd = np.zeros((n, GT_CAP), bool)
    for j in range(n):
        for k in range(2):
            x1 = rs.uniform(0, CANVAS[1] - 20)
            y1 = rs.uniform(0, CANVAS[0] - 12)
            bx[j, k] = [x1, y1, x1 + rs.uniform(10, 18), y1 + rs.uniform(8, 11)]
            cl[j, k] = rs.randint(0, 8)
            vd[j, k] = True
    return {
        "images": images,
        "sizes": np.tile(np.asarray([[CANVAS[0], CANVAS[1]]], np.int32), (n, 1)),
        "gt_boxes": bx,
        "gt_classes": cl,
        "gt_valid": vd,
    }


def worker_cfg(total_devices: int, outdir: str):
    import __graft_entry__ as g

    cfg = g._tiny_cfg(total_devices, canvas=CANVAS, backbone="tiny")
    cfg.TRAINER = "base"
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 0  # schedule must not depend on the phase split
    cfg.SOLVER.STEPS = ()
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.OUTPUT_DIR = outdir
    cfg.freeze()
    return cfg


def build(total_devices: int, outdir: str):
    from simple_sfod_tpu.engine.trainers import build_trainer

    return build_trainer(worker_cfg(total_devices, outdir), synthetic=True)


def dump_params(tr, path: str):
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(
        {"params": jax.device_get(tr.state.params),
         "batch_stats": jax.device_get(tr.state.batch_stats)}
    )[0]
    np.savez(path, **{
        "/".join(str(getattr(p, "key", p)) for p in kp): np.asarray(leaf)
        for kp, leaf in flat
    })


def main():
    coordinator, nproc, pid, mode, outdir, steps = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5], int(sys.argv[6]),
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from simple_sfod_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator, nproc, pid)
    assert jax.process_count() == nproc

    tr = build(nproc, outdir)

    if mode == "adabn":
        tr.reset_bn_stats()
        tr.refine_bn_stats(
            max_batches=steps,
            loader=[make_batch(i, nproc) for i in range(steps)],
            chunk=4,
        )
        dump_params(tr, os.path.join(outdir, f"adabn_proc{pid}.npz"))
        print(f"MULTIHOST_TRAINER_OK proc={pid}", flush=True)
        return

    start = 0
    if mode == "resume":
        tr.resume_or_load(resume=True)
        start = int(tr.state.step)
        assert start > 0, "resume restored nothing"
    for i in range(start, start + steps):
        m = tr.run_step(make_batch(i, nproc))
    assert float(m["total_loss"]) == float(m["total_loss"])  # finite (not NaN)
    if mode == "train":
        tr.checkpointer.save("model_mh", tr.state)  # single-writer inside
    dump_params(tr, os.path.join(outdir, f"{mode}_proc{pid}.npz"))
    print(f"MULTIHOST_TRAINER_OK proc={pid} step={int(tr.state.step)}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
