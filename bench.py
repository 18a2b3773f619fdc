#!/usr/bin/env python
"""Headline benchmark: source-free adaptive-teacher adaptation-step throughput
(images/sec/chip) at the reference workload shape (SURVEY §6 / BASELINE.md):
VGG16-BN Faster R-CNN, shortest-edge-600 Cityscapes canvas (608x1216),
batch 1 target image/chip, teacher inference + pseudo-labelling + student
update + EMA in one compiled step.

Baseline: the reference (PyTorch/Detectron2, A100) runs this adaptation step
at ~4.5 it/s = 4.5 imgs/s/GPU (typical Detectron2 VGG16 600px 1-img step from
its LOG conventions; the repo publishes no number — BASELINE.md). The driver
north-star is >=3x that, so vs_baseline is measured_imgs_per_sec / 4.5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import signal
import sys
import time

REFERENCE_IMGS_PER_SEC = 4.5  # assumed A100 Detectron2 baseline (see docstring)


def _watchdog(seconds: int = None):
    seconds = seconds or int(__import__("os").environ.get("BENCH_WATCHDOG_SECS", 7200))
    # 7200s: a COLD cache pays two ~30-min backend compiles (run_step +
    # the run_steps scan graph); a smaller watchdog would SIGKILL a
    # healthy first run mid-compile and report a false "tunnel hung"
    """The axon TPU tunnel can wedge (ops hang forever, ~0 CPU). Emit a
    sentinel result instead of hanging the driver."""

    def handler(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "sfat_adaptation_imgs_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "imgs/s/chip",
                    "vs_baseline": 0.0,
                    "error": f"timeout after {seconds}s (TPU tunnel hung?)",
                }
            )
        )
        sys.stdout.flush()
        # SIGKILL ourselves: a wedged TPU client cannot exit cleanly
        import os

        os.kill(os.getpid(), signal.SIGKILL)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def main():
    _watchdog()
    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()

    from simple_sfod_tpu.engine.trainers import build_trainer
    from simple_sfod_tpu.utils.bench import sfat_bench_cfg, synthetic_bench_batch

    cfg = sfat_bench_cfg(output_dir="/tmp/bench_out")

    trainer = build_trainer(cfg, synthetic=True)

    batch_size = cfg.SOLVER.IMS_PER_BATCH_TARGET
    batch = synthetic_bench_batch(cfg)

    # warmup / compile
    for _ in range(3):
        metrics = trainer.run_step(batch)
    import numpy as _np

    # timing always ends in a MATERIALIZING read: on the tunnel backend
    # jax.block_until_ready can return before execution finishes
    # (BENCH_NOTES round 2); a materialized host value cannot lie

    _np.asarray(metrics["total_loss"])

    # per-step breakdown (one synced step, then the pipelined loop)
    t0 = time.perf_counter()
    metrics = trainer.run_step(batch)
    _np.asarray(metrics["total_loss"])
    print(f"# synced single step: {(time.perf_counter() - t0) * 1000:.1f} ms", file=sys.stderr)

    # dispatch-per-step path (the interactive-training shape): each step is
    # its own host dispatch, so under tunnel load every step pays one RTT of
    # device idle on top of the 53ms executable (BENCH_NOTES round 2)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        metrics = trainer.run_step(batch)
    _np.asarray(metrics["total_loss"])
    dispatch_rate = iters * batch_size / (time.perf_counter() - t0)

    # headline: 30 steps per dispatched executable (trainer.run_steps =
    # lax.scan over the step body — how production TPU loops are written;
    # per-step RNG still advances). This measures the device's step
    # throughput rather than the shared tunnel's round-trip weather.
    metrics = trainer.run_steps(batch, iters)  # compile
    _np.asarray(metrics["total_loss"])
    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        metrics = trainer.run_steps(batch, iters)
        _np.asarray(metrics["total_loss"])
        windows.append(time.perf_counter() - t0)

    n_chips = max(trainer.mesh.devices.size, 1)
    rates = sorted(iters * batch_size / dt / n_chips for dt in windows)
    median = rates[len(rates) // 2]
    best = rates[-1]
    print(
        json.dumps(
            {
                "metric": "sfat_adaptation_imgs_per_sec_per_chip",
                "value": round(median, 3),
                "unit": "imgs/s/chip",
                "vs_baseline": round(median / REFERENCE_IMGS_PER_SEC, 3),
                "best": round(best, 3),
                "best_vs_baseline": round(best / REFERENCE_IMGS_PER_SEC, 3),
                "windows": [round(r, 2) for r in rates],
                "dispatch_per_step_rate": round(dispatch_rate, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
