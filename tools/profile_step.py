#!/usr/bin/env python
"""Trace N adaptation steps with jax.profiler and print the device-time
breakdown (top XLA ops by total time). The TPU-native replacement for "run
torch.profiler and stare at the table"; findings feed BENCH_NOTES.md.

Usage: python tools/profile_step.py [--trainer source_free_adaptive_teacher]
       [--steps 5] [--out /tmp/sfat_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_trainer(trainer_name: str):
    from simple_sfod_tpu.engine.trainers import build_trainer as _build
    from simple_sfod_tpu.utils.bench import sfat_bench_cfg

    cfg = sfat_bench_cfg(trainer=trainer_name, output_dir="/tmp/profile_out")
    return _build(cfg, synthetic=True), cfg


def synthetic_batch(cfg):
    from simple_sfod_tpu.utils.bench import synthetic_bench_batch

    return synthetic_bench_batch(cfg)


def summarize_xplane(trace_dir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print(f"no xplane.pb under {trace_dir}", file=sys.stderr)
        return
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        print(f"\n=== plane: {plane.name} ===")
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            per_op = collections.Counter()
            counts = collections.Counter()
            total = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                counts[name] += 1
                total += ev.duration_ps
            if not per_op:
                continue
            print(f"\n-- line '{line.name}': total {total / 1e9:.3f} ms over {sum(counts.values())} events")
            if line.name.lower().startswith("step"):
                print("   (step markers: total only, per-op breakdown n/a)")
                continue
            for name, ps in per_op.most_common(top):
                print(f"  {ps / 1e9:9.3f} ms  x{counts[name]:<5} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainer", default="source_free_adaptive_teacher")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/sfat_trace")
    ap.add_argument("--parse-only", action="store_true", help="just summarize an existing trace dir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if not args.parse_only:
        from simple_sfod_tpu.utils.env import setup_cache

        setup_cache()
        import jax

        from simple_sfod_tpu.utils.profiling import device_trace

        trainer, cfg = build_trainer(args.trainer)
        batch = synthetic_batch(cfg)
        import numpy as np

        for _ in range(3):
            metrics = trainer.run_step(batch)
        np.asarray(metrics["total_loss"])  # materialize: block_until_ready
        # can return early on the tunnel backend (BENCH_NOTES hazards)

        with device_trace(args.out):
            for _ in range(args.steps):
                metrics = trainer.run_step(batch)
            np.asarray(metrics["total_loss"])
        print(f"trace written to {args.out}")

    summarize_xplane(args.out, args.top)


if __name__ == "__main__":
    main()
