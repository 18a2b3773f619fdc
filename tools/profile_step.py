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
    from simple_sfod_tpu.config import get_cfg
    from simple_sfod_tpu.engine.trainers import build_trainer as _build

    cfg = get_cfg()
    cfg.TRAINER = trainer_name
    cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
    cfg.MODEL.RPN.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    cfg.VGG.BN = True
    cfg.SOLVER.IMS_PER_BATCH_TARGET = 1
    cfg.TPU.CANVAS = (608, 1216)
    cfg.TPU.DTYPE = "bfloat16"
    cfg.SEED = 0
    cfg.OUTPUT_DIR = "/tmp/profile_out"
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.freeze()
    return _build(cfg, synthetic=True), cfg


def synthetic_batch(cfg):
    import numpy as np

    rs = np.random.RandomState(0)
    b = cfg.SOLVER.IMS_PER_BATCH_TARGET
    return {
        "images": rs.uniform(0, 255, (b, *cfg.TPU.CANVAS, 3)).astype(np.uint8),
        "sizes": np.tile(np.asarray([[600, 1200]], np.int32), (b, 1)),
    }


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
        for _ in range(3):
            metrics = trainer.run_step(batch)
        jax.block_until_ready(metrics["total_loss"])

        with device_trace(args.out):
            for _ in range(args.steps):
                metrics = trainer.run_step(batch)
            jax.block_until_ready(metrics["total_loss"])
        print(f"trace written to {args.out}")

    summarize_xplane(args.out, args.top)


if __name__ == "__main__":
    main()
