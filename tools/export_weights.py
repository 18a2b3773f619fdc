#!/usr/bin/env python
"""Export a JAX-trained checkpoint to a reference-consumable Detectron2 .pth
(the inverse of tools/import_weights.py).

The emitted file is the exact artifact the reference stack reads
(fvcore-Checkpointer wrapper, d2 key naming, EnsembleTSModel prefixes for
teacher-student states — reference daod/checkpoint/
detection_ts_checkpointer.py:11-90), so a JAX-trained model can be evaluated
off-box by the reference's own eval stack for absolute-mAP validation.

Usage:
  # a train-state checkpoint saved by our trainers (orbax dir):
  python tools/export_weights.py --ckpt output/model_final \
      --config-file configs/sfat_foggy.yaml --output model_final.pth

  # pick which copy to emit (auto = ensemble when a teacher exists):
  python tools/export_weights.py --ckpt output/model_final --which teacher \
      --config-file configs/sfat_foggy.yaml --output teacher.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir (a saved train state)")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--output", required=True, help=".pth to write")
    ap.add_argument(
        "--which",
        choices=["auto", "student", "teacher", "ensemble"],
        default="auto",
        help="auto: ensemble when the state has a teacher, else plain student",
    )
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from simple_sfod_tpu.checkpoint.torch_export import (
        export_train_state,
        save_torch_file,
    )
    from simple_sfod_tpu.config import detector_config_from_cfg, get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file, allow_new=True)
    det_cfg = detector_config_from_cfg(cfg)

    state = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
    sd = export_train_state(state, det_cfg, which=args.which)
    step = state.get("step") if isinstance(state, dict) else getattr(state, "step", None)
    iteration = int(step) if step is not None else None
    save_torch_file(sd, args.output, iteration=iteration)
    kind = args.which
    if kind == "auto":
        kind = "ensemble" if any(k.startswith("modelTeacher.") for k in sd) else "student"
    print(f"exported {args.ckpt} -> {args.output} ({kind}, {len(sd)} tensors)")


if __name__ == "__main__":
    main()
