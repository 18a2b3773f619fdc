#!/usr/bin/env python
"""Training/eval CLI (parity with the reference's train_net.py:
setup :34, trainer dispatch :45-85, --eval-only -> test_refinement :73-80).

Usage:
    python tools/train_net.py --config-file configs/x.yaml [--eval-only]
        [--resume] [--num-chips N] [opts KEY VALUE ...]

Multi-device: instead of the reference's `launch(num_gpus, ...)` process
spawn, one process drives all local chips through the data-parallel mesh;
multi-host runs add --coordinator/--num-processes/--process-id
(jax.distributed)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def default_argument_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    # --num-gpus is the reference's flag name (train_net.py:92); both spell
    # the data-parallel width here
    p.add_argument("--num-chips", "--num-gpus", dest="num_chips", type=int, default=-1,
                   help="data-parallel width (reference: --num-gpus)")
    # multi-host: reference used --num-machines/--machine-rank/--dist-url for
    # the NCCL store; these map onto jax.distributed
    p.add_argument("--coordinator", "--dist-url", dest="coordinator", default=None,
                   help="multi-host coordinator address (reference: --dist-url)")
    p.add_argument("--num-processes", "--num-machines", dest="num_processes", type=int, default=1)
    p.add_argument("--process-id", "--machine-rank", dest="process_id", type=int, default=0)
    p.add_argument("--synthetic", action="store_true", help="synthetic data (no dataset on disk)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p


def setup(args):
    from simple_sfod_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file, allow_new=True)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.num_chips > 0:
        cfg.TPU.MESH_DATA = args.num_chips
    cfg.freeze()
    return cfg


def main(args, eval_mode: str = "test"):
    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()
    from simple_sfod_tpu.data.datasets import register_all_datasets
    from simple_sfod_tpu.engine.trainers import build_trainer
    from simple_sfod_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    cfg = setup(args)
    register_all_datasets()
    if args.synthetic:
        from simple_sfod_tpu.data.datasets import get_dataset
        from simple_sfod_tpu.data.synthetic import register_synthetic

        for name in list(cfg.DATASETS.TRAIN) + list(cfg.DATASETS.TRAIN_TARGET) + list(cfg.DATASETS.TEST):
            # Prefer real on-disk annotations when the name resolves (the
            # loader synthesizes PIXELS either way under synthetic=True) —
            # this lets the fixed-pseudo-label workflow splice a detections
            # dump into a JSON and feed it back through the real CLIs
            # (WORKFLOWS §3) without datasets. Fall back to a fully
            # synthetic registration when no JSON exists.
            try:
                get_dataset(name)
                print(f"[synthetic] {name}: on-disk annotations + synthesized pixels")
            except (KeyError, LookupError, FileNotFoundError):
                # name resolves to nothing: fully synthetic data. Corrupt
                # JSONs and IO errors RAISE — silently training a workflow
                # stage on 8 random images would mask real dataset bugs.
                print(f"[synthetic] {name}: fully synthetic (no on-disk annotations)")
                register_synthetic(name, num_images=8, num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES)

    trainer = build_trainer(cfg, synthetic=args.synthetic)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        if eval_mode == "adabn":
            # the reference triggers AdaBN through eval-only mode
            # (train_net_mt.py:82 -> base.adabn_refinement)
            return trainer.adabn_refinement()
        # reference train_net.py:79: eval-only runs test_refinement (BN
        # drift WITHOUT reset, then test, then save "adabn")
        return trainer.test_refinement()
    trainer.train()
    return None


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
