#!/usr/bin/env python
"""Export a trained/adapted detector as a standalone serving artifact.

Builds the config's detector, loads its weights exactly like the training
CLIs (MODEL.WEIGHTS routing incl. .pth/.pkl, or --resume from OUTPUT_DIR),
then AOT-lowers the inference function to a serialized StableHLO blob
(engine/export.py over jax.export). The artifact replaces the reference's
deployment story — re-running train_net.py --eval-only inside the full
codebase — with one file any JAX process can reload without this package's
model code.

Usage:
    python tools/export_model.py --config-file configs/x.yaml \
        --out /tmp/model.sfodx [--model teacher|student] [--batch N|poly] \
        [--platforms tpu cpu] [--train-mode-bn] [--no-bundle-params] \
        [--selfcheck] [--resume] [KEY VALUE ...]

--batch poly exports a symbolic batch dimension (one artifact, any batch).
--selfcheck reloads the written artifact and verifies its detections equal a
direct jit of the in-package inference on a synthetic batch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True, metavar="FILE")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument(
        "--model",
        choices=("teacher", "student"),
        default="teacher",
        help="which params tree to export for teacher-student states "
        "(the reference evaluates the teacher; plain states ignore this)",
    )
    p.add_argument("--batch", default="1", help="batch size, or 'poly' for symbolic")
    p.add_argument("--platforms", nargs="*", default=None, help="lowering platforms, e.g. tpu cpu")
    p.add_argument("--train-mode-bn", action="store_true",
                   help="batch-stat BN at inference (the AdaBN eval probe)")
    p.add_argument("--no-bundle-params", action="store_true",
                   help="keep weights a call-time argument instead of baking them in")
    p.add_argument("--params-dtype", default=None, metavar="DTYPE",
                   help="cast float weights before export (e.g. bfloat16 — "
                   "halves a self-contained artifact)")
    p.add_argument("--selfcheck", action="store_true")
    p.add_argument("--resume", action="store_true", help="load the last OUTPUT_DIR checkpoint")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()

    from simple_sfod_tpu.config import get_cfg
    from simple_sfod_tpu.engine.export import (
        cast_floating,
        export_inference,
        load_exported,
        save_exported,
    )
    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file, allow_new=True)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # export is single-program; sharding happens on load. Reset EVERY mesh
    # axis — a TP/SP training config would otherwise build a ('data','model')
    # mesh here and lower device-sharded constants into the artifact.
    cfg.TPU.MESH_DATA = 1
    cfg.TPU.MESH_MODEL = 1
    cfg.TPU.SPATIAL_SHARD = False
    cfg.freeze()

    # the trainer gives us the exact init + checkpoint-overlay path the
    # training CLIs use (synthetic=True: no dataset is ever touched)
    trainer = build_trainer(cfg, synthetic=True)
    trainer.resume_or_load(resume=args.resume)
    state = trainer.state
    if args.model == "teacher" and hasattr(state, "teacher_variables"):
        variables = state.teacher_variables()
    else:
        variables = state.variables()

    if args.params_dtype:
        # cast once here so the selfcheck below compares against the SAME tree
        variables = cast_floating(variables, args.params_dtype)
    batch = None if args.batch == "poly" else int(args.batch)
    exported = export_inference(
        trainer.detector,
        variables,
        tuple(cfg.TPU.CANVAS),
        batch=batch,
        bundle_params=not args.no_bundle_params,
        platforms=args.platforms,
        train_mode_bn=args.train_mode_bn,
    )
    class_names = None
    if cfg.DATASETS.TEST:
        try:
            from simple_sfod_tpu.data.datasets import get_dataset

            class_names = list(get_dataset(cfg.DATASETS.TEST[0])["thing_classes"])
        except Exception:
            pass  # unregistered dataset: the artifact still serves class ids
    meta = {
        "canvas": [int(cfg.TPU.CANVAS[0]), int(cfg.TPU.CANVAS[1])],
        "batch": batch,
        "min_size": int(cfg.INPUT.MIN_SIZE_TEST),
        "max_size": int(cfg.INPUT.MAX_SIZE_TEST),
        "image_format": cfg.INPUT.FORMAT,
        "class_names": class_names,
        "model": args.model,
        "params_dtype": args.params_dtype,
        "train_mode_bn": bool(args.train_mode_bn),
        "bundle_params": not args.no_bundle_params,
        "config": os.path.basename(args.config_file),
    }
    size = save_exported(exported, args.out, meta=meta)
    print(
        f"exported {args.model} inference ({cfg.TPU.CANVAS[0]}x{cfg.TPU.CANVAS[1]} canvas, "
        f"batch={'poly' if batch is None else batch}, "
        f"platforms={list(exported.platforms)}) -> {args.out} ({size / 1e6:.1f} MB)"
    )

    if args.selfcheck:
        import numpy as np
        import jax

        from simple_sfod_tpu.utils.bench import synthetic_bench_batch

        reloaded, _ = load_exported(args.out)
        b = synthetic_bench_batch(cfg, n=batch or 1)
        call_args = (b["images"], b["sizes"])
        if args.no_bundle_params:
            call_args = (variables,) + call_args
        got = reloaded.call(*call_args)
        want = jax.jit(
            lambda img, sz: trainer.detector.infer(
                variables, img, sz, train_mode_bn=args.train_mode_bn
            )
        )(b["images"], b["sizes"])
        for key, ref in (
            ("boxes", want.boxes), ("scores", want.scores),
            ("classes", want.classes), ("valid", want.valid),
        ):
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(ref), rtol=1e-5, atol=1e-5
            )
        n_det = int(np.asarray(got["valid"]).sum())
        print(f"selfcheck OK: reloaded artifact matches direct inference ({n_det} detections)")


if __name__ == "__main__":
    main()
