#!/usr/bin/env python
"""Serving-artifact throughput: the exported StableHLO blob on real hardware.

The eval-path numbers (tools/bench_extra.py bench_eval_batches) time the
in-package jitted inference; this times the DEPLOYMENT unit instead — the
serialized artifact reloaded via engine/export.py::load_exported, exactly
what tools/serve_model.py runs — so the export round trip is qualified as
overhead-free (or its overhead is on record).

Measurement discipline (BENCH_NOTES / CLAUDE.md tunnel hazards):
  - inputs vary per call (the tiny `sizes` operand cycles through distinct
    values) so the tunnel backend cannot serve a memoized (executable,
    inputs) result; the 17MB uint8 canvas stays device-resident so the
    timing tracks the chip, not host->device transfer;
  - calls are enqueued pipelined, then every output is MATERIALIZED
    (np.asarray) — block_until_ready can return early on this backend.

Usage: python tools/bench_serving.py [--batches 1 8] [--params-dtype bfloat16]
Prints one JSON line per batch size; results recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int, default=[1, 8])
    p.add_argument("--params-dtype", default=None,
                   help="also bake cast weights (e.g. bfloat16) into the artifact")
    args = p.parse_args()

    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()

    import jax.numpy as jnp
    import numpy as np

    from simple_sfod_tpu.engine.export import export_inference, load_exported, save_exported
    from simple_sfod_tpu.engine.trainers import build_trainer
    from simple_sfod_tpu.utils.bench import sfat_bench_cfg

    cfg = sfat_bench_cfg(batch_target=1, output_dir="/tmp/bench_serving_out")
    trainer = build_trainer(cfg, synthetic=True)
    variables = trainer.state.teacher_variables()
    rs = np.random.RandomState(0)

    for b in args.batches:
        t0 = time.perf_counter()
        exported = export_inference(
            trainer.detector, variables, tuple(cfg.TPU.CANVAS), batch=b,
            params_dtype=args.params_dtype,
        )
        path = f"/tmp/bench_serving_b{b}.sfodx"
        size = save_exported(exported, path)
        reloaded, _ = load_exported(path)
        export_s = time.perf_counter() - t0

        image = jnp.asarray(
            rs.uniform(0, 255, (b, *cfg.TPU.CANVAS, 3)).astype(np.uint8)
        )
        step = [0]

        def call():
            # distinct sizes per call -> distinct (executable, inputs) key;
            # the 1-2px jitter is numerically irrelevant to throughput
            step[0] += 1
            sizes = jnp.asarray(
                [[600 + (step[0] + i) % 2, 1200 - (step[0] + i) % 3]
                 for i in range(b)], jnp.int32)
            return reloaded.call(image, sizes)

        t0 = time.perf_counter()
        out = [call() for _ in range(4)]
        [np.asarray(o["scores"]) for o in out]
        warm_s = time.perf_counter() - t0  # includes the one-time compile

        rates = []
        n_calls = max(4, 32 // b)
        for _ in range(5):
            t0 = time.perf_counter()
            out = [call() for _ in range(n_calls)]
            [np.asarray(o["scores"]) for o in out]
            rates.append(n_calls * b / (time.perf_counter() - t0))
        rates.sort()
        print(json.dumps({
            "metric": f"serving_artifact_imgs_per_sec_per_chip_batch{b}",
            "value": round(rates[len(rates) // 2], 3), "unit": "imgs/s/chip",
            "best": round(rates[-1], 3), "windows": [round(r, 2) for r in rates],
            "artifact_mb": round(size / 1e6, 1),
            "params_dtype": args.params_dtype or "float32",
            "export_s": round(export_s, 1), "first_calls_s": round(warm_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
