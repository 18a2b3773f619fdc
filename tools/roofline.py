"""Roofline analysis of a compiled training step via XLA's own cost model
(`compiled.cost_analysis()`), the methodology behind BENCH_NOTES "Roofline:
the headline step runs at ~82% of the v5e HBM roofline".

Defaults to the FPN supervised workload (VERDICT r3 #8: the FPN full-canvas
number was reported bare, with no statement of how far from its floor it
runs); `--headline` analyses the SFAT adaptation step instead.

Prints FLOPs/step, HBM bytes/step, arithmetic intensity, the v5e
bandwidth/compute floors, and — with --measure — a fresh chunked-dispatch
timing (BENCH_NOTES discipline: K steps per dispatch, varied inputs,
materializing reads) and the %-of-floor.

Run on the real TPU:  nohup python tools/roofline.py --measure > log &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_BF16_FLOPS = 197e12  # peak bf16 TFLOP/s
V5E_HBM_BPS = 819e9  # HBM GB/s


def fpn_cfg():
    from simple_sfod_tpu.config import get_cfg
    from simple_sfod_tpu.data.synthetic import register_synthetic

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..",
            "configs",
            "vgg16_fpn_cityscapes_to_foggy_source.yaml",
        )
    )
    cfg.SOLVER.IMS_PER_BATCH = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.VAL_LOSS = False
    cfg.TPU.MESH_DATA = 1
    cfg.OUTPUT_DIR = "/tmp/roofline_out"
    register_synthetic("synthetic_train", 8, tuple(cfg.TPU.CANVAS), 8, seed=0)
    cfg.DATASETS.TRAIN = ("synthetic_train",)
    cfg.DATASETS.TEST = ()
    cfg.freeze()
    return cfg


def eval_roofline(args):
    """Roofline the PURE-FORWARD paths (VERDICT r4 weak #5): the eval
    pipeline's jitted infer at each batch size, and (--serving) the exported
    StableHLO deployment artifact — same methodology as the training steps
    (cost_analysis floors + pipelined, input-varied, materialized timing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simple_sfod_tpu.engine.trainers import build_trainer
    from simple_sfod_tpu.utils.bench import sfat_bench_cfg

    cfg = sfat_bench_cfg(output_dir="/tmp/roofline_out")
    tr = build_trainer(cfg, synthetic=True)
    params = tr.state.params
    det_params = params["det"] if isinstance(params, dict) and "det" in params else params
    variables = {"params": det_params, "batch_stats": tr.state.batch_stats}
    det = tr.detector
    canvas = tuple(cfg.TPU.CANVAS)

    # stage isolation (--stages): where does the gap to floor live?
    #   features   — backbone+neck forward only (the MXU/HBM-bound core)
    #   raw        — + RPN propose + ROI pool/head, NO NMS/threshold
    #                (reference fast_rcnn_inference_new, the BPC path)
    #   full       — production det.infer incl. per-class NMS + top-k
    # full − raw = NMS/postprocess share; raw − features = proposal/ROI share.
    # the serving branch times the exported artifact and ignores stage
    # prefixes — running it three times under different labels would print
    # identical rows a reader could wrongly difference
    stages = ("features", "raw", "full") if (args.stages and not args.serving) else ("full",)

    for b in args.batches:
      for stage in stages:
        if args.serving:
            from simple_sfod_tpu.engine.export import export_inference

            exported = export_inference(det, variables, canvas, batch=b)
            call = jax.jit(exported.call)
            make_args = lambda img, sz: (img, sz)
        elif stage == "features":
            call = jax.jit(
                lambda v, img, sz: det._features(v, img, False, mutable=False)
            )
            make_args = lambda img, sz: (variables, img, sz)
        elif stage == "raw":
            call = jax.jit(lambda v, img, sz: det.infer_raw(v, img, sz))
            make_args = lambda img, sz: (variables, img, sz)
        elif args.scan > 1:
            # K batches per dispatch (lax.scan inside one executable): the
            # eval analog of TPU.STEPS_PER_DISPATCH. On the tunnel each
            # dispatch pays ~one RTT of device idle (CLAUDE.md); if the
            # per-batch rate rises toward the floor as K grows, the eval
            # gap is dispatch overhead, not the compiled graph.
            K = args.scan

            def scanned(v, imgs, szs):
                def body(c, xy):
                    img, sz = xy
                    d = det.infer(v, img, sz)
                    return c, (d.boxes, d.scores, d.classes, d.valid)

                _, outs = jax.lax.scan(body, 0, (imgs, szs))
                return outs

            call = jax.jit(scanned)
            make_args = lambda img, sz: (
                variables,
                jnp.stack([img] * K) if img.ndim == 4 else img,
                jnp.stack([sz] * K) if sz.ndim == 2 else sz,
            )
        else:
            call = jax.jit(lambda v, img, sz: det.infer(v, img, sz))
            make_args = lambda img, sz: (variables, img, sz)

        # with --scan K one executable serves K batches; report per-batch
        kfac = args.scan if (args.scan > 1 and stage == "full" and not args.serving) else 1

        rs = np.random.RandomState(0)
        sizes = jnp.asarray(np.tile(np.asarray([[600, 1200]], np.int32), (b, 1)))
        # device-resident input variants: timing must track the chip, not
        # the tunnel upload, and identical (executable, inputs) reruns can
        # be served cached (CLAUDE.md) — cycle distinct canvases
        variants = [
            jnp.asarray(rs.randint(0, 256, (b, *canvas, 3), np.uint8))
            for _ in range(6)
        ]
        if kfac > 1:
            # pre-stage the [K, b, ...] stacks so the timed loop dispatches
            # exactly one executable per K batches (no per-call stack op)
            variants = [jnp.stack([v] * kfac) for v in variants]
            sizes = jnp.stack([sizes] * kfac)
        np.asarray(sum(jnp.sum(v.astype(jnp.float32)) for v in variants))  # staged

        t0 = time.time()
        compiled = call.lower(*make_args(variants[0], sizes)).compile()
        compile_s = time.time() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / kfac
        byts = float(ca.get("bytes accessed", 0.0)) / kfac
        out = {
            "workload": ("serving_artifact" if args.serving else "eval_forward"),
            "stage": stage,
            "canvas": list(canvas),
            "batch": b,
            "scan": kfac,
            "compile_s": round(compile_s, 1),
            "flops_per_batch": flops,
            "hbm_bytes_per_batch": byts,
            "arith_intensity_flop_per_byte": round(flops / max(byts, 1.0), 1),
            "bandwidth_floor_ms": round(byts / V5E_HBM_BPS * 1e3, 2),
            "compute_floor_ms": round(flops / V5E_BF16_FLOPS * 1e3, 2),
        }

        if args.measure:
            mat = lambda r: np.asarray(jax.tree.leaves(r)[0])  # materializing read
            mat(call(*make_args(variants[0], sizes)))  # warm dispatch
            n_disp = 12
            rates = []
            for w in range(args.windows):
                # EVERY dispatch gets distinct content (identical
                # (executable, inputs) reruns can be served cached on the
                # tunnel — CLAUDE.md): a per-dispatch uint8 offset on a
                # cycled base canvas, built + materialized BEFORE the timer
                # so the offset op never lands in the measured window
                win = [
                    variants[i % len(variants)]
                    + jnp.uint8(1 + (w * n_disp + i) % 250)
                    for i in range(n_disp)
                ]
                np.asarray(sum(jnp.sum(v.astype(jnp.float32)) for v in win))
                t0 = time.perf_counter()
                last = None
                for v in win:  # pipelined enqueue, one chip stream
                    last = call(*make_args(v, sizes))
                mat(last)
                dt = time.perf_counter() - t0
                rates.append(n_disp * b * kfac / dt)
            rates.sort()
            med = rates[len(rates) // 2]
            out["measured_imgs_per_sec"] = round(med, 3)
            out["measured_ms_per_batch"] = round(1e3 * b / med, 2)
            floor = max(out["bandwidth_floor_ms"], out["compute_floor_ms"])
            out["pct_of_roofline"] = round(100.0 * floor / out["measured_ms_per_batch"], 1)
            out["windows"] = [round(r, 2) for r in rates]
        print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--headline", action="store_true", help="SFAT adaptation step")
    ap.add_argument("--eval", action="store_true", help="pure-forward eval path")
    ap.add_argument("--serving", action="store_true",
                    help="exported StableHLO artifact (implies the eval shape)")
    ap.add_argument("--batches", nargs="*", type=int, default=[1, 4, 8])
    ap.add_argument("--measure", action="store_true", help="also time the step")
    ap.add_argument("--stages", action="store_true",
                    help="eval gap isolation: features / raw (no NMS) / full")
    ap.add_argument("--scan", type=int, default=1,
                    help="eval: K batches per dispatch via lax.scan "
                    "(dispatch-overhead isolation on the tunnel)")
    ap.add_argument("--steps-per-dispatch", type=int, default=10)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    if args.eval or args.serving:
        from simple_sfod_tpu.utils.env import setup_cache

        setup_cache()
        eval_roofline(args)
        return

    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simple_sfod_tpu.engine.trainers import build_trainer

    if args.headline:
        from simple_sfod_tpu.utils.bench import sfat_bench_cfg

        cfg = sfat_bench_cfg(output_dir="/tmp/roofline_out")
    else:
        cfg = fpn_cfg()

    tr = build_trainer(cfg, synthetic=True)
    if args.headline:
        from simple_sfod_tpu.utils.bench import synthetic_bench_batch

        loader = None
        batch = synthetic_bench_batch(cfg)
    else:
        loader = iter(tr.build_train_loader())
        batch = dict(next(loader))

    # Lower the SINGLE-step graph with run_step's exact argument prep; the
    # persistent compile cache makes compile() a lookup when the graph is
    # already prewarmed (bench/CLI runs), a one-time server compile otherwise.
    from simple_sfod_tpu.data.loader import gt_instances

    images = jnp.asarray(batch["images"])
    sizes = jnp.asarray(batch["sizes"])
    if args.headline:  # SFAT step: unlabeled target batch, no GT arg
        images, sizes = tr._shard((images, sizes))
        step_args = (tr.state, images, sizes, tr.base_rng)
    else:
        gt = gt_instances(batch)
        images, sizes, gt = tr._shard((images, sizes, gt))
        step_args = (tr.state, images, sizes, gt, tr.base_rng)
    t0 = time.time()
    compiled = tr._train_step.lower(*step_args).compile()
    print(f"# compile: {time.time() - t0:.1f}s", flush=True)

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    out = {
        "workload": "sfat_headline" if args.headline else "fpn_supervised",
        "canvas": list(cfg.TPU.CANVAS),
        "batch": int(cfg.SOLVER.IMS_PER_BATCH),
        "flops_per_step": flops,
        "hbm_bytes_per_step": byts,
        "arith_intensity_flop_per_byte": round(flops / max(byts, 1.0), 1),
        "v5e_machine_balance": round(V5E_BF16_FLOPS / V5E_HBM_BPS, 1),
        "bandwidth_floor_ms": round(byts / V5E_HBM_BPS * 1e3, 2),
        "compute_floor_ms": round(flops / V5E_BF16_FLOPS * 1e3, 2),
    }

    if args.measure:
        k = args.steps_per_dispatch

        def fresh_batches(tag):
            if loader is None:  # headline: vary one pixel per dispatch
                b = dict(batch)
                b["images"] = b["images"].copy()
                b["images"][0, 0, 0, 0] = tag % 251
                return b
            bs = []
            for _ in range(k):
                b = dict(next(loader))
                b["images"] = b["images"].copy()
                b["images"][0, 0, 0, 0] = tag % 251
                bs.append(b)
            return bs

        def prestage(bs):
            """Start the sharded upload and force its completion — the
            production train loop rides transfers under compute via the
            CHUNK_STAGE_AHEAD feeder, so the roofline comparison must time
            device execution, not tunnel bandwidth. block_until_ready can
            return early on the tunnel; a materialized device-side reduction
            over every leaf cannot."""
            if loader is None:
                return (bs, None)
            xs = tr.stage_chunk(bs)
            tot = sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in jax.tree.leaves(xs))
            np.asarray(tot)
            return (bs, xs)

        def dispatch(staged):
            bs, xs = staged
            return tr.run_steps(bs, k) if loader is None else tr.run_step_chunk(bs, xs=xs)

        m = dispatch(prestage(fresh_batches(0)))
        np.asarray(m["total_loss"])  # materialize (compile + first dispatch)
        rates = []
        tag = 1
        for _ in range(args.windows):
            chunks = [prestage(fresh_batches(tag + i)) for i in range(3)]
            tag += 3
            t0 = time.perf_counter()
            for c in chunks:
                m = dispatch(c)
            np.asarray(m["total_loss"])
            dt = time.perf_counter() - t0
            rates.append(3 * k * cfg.SOLVER.IMS_PER_BATCH / dt)
        rates.sort()
        med = rates[len(rates) // 2]
        out["measured_imgs_per_sec"] = round(med, 3)
        out["measured_ms_per_step"] = round(
            1e3 * cfg.SOLVER.IMS_PER_BATCH / med, 2
        )
        floor = max(out["bandwidth_floor_ms"], out["compute_floor_ms"])
        out["pct_of_roofline"] = round(100.0 * floor / out["measured_ms_per_step"], 1)
        out["windows"] = [round(r, 2) for r in rates]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
