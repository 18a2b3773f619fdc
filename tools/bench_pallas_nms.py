"""Pallas suppression-relation kernel vs the XLA matrix fixpoint, ON TPU
(VERDICT r2 next #7: no TPU-kernel claim without a TPU execution).

Measures compile time and steady-state run time of `nms_mask_matrix` (the
hot-path XLA formulation) against `nms_mask_pallas` (VMEM-tiled relation
build) on the real backend, checks they agree exactly, and prints one
summary line per variant. Timing follows the tunnel rules from
BENCH_NOTES.md: vary an input every rep, end with a materializing read.

    python tools/bench_pallas_nms.py [--n 2048] [--reps 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--scan", type=int, default=0,
                    help="K NMS calls per dispatch via lax.scan (isolates "
                         "device time from the tunnel RTT)")
    args = ap.parse_args()

    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from simple_sfod_tpu.ops.nms import nms_mask_matrix
    from simple_sfod_tpu.ops.pallas_kernels import nms_mask_pallas

    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rs = np.random.RandomState(0)

    def make_inputs(seed):
        r = np.random.RandomState(seed)
        xy = r.uniform(0, 900, (args.n, 2))
        wh = r.uniform(8, 160, (args.n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = r.uniform(0, 1, (args.n,)).astype(np.float32)
        valid = np.ones((args.n,), bool)
        return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)

    if args.scan > 0:
        def scanned(core):
            def run(b, s, v):
                def body(_, x):
                    bb, ss = x
                    return None, core(bb, ss, v, 0.7)

                _, keeps = jax.lax.scan(body, None, (b, s))
                return keeps

            return jax.jit(run)

        variants = {
            "matrix_fixpoint": scanned(nms_mask_matrix),
            "pallas_relation": scanned(nms_mask_pallas),
        }

        def make_scan_inputs(seed):
            b, s, v = make_inputs(seed)
            r = np.random.RandomState(seed + 10_000)
            bs = jnp.asarray(
                np.stack([np.asarray(b) + r.uniform(-2, 2) for _ in range(args.scan)])
            )
            ss = jnp.asarray(
                np.stack([np.asarray(s) * r.uniform(0.9, 1.1) for _ in range(args.scan)])
            )
            return bs, ss, v

        for name, fn in variants.items():
            t0 = time.time()
            out = np.asarray(fn(*make_scan_inputs(0)))
            compile_s = time.time() - t0
            times = []
            for i in range(args.reps):
                xs = make_scan_inputs(i + 1)
                t0 = time.time()
                np.asarray(fn(*xs))
                times.append((time.time() - t0) / args.scan)
            med = sorted(times)[len(times) // 2]
            print(
                f"{name} (scan {args.scan}/dispatch): compile+first {compile_s:.1f}s, "
                f"median {med * 1e3:.2f}ms/NMS over {args.reps} dispatches"
            )
        return

    variants = {
        "matrix_fixpoint": jax.jit(
            lambda b, s, v: nms_mask_matrix(b, s, v, 0.7)
        ),
        "pallas_relation": jax.jit(
            lambda b, s, v: nms_mask_pallas(b, s, v, 0.7)
        ),
    }

    results = {}
    keep_ref = None
    for name, fn in variants.items():
        try:
            t0 = time.time()
            out = fn(*make_inputs(0))
            first = np.asarray(out)  # materialize (compile + first run)
            compile_s = time.time() - t0
            times = []
            for i in range(args.reps):
                b, s, v = make_inputs(i + 1)  # vary inputs: no cached replay
                t0 = time.time()
                out = np.asarray(fn(b, s, v))
                times.append(time.time() - t0)
            med = sorted(times)[len(times) // 2]
            results[name] = (compile_s, med, first)
            print(
                f"{name}: compile+first {compile_s:.1f}s, median run "
                f"{med * 1e3:.2f}ms over {args.reps} reps, keep={int(first.sum())}"
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            results[name] = None

    if all(results.get(k) is not None for k in variants):
        for i in range(5):
            b, s, v = make_inputs(100 + i)
            a = np.asarray(variants["matrix_fixpoint"](b, s, v))
            p = np.asarray(variants["pallas_relation"](b, s, v))
            assert (a == p).all(), f"keep masks disagree on seed {100 + i}"
        print("agreement: exact on 5 fresh inputs")


if __name__ == "__main__":
    main()
