"""Lockstep JAX-vs-torch training differential, evidence run.

Runs the tests/lockstep_runner.py differential for N steps (default 200) and
prints the drift table recorded in PARITY_EVIDENCE.md ("Training-dynamics
drift"). Pure CPU (torch has no TPU backend; the point is framework
semantics, not hardware).

    python tools/lockstep_diff.py [--steps 200] [--batch 2] [--seed 0]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from lockstep_runner import run_lockstep

    out = run_lockstep(n_steps=args.steps, batch=args.batch, seed=args.seed)
    d = out["param_drift"]
    marks = sorted({0, 9, 49, 99, len(d) - 1} & set(range(len(d))))
    print("step  param_drift  loss_rel")
    for i in marks:
        print(f"{i + 1:>4}  {d[i]:.3e}    {out['loss_rel'][i]:.3e}")
    print(f"max loss_rel over run: {max(out['loss_rel']):.3e}")
    print(f"ema_drift at end: {out['ema_drift']:.3e}")
    print("worst leaves at end:")
    for k, v in sorted(out["worst_leaves"].items(), key=lambda kv: -kv[1])[:5]:
        print(f"  {v:.3e}  {k}")
    print(
        json.dumps(
            {
                "steps": args.steps,
                "final_param_drift": d[-1],
                "max_loss_rel": max(out["loss_rel"]),
                "ema_drift": out["ema_drift"],
                "jax_final_loss": out["jax_losses"][-1]["total_loss"],
                "torch_final_loss": out["torch_losses"][-1]["total_loss"],
            }
        )
    )


if __name__ == "__main__":
    main()
