"""Slow opt-in endpoint train-to-AP differential (SFOD_SLOW_TESTS=1).

VERDICT r3 #2 / PARITY_EVIDENCE residual #1: the lockstep differentials prove
semantic lockstep until chaotic decision divergence; this test trains the real
jitted `base` trainer and the torch mirror (detectron2's REAL subsampling, the
take-all contract OFF — each stack draws its own RPN/ROI sampling stream) from
identical per-seed inits on the same learnable synthetic dataset and asserts
the trained-to endpoints (AP50 through the same COCOEvaluator) agree within
the measured seed-noise band. Reference workload: train_net.py:45-85.

The authoritative 6-seed run lives in artifacts/endpoint_ab_r4.json (via
tools/endpoint_ab.py); this in-suite version uses 2 seeds x 400 steps
(~10 min) with a band widened accordingly.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SFOD_SLOW_TESTS"), reason="set SFOD_SLOW_TESTS=1 (slow)"
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_endpoint_ap_agreement():
    import endpoint_ab as ab

    steps, seeds = 400, 2
    train = ab.make_dataset(ab.N_TRAIN, seed=100)
    eval_set = ab.make_dataset(ab.N_EVAL, seed=200)

    jax_ap, torch_ap = [], []
    for seed in range(seeds):
        jax_ap.append(ab.run_jax(seed, steps, train, eval_set)["ap50"])
        torch_ap.append(ab.run_torch(seed, steps, train, eval_set)["ap50"])

    ja, ta = np.mean(jax_ap), np.mean(torch_ap)
    # Both stacks must actually learn the synthetic task...
    assert ja > 30.0, f"jax endpoint did not learn: AP50 {jax_ap}"
    assert ta > 30.0, f"torch endpoint did not learn: AP50 {torch_ap}"
    # ...and land in the same endpoint band. Per-seed spread at this scale is
    # large (different sampling streams; 6-seed pooled std ~9 AP50,
    # artifacts/endpoint_ab_r4.json) — at 2 seeds the band on the mean
    # difference is ~2 * 9 * sqrt(2/2) = 18; a systematic semantic gap
    # (loss term, sampling distribution, BN bookkeeping) shows up far larger.
    assert abs(ja - ta) < 18.0, (
        f"endpoint AP50 disagreement beyond seed noise: jax {jax_ap} "
        f"(mean {ja:.2f}) vs torch {torch_ap} (mean {ta:.2f})"
    )
