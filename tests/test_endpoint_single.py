"""Slow opt-in `_single` (EMA) adaptation endpoint differential (SFOD_SLOW_TESTS=1).

VERDICT r4 weak #2: the `_single` variant (STUDENT pseudo-labels + EMA
teacher, reference source_free_adaptive_teacher_single.py:390,581) previously
had only 10-step lockstep evidence — every endpoint operating point tried
collapsed both stacks to AP 0 (agreement, but vacuous). Round 5 found a
STABLE operating point (800 source steps, fog 0.2, bbox threshold 0.5,
EMA keep 0.99, unsup weight 0.5, adaptation LR 0.001) where the EMA teacher
measurably adapts ABOVE the un-adapted source floor in BOTH stacks; the
authoritative 20-seed run + torch-vs-torch chaos-floor control live in
artifacts/endpoint_ab_single_r5{,_control}.json (tools/endpoint_ab_sfat.py).

This in-suite version replays 2 seeds (~3 min) and guards the two claims:
1. non-vacuity — the EMA-teacher endpoint does not collapse (the known
   failure mode is a runaway to AP 0 once sub-recall pseudo sets label true
   objects background);
2. agreement — jax and torch teacher endpoints land in the same band
   (widened for 2 seeds from the 20-seed paired spread).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SFOD_SLOW_TESTS"), reason="set SFOD_SLOW_TESTS=1 (slow)"
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_single_ema_endpoint_adapts_and_agrees(monkeypatch):
    import endpoint_ab_sfat as ab

    # the round-5 stable operating point (see module docstring); monkeypatch
    # so the module-level knobs revert after this test (they are process-wide
    # state any later import of the tool would otherwise inherit)
    monkeypatch.setattr(ab, "BBOX_THRESHOLD", 0.5)
    monkeypatch.setattr(ab, "EMA_KEEP_RATE", 0.99)
    monkeypatch.setattr(ab, "UNSUP_WEIGHT", 0.5)
    monkeypatch.setattr(ab, "ADAPT_LR", 0.001)
    fog, src_steps, adapt_steps, seeds = 0.2, 800, 300, 2

    src_train = ab.make_dataset(ab.N_TRAIN, seed=100)
    adapt_set, eval_set = ab.make_target_sets(fog, n_eval=16)

    res = [
        ab.run_seed(s, src_steps, adapt_steps, fog, src_train, adapt_set,
                    eval_set, "source_free_adaptive_teacher_single")
        for s in range(seeds)
    ]
    src = np.mean([r["ap50_source_on_target"] for r in res])
    jt = np.mean([r["jax"]["ap50_teacher"] for r in res])
    tt = np.mean([r["torch"]["ap50_teacher"] for r in res])

    # 1. non-vacuity: neither stack's EMA teacher collapses (the failure mode
    #    this operating point was engineered away from is AP -> ~0); at the
    #    20-seed scale the jax margin over the source floor is positive.
    assert jt > 25.0, f"jax EMA teacher collapsed: {jt:.2f} (floor {src:.2f})"
    assert tt > 25.0, f"torch EMA teacher collapsed: {tt:.2f} (floor {src:.2f})"
    assert jt > src - 8.0, (
        f"jax EMA teacher fell far below the source floor: {jt:.2f} vs {src:.2f}"
    )

    # 2. agreement: 20-seed paired teacher delta -1.4 +/- 3.3 (CI95), per-seed
    #    paired std ~4.6; at 2 seeds a ~2-sigma band on the mean diff is ~13.
    assert abs(jt - tt) < 13.0, (
        f"`_single` teacher endpoint disagreement beyond seed noise: "
        f"jax {jt:.2f} vs torch {tt:.2f} (source floor {src:.2f})"
    )
