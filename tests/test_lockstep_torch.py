"""Lockstep JAX-vs-torch training-dynamics differential (slow).

Bounds PARITY_EVIDENCE residual #1: with identical init, batches and
hyperparameters, N supervised steps of our optax/flax stack vs the torch
stack (torch SGD + BatchNorm2d + torchvision ops) must stay numerically
close — the drift that remains is the true framework delta (biased-vs-
unbiased BN running var, op-order numerics), not a semantic bug.

Measured on this box (see PARITY_EVIDENCE.md "Training-dynamics drift"):
step-0 losses agree to ~1e-6 relative; over 50 steps the worst per-leaf
relative parameter drift stays in the 1e-3 band. The assertions below give
those measurements ~10x headroom so the test flags regressions (a semantic
divergence shows up as O(1) drift within a few steps), not noise.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SFOD_SLOW_TESTS"), reason="set SFOD_SLOW_TESTS=1 (slow)"
)


def test_lockstep_50_steps():
    from lockstep_runner import run_lockstep

    out = run_lockstep(n_steps=50, batch=2, seed=0)

    # step 0: same forward/backward up to float32 accumulation order
    assert out["loss_rel"][0] < 1e-4, out["loss_rel"][0]
    # the loss curves must track each other throughout
    assert max(out["loss_rel"]) < 0.05, (max(out["loss_rel"]), out["loss_rel"][-5:])
    # LOCKSTEP regime: float-noise drift through step 25. A semantic
    # divergence (e.g. a weight-decay mask mismatch) shows up here as
    # immediate super-noise growth; the chaotic NMS/matcher tie-flip that
    # ends lockstep arrives between steps ~30-60 depending on trajectory
    # (it moved from ~50-100 to ~30 when WEIGHT_DECAY_NORM exempted BN
    # params on both sides — PARITY_EVIDENCE).
    assert out["param_drift"][24] < 5e-3, out["param_drift"][:25]
    # post-flip the trajectories separate chaotically but stay in the same
    # basin (loss_rel bound above); drift must not be runaway
    assert out["param_drift"][-1] < 0.5, out["worst_leaves"]
    assert out["ema_drift"] < 0.5, out["ema_drift"]
    # and training actually went somewhere (both frameworks learned)
    assert out["torch_losses"][-1]["total_loss"] < out["torch_losses"][0]["total_loss"]
    assert out["jax_losses"][-1]["total_loss"] < out["jax_losses"][0]["total_loss"]
