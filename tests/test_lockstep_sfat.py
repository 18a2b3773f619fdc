"""Lockstep JAX-vs-torch differential for the SFAT adaptation step (slow).

Extends the supervised lockstep (test_lockstep_torch.py) to the flagship
source-free adaptation semantics: the REAL `source_free_adaptive_teacher_single`
trainer (jitted step: train-mode forward, weak-view inference, BBOX_THRESHOLD
pseudo-labelling, student update on pseudo GT, EMA teacher) runs against a
pure-torch mirror of the same chain, from identical init on identical batches.

What this differential established (and the assertions lock in):

* Step-0 exactness: all four loss components agree to ~1e-7 relative — the
  teacher-inference -> threshold -> pseudo-GT -> loss chain is semantically
  identical (it caught a real bug on the way: the linear-warmup schedule
  leaked warmup_factor into step 0 at WARMUP_ITERS=0, solver/build.py).
* Discrete agreement: both frameworks select the SAME pseudo-label sets in
  the early steps, before chaos decorrelates them.
* The adaptation dynamics are intrinsically CHAOTIC: every pseudo-GT box is
  the box head's own decoded output, so each (proposal -> its own detection)
  pair sits at a structural zero of the box-regression L1 — the gradient is
  sign(float-noise). run_chaos_floor measures this floor torch-vs-torch
  (identical semantics, one weight perturbed by 1e-6): drift reaches ~0.25
  after ONE step and O(1) within six. The JAX-vs-torch drift is asserted to
  stay within a small multiple of that floor — divergence is the algorithm's,
  not a semantic gap. (The reference knew: its commented-out `loss_dict[key]
  * 0` for pseudo box regression, sfat.py:545-547, shows the authors
  experimented with zeroing exactly this term.)
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SFOD_SLOW_TESTS"), reason="set SFOD_SLOW_TESTS=1 (slow)"
)


def test_sfat_main_fixed_teacher_lockstep():
    """Fixed-teacher MAIN variant (`source_free_adaptive_teacher`): the
    reference teacher is never .eval()'d, so pseudo-labelling runs
    train-mode BN on the teacher AND nudges the teacher's running stats;
    EMA is disabled (ref sfat.py:581). With the student offset from the
    teacher (see the runner: at teacher == student the pseudo boxes are
    the student's own outputs — the `_single` structural-zero chaos), the
    pseudo GT is a real regression target and the lockstep holds TIGHTLY
    for every compared step (measured: loss_rel <= 5e-7, param drift
    <= 6e-4 over 8 steps — pure float noise, no chaos onset)."""
    from sfat_lockstep_runner import run_sfat_main_lockstep

    out = run_sfat_main_lockstep(n_steps=8, seed=0)

    assert sum(out["pseudo_jax"]) > 0, out["pseudo_jax"]
    # fixed teacher -> deterministic pseudo stream: sets agree step by step
    assert out["pseudo_jax"] == out["pseudo_torch"], (
        out["pseudo_jax"],
        out["pseudo_torch"],
    )
    assert max(out["loss_rel"]) < 1e-4, out["loss_rel"]
    # no chaos mechanism: drift stays float-noise-sized for all 8 steps
    assert out["param_drift"][-1] < 5e-3, out["param_drift"]

    # teacher params must stay bit-exact at init on BOTH sides
    assert out["teacher_param_frozen_jax"]
    assert out["teacher_param_frozen_torch"]
    # ... while the running stats move in lockstep: means to float noise,
    # vars within the known biased/unbiased factor (1/(n-1), n = B*H*W of
    # the smallest BN input = 2*32*64 here)
    assert max(out["teacher_mean_rel"]) < 1e-4, out["teacher_mean_rel"]
    assert max(out["teacher_var_rel"]) < 4.5e-4, out["teacher_var_rel"]
    # and they DID move (the nudge is real, not a no-op)
    assert out["teacher_stats_moved"]


def test_sfat_lockstep_vs_chaos_floor():
    from sfat_lockstep_runner import run_chaos_floor, run_sfat_lockstep

    n = 10
    out = run_sfat_lockstep(n_steps=n, seed=0)
    floor = run_chaos_floor(n_steps=n, seed=0, eps=1e-6)

    # pseudo-labels flow (the differential exercises the full chain)
    assert sum(out["pseudo_jax"]) > 0, out["pseudo_jax"]
    # the discrete chain agrees exactly in the pre-chaos steps
    assert out["pseudo_jax"][:4] == out["pseudo_torch"][:4], (
        out["pseudo_jax"],
        out["pseudo_torch"],
    )
    # step 0: identical pseudo sets, losses equal to f32 accumulation order
    assert out["loss_rel"][0] < 1e-4, out["loss_rel"][0]

    # the algorithm itself is chaotic: the torch-vs-torch floor is O(1)
    assert floor["param_drift"][-1] > 0.05, floor["param_drift"]
    # ... and the cross-framework drift stays within a small multiple of it
    # (same divergence mechanism, slightly different noise seed)
    ratio = out["param_drift"][-1] / max(floor["param_drift"][-1], 1e-9)
    assert ratio < 30.0, (out["param_drift"], floor["param_drift"])
    # teacher EMA inherits the same bound
    t_ratio = out["teacher_drift"][-1] / max(floor["param_drift"][-1], 1e-9)
    assert t_ratio < 30.0, (out["teacher_drift"], floor["param_drift"])
