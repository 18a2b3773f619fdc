"""Solver: fused flat SGD must be numerically identical to the optax chain."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from simple_sfod_tpu.solver.build import (
    apply_gradients,
    fused_sgd,
    warmup_multistep_schedule,
)


def random_tree(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv": {"kernel": jax.random.normal(k1, (3, 3, 4, 8)), "bias": jax.random.normal(k2, (8,))},
        "bn": {"scale": jax.random.normal(k3, (8,)) + 1.0},
        "fc": {"kernel": jax.random.normal(k4, (16, 4))},
    }


@pytest.mark.parametrize("clip", [None, 0.05])
def test_fused_matches_optax_chain(clip):
    schedule = warmup_multistep_schedule(2.5e-3, [5, 8], 0.1, None, warmup_iters=3)
    mom, wd = 0.9, 1e-4

    chain = [optax.clip(clip)] if clip is not None else []
    chain += [optax.add_decayed_weights(wd), optax.sgd(schedule, momentum=mom)]
    ref_opt = optax.chain(*chain)
    fused = fused_sgd(schedule, momentum=mom, weight_decay=wd, clip_value=clip)

    params_ref = random_tree(jax.random.key(0))
    params_fused = jax.tree.map(jnp.array, params_ref)
    s_ref = ref_opt.init(params_ref)
    s_fused = fused.init(params_fused)

    for step in range(10):
        grads = random_tree(jax.random.key(100 + step))
        params_ref, s_ref = apply_gradients(ref_opt, grads, s_ref, params_ref)
        params_fused, s_fused = apply_gradients(fused, grads, s_fused, params_fused)

    flat_r = jax.tree.leaves(params_ref)
    flat_f = jax.tree.leaves(params_fused)
    for r, f in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(r), np.asarray(f), rtol=1e-6, atol=1e-7)


def test_fused_update_is_optax_compatible():
    """FusedSGD.update returns an updates tree usable with apply_updates."""
    schedule = lambda c: 1e-2
    fused = fused_sgd(schedule, momentum=0.9, weight_decay=0.0)
    params = random_tree(jax.random.key(1))
    state = fused.init(params)
    grads = random_tree(jax.random.key(2))
    updates, state2 = fused.update(grads, state, params)
    via_updates = optax.apply_updates(params, updates)
    via_apply, _ = fused.apply(grads, fused.init(params), params)
    for a, b in zip(jax.tree.leaves(via_updates), jax.tree.leaves(via_apply)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
