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


class TestWarmupMethod:
    def test_constant_warmup(self):
        lin = warmup_multistep_schedule(1.0, [100], warmup_iters=10, warmup_factor=0.1)
        const = warmup_multistep_schedule(
            1.0, [100], warmup_iters=10, warmup_factor=0.1, warmup_method="constant"
        )
        assert float(const(0)) == pytest.approx(0.1)
        assert float(const(9)) == pytest.approx(0.1)
        assert float(const(10)) == pytest.approx(1.0)
        assert float(lin(5)) == pytest.approx(0.1 * 0.5 + 0.5)

    def test_unknown_method_rejected(self):
        with pytest.raises(ValueError, match="WARMUP_METHOD"):
            warmup_multistep_schedule(1.0, [100], warmup_method="cosine")

    def test_zero_warmup_iters_means_no_warmup(self):
        """WARMUP_ITERS=0: d2's WarmupParamScheduler applies no warmup at
        zero length; the linear ramp must not leak warmup_factor into step 0
        (regression caught by the SFAT lockstep differential)."""
        for method in ("linear", "constant"):
            sched = warmup_multistep_schedule(
                1.0, [100], warmup_iters=0, warmup_factor=1e-3, warmup_method=method
            )
            assert float(sched(0)) == pytest.approx(1.0)
            assert float(sched(1)) == pytest.approx(1.0)


class TestBackboneFreeze:
    """MODEL.BACKBONE.FREEZE_AT (d2 semantics: stem=stage1, res{s}=stage s;
    frozen stages get neither gradient nor weight decay)."""

    def _params(self):
        mk = lambda: {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}
        return {
            "det": {
                "backbone": {
                    "stem_conv": mk(),
                    "res2_block0": {"conv1": mk()},
                    "res3_block0": {"conv1": mk()},
                },
                "rpn_head": {"conv": mk()},
            }
        }

    @pytest.mark.parametrize("fused", [False, True])
    def test_freeze_at_2_pins_stem_and_res2(self, fused):
        from simple_sfod_tpu.solver.build import fused_sgd, with_frozen

        schedule = lambda c: 1e-2
        base = (
            fused_sgd(schedule, momentum=0.9, weight_decay=1e-4)
            if fused
            else optax.chain(
                optax.add_decayed_weights(1e-4), optax.sgd(schedule, momentum=0.9)
            )
        )
        opt = with_frozen(base, 2)
        params = self._params()
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        new_params, _ = apply_gradients(opt, grads, state, params)

        def flat(d, prefix=""):
            out = {}
            for k, v in d.items():
                if isinstance(v, dict):
                    out.update(flat(v, prefix + k + "/"))
                else:
                    out[prefix + k] = v
            return out

        before, after = flat(params), flat(new_params)
        for k in before:
            delta = float(jnp.abs(after[k] - before[k]).max())
            if "stem" in k or "res2_block" in k:
                assert delta == 0.0, f"{k} should be frozen"
            else:
                assert delta > 0.0, f"{k} should train"

        # invariant: frozen leaves' momentum stays exactly zero (weight decay
        # must not pollute it) — d2's requires_grad=False has no opt state
        new_params2, state2 = apply_gradients(opt, grads, state, new_params)
        if fused:
            from jax.flatten_util import ravel_pytree
            from simple_sfod_tpu.solver.build import backbone_freeze_mask

            per_leaf = backbone_freeze_mask(new_params, 2)
            full = jax.tree.map(
                lambda p, f: jnp.full(p.shape, f, bool), new_params, per_leaf
            )
            mask_flat, _ = ravel_pytree(full)
            assert float(jnp.abs(jnp.where(mask_flat, state2["mu"], 0.0)).max()) == 0.0
        else:
            # masked composition: the inner momentum tree only covers
            # trainable leaves — frozen leaves have no momentum at all
            import optax as _optax

            inner = state2[0].inner_state  # MaskedState of the chained base
            trace = [
                leaf
                for leaf in jax.tree.leaves(inner, is_leaf=lambda x: x is None)
                if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) > 0
            ]
            n_trainable = len(
                [1 for k in flat(new_params) if not ("stem" in k or "res2_block" in k)]
            )
            assert len(trace) == n_trainable

    def test_freeze_mask_paths(self):
        from simple_sfod_tpu.solver.build import backbone_freeze_mask

        params = self._params()
        mask3 = backbone_freeze_mask(params, 3)
        assert mask3["det"]["backbone"]["res3_block0"]["conv1"]["kernel"]
        assert not mask3["det"]["rpn_head"]["conv"]["kernel"]
        mask1 = backbone_freeze_mask(params, 1)
        assert mask1["det"]["backbone"]["stem_conv"]["kernel"]
        assert not mask1["det"]["backbone"]["res2_block0"]["conv1"]["kernel"]


class TestStopFrozenGradients:
    """stop_frozen_gradients: d2's requires_grad=False on the compute side —
    frozen leaves' gradients are STRUCTURAL zeros (the backward is never
    built), not merely discarded by the masked optimizer."""

    def _params(self):
        mk = lambda: {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}
        return {
            "det": {
                "backbone": {
                    "stem_conv": mk(),
                    "res2_block0": {"conv1": mk()},
                    "res3_block0": {"conv1": mk()},
                },
                "rpn_head": {"conv": mk()},
            }
        }

    def test_frozen_grads_are_zero_trainable_flow(self):
        from simple_sfod_tpu.solver.build import stop_frozen_gradients

        def loss(params):
            p = stop_frozen_gradients(params, 2)
            return sum(jnp.sum(x**2) for x in jax.tree.leaves(p))

        grads = jax.grad(loss)(self._params())
        bb = grads["det"]["backbone"]
        assert float(jnp.abs(bb["stem_conv"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(bb["res2_block0"]["conv1"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(bb["res3_block0"]["conv1"]["kernel"]).min()) > 0.0
        assert float(jnp.abs(grads["det"]["rpn_head"]["conv"]["kernel"]).min()) > 0.0

    def test_identity_when_nothing_matches_or_freeze_off(self):
        from simple_sfod_tpu.solver.build import stop_frozen_gradients

        vgg_like = {"det": {"backbone": {"vgg1_1": {"kernel": jnp.ones((2,))}}}}
        assert stop_frozen_gradients(vgg_like, 2) is vgg_like  # same object: graph unchanged
        p = self._params()
        assert stop_frozen_gradients(p, 0) is p

    def test_trainers_wire_the_stop(self, monkeypatch):
        """Every trainer's loss closure must route params through
        stop_frozen_gradients (the wrap is what kills the frozen backward)."""
        import simple_sfod_tpu.engine.trainers.base as base_mod
        from simple_sfod_tpu.solver.build import stop_frozen_gradients
        from test_trainers import tiny_cfg, one_batch
        from simple_sfod_tpu.engine.trainers import build_trainer

        calls = []

        def spy(params, freeze_at):
            calls.append(freeze_at)
            return stop_frozen_gradients(params, freeze_at)

        monkeypatch.setattr(base_mod, "stop_frozen_gradients", spy)
        cfg = tiny_cfg(
            "base",
            **{
                "MODEL.BACKBONE.NAME": "build_tiny_backbone",
                "MODEL.RPN.IN_FEATURES": ("tiny1",),
                "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
            },
        )
        tr = build_trainer(cfg, synthetic=True)
        tr.run_step(one_batch(cfg, tr.build_train_loader()))
        assert calls and calls[0] == int(cfg.MODEL.BACKBONE.FREEZE_AT)


class TestWeightDecayNorm:
    """SOLVER.WEIGHT_DECAY_NORM (d2 default 0.0): norm-layer scale/bias are
    exempt from weight decay — the reference inherits this via d2's
    get_default_optimizer_params; decaying BN affine params would steadily
    shrink them relative to the reference."""

    def _params(self):
        return {
            "backbone": {
                "conv0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
                "bn0": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
                "stem_norm": {"scale": jnp.ones((2,))},
            },
            "rpn_head": {"conv": {"kernel": jnp.ones((2, 2))}},
        }

    @pytest.mark.parametrize("fused", [False, True])
    def test_norm_leaves_not_decayed(self, fused):
        from simple_sfod_tpu.config import get_cfg
        from simple_sfod_tpu.solver.build import build_optimizer

        cfg = get_cfg()
        cfg.SOLVER.FUSED = fused
        cfg.SOLVER.WEIGHT_DECAY = 1e-2
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
        opt = build_optimizer(cfg)
        params = self._params()
        state = opt.init(params)
        zero_grads = jax.tree.map(jnp.zeros_like, params)
        new_params, _ = apply_gradients(opt, zero_grads, state, params)
        bb, nbb = new_params["backbone"], params["backbone"]
        # zero grads: the ONLY update source is weight decay
        np.testing.assert_array_equal(bb["bn0"]["scale"], nbb["bn0"]["scale"])
        np.testing.assert_array_equal(bb["bn0"]["bias"], nbb["bn0"]["bias"])
        np.testing.assert_array_equal(bb["stem_norm"]["scale"], nbb["stem_norm"]["scale"])
        assert float(jnp.abs(bb["conv0"]["kernel"] - nbb["conv0"]["kernel"]).max()) > 0
        assert float(jnp.abs(new_params["rpn_head"]["conv"]["kernel"] - 1.0).max()) > 0
        # conv BIAS still decays (d2 WEIGHT_DECAY_BIAS defaults to WEIGHT_DECAY)
        assert float(jnp.abs(bb["conv0"]["bias"] - 1.0).max()) > 0

    def test_weight_decay_norm_nonzero_applies(self):
        from simple_sfod_tpu.config import get_cfg
        from simple_sfod_tpu.solver.build import build_optimizer

        cfg = get_cfg()
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WEIGHT_DECAY_NORM = 1e-2
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
        opt = build_optimizer(cfg)
        params = self._params()
        new_params, _ = apply_gradients(
            opt, jax.tree.map(jnp.zeros_like, params), opt.init(params), params
        )
        bb = new_params["backbone"]
        assert float(jnp.abs(bb["bn0"]["scale"] - 1.0).max()) > 0
        np.testing.assert_array_equal(bb["conv0"]["kernel"], params["backbone"]["conv0"]["kernel"])


class TestFrozenBNAffine:
    """d2's FrozenBatchNorm2d keeps weight/bias as non-trainable buffers in
    EVERY stage — with the r101 default NORM='FrozenBN', res3..res5 norm
    affine must not receive SGD steps even though FREEZE_AT=2 only freezes
    stem+res2 (reference: d2 layers/batch_norm.py FrozenBatchNorm2d)."""

    def _params(self):
        mk = lambda: {"kernel": jnp.ones((2, 2))}
        fbn = lambda: {"scale": jnp.ones((2,)), "bias": jnp.zeros((2,))}
        bn = lambda: {"BatchNorm_0": {"scale": jnp.ones((2,)), "bias": jnp.zeros((2,))}}
        return {
            "det": {
                "backbone": {
                    "stem_conv": mk(),
                    "stem_norm": fbn(),
                    "res4_block0": {"conv1": mk(), "norm1": fbn()},
                    "res5_block2": {"conv2": mk(), "shortcut_norm": fbn()},
                },
                # VGG-style trainable BN nests affine under BatchNorm_0 and
                # lives outside any res/stem scope: never caught
                "vgg_backbone": {"bn3": bn()},
                "rpn_head": {"conv": mk()},
            }
        }

    def test_mask_catches_frozen_bn_at_every_stage(self):
        from simple_sfod_tpu.solver.build import backbone_freeze_mask

        m = backbone_freeze_mask(self._params(), 2)
        bb = m["det"]["backbone"]
        assert bb["stem_norm"]["scale"] and bb["stem_norm"]["bias"]
        # stages ABOVE freeze_at: conv trains, FrozenBN affine does not
        assert not bb["res4_block0"]["conv1"]["kernel"]
        assert bb["res4_block0"]["norm1"]["scale"]
        assert bb["res5_block2"]["shortcut_norm"]["bias"]
        assert not bb["res5_block2"]["conv2"]["kernel"]
        # trainable-BN nesting and non-resnet scopes stay trainable
        assert not m["det"]["vgg_backbone"]["bn3"]["BatchNorm_0"]["scale"]
        assert not m["det"]["rpn_head"]["conv"]["kernel"]

    def test_frozen_bn_frozen_even_at_freeze_at_zero(self):
        from simple_sfod_tpu.solver.build import with_frozen

        opt = with_frozen(
            optax.chain(optax.add_decayed_weights(1e-4),
                        optax.sgd(lambda c: 1e-2, momentum=0.9)),
            0,
        )
        params = self._params()
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        new_params, _ = apply_gradients(opt, grads, state, params)
        bb_old = params["det"]["backbone"]
        bb_new = new_params["det"]["backbone"]
        assert float(jnp.abs(bb_new["res4_block0"]["norm1"]["scale"]
                             - bb_old["res4_block0"]["norm1"]["scale"]).max()) == 0.0
        # freeze_at=0: stem CONV trains, only the FrozenBN affine is pinned
        assert float(jnp.abs(bb_new["stem_conv"]["kernel"]
                             - bb_old["stem_conv"]["kernel"]).max()) > 0.0
        assert float(jnp.abs(bb_new["stem_norm"]["bias"]
                             - bb_old["stem_norm"]["bias"]).max()) == 0.0

    def test_real_resnet_param_paths_match_the_mask(self):
        """The name patterns must hold for the ACTUAL ResNet module tree:
        every FrozenBN scale/bias leaf frozen, every conv kernel in stages
        above FREEZE_AT trainable."""
        import jax as _jax
        from simple_sfod_tpu.models.backbones.resnet import ResNetBackbone
        from simple_sfod_tpu.solver.build import backbone_freeze_mask

        bb = ResNetBackbone(depth=50, norm="FrozenBN")
        variables = bb.init(_jax.random.key(0), jnp.zeros((1, 64, 64, 3)), False)
        mask = backbone_freeze_mask(variables["params"], 2)
        flat = _jax.tree_util.tree_flatten_with_path(mask)[0]
        frozen_bn, trainable_conv = 0, 0
        for path, val in flat:
            names = [str(getattr(p, "key", p)) for p in path]
            if names[-1] in ("scale", "bias") and "norm" in names[-2]:
                assert val, names
                frozen_bn += 1
            if names[-1] == "kernel" and any(
                n.startswith(("res3", "res4", "res5")) for n in names
            ):
                assert not val, names
                trainable_conv += 1
        assert frozen_bn > 20 and trainable_conv > 20
