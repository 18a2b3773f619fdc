"""Optimizer + LR schedule (optax), matching detectron2's solver semantics
used by the reference: SGD momentum 0.9, weight decay 1e-4, WarmupMultiStepLR
with the daod FACTOR_LIST extension (configs set SOLVER.STEPS +
SOLVER.FACTOR_LIST, e.g. faster_rcnn_VGG_..._source_free.yaml:35-37)."""

from __future__ import annotations

import re
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    factor_list: Sequence[float] = None,
    warmup_iters: int = 1000,
    warmup_factor: float = 1.0 / 1000,
    warmup_method: str = "linear",
):
    """LR(it) = base * factor(it) * warmup(it).

    factor(it): with factor_list given (reference semantics), the factor is
    factor_list[bisect(steps, it)]; otherwise detectron2's gamma**k.
    warmup_method: d2's "linear" (ramp from warmup_factor to 1) or
    "constant" (flat warmup_factor until warmup_iters).
    """
    if warmup_method not in ("linear", "constant"):
        raise ValueError(f"unknown SOLVER.WARMUP_METHOD {warmup_method!r}")
    steps = list(steps)
    if factor_list is not None and len(factor_list) >= 1:
        factors = list(factor_list)
        while len(factors) < len(steps) + 1:
            factors.append(factors[-1])
    else:
        factors = [gamma**k for k in range(len(steps) + 1)]
    boundaries = jnp.asarray(steps)
    factors_arr = jnp.asarray(factors, jnp.float32)

    def schedule(count):
        idx = jnp.sum(count >= boundaries)
        factor = factors_arr[idx]
        if warmup_iters <= 0:
            # WARMUP_ITERS=0: no warmup at all. The ramp formula below would
            # still emit warmup_factor at step 0, but d2's
            # WarmupParamScheduler applies no warmup at zero length (caught
            # by the SFAT lockstep differential, tests/test_lockstep_sfat.py).
            # Python-level branch so warmup>0 graphs are unchanged (compile
            # cache stays valid).
            warm = 1.0
        elif warmup_method == "constant":
            warm = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:
            alpha = jnp.clip(count / max(warmup_iters, 1), 0.0, 1.0)
            warm = warmup_factor * (1 - alpha) + alpha
        return base_lr * factor * warm

    return schedule


def auto_scale_workers(cfg, new_world_size: int):
    """Linear-scaling-rule config rewrite (detectron2 auto_scale_workers,
    used by the reference at base.py:38): when the data-parallel width
    changes, scale LR up and iteration counts down by the same factor so the
    trained model is equivalent. Returns a new (defrosted) cfg."""
    old = getattr(cfg.SOLVER, "REFERENCE_WORLD_SIZE", 0) or 0
    if old == 0 or old == new_world_size:
        return cfg
    scale = new_world_size / old
    cfg = cfg.clone()
    cfg.defrost()
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    # d2 scales the GLOBAL batch with the world size (per-worker batch
    # constant) — LR/iteration scaling without it is not the linear rule
    cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
    cfg.SOLVER.IMS_PER_BATCH_TARGET = int(
        round(cfg.SOLVER.IMS_PER_BATCH_TARGET * scale)
    )
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
    cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    cfg.SOLVER.CHECKPOINT_PERIOD = int(round(cfg.SOLVER.CHECKPOINT_PERIOD / scale))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = new_world_size
    return cfg


class FusedSGD(NamedTuple):
    """SGD(momentum) + weight decay + schedule computed over ONE flat f32
    buffer instead of one fusion per parameter leaf.

    Built to chase BENCH_NOTES round-2 lead #3 (the device trace showed the
    per-leaf optax tree_maps as ~60 scattered small fusions). MEASURED
    OUTCOME on the TPU (608x1216 VGG16-BN step): the flat path is ~4ms/step
    SLOWER — the grads/params ravel concats and the unravel slice-backs add
    ~3.4ms of pure HBM traffic, while the per-leaf fusions' apparent cost was
    overlapped DMA wait, not serial time. Kept as an off-by-default option
    (SOLVER.FUSED) and a documented negative result.

    Math is identical to optax.chain(clip?, add_decayed_weights(wd),
    sgd(schedule, momentum)) — asserted by tests/test_solver.py.
    """

    init: callable
    update: callable  # optax-compatible: (grads, state, params) -> (updates, state)
    apply: callable  # fused: (grads, state, params) -> (new_params, state)


_NORM_NAME = re.compile(r"^bn\d+$|norm")


def norm_param_mask(params):
    """Pytree of bools: True for normalization-layer leaves (BN/GN
    scale+bias — module names `bn<i>`, `*norm*`). detectron2's
    get_default_optimizer_params gives these SOLVER.WEIGHT_DECAY_NORM
    (default 0.0) instead of WEIGHT_DECAY, and the reference inherits that
    through DefaultTrainer.build_optimizer — decaying BN affine params
    would steadily shrink them relative to the reference."""

    def is_norm(path) -> bool:
        return any(
            _NORM_NAME.search(str(getattr(p, "key", p))) for p in path
        )

    return jax.tree_util.tree_map_with_path(lambda path, _: is_norm(path), params)


def _non_norm_mask(params):
    return jax.tree.map(lambda f: not f, norm_param_mask(params))


def fused_sgd(schedule, momentum: float, weight_decay: float, clip_value=None,
              weight_decay_norm: float = None) -> FusedSGD:
    def init(params):
        flat, _ = ravel_pytree(params)
        return {"mu": jnp.zeros_like(flat), "count": jnp.zeros((), jnp.int32)}

    def _decay_vec(params, pflat):
        if weight_decay_norm is None:  # uniform decay (raw-constructor mode)
            return weight_decay
        full = jax.tree.map(
            lambda p, f: jnp.full(p.shape, f, bool), params, norm_param_mask(params)
        )
        mflat, _ = ravel_pytree(full)
        return jnp.where(mflat, weight_decay_norm, weight_decay)

    def _flat_update(grads, state, params):
        pflat, unravel = ravel_pytree(params)
        gflat, _ = ravel_pytree(grads)
        if clip_value is not None:
            gflat = jnp.clip(gflat, -clip_value, clip_value)
        gflat = gflat + _decay_vec(params, pflat) * pflat
        mu = state["mu"] * momentum + gflat
        lr = schedule(state["count"])
        new_state = {"mu": mu, "count": state["count"] + 1}
        return pflat - lr * mu, unravel, new_state

    def apply(grads, state, params):
        new_flat, unravel, new_state = _flat_update(grads, state, params)
        return unravel(new_flat), new_state

    def update(grads, state, params):
        new_flat, unravel, new_state = _flat_update(grads, state, params)
        pflat, _ = ravel_pytree(params)
        return unravel(new_flat - pflat), new_state

    return FusedSGD(init=init, update=update, apply=apply)


def backbone_freeze_mask(params, freeze_at: int):
    """Pytree of bools: True = frozen leaf (update must be zero).

    detectron2 semantics (ResNet.freeze, applied by build_resnet_backbone
    with cfg.MODEL.BACKBONE.FREEZE_AT, d2 default 2): stage 1 is the stem,
    stage s>=2 is res{s}; everything with stage <= freeze_at is frozen —
    no gradient, no weight decay. The reference's VGG backbone never calls
    freeze, and VGG param names don't match the stem/res patterns, so VGG
    configs are unaffected — same as the reference.

    FrozenBN affine leaves are frozen at EVERY stage regardless of
    freeze_at: d2's FrozenBatchNorm2d keeps weight/bias as buffers
    (requires_grad never set), so with the r101 default NORM='FrozenBN'
    they must not receive SGD steps in res3..res5 either. FrozenBN
    registers scale/bias DIRECTLY under the norm-named module
    (backbones/resnet.py _Norm); a trainable nn.BatchNorm nests its affine
    one level deeper (BatchNorm_0, which the case-sensitive pattern does
    not match), so the direct-child test selects exactly the frozen kind,
    and the resnet-scope guard keeps VGG-BN names out."""
    pat = re.compile(r"^res(\d)_block")

    def frozen(path) -> bool:
        names = [str(getattr(p, "key", p)) for p in path]
        in_resnet = False
        for name in names:
            if name.startswith("stem"):
                in_resnet = True
                if freeze_at >= 1:
                    return True
            m = pat.match(name)
            if m:
                in_resnet = True
                if int(m.group(1)) <= freeze_at:
                    return True
        return (
            in_resnet
            and len(names) >= 2
            and _NORM_NAME.search(names[-2]) is not None
            and names[-1] in ("scale", "bias")
        )

    return jax.tree_util.tree_map_with_path(lambda path, _: frozen(path), params)


def stop_frozen_gradients(params, freeze_at: int):
    """d2's requires_grad=False, compute-faithfully: stop_gradient on frozen
    leaves inside the loss so XLA eliminates the frozen stages' BACKWARD
    entirely. The masked optimizer (with_frozen) alone only zeroes the
    UPDATES — the backward through stem/res2 still ran at the largest
    feature resolutions, compute the reference never pays (its frozen
    modules have requires_grad=False). Trainers call this on the params
    tree at the top of every loss closure; the name-based mask is decided
    at trace time, so VGG configs (no stem/res leaves) get the identity
    and an unchanged graph. Updates are bit-identical either way (frozen
    grads were already discarded); only the gradient COMPUTATION changes.

    Runs even at freeze_at=0: FrozenBN affine leaves freeze
    unconditionally (see backbone_freeze_mask)."""
    mask = backbone_freeze_mask(params, freeze_at)
    if not any(jax.tree.leaves(mask)):
        return params
    return jax.tree.map(
        lambda p, f: jax.lax.stop_gradient(p) if f else p, params, mask
    )


def _zero_frozen(updates, params, freeze_at: int):
    mask = backbone_freeze_mask(params, freeze_at)
    return jax.tree.map(
        lambda u, f: jnp.zeros_like(u) if f else u, updates, mask
    )


def with_frozen(base, freeze_at: int):
    """Freeze backbone stages <= freeze_at — d2's requires_grad=False:
    frozen leaves are bit-identical across steps (no SGD step, no weight
    decay) AND their optimizer state stays pristine (zero momentum).

    optax path: masked composition — the inner chain only ever sees the
    trainable leaves (its momentum state exists only for them), and frozen
    leaves' updates are set to zero. FusedSGD path: grads are zeroed going
    in, params restored coming out, and the flat momentum buffer is masked
    to zero on the frozen segments so weight decay cannot pollute it.

    Wraps even at freeze_at=0 — FrozenBN affine leaves freeze
    unconditionally (backbone_freeze_mask); the _nothing_frozen
    fallthrough keeps no-match models (VGG) bit- and pytree-identical."""
    if isinstance(base, FusedSGD):
        def _mu_mask(params):
            per_leaf = backbone_freeze_mask(params, freeze_at)
            full = jax.tree.map(
                lambda p, f: jnp.full(p.shape, f, bool), params, per_leaf
            )
            flat, _ = ravel_pytree(full)
            return flat

        def apply(grads, state, params):
            new_params, new_state = base.apply(
                _zero_frozen(grads, params, freeze_at), state, params
            )
            mask = backbone_freeze_mask(params, freeze_at)
            new_params = jax.tree.map(
                lambda old, new, f: old if f else new, params, new_params, mask
            )
            new_state = {**new_state, "mu": jnp.where(_mu_mask(params), 0.0, new_state["mu"])}
            return new_params, new_state

        def update(grads, state, params):
            updates, new_state = base.update(
                _zero_frozen(grads, params, freeze_at), state, params
            )
            new_state = {**new_state, "mu": jnp.where(_mu_mask(params), 0.0, new_state["mu"])}
            return _zero_frozen(updates, params, freeze_at), new_state

        return FusedSGD(init=base.init, update=update, apply=apply)

    def trainable_mask(params):
        return jax.tree.map(lambda f: not f, backbone_freeze_mask(params, freeze_at))

    def frozen_mask(params):
        return backbone_freeze_mask(params, freeze_at)

    masked = optax.chain(
        optax.masked(base, trainable_mask),
        optax.masked(optax.set_to_zero(), frozen_mask),
    )

    # When the mask matches nothing (e.g. VGG backbones, which d2's FREEZE_AT
    # does not apply to), fall through to the unwrapped optimizer so the
    # opt_state pytree structure — and therefore checkpoint resume — is
    # identical to a freeze_at=0 run. The mask depends only on param NAMES,
    # so this branch is decided once at init/trace time.
    def _nothing_frozen(params):
        return not any(jax.tree.leaves(backbone_freeze_mask(params, freeze_at)))

    def init_fn(params):
        return base.init(params) if _nothing_frozen(params) else masked.init(params)

    def update_fn(grads, state, params=None):
        tx = base if _nothing_frozen(params) else masked
        return tx.update(grads, state, params)

    return optax.GradientTransformation(init_fn, update_fn)


def apply_gradients(optimizer, grads, opt_state, params):
    """(new_params, new_opt_state) — the one call every jitted step makes.
    Uses the fused flat path when the optimizer provides one."""
    fused = getattr(optimizer, "apply", None)
    if fused is not None:
        return fused(grads, opt_state, params)
    updates, new_opt = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt


def build_optimizer(cfg) -> optax.GradientTransformation:
    schedule = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.FACTOR_LIST if len(cfg.SOLVER.FACTOR_LIST) else None,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_METHOD,
    )
    freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_AT)
    if getattr(cfg.SOLVER, "FUSED", False):
        return with_frozen(
            fused_sgd(
                schedule,
                momentum=cfg.SOLVER.MOMENTUM,
                weight_decay=cfg.SOLVER.WEIGHT_DECAY,
                clip_value=cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE
                if cfg.SOLVER.CLIP_GRADIENTS.ENABLED
                else None,
                weight_decay_norm=float(cfg.SOLVER.WEIGHT_DECAY_NORM),
            ),
            freeze_at,
        )
    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
    # d2 semantics: norm-layer params decay at WEIGHT_DECAY_NORM (default 0)
    wd_norm = float(cfg.SOLVER.WEIGHT_DECAY_NORM)
    chain.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY, mask=_non_norm_mask))
    if wd_norm:
        chain.append(optax.add_decayed_weights(wd_norm, mask=norm_param_mask))
    chain.append(optax.sgd(schedule, momentum=cfg.SOLVER.MOMENTUM))
    return with_frozen(optax.chain(*chain), freeze_at)
