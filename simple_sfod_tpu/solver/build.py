"""Optimizer + LR schedule (optax), matching detectron2's solver semantics
used by the reference: SGD momentum 0.9, weight decay 1e-4, WarmupMultiStepLR
with the daod FACTOR_LIST extension (configs set SOLVER.STEPS +
SOLVER.FACTOR_LIST, e.g. faster_rcnn_VGG_..._source_free.yaml:35-37)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    factor_list: Sequence[float] = None,
    warmup_iters: int = 1000,
    warmup_factor: float = 1.0 / 1000,
):
    """LR(it) = base * factor(it) * warmup(it).

    factor(it): with factor_list given (reference semantics), the factor is
    factor_list[bisect(steps, it)]; otherwise detectron2's gamma**k.
    """
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
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
    cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    cfg.SOLVER.CHECKPOINT_PERIOD = int(round(cfg.SOLVER.CHECKPOINT_PERIOD / scale))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = new_world_size
    return cfg


def build_optimizer(cfg) -> optax.GradientTransformation:
    schedule = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.FACTOR_LIST if len(cfg.SOLVER.FACTOR_LIST) else None,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_FACTOR,
    )
    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
    chain.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY))
    chain.append(optax.sgd(schedule, momentum=cfg.SOLVER.MOMENTUM))
    return optax.chain(*chain)
