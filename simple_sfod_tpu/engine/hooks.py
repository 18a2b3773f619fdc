"""Periodic hooks: validation loss, PreciseBN, anomaly detection.

Functional re-design of the reference's hook stack:
  - ValLossHook (engine/hooks/val_loss.py:8-96): periodic val-set losses under
    no_grad, logged as `*_val` scalars, with NaN/Inf anomaly detection
    (:84-90). Here: the same jitted loss function the trainer uses, run on a
    held-out batch without taking gradients.
  - PreciseBN (fvcore, enabled at base.py:237-244): recompute BN statistics
    over N batches before eval — identical machinery to AdaBN but bounded by
    NUM_ITER and run at eval time.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Iterator

import jax
import jax.numpy as jnp

from ..models.detector import DetectionBatch, Detector


class ValLossHook:
    """Compute detector losses on validation batches (no gradient, no BN
    update) and log them with a `_val` suffix."""

    def __init__(self, detector: Detector, loader_factory: Callable, period: int = 100):
        self.detector = detector
        self.loader_factory = loader_factory
        self.period = period
        self._iter = None
        self._jit_loss = jax.jit(
            lambda variables, batch, rng: detector.supervised_losses(
                variables, batch, rng, update_bn=False
            )[1]
        )

    def _next_batch(self):
        if self._iter is None:
            self._iter = iter(self.loader_factory())
        try:
            return next(self._iter)
        except StopIteration:
            self._iter = iter(self.loader_factory())
            return next(self._iter)

    def after_step(self, step: int, variables, rng, storage, prev_step: int = None) -> Dict[str, float]:
        """prev_step: with chunked stepping (TPU.STEPS_PER_DISPATCH>1) the
        loop lands only on chunk boundaries; fire if ANY multiple of the
        period fell in (prev_step, step] so periods misaligned with the
        chunk size don't silently disable the hook."""
        if self.period <= 0:
            return {}
        lo = step - 1 if prev_step is None else prev_step
        if (step + 1) // self.period <= (lo + 1) // self.period:
            return {}
        from ..data.loader import gt_instances

        batch = self._next_batch()
        metrics = self._jit_loss(
            variables,
            DetectionBatch(
                jnp.asarray(batch["images"]), jnp.asarray(batch["sizes"]), gt_instances(batch)
            ),
            rng,
        )
        out = {}
        for k, v in metrics.items():
            v = float(v)
            detect_anomaly(step, v, k)
            out[f"{k}_val"] = v
            storage.put_scalar(f"{k}_val", v)
        return out


def detect_anomaly(step: int, value: float, name: str):
    """NaN/Inf guard (reference ValLossHook._detect_anomaly, val_loss.py:84-90)."""
    if not math.isfinite(value):
        raise FloatingPointError(
            f"Loss became infinite or NaN at iteration={step}! loss {name} = {value}"
        )


def precise_bn(
    detector: Detector,
    variables,
    batches: Iterator,
    num_iter: int = 200,
):
    """Recompute BN statistics as the true mean over `num_iter` batches
    (fvcore update_bn_stats semantics: equal-weight average rather than EMA).

    Returns new batch_stats. Uses a running average over the per-batch
    statistics produced by the jitted BN update.
    """
    bn_step = jax.jit(
        lambda v, images: detector._features(v, images, True, mutable=True)[1]["batch_stats"]
    )
    acc = None
    n = 0
    params = variables["params"]
    for i, batch in enumerate(batches):
        if i >= num_iter:
            break
        images = jnp.asarray(batch["images"]) if isinstance(batch, dict) else batch
        # run with momentum-free capture: compute batch stats directly by
        # forwarding with train=True from the CURRENT stats, then extract the
        # newly-written collection; average the per-batch values.
        stats_i = bn_step({"params": params, "batch_stats": variables["batch_stats"]}, images)
        if acc is None:
            acc = jax.tree.map(jnp.zeros_like, stats_i)
        # undo the EMA: flax writes m*old + (1-m)*batch; recover batch value
        momentum = 0.9
        batch_val = jax.tree.map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            stats_i,
            variables["batch_stats"],
        )
        acc = jax.tree.map(lambda a, b: a + b, acc, batch_val)
        n += 1
    if not n:
        return variables["batch_stats"]
    return jax.tree.map(lambda a: a / n, acc)
