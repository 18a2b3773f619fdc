"""TCD (true-class-distribution) loss.

The reference ships two experimental, never-wired implementations
(daod/loss/tcd_loss.py, tcd_new.py — referenced only in comments, SURVEY §2
item 31). Provided here with the same role for capability parity: an L1
divergence between the per-class distribution of confident predictions and a
target class distribution."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.instances import Instances


def tcd_loss(
    pred: Instances,
    target_distribution: jnp.ndarray,
    score_thresh: float = 0.5,
) -> jnp.ndarray:
    """pred: batched Instances; target_distribution: [C] summing to 1."""
    num_classes = target_distribution.shape[0]
    conf = pred.valid & (pred.scores >= score_thresh)
    counts = jnp.sum(
        jax.nn.one_hot(pred.classes, num_classes) * conf[..., None].astype(jnp.float32),
        axis=tuple(range(pred.classes.ndim)),
    )
    total = jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.sum(jnp.abs(counts / total - target_distribution))
