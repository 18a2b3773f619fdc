"""Loss primitives shared by RPN and ROI heads (masked, static-shape).

Replacements for fvcore/detectron2's smooth_l1_loss and the cross-entropy
variants the reference trainers use (MODEL.RPN.LOSS / ROI_HEADS.LOSS =
"CrossEntropy", daod/config.py:84-86).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 0.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber). beta = 0 degrades to pure L1, which is
    detectron2's default for both RPN and box-head regression."""
    diff = pred - target
    if beta <= 0:
        return jnp.abs(diff)
    adiff = jnp.abs(diff)
    return jnp.where(adiff < beta, 0.5 * diff * diff / beta, adiff - 0.5 * beta)


def sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (numerically stable)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row softmax cross-entropy. logits [N, C], labels [N] int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, floor: float = 1.0) -> jnp.ndarray:
    """Mean over masked entries; denominator floored to avoid 0/0."""
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), floor)


def masked_sum(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(values * mask.astype(values.dtype))
