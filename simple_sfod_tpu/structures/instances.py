"""Fixed-capacity instance container (the TPU replacement for detectron2's
`Instances`).

The reference carries per-image detections / ground truth in dynamically sized
`Instances` objects (variable #GT, #proposals, #detections). Under XLA every
shape must be static, so an `Instances` here is a frozen dataclass pytree with
a fixed capacity N and a validity mask; "filtering" becomes masking, "sorting"
becomes a permutation, and "concatenation" is capacity-preserving merge +
re-top-k. All trainers and the jitted step functions exchange this type.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Instances:
    """A batch-free set of N (padded) instances for one image.

    boxes:   [N, 4] float, XYXY absolute in the *network input* coordinate frame
    scores:  [N]   float (objectness or class score; 0 for padding)
    classes: [N]   int32 (contiguous 0..C-1; -1 convention NOT used — check mask)
    valid:   [N]   bool
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def mask(self, keep: jnp.ndarray) -> "Instances":
        """AND the validity mask with `keep` (same shape as valid)."""
        return dataclasses.replace(self, valid=self.valid & keep)

    def replace(self, **kw) -> "Instances":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "Instances":
        return Instances(
            boxes=jnp.zeros((capacity, 4), dtype),
            scores=jnp.zeros((capacity,), dtype),
            classes=jnp.zeros((capacity,), jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )

    def top_k(self, k: int, by: Optional[jnp.ndarray] = None) -> "Instances":
        """Keep the k highest-score valid instances, compacted to the front.

        `by` overrides the ranking key (defaults to scores). Padding entries
        rank below every valid entry.
        """
        key = self.scores if by is None else by
        key = jnp.where(self.valid, key, -jnp.inf)
        _, idx = jax.lax.top_k(key, k)
        return Instances(
            boxes=jnp.take(self.boxes, idx, axis=0),
            scores=jnp.take(self.scores, idx, axis=0),
            classes=jnp.take(self.classes, idx, axis=0),
            valid=jnp.take(self.valid, idx, axis=0),
        )

    @staticmethod
    def concatenate(a: "Instances", b: "Instances") -> "Instances":
        """Concatenate capacities (N_a + N_b); callers usually re-top_k after."""
        return Instances(
            boxes=jnp.concatenate([a.boxes, b.boxes], axis=0),
            scores=jnp.concatenate([a.scores, b.scores], axis=0),
            classes=jnp.concatenate([a.classes, b.classes], axis=0),
            valid=jnp.concatenate([a.valid, b.valid], axis=0),
        )


def pad_instances(
    boxes: np.ndarray,
    classes: np.ndarray,
    capacity: int,
    scores: Optional[np.ndarray] = None,
) -> Instances:
    """Host-side helper: pad variable-length numpy GT to a fixed capacity.

    Extra instances beyond `capacity` are dropped (largest-area kept first, the
    same information-preserving order the reference relies on implicitly by
    its dataset order).
    """
    n = min(len(boxes), capacity)
    if len(boxes) > capacity:
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        order = np.argsort(-areas)[:capacity]
        boxes = boxes[order]
        classes = classes[order]
        if scores is not None:
            scores = scores[order]
    out_boxes = np.zeros((capacity, 4), np.float32)
    out_scores = np.zeros((capacity,), np.float32)
    out_classes = np.zeros((capacity,), np.int32)
    out_valid = np.zeros((capacity,), bool)
    out_boxes[:n] = boxes[:n]
    out_classes[:n] = classes[:n]
    out_valid[:n] = True
    if scores is not None:
        out_scores[:n] = scores[:n]
    else:
        out_scores[:n] = 1.0
    return Instances(
        boxes=jnp.asarray(out_boxes),
        scores=jnp.asarray(out_scores),
        classes=jnp.asarray(out_classes),
        valid=jnp.asarray(out_valid),
    )
