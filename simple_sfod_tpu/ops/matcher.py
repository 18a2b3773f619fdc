"""IoU matcher with static shapes (replaces detectron2's `Matcher`).

Used by RPN anchor labelling (thresholds [0.3, 0.7] -> labels [0, -1, 1],
allow_low_quality=True) and by ROI-head proposal labelling ([0.5] -> [0, 1]);
see the reference call sites /root/reference/daod/modeling/proposal_generator/
rpn.py:45 and roi_heads/source_free_adaptive_teacher_roi_heads.py:179-187.

Padded (invalid) ground-truth rows are treated as IoU = -inf so they can never
match; when no GT is valid everything becomes background — the same behaviour
detectron2 gets from its empty-GT special case.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp


class MatcherConfig(NamedTuple):
    thresholds: Sequence[float]
    labels: Sequence[int]  # len(thresholds) + 1 entries; -1 = ignore
    allow_low_quality_matches: bool = False


RPN_MATCHER = MatcherConfig((0.3, 0.7), (0, -1, 1), True)
ROI_MATCHER = MatcherConfig((0.5,), (0, 1), False)


def match_boxes(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    config: MatcherConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match predictions to ground truth by IoU.

    iou:      [M_gt, N_pred] (padded GT rows included)
    gt_valid: [M_gt] bool

    Returns (matched_idx [N_pred] int32 — index into GT rows, arbitrary (0)
    when nothing matches; match_labels [N_pred] int32 in {-1, 0, 1}).
    """
    neg_inf = jnp.asarray(-1.0, iou.dtype)
    masked = jnp.where(gt_valid[:, None], iou, neg_inf)  # [M, N]

    matched_vals = jnp.max(masked, axis=0)  # [N]
    matched_idx = jnp.argmax(masked, axis=0).astype(jnp.int32)  # [N]

    labels = jnp.full(matched_vals.shape, config.labels[0], jnp.int32)
    for thr, lbl in zip(config.thresholds, config.labels[1:]):
        labels = jnp.where(matched_vals >= thr, jnp.int32(lbl), labels)

    if config.allow_low_quality_matches:
        # For each valid GT, predictions tying its best IoU (> 0) are forced
        # positive even if below the high threshold (detectron2's
        # set_low_quality_matches_).
        per_gt_best = jnp.max(masked, axis=1, keepdims=True)  # [M, 1]
        is_best = (masked >= per_gt_best) & (per_gt_best > 0) & gt_valid[:, None]
        low_quality = jnp.any(is_best, axis=0)  # [N]
        labels = jnp.where(low_quality, jnp.int32(1), labels)

    return matched_idx, labels
