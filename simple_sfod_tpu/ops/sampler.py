"""Static-shape foreground/background subsampling.

Replaces detectron2's `subsample_labels` (used for the RPN 256-anchor batch
and the ROI-head 512-proposal batch; reference call sites rpn.py:45 and
roi_heads/source_free_adaptive_teacher_roi_heads.py:179-213). Random choice
without replacement is expressed as top-k over iid uniform priorities, which
keeps every shape static under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def subsample_labels(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample a fixed-size batch of positives + negatives.

    labels: [N] int32 with 1 = positive, 0 = negative, -1 = ignore.

    Returns:
      idx:    [num_samples] int32 indices into labels (compacted: sampled
              positives first, then negatives, then invalid filler)
      is_pos: [num_samples] bool
      valid:  [num_samples] bool  (False when fewer than num_samples eligible)

    Semantics match detectron2: num_pos = min(#pos, num_samples * fraction);
    num_neg = min(#neg, num_samples - num_pos); both drawn uniformly without
    replacement.
    """
    n = labels.shape[0]
    pos_cap = min(int(num_samples * positive_fraction), n)
    neg_cap = min(num_samples, n)
    r = jax.random.uniform(rng, (n,))

    neg_inf = -jnp.inf
    pos_key = jnp.where(labels == 1, r, neg_inf)
    neg_key = jnp.where(labels == 0, r, neg_inf)

    pos_vals, pos_idx = jax.lax.top_k(pos_key, pos_cap)
    pos_valid = pos_vals > neg_inf
    n_pos = jnp.sum(pos_valid.astype(jnp.int32))

    neg_vals, neg_idx = jax.lax.top_k(neg_key, neg_cap)
    n_neg = num_samples - n_pos
    neg_valid = (jnp.arange(neg_cap) < n_neg) & (neg_vals > neg_inf)

    # Compact [pos_cap + neg_cap] slots down to num_samples, valid first.
    all_idx = jnp.concatenate([pos_idx, neg_idx]).astype(jnp.int32)
    all_pos = jnp.concatenate([jnp.ones((pos_cap,), bool), jnp.zeros((neg_cap,), bool)])
    all_valid = jnp.concatenate([pos_valid, neg_valid])
    if pos_cap + neg_cap < num_samples:  # tiny-N edge case (tests only)
        pad = num_samples - (pos_cap + neg_cap)
        all_idx = jnp.pad(all_idx, (0, pad))
        all_pos = jnp.pad(all_pos, (0, pad))
        all_valid = jnp.pad(all_valid, (0, pad))
    # Stable order: valid first, positives before negatives (already in order).
    order = jnp.argsort(~all_valid, stable=True)[:num_samples]
    return (
        jnp.take(all_idx, order),
        jnp.take(all_pos, order),
        jnp.take(all_valid, order),
    )


def subsample_labels_mask(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask-form sampling for losses computed over the full anchor set.

    Returns (selected [N] bool, selected_pos [N] bool); used by the RPN loss,
    which sums over selected anchors and normalises by num_samples.
    """
    idx, is_pos, valid = subsample_labels(labels, num_samples, positive_fraction, rng)
    n = labels.shape[0]
    sel = jnp.zeros((n,), bool).at[idx].max(valid)
    sel_pos = jnp.zeros((n,), bool).at[idx].max(valid & is_pos)
    return sel, sel_pos
