"""Fixed-shape non-maximum suppression for TPU.

Replaces torchvision's CUDA `nms` / detectron2's `batched_nms` (used by the
reference's RPN proposal selection, rpn.py:54-57, and Fast R-CNN inference).
Exact greedy NMS is re-expressed as a *tiled certain-suppression fixpoint*:

  - boxes are sorted by score once (XLA sort, MXU-free);
  - tiles of T boxes are finalised left-to-right; within a tile, only boxes
    that are provably kept ("no live earlier box overlaps me") are allowed to
    suppress, and the inner while_loop finalises at least one undecided box
    per iteration — so it terminates with exactly the greedy-NMS keep set,
    usually in a handful of iterations;
  - suppressed boxes are zeroed so they have IoU 0 with everything, which
    makes cross-tile suppression a single masked matrix op on the VPU.

All shapes are static; "keep" is a mask, not a gather, so this composes with
the padded `Instances` representation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou, nonempty


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _self_suppress_tile(iou_up: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Within-tile greedy suppression.

    iou_up: [T, T] IoU with only the strict upper triangle populated
    (row k may suppress column j only for k < j). Returns suppressed [T] bool.
    """

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        iou_m, _ = state
        # A row may suppress only if nothing still-live suppresses it.
        can_suppress = jnp.max(iou_m, axis=0) <= threshold  # [T]
        suppressed = jnp.max(jnp.where(can_suppress[:, None], iou_m, 0.0), axis=0) > threshold
        new_iou = jnp.where(suppressed[:, None], 0.0, iou_m)  # dead rows can't suppress
        changed = jnp.any(new_iou != iou_m)
        return new_iou, changed

    final_iou, _ = jax.lax.while_loop(cond, body, (iou_up, jnp.asarray(True)))
    return jnp.max(final_iou, axis=0) > threshold


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    tile: int = 256,
) -> jnp.ndarray:
    """Exact greedy NMS. Returns keep mask [N] bool (subset of `valid`).

    boxes [N, 4], scores [N], valid [N]. N is padded internally to a multiple
    of `tile`; ties in score break by index, matching the sorted-order
    convention of torchvision's nms.
    """
    n = boxes.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    pad = n_pad - n
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, pad),))
        valid = jnp.pad(valid, ((0, pad),))

    # Sort by score desc; invalid entries to the end. argsort(-key) is stable,
    # preserving index order among equal scores.
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order)
    # Zeroed boxes have IoU 0 with everything — the "dead" representation.
    live_boxes = jnp.where(svalid[:, None], sboxes, 0.0)

    num_tiles = n_pad // tile
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    upper = row < col

    def outer(i, state):
        boxes_state, keep = state  # [N,4] finalized-so-far (dead = 0), [N] bool
        start = i * tile
        box_t = jax.lax.dynamic_slice(boxes_state, (start, 0), (tile, 4))

        # Cross-tile: suppression by finalized live boxes in earlier tiles.
        iou_all = pairwise_iou(boxes_state, box_t)  # [N, T] rows = candidates' suppressors
        earlier = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < start
        cross_sup = jnp.max(jnp.where(earlier, iou_all, 0.0), axis=0) > iou_threshold
        box_t = jnp.where(cross_sup[:, None], 0.0, box_t)

        # Within-tile greedy fixpoint.
        iou_self = pairwise_iou(box_t, box_t)
        iou_up = jnp.where(upper, iou_self, 0.0)
        self_sup = _self_suppress_tile(iou_up, iou_threshold)

        dead = cross_sup | self_sup
        box_t = jnp.where(dead[:, None], 0.0, box_t)
        boxes_state = jax.lax.dynamic_update_slice(boxes_state, box_t, (start, 0))
        keep = jax.lax.dynamic_update_slice(keep, ~dead, (start,))
        return boxes_state, keep

    _, keep_sorted = jax.lax.fori_loop(
        0, num_tiles, outer, (live_boxes, jnp.zeros((n_pad,), bool))
    )
    keep_sorted = keep_sorted & svalid
    # Un-sort back to input order.
    keep = jnp.zeros((n_pad,), bool).at[order].set(keep_sorted)
    return keep[:n]


def nms_mask_matrix(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Exact greedy NMS as a whole-matrix certain-suppression fixpoint.

    One flat while_loop whose body is two [N, N] masked reductions on the
    VPU — no nested control flow (fast TPU compile), no N sequential picks
    (fast execution; converges in the suppression-chain depth, typically <6
    iterations on detector outputs).

    Invariant: a box is marked suppressed only when some *certainly kept*
    (live and unthreatened) earlier box overlaps it; each iteration finalises
    at least the lowest-indexed threatened box, so the fixpoint equals greedy
    NMS exactly.
    """
    n = boxes.shape[0]
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order)

    iou = pairwise_iou(sboxes, sboxes)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    suppress_rel = (iou > iou_threshold) & (row < col) & svalid[:, None] & svalid[None, :]

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        sup, _ = state
        alive = svalid & ~sup
        threatened = jnp.any(suppress_rel & alive[:, None], axis=0)
        certain = alive & ~threatened
        new_sup = sup | jnp.any(suppress_rel & certain[:, None], axis=0)
        return new_sup, jnp.any(new_sup != sup)

    sup, _ = jax.lax.while_loop(cond, body, (jnp.zeros((n,), bool), jnp.asarray(True)))
    keep_sorted = svalid & ~sup
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def nms_mask_scan(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_keep: int = None,
) -> jnp.ndarray:
    """Exact greedy NMS as a single lax.scan of pick-max steps.

    Each of `max_keep` steps picks the highest-scoring live box and kills its
    overlaps — one flat loop, no nested control flow, which the TPU compiler
    handles far better than the tiled fixpoint (see nms_mask). Exact as long
    as the caller keeps <= max_keep boxes afterwards, which is always true
    for RPN (post_nms_topk) and test-time (detections_per_image) use.
    """
    n = boxes.shape[0]
    max_keep = n if max_keep is None else min(max_keep, n)
    live = valid & nonempty(boxes)
    scores = jnp.where(live, scores, -jnp.inf)

    def step(carry, _):
        scores_c, keep = carry
        i = jnp.argmax(scores_c)
        ok = scores_c[i] > -jnp.inf
        box_i = boxes[i]
        iou = _iou_one_vs_all(box_i, boxes)
        kill = (iou > iou_threshold) & ok
        new_scores = jnp.where(kill, -jnp.inf, scores_c)
        new_scores = new_scores.at[i].set(-jnp.inf)
        keep = keep.at[i].set(ok | keep[i])
        return (new_scores, keep), None

    (_, keep), _ = jax.lax.scan(
        step, (scores, jnp.zeros((n,), bool)), None, length=max_keep
    )
    return keep & valid



def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = a + b - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def batched_class_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_keep: int = None,
) -> jnp.ndarray:
    """Per-class NMS via the coordinate-offset trick (detectron2 batched_nms):
    boxes of different classes are translated to disjoint regions so one NMS
    pass never suppresses across classes.
    """
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    del max_keep  # the matrix fixpoint computes the full exact keep set
    return nms_mask_matrix(shifted, scores, valid, iou_threshold)
