"""Box operations on fixed-shape arrays (XYXY absolute coordinates).

TPU-first design: every op is a pure function over `[..., 4]` float arrays and
is shape-polymorphic only in the *static* leading dims, so everything jits and
vectorises onto the VPU without recompilation. Variable box counts are handled
upstream by padding + validity masks (see `structures/instances.py`), never by
dynamic shapes.

Capability parity with the reference's detectron2 `Boxes` / `Box2BoxTransform`
usage (see /root/reference/daod/modeling/proposal_generator/rpn.py and
roi_heads/*; the transform math follows the Faster R-CNN paper's
parameterisation with per-coordinate weights and a scale clamp).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp

# Detectron2's default: log(1000 / 16). Deltas are clamped so decoded boxes
# cannot explode early in training.
DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas. boxes: [..., 4] -> [...]. Degenerate boxes give area <= 0."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with both sides > threshold. [..., 4] -> [...] bool."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def clip_boxes(boxes: jnp.ndarray, image_size: jnp.ndarray) -> jnp.ndarray:
    """Clip boxes to [0, W] x [0, H].

    image_size: (h, w) — scalars or arrays broadcastable against the leading
    dims of `boxes` (so a per-image [B, 2] size clips [B, N, 4] boxes).
    """
    h = jnp.asarray(image_size[..., 0])[..., None]
    w = jnp.asarray(image_size[..., 1])[..., None]
    x1 = jnp.clip(boxes[..., 0:1], 0.0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0.0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0.0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0.0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def _pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas. [N, 4] x [M, 4] -> [N, M]."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix. [N, 4] x [M, 4] -> [N, M]. 0 where union is 0."""
    inter = _pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection over area of boxes2. [N, 4] x [M, 4] -> [N, M]."""
    inter = _pairwise_intersection(boxes1, boxes2)
    a2 = area(boxes2)[None, :]
    return jnp.where(a2 > 0, inter / jnp.where(a2 > 0, a2, 1.0), 0.0)


class BoxTransform(NamedTuple):
    """Faster R-CNN box delta parameterisation with coordinate weights.

    Mirrors detectron2's Box2BoxTransform: RPN uses weights (1, 1, 1, 1);
    ROI box head uses (10, 10, 5, 5).
    """

    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    scale_clamp: float = DEFAULT_SCALE_CLAMP

    def get_deltas(self, src: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return encode_deltas(src, target, self.weights)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        return decode_deltas(deltas, boxes, self.weights, self.scale_clamp)


def encode_deltas(
    src: jnp.ndarray,
    target: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode target boxes as (dx, dy, dw, dh) deltas relative to src boxes.

    src/target: [..., 4] XYXY. Degenerate src boxes (non-positive side) are
    guarded with a floor of 1 to keep gradients finite; callers mask those
    entries out.
    """
    src_w = jnp.maximum(src[..., 2] - src[..., 0], 1e-6)
    src_h = jnp.maximum(src[..., 3] - src[..., 1], 1e-6)
    src_cx = src[..., 0] + 0.5 * src_w
    src_cy = src[..., 1] + 0.5 * src_h

    tgt_w = jnp.maximum(target[..., 2] - target[..., 0], 1e-6)
    tgt_h = jnp.maximum(target[..., 3] - target[..., 1], 1e-6)
    tgt_cx = target[..., 0] + 0.5 * (target[..., 2] - target[..., 0])
    tgt_cy = target[..., 1] + 0.5 * (target[..., 3] - target[..., 1])

    wx, wy, ww, wh = weights
    dx = wx * (tgt_cx - src_cx) / src_w
    dy = wy * (tgt_cy - src_cy) / src_h
    dw = ww * jnp.log(tgt_w / src_w)
    dh = wh * jnp.log(tgt_h / src_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    scale_clamp: float = DEFAULT_SCALE_CLAMP,
) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to boxes.

    deltas: [..., K*4] (K classes) or [..., 4]; boxes: [..., 4].
    Returns same shape as `deltas`.
    """
    boxes = boxes.astype(deltas.dtype)
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    wx, wy, ww, wh = weights
    shape = deltas.shape
    d = deltas.reshape(shape[:-1] + (-1, 4))
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(d[..., 3] / wh, scale_clamp)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(shape)
