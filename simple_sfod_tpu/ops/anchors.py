"""Anchor generation for single- or multi-level feature maps.

Replaces detectron2's DefaultAnchorGenerator (used by the reference's RPN,
/root/reference/daod/modeling/proposal_generator/rpn.py:25-41) with a pure
function producing a static [H*W*A, 4] array — precomputed once per canvas
shape at trace time, so it folds into the compiled graph as a constant.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def generate_cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """Anchors centered at (0, 0) for one feature location. [A, 4] XYXY.

    Same math as detectron2: anchor area = size**2, w = sqrt(area / ratio),
    h = w * ratio.
    """
    anchors = []
    for size in sizes:
        anchor_area = float(size) ** 2
        for ratio in aspect_ratios:
            w = float(np.sqrt(anchor_area / ratio))
            h = w * ratio
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, dtype=np.float32)


def generate_anchors(
    feature_hw: Tuple[int, int],
    stride: int,
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
    offset: float = 0.0,
) -> jnp.ndarray:
    """Full anchor grid for a feature map. Returns [H*W*A, 4] float32.

    Row-major over (y, x) locations with A anchors per location — matching
    the (N, Hi, Wi, A) flattening order the reference's RPN uses
    (rpn.py:28-41), so objectness/delta predictions align index-for-index.
    """
    h, w = feature_hw
    cell = generate_cell_anchors(sizes, aspect_ratios)  # [A, 4]
    shift_x = (np.arange(w, dtype=np.float32) + offset) * stride
    shift_y = (np.arange(h, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # [H, W] each
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # [H*W, 1, 4]
    grid = (shifts + cell[None, :, :]).reshape(-1, 4)  # [H*W*A, 4]
    return jnp.asarray(grid)
