"""Padded image batch (the TPU replacement for detectron2's `ImageList`).

The reference groups variable-size images by aspect ratio and pads per batch
(daod/data/common.py:45-89 in /root/reference). Under XLA the padded canvas
must be a *compile-time* constant, so images are resized (shortest edge ->
cfg.INPUT.MIN_SIZE) then padded to a fixed bucket shape; `sizes` records the
true (h, w) of each image inside the canvas so RPN clipping and the evaluator
can undo the padding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImageBatch:
    """images: [B, H, W, 3] float (NHWC — the TPU-friendly conv layout).
    sizes:  [B, 2] int32, true (h, w) of valid pixels per image.
    scale:  [B] float, resize factor from the original file to this canvas
            (used by the evaluator to map detections back to file coords).
    """

    images: jnp.ndarray
    sizes: jnp.ndarray
    scale: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.images.shape[0]

    @property
    def canvas(self):
        return self.images.shape[1], self.images.shape[2]
