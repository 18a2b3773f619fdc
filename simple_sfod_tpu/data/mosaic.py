"""On-device mosaic / mixup augmentation (static shapes).

The reference wraps its datasets in YOLOX-style MosaicDetection / mixup
mappers on CPU workers (/root/reference/daod/data/mappers/mosaic.py:39-356,
mixup.py). On TPU both become pure batched functions inside the jitted step:

  mosaic: each output image composites 4 batch neighbours (i, i+1, i+2, i+3
  mod B) around a random center; tiles are *crops* of the sources (YOLOX
  placement: each source's inner corner pinned to the mosaic center), realised
  as one inverse-warp gather — no dynamic shapes.

  mixup: 0.5/0.5 blend of batch neighbours with GT concatenation
  (mixup.py ~:40, the reference's fixed-lambda blend).


KNOWN DEVIATION (static-canvas geometry): tiles are cropped from the PADDED
canvases, so when images do not fill TPU.CANVAS (small multi-scale samples,
outlier aspect ratios) a tile's center-facing corner can include the zero
padding — regions the reference's mosaic (compositing raw unpadded images)
would fill with pixels. With the standard configs (canvas sized to the
single training scale, e.g. 600->608x1216) images fill the canvas to within
a few pixels and the effect is nil; multi-scale users should size mosaics'
canvas to the sampled scale or accept the padding bands.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import nonempty
from ..structures.instances import Instances


def _mosaic_one(
    rng: jax.Array,
    images4: jnp.ndarray,  # [4, H, W, 3] sources (TL, TR, BL, BR)
    boxes4: jnp.ndarray,  # [4, N, 4]
    classes4: jnp.ndarray,  # [4, N]
    valid4: jnp.ndarray,  # [4, N]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    h, w = images4.shape[1], images4.shape[2]
    k1, k2 = jax.random.split(rng)
    cy = (jax.random.uniform(k1, (), minval=0.25, maxval=0.75) * h).astype(jnp.int32)
    cx = (jax.random.uniform(k2, (), minval=0.25, maxval=0.75) * w).astype(jnp.int32)

    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    is_top = rows < cy
    is_left = cols < cx
    tile = jnp.where(
        is_top, jnp.where(is_left, 0, 1), jnp.where(is_left, 2, 3)
    )  # [H, W]

    # Source offsets: each source's corner facing the center is pinned there.
    # TL tile shows source0's bottom-right crop: src_y = y + (h - cy).
    off_y = jnp.stack([h - cy, h - cy, -cy, -cy])  # add to dest y
    off_x = jnp.stack([w - cx, -cx, w - cx, -cx])
    src_y = jnp.clip(rows + off_y[tile], 0, h - 1)
    src_x = jnp.clip(cols + off_x[tile], 0, w - 1)
    flat_idx = (tile * h + src_y) * w + src_x  # [H, W]
    flat_src = images4.reshape(4 * h * w, 3)
    out = jnp.take(flat_src, flat_idx.reshape(-1), axis=0).reshape(h, w, 3)

    # Boxes: shift each source's boxes by -offset, clip to its tile rect.
    tile_x1 = jnp.stack([0, cx, 0, cx]).astype(jnp.float32)
    tile_y1 = jnp.stack([0, 0, cy, cy]).astype(jnp.float32)
    tile_x2 = jnp.stack([cx, w, cx, w]).astype(jnp.float32)
    tile_y2 = jnp.stack([0 + cy, cy, h, h]).astype(jnp.float32)

    shift = jnp.stack(
        [-off_x.astype(jnp.float32), -off_y.astype(jnp.float32)], axis=-1
    )  # [4, 2] (dx, dy): dest = src + shift... src_y = y + off => y = src_y - off
    dx = shift[:, 0][:, None]
    dy = shift[:, 1][:, None]
    bx = boxes4 + jnp.stack([dx, dy, dx, dy], axis=-1)  # [4, N, 4]
    x1 = jnp.clip(bx[..., 0], tile_x1[:, None], tile_x2[:, None])
    y1 = jnp.clip(bx[..., 1], tile_y1[:, None], tile_y2[:, None])
    x2 = jnp.clip(bx[..., 2], tile_x1[:, None], tile_x2[:, None])
    y2 = jnp.clip(bx[..., 3], tile_y1[:, None], tile_y2[:, None])
    nb = jnp.stack([x1, y1, x2, y2], axis=-1)
    nvalid = valid4 & nonempty(nb, 2.0)  # drop slivers (< 2px), like adjust_box_anns

    return (
        out,
        nb.reshape(-1, 4),
        classes4.reshape(-1),
        nvalid.reshape(-1),
    )


def mosaic_batch(rng: jax.Array, images, gt: Instances):
    """images [B, H, W, 3]; gt batched Instances [B, N]. Returns (images,
    Instances [B, 4N]). Output i composites inputs (i, i+1, i+2, i+3 mod B)."""
    b = images.shape[0]

    def gather4(x):
        return jnp.stack([jnp.roll(x, -k, axis=0) for k in range(4)], axis=1)

    images4 = gather4(images)  # [B, 4, H, W, 3]
    boxes4 = gather4(gt.boxes)
    classes4 = gather4(gt.classes)
    valid4 = gather4(gt.valid)
    rngs = jax.random.split(rng, b)
    out, boxes, classes, valid = jax.vmap(_mosaic_one)(
        rngs, images4, boxes4, classes4, valid4
    )
    return out, Instances(
        boxes=boxes, scores=jnp.ones_like(classes, jnp.float32), classes=classes, valid=valid
    )


def mixup_batch(rng: jax.Array, images, gt: Instances, alpha: float = 0.5):
    """0.5/0.5 blend with the rolled batch; GT concatenated ([B, 2N])."""
    other_images = jnp.roll(images, -1, axis=0)
    out = images * alpha + other_images * (1.0 - alpha)
    other = jax.tree.map(lambda x: jnp.roll(x, -1, axis=0), gt)
    merged = Instances(
        boxes=jnp.concatenate([gt.boxes, other.boxes], axis=1),
        scores=jnp.concatenate([gt.scores, other.scores], axis=1),
        classes=jnp.concatenate([gt.classes, other.classes], axis=1),
        valid=jnp.concatenate([gt.valid, other.valid], axis=1),
    )
    return out, merged
