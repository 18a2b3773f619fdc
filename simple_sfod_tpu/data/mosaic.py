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


CONTENT-AWARE compositing: when per-image content sizes are passed (the
trainers do), each source's CONTENT corner — not its padded-canvas corner —
is pinned to the mosaic center, and mosaic regions no source content covers
are filled with YOLOX's 114 gray (the reference's base canvas,
mosaic.py:127 np.full(..., 114)). This closes the padding-band deviation
that round 3 documented here: the content-blind composite (sizes=None)
includes each canvas's zero padding in the tiles whenever images do not
fill TPU.CANVAS, and tools/quantify_mosaic_padding.py measured that at
fill=0.75 those bands collapse short-horizon learning (fit 27.6 AP50 vs
padded 0.5 at 250 steps). With sizes == canvas the two formulations are
pixel-identical (the in-bounds mask is all-true), matching the standard
configs where images fill the canvas.

Remaining deviation vs the reference's live mosaic: sources are composited
at the loader's sampled scale (content dims), not re-upscaled to the mosaic
canvas — identical when the loader's aspect-preserving min-fit resize is
used (YOLOX's own scale rule), smaller content only under multi-scale
`choice` sampling, where the gray fill takes the slack exactly like
YOLOX's own aspect-mismatch fill.
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
    scores4: jnp.ndarray,  # [4, N] (pseudo-label weights ride along)
    valid4: jnp.ndarray,  # [4, N]
    sizes4: jnp.ndarray,  # [4, 2] (content h, content w) per source
    pad_val: float = 114.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    h, w = images4.shape[1], images4.shape[2]
    sh, sw = sizes4[:, 0], sizes4[:, 1]
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

    # Source offsets: each source's CONTENT corner facing the center is
    # pinned there (content is top-left anchored, so its top/left edges are 0
    # and its bottom/right edges are sh/sw). TL tile shows source0's
    # bottom-right content crop: src_y = y + (sh0 - cy).
    off_y = jnp.stack([sh[0] - cy, sh[1] - cy, -cy, -cy])  # add to dest y
    off_x = jnp.stack([sw[0] - cx, -cx, sw[2] - cx, -cx])
    raw_y = rows + off_y[tile]
    raw_x = cols + off_x[tile]
    src_y = jnp.clip(raw_y, 0, h - 1)
    src_x = jnp.clip(raw_x, 0, w - 1)
    flat_idx = (tile * h + src_y) * w + src_x  # [H, W]
    flat_src = images4.reshape(4 * h * w, 3)
    out = jnp.take(flat_src, flat_idx.reshape(-1), axis=0).reshape(h, w, 3)
    # Regions the source content does not cover read the YOLOX gray base
    # canvas (reference mosaic.py:127). All-true when content == canvas.
    inb = (
        (raw_y >= 0) & (raw_y < sh[tile]) & (raw_x >= 0) & (raw_x < sw[tile])
    )
    out = jnp.where(inb[..., None], out, jnp.asarray(pad_val, out.dtype))

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
        scores4.reshape(-1),
        nvalid.reshape(-1),
    )


def mosaic_batch(rng: jax.Array, images, gt: Instances, sizes=None, pad_val: float = 114.0):
    """images [B, H, W, 3]; gt batched Instances [B, N]; sizes [B, 2] content
    (h, w) per image for content-aware compositing (None = content fills the
    canvas, the content-blind legacy composite). Returns (images, Instances
    [B, 4N]). Output i composites inputs (i, i+1, i+2, i+3 mod B)."""
    b = images.shape[0]
    if sizes is None:
        sizes = jnp.broadcast_to(
            jnp.asarray(images.shape[1:3], jnp.int32), (b, 2)
        )

    def gather4(x):
        return jnp.stack([jnp.roll(x, -k, axis=0) for k in range(4)], axis=1)

    images4 = gather4(images)  # [B, 4, H, W, 3]
    boxes4 = gather4(gt.boxes)
    classes4 = gather4(gt.classes)
    # scores (pseudo-label weights) follow the same tile gather as
    # boxes/classes — mixup_batch concatenates them too, and dropping them
    # here would silently train score-weighted pseudo labels uniformly
    scores4 = gather4(gt.scores)
    valid4 = gather4(gt.valid)
    sizes4 = gather4(jnp.asarray(sizes, jnp.int32))
    rngs = jax.random.split(rng, b)
    out, boxes, classes, scores, valid = jax.vmap(
        lambda r, i4, b4, c4, sc4, v4, s4: _mosaic_one(r, i4, b4, c4, sc4, v4, s4, pad_val)
    )(rngs, images4, boxes4, classes4, scores4, valid4, sizes4)
    return out, Instances(
        boxes=boxes, scores=scores, classes=classes, valid=valid
    )


def mixup_batch(
    rng: jax.Array,
    images,
    gt: Instances,
    alpha: float = 0.5,
    flip: bool = True,
    scale_jitter=None,
    sizes=None,
):
    """0.5/0.5 blend with the rolled batch; GT concatenated ([B, 2N]).

    flip: the companion is horizontally flipped with p=0.5 — LIVE in the
    reference's mixup (mixup.py:174 `FLIP = random.uniform(0,1) > 0.5`,
    :225-227 flips the full input_dim canvas including its gray padding, so
    the flip here is about the full canvas width).

    scale_jitter: optional (lo, hi) companion rescale about the top-left
    corner with a random crop offset when upscaled — the reference SAMPLES
    this factor (mixup.py:173) but then overwrites it with 1 (mixup.py:210
    `jit_factor = 1`), so it is DEAD there; default None matches the live
    reference. Downscale pads with 0 (reference np.zeros padded_img :230-233).

    sizes [B, 2]: per-image content (h, w) for CONTENT-AWARE mixing, the
    reference's geometry (mixup.py:188-245): the companion's canvas padding
    reads as 114 gray (the reference pastes the companion onto a gray
    input_dim canvas, :188), the gray canvas is flipped whole, a random crop
    offset samples the companion window when the canvas exceeds the origin
    frame (:236-241 randint(0, diff-1)), the blend covers only the origin
    frame (the reference's origin_img IS its frame), and companion GT is
    clipped to the frame (adjust_box_anns). With sizes=None (or content ==
    canvas: frame = canvas, zero offsets, all-true masks) this reduces to
    the plain full-canvas blend — otherwise the companion's ZERO padding
    would be blended at (1-alpha) over real content and its GT would land
    outside the origin's declared valid region.
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    other_images = jnp.roll(images, -1, axis=0)
    other = jax.tree.map(lambda x: jnp.roll(x, -1, axis=0), gt)
    oboxes = other.boxes
    ovalid = other.valid

    if sizes is not None:
        sizes = jnp.asarray(sizes, jnp.int32)
        s_c = jnp.roll(sizes, -1, axis=0)  # companion content dims
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        in_content = (yy < s_c[:, 0][:, None, None]) & (xx < s_c[:, 1][:, None, None])
        other_images = jnp.where(
            in_content[..., None], other_images, jnp.asarray(114.0, other_images.dtype)
        )

    if scale_jitter is not None:
        lo, hi = scale_jitter

        def jitter_one(rng_i, img, boxes):
            kj, ko = jax.random.split(rng_i)
            j = jax.random.uniform(kj, (), minval=lo, maxval=hi)
            # random crop offset when the jittered canvas exceeds the target
            # (reference mixup.py:235-241); zero when it fits
            omax = jnp.maximum(jnp.asarray([w, h], jnp.float32) * j - jnp.asarray([w, h], jnp.float32), 0.0)
            off = jax.random.uniform(ko, (2,)) * omax
            m = jnp.asarray([[j, 0.0, -off[0]], [0.0, j, -off[1]]], jnp.float32)
            return affine_warp(img, m, pad_val=0.0), affine_boxes(boxes, m, w, h)

        rj = jax.random.split(jax.random.fold_in(rng, 1), b)
        other_images, oboxes = jax.vmap(jitter_one)(rj, other_images, oboxes)
        ovalid = ovalid & nonempty(oboxes, 2.0)

    if flip:
        do = jax.random.bernoulli(jax.random.fold_in(rng, 0), 0.5, (b,))
        flipped = other_images[:, :, ::-1, :]
        fboxes = jnp.stack(
            [w - oboxes[..., 2], oboxes[..., 1], w - oboxes[..., 0], oboxes[..., 3]],
            axis=-1,
        )
        other_images = jnp.where(do[:, None, None, None], flipped, other_images)
        oboxes = jnp.where(do[:, None, None], fboxes, oboxes)

    if sizes is not None:
        # crop the companion canvas to the origin frame at a random offset
        # (reference mixup.py:236-241), blend only inside the frame
        def crop_one(rng_i, img, boxes, frame_hw):
            ky, kx = jax.random.split(rng_i)
            y_off = jax.random.randint(ky, (), 0, jnp.maximum(h - frame_hw[0], 1))
            x_off = jax.random.randint(kx, (), 0, jnp.maximum(w - frame_hw[1], 1))
            ys = jnp.clip(jnp.arange(h) + y_off, 0, h - 1)
            xs = jnp.clip(jnp.arange(w) + x_off, 0, w - 1)
            shifted = img[ys][:, xs]
            in_frame = (jnp.arange(h)[:, None] < frame_hw[0]) & (
                jnp.arange(w)[None, :] < frame_hw[1]
            )
            # zero outside the frame: the blend must leave the origin's own
            # padding untouched (alpha*0 + (1-alpha)*0)
            comp = jnp.where(in_frame[..., None], shifted, jnp.zeros((), img.dtype))
            offs = jnp.stack([x_off, y_off, x_off, y_off]).astype(boxes.dtype)
            bx = boxes - offs
            fw = frame_hw[1].astype(boxes.dtype)
            fh = frame_hw[0].astype(boxes.dtype)
            bx = jnp.stack(
                [
                    jnp.clip(bx[..., 0], 0, fw),
                    jnp.clip(bx[..., 1], 0, fh),
                    jnp.clip(bx[..., 2], 0, fw),
                    jnp.clip(bx[..., 3], 0, fh),
                ],
                axis=-1,
            )
            return comp, bx

        rc = jax.random.split(jax.random.fold_in(rng, 2), b)
        other_images, oboxes = jax.vmap(crop_one)(rc, other_images, oboxes, sizes)
        ovalid = ovalid & nonempty(oboxes, 2.0)

    out = images * alpha + other_images * (1.0 - alpha)
    merged = Instances(
        boxes=jnp.concatenate([gt.boxes, oboxes], axis=1),
        scores=jnp.concatenate([gt.scores, other.scores], axis=1),
        classes=jnp.concatenate([gt.classes, other.classes], axis=1),
        valid=jnp.concatenate([gt.valid, ovalid], axis=1),
    )
    return out, merged


# ---------------------------------------------------------------------------
# YOLOX random_affine.
#
# The reference's mosaic mappers import it (mosaic.py:14) and construct the
# degrees/translate/scale/shear knobs (mosaic.py:44-45), but the actual call
# is COMMENTED OUT in all three forks (mosaic.py:196-206,
# mosaic_wq.py:197-207, mosaic_wq_new.py:199-209) — the live reference mosaic
# applies no affine. It is therefore OFF by default
# (INPUT.MOSAIC.RANDOM_AFFINE=False matches the live reference) and available
# as the full YOLOX-strength geometric augmentation.
#
# Matrix semantics are YOLOX get_affine_matrix / apply_affine_to_bboxes
# (yolox/data/data_augment.py): rotation+scale about the origin via
# cv2.getRotationMatrix2D(center=(0,0)), rows mixed by tan(shear), translation
# uniform(0.5±translate)*target; boxes warp all 4 corners and take the
# axis-aligned hull, clipped to the target. Golden-tested against a numpy
# transcription in tests/test_transforms.py.
# ---------------------------------------------------------------------------


def affine_matrix(angle_deg, scale, shear_x_deg, shear_y_deg, tx, ty) -> jnp.ndarray:
    """YOLOX get_affine_matrix from explicit parameters; returns M [2, 3]
    with dst = M[:, :2] @ src + M[:, 2]."""
    rad = jnp.asarray(angle_deg, jnp.float32) * (jnp.pi / 180.0)
    a = scale * jnp.cos(rad)
    b = scale * jnp.sin(rad)
    r0 = jnp.stack([a, b])  # cv2.getRotationMatrix2D(center=(0,0)) row 0
    r1 = jnp.stack([-b, a])
    sx = jnp.tan(jnp.asarray(shear_x_deg, jnp.float32) * (jnp.pi / 180.0))
    sy = jnp.tan(jnp.asarray(shear_y_deg, jnp.float32) * (jnp.pi / 180.0))
    m0 = r0 + sy * r1
    m1 = r1 + sx * r0
    return jnp.stack(
        [
            jnp.concatenate([m0, jnp.asarray(tx, jnp.float32)[None]]),
            jnp.concatenate([m1, jnp.asarray(ty, jnp.float32)[None]]),
        ]
    )


def sample_affine_params(rng, target_size, degrees, translate, scales, shear):
    """YOLOX's parameter sampling: angle/shear uniform(±x), scale
    uniform(lo, hi), translation uniform(0.5±translate)*target."""
    tw, th = target_size
    ks = jax.random.split(rng, 6)
    angle = jax.random.uniform(ks[0], (), minval=-degrees, maxval=degrees)
    scale = jax.random.uniform(ks[1], (), minval=scales[0], maxval=scales[1])
    shear_x = jax.random.uniform(ks[2], (), minval=-shear, maxval=shear)
    shear_y = jax.random.uniform(ks[3], (), minval=-shear, maxval=shear)
    tx = jax.random.uniform(ks[4], (), minval=0.5 - translate, maxval=0.5 + translate) * tw
    ty = jax.random.uniform(ks[5], (), minval=0.5 - translate, maxval=0.5 + translate) * th
    return angle, scale, shear_x, shear_y, tx, ty


def affine_warp(image: jnp.ndarray, M: jnp.ndarray, pad_val: float = 114.0) -> jnp.ndarray:
    """Inverse-warp bilinear resample: dst(x, y) = src(M^{-1} @ (x, y, 1)).
    Out-of-bounds corners read pad_val (cv2.warpAffine borderValue=(114,..)).
    Same-shape output; one fused gather, static shapes."""
    h, w = image.shape[0], image.shape[1]
    A, t = M[:, :2], M[:, 2]
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    inv = (
        jnp.stack([jnp.stack([A[1, 1], -A[0, 1]]), jnp.stack([-A[1, 0], A[0, 0]])])
        / det
    )
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    dx, dy = xs - t[0], ys - t[1]
    sx = inv[0, 0] * dx + inv[0, 1] * dy
    sy = inv[1, 0] * dx + inv[1, 1] * dy
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    fx, fy = (sx - x0)[..., None], (sy - y0)[..., None]

    def sample(yi, xi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        v = image[
            jnp.clip(yi, 0, h - 1).astype(jnp.int32),
            jnp.clip(xi, 0, w - 1).astype(jnp.int32),
        ]
        return jnp.where(inb[..., None], v, pad_val)

    top = sample(y0, x0) * (1 - fx) + sample(y0, x0 + 1) * fx
    bot = sample(y0 + 1, x0) * (1 - fx) + sample(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def affine_boxes(boxes: jnp.ndarray, M: jnp.ndarray, out_w, out_h) -> jnp.ndarray:
    """YOLOX apply_affine_to_bboxes: warp the 4 corners, axis-aligned hull,
    clip x to [0, out_w] and y to [0, out_h]."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    cx = jnp.stack([x1, x2, x1, x2], axis=-1)
    cy = jnp.stack([y1, y2, y2, y1], axis=-1)
    nx = M[0, 0] * cx + M[0, 1] * cy + M[0, 2]
    ny = M[1, 0] * cx + M[1, 1] * cy + M[1, 2]
    return jnp.stack(
        [
            jnp.clip(nx.min(-1), 0, out_w),
            jnp.clip(ny.min(-1), 0, out_h),
            jnp.clip(nx.max(-1), 0, out_w),
            jnp.clip(ny.max(-1), 0, out_h),
        ],
        axis=-1,
    )


def random_affine_batch(
    rng: jax.Array,
    images,
    gt: Instances,
    degrees: float = 10.0,
    translate: float = 0.1,
    scales=(0.5, 1.5),
    shear: float = 2.0,
    pad_val: float = 114.0,
):
    """Per-image YOLOX random_affine on the assembled mosaic canvas.

    Coordinate frame: the matrix acts on source coordinates measured from the
    CANVAS CENTER (dst = M @ (src - c)). YOLOX feeds a 2x canvas whose content
    sits around its center and the ~0.5*target translation recentres it; our
    mosaic is already the 1x center assembly, so the pre-shift reproduces the
    same content-centered geometry without materialising a 2x canvas.
    Boxes that collapse below 2px after the warp are dropped (sliver drop,
    like adjust_box_anns)."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    c = jnp.asarray([w / 2.0, h / 2.0], jnp.float32)

    def one(rng_i, img, boxes):
        m = affine_matrix(*sample_affine_params(rng_i, (w, h), degrees, translate, scales, shear))
        m_eff = jnp.concatenate([m[:, :2], (m[:, 2] - m[:, :2] @ c)[:, None]], axis=1)
        return affine_warp(img, m_eff, pad_val), affine_boxes(boxes, m_eff, w, h)

    rngs = jax.random.split(rng, b)
    out, nb = jax.vmap(one)(rngs, images, gt.boxes)
    return out, gt.replace(boxes=nb, valid=gt.valid & nonempty(nb, 2.0))
