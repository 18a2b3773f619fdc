"""ROIAlign (V2 / "aligned") as a pure-XLA gather kernel.

Replaces detectron2's CUDA ROIAlign used by `ROIPooler` (reference call site
roi_heads/source_free_adaptive_teacher_roi_heads.py:42-47,117). The bilinear
sampling is expressed as four fused gathers + a weighted sum, all static
shapes, so XLA lowers it to vectorised dynamic-gathers on the VPU. The
sampling ratio is a static int (the reference's adaptive `ceil(roi/out)` is
data-dependent and cannot be traced; 2 matches common detector settings).

Coordinate semantics follow torchvision/detectron2 `aligned=True`:
continuous coordinates are shifted by -0.5 after scaling; samples farther
than one pixel outside the map contribute zero; interior samples clamp to
the border.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """features: [H, W, C]; rois: [R, 4] XYXY in input-image coordinates.

    Returns [R, output_size, output_size, C].
    """
    h, w, c = features.shape
    r = rois.shape[0]
    s = sampling_ratio
    out = output_size

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out

    # Sample grid: [out * s] fractional offsets within the ROI, per axis.
    grid = (jnp.arange(out * s, dtype=features.dtype).reshape(out, s) // s).reshape(-1)
    frac = (jnp.arange(out * s) % s + 0.5) / s  # position inside the bin
    axis_pos = grid + frac  # [out*s] in units of bins

    ys = y1[:, None] + axis_pos[None, :] * bin_h[:, None]  # [R, out*s]
    xs = x1[:, None] + axis_pos[None, :] * bin_w[:, None]

    # Outside-by-more-than-one-pixel samples contribute 0.
    y_ok = (ys >= -1.0) & (ys <= h)
    x_ok = (xs >= -1.0) & (xs <= w)

    ys_c = jnp.clip(ys, 0.0, h - 1)
    xs_c = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ys_c)
    x0 = jnp.floor(xs_c)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    ly = ys_c - y0
    lx = xs_c - x0

    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = y1i.astype(jnp.int32)
    x1i = x1i.astype(jnp.int32)

    flat = features.reshape(h * w, c)
    P = out * s  # samples per axis

    # Broadcast to the [R, P_y, P_x] sample lattice.
    def bcast_y(a):
        return a[:, :, None]

    def bcast_x(a):
        return a[:, None, :]

    wy1 = bcast_y(ly)
    wy0 = 1.0 - wy1
    wx1 = bcast_x(lx)
    wx0 = 1.0 - wx1
    ok = (bcast_y(y_ok) & bcast_x(x_ok)).astype(features.dtype)

    def gather(yi, xi):
        idx = (bcast_y(yi) * w + bcast_x(xi)).reshape(-1)  # [R*P*P]
        return jnp.take(flat, idx, axis=0).reshape(r, P, P, c)

    val = (
        gather(y0, x0) * (wy0 * wx0 * ok)[..., None]
        + gather(y0, x1i) * (wy0 * wx1 * ok)[..., None]
        + gather(y1i, x0) * (wy1 * wx0 * ok)[..., None]
        + gather(y1i, x1i) * (wy1 * wx1 * ok)[..., None]
    )  # [R, P, P, C]

    # Average the s x s samples inside each bin.
    val = val.reshape(r, out, s, out, s, c)
    return jnp.mean(val, axis=(2, 4))


def roi_align_batched(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """features: [B, H, W, C]; rois: [B, R, 4] -> [B, R, out, out, C]."""
    return jax.vmap(
        lambda f, b: roi_align(f, b, spatial_scale, output_size, sampling_ratio, aligned)
    )(features, rois)
