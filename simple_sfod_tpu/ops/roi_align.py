"""ROIAlign (V2 / "aligned") — two TPU-native formulations.

Replaces detectron2's CUDA ROIAlign used by `ROIPooler` (reference call site
roi_heads/source_free_adaptive_teacher_roi_heads.py:42-47,117).

`roi_align` (default): **separable-matmul formulation for the MXU.** The
bilinear kernel factorises over y and x, and so does the s x s in-bin sample
average, so pooling is exactly

    out[r] = Wy_r @ F @ Wx_r^T        (per channel)

with dense per-ROI weight matrices Wy [R, P, H] / Wx [R, P, W] built from
iota comparisons on the VPU. Both contractions run on the MXU — no gathers,
no dynamic indexing, and XLA fuses the weight construction. This is the hot
op of the detector (512-1000 ROIs/image/step).

`roi_align_gather`: the direct 4-corner-gather formulation (VPU dynamic
gathers); kept as an independently-derived semantics reference — both are
golden-tested against a scalar numpy oracle and against each other.

Coordinate semantics follow torchvision/detectron2 `aligned=True`:
continuous coordinates are shifted by -0.5 after scaling; samples farther
than one pixel outside the map contribute zero; interior samples clamp to
the border. Sampling ratio is a static int (the reference's adaptive
`ceil(roi/out)` is data-dependent and untraceable; 2 is the common setting).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(
    start: jnp.ndarray,  # [R] continuous start coordinate (aligned-shifted)
    bin_size: jnp.ndarray,  # [R]
    out: int,
    s: int,
    dim: int,
    dtype,
) -> jnp.ndarray:
    """Per-ROI 1-D pooling weights [R, out, dim]: mean over the s in-bin
    samples of the clamped bilinear hat function, zeroed for samples farther
    than one pixel outside the feature map."""
    k = jnp.arange(out * s, dtype=dtype)
    grid = k // s + ((k % s) + 0.5) / s  # [out*s] position in bin units
    p = start[:, None] + grid[None, :] * bin_size[:, None]  # [R, out*s]
    ok = (p >= -1.0) & (p <= dim)
    pc = jnp.clip(p, 0.0, dim - 1)
    rows = jnp.arange(dim, dtype=dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pc[:, :, None] - rows[None, None, :]))
    w = w * ok[:, :, None].astype(dtype)
    r = start.shape[0]
    return w.reshape(r, out, s, dim).mean(axis=2)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """MXU separable-matmul ROIAlign. features [H, W, C]; rois [R, 4] XYXY in
    input-image coordinates -> [R, out, out, C]."""
    h, w, c = features.shape
    out = output_size
    dtype = features.dtype if features.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32

    # Coordinates and bilinear weights are ALWAYS built in f32: bf16's 8-bit
    # mantissa snaps a coordinate near 1000 to 4-px multiples, pooling large
    # ROIs from visibly wrong locations. Only the matmul OPERANDS are cast
    # to the compute dtype (the einsums accumulate in f32 regardless).
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0].astype(jnp.float32) * spatial_scale - offset
    y1 = rois[:, 1].astype(jnp.float32) * spatial_scale - offset
    x2 = rois[:, 2].astype(jnp.float32) * spatial_scale - offset
    y2 = rois[:, 3].astype(jnp.float32) * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    wy = _axis_weights(y1, roi_h / out, out, sampling_ratio, h, jnp.float32)
    wx = _axis_weights(x1, roi_w / out, out, sampling_ratio, w, jnp.float32)
    wy = wy.astype(dtype)  # [R, P, H]
    wx = wx.astype(dtype)  # [R, P, W]

    f = features.astype(dtype)
    # contract the wider spatial axis first to keep the intermediate small
    if w >= h:
        tmp = jnp.einsum("rxw,hwc->rhxc", wx, f, preferred_element_type=jnp.float32)
        res = jnp.einsum(
            "ryh,rhxc->ryxc", wy, tmp.astype(dtype), preferred_element_type=jnp.float32
        )
    else:
        tmp = jnp.einsum("ryh,hwc->rywc", wy, f, preferred_element_type=jnp.float32)
        res = jnp.einsum(
            "rxw,rywc->ryxc", wx, tmp.astype(dtype), preferred_element_type=jnp.float32
        )
    return res.astype(features.dtype)


def roi_align_gather(
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
