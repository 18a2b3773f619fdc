"""BPC (bounding-box prediction calibration) loss.

Static-shape re-derivation of /root/reference/daod/loss/bpc_loss.py:10-262:
raw (un-NMS'd) predictions are split per class into TP (best-IoU-vs-GT > 0.5,
legacy +1 pixel IoU, find_ious :62-84) and FP; confidences accumulate into
  AC = sum_{TP, s>=.5} s*tanh(s)      AN = sum_{TP, s<.5} s*(1-tanh(s))
  IC = sum_{FP, s>=.5} (1-s)*tanh(s)  IN = sum_{FP, s<.5} (1-s)*(1-tanh(s))
and the per-image loss is log(1 + (AN+IC)/(AC+IN)), averaged over images with
a positive denominator. In the reference trainer it is computed in the
supervised_target branch but weighted x0 (sfat.py:546-549) — logged only; we
keep the same role.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.instances import Instances


def _legacy_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pascal-style IoU with +1 offsets (bpc_loss.py:68-69). [N,4]x[M,4]->[N,M]."""
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def bpc_loss(pred: Instances, gt: Instances, iou_thresh: float = 0.5) -> jnp.ndarray:
    """pred/gt: batched Instances ([B, N, ...]); returns scalar."""

    def per_image(p: Instances, g: Instances):
        iou = _legacy_iou(g.boxes, p.boxes)  # [G, P]
        same_class = g.classes[:, None] == p.classes[None, :]
        pair_ok = same_class & g.valid[:, None] & p.valid[None, :]
        iou = jnp.where(pair_ok, iou, 0.0)
        best = jnp.max(iou, axis=0)  # [P]
        is_tp = p.valid & (best > iou_thresh)
        is_fp = p.valid & ~is_tp

        s = p.scores
        t = jnp.tanh(s)
        hi = s >= 0.5
        ac = jnp.sum(jnp.where(is_tp & hi, s * t, 0.0))
        an = jnp.sum(jnp.where(is_tp & ~hi, s * (1 - t), 0.0))
        ic = jnp.sum(jnp.where(is_fp & hi, (1 - s) * t, 0.0))
        inn = jnp.sum(jnp.where(is_fp & ~hi, (1 - s) * (1 - t), 0.0))
        numer = an + ic
        denom = ac + inn
        loss = jnp.log1p(numer / jnp.maximum(denom, 1e-12))
        return jnp.where(denom > 0, loss, 0.0), (denom > 0).astype(jnp.float32)

    losses, valid = jax.vmap(per_image)(pred, gt)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(valid), 1.0)
