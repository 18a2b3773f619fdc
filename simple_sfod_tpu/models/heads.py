"""RPN head, box head, and Fast R-CNN predictor (flax linen, NHWC).

Functional replacements for detectron2's StandardRPNHead /
FastRCNNConvFCHead / FastRCNNOutputLayers, which the reference composes via
its registries (configs set ROI_BOX_HEAD.NAME=FastRCNNConvFCHead NUM_FC=2,
see /root/reference/configs/*.yaml). Outputs keep the (B, H, W, A[, 4])
layout so flattening matches the anchor grid order in ops/anchors.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class RPNHead(nn.Module):
    """3x3 conv + sibling 1x1 objectness / anchor-delta convs."""

    num_anchors: int
    conv_dim: int = -1  # -1: match input channels (detectron2 default)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, H, W, C] -> (objectness [B, H*W*A], deltas [B, H*W*A, 4])."""
        dim = x.shape[-1] if self.conv_dim < 0 else self.conv_dim
        init = nn.initializers.normal(0.01)
        t = nn.Conv(dim, (3, 3), padding=1, kernel_init=init, dtype=self.dtype, name="conv")(x)
        t = nn.relu(t)
        logits = nn.Conv(
            self.num_anchors, (1, 1), kernel_init=init, dtype=self.dtype, name="objectness"
        )(t)
        deltas = nn.Conv(
            self.num_anchors * 4, (1, 1), kernel_init=init, dtype=self.dtype, name="deltas"
        )(t)
        b, h, w, _ = logits.shape
        return (
            logits.reshape(b, h * w * self.num_anchors).astype(jnp.float32),
            deltas.reshape(b, h * w * self.num_anchors, 4).astype(jnp.float32),
        )


class FastRCNNConvFCHead(nn.Module):
    """Optional 3x3 convs then FC layers over the pooled ROI feature."""

    fc_dims: Sequence[int] = (1024, 1024)
    conv_dims: Sequence[int] = ()
    dropout: float = 0.0  # >0 enables the MC-dropout variant (reference
    # roi_heads/box_head.py FastRCNNConvFCHeadWithDropout)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, mc_dropout: bool = False):
        """x: [N, P, P, C] pooled ROI features -> [N, fc_dims[-1]]."""
        for i, dim in enumerate(self.conv_dims):
            x = nn.Conv(dim, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i, dim in enumerate(self.fc_dims):
            x = nn.Dense(
                dim,
                kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                dtype=self.dtype,
                name=f"fc{i}",
            )(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not (train or mc_dropout))(x)
        return x


class FastRCNNPredictor(nn.Module):
    """Class logits (C+1, background last) + class-specific box deltas (4C)."""

    num_classes: int
    cls_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scores = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="cls_score",
        )(x)
        num_box = 1 if self.cls_agnostic else self.num_classes
        deltas = nn.Dense(
            num_box * 4,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            name="bbox_pred",
        )(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)
