"""Feature Pyramid Network over a pooled-stage backbone.

The reference registers `build_vgg_fpn_backbone`
(/root/reference/daod/modeling/meta_arch/vgg.py:122-144): detectron2's FPN
with a LastLevelMaxPool top block over the VGG stages. No shipped reference
YAML selects it, but the registered capability is rebuilt here for real
rather than aliased to the plain backbone: lateral 1x1 convs project each
input stage to OUT_CHANNELS, a nearest-neighbour top-down pathway sums
coarser levels in, 3x3 output convs smooth each merged map, and a stride-2
max-pool adds one extra level (LastLevelMaxPool). Output names follow
detectron2's stride convention: ``p{log2(stride)}`` — for the VGG stages
(vgg1..vgg4, strides 4..32) that is p2..p5 plus p6.

The heads consume the pyramid with full detectron2 semantics (not a single
level): the shared RPN head runs on every `rpn_in_features` level with
per-level pre-NMS top-k and one merged NMS (faster_rcnn._propose_fpn), and
the ROI pooler assigns each box to a `roi_in_features` level by d2's
box-size rule (faster_rcnn.assign_boxes_to_levels) — see tests/test_fpn.py.

TPU notes: the nearest 2x upsample is a `jnp.repeat` (pure data movement,
fuses into the following add); all convs stay NHWC so the laterals/outputs
run on the MXU in the compute dtype.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _upsample2x(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample of [B,h,w,C] cropped to `like`'s h,w."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x[:, : like.shape[1], : like.shape[2]]


class FPN(nn.Module):
    """detectron2-semantics FPN wrapper. `bottom_up` must expose pooled-stage
    features by name plus `out_strides()` (VGG16Backbone / ResNetBackbone /
    TinyBackbone all do)."""

    bottom_up: nn.Module
    in_features: Tuple[str, ...]
    out_channels: int = 256
    norm: str = ""  # "" (none, conv bias on — d2 default) or "BN"
    fuse_type: str = "sum"  # "sum" | "avg"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = self.bottom_up(x, train=train)
        strides = self.bottom_up.out_strides()
        use_bias = self.norm == ""

        def maybe_norm(v, name):
            if self.norm == "BN":
                v = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=name,
                )(v)
            return v

        levels = [strides[f].bit_length() - 1 for f in self.in_features]
        laterals = []
        for f, lvl in zip(self.in_features, levels):
            lat = nn.Conv(
                self.out_channels,
                (1, 1),
                use_bias=use_bias,
                dtype=self.dtype,
                name=f"fpn_lateral{lvl}",
            )(feats[f])
            laterals.append(maybe_norm(lat, f"fpn_lateral{lvl}_norm"))

        # top-down pathway (coarsest first)
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            m = laterals[i] + _upsample2x(merged[i + 1], laterals[i])
            if self.fuse_type == "avg":
                m = m / 2.0
            merged[i] = m

        out: Dict[str, jnp.ndarray] = {}
        for m, lvl in zip(merged, levels):
            o = nn.Conv(
                self.out_channels,
                (3, 3),
                padding=1,
                use_bias=use_bias,
                dtype=self.dtype,
                name=f"fpn_output{lvl}",
            )(m)
            out[f"p{lvl}"] = maybe_norm(o, f"fpn_output{lvl}_norm")

        # LastLevelMaxPool: kernel 1, stride 2 over the coarsest output.
        # A (1,1)-window max_pool is exactly a strided slice; the slice form
        # avoids reduce_window's SelectAndScatter backward (the slow op this
        # backend's CLAUDE.md flags), and its gradient is a cheap pad.
        top = levels[-1]
        out[f"p{top + 1}"] = out[f"p{top}"][:, ::2, ::2, :]
        return out

    def fpn_out_channels(self) -> Dict[str, int]:
        strides = self.bottom_up.out_strides()
        levels = [strides[f].bit_length() - 1 for f in self.in_features]
        return {f"p{l}": self.out_channels for l in levels + [levels[-1] + 1]}

    def fpn_out_strides(self) -> Dict[str, int]:
        strides = self.bottom_up.out_strides()
        levels = [strides[f].bit_length() - 1 for f in self.in_features]
        return {f"p{l}": 2 ** l for l in levels + [levels[-1] + 1]}
