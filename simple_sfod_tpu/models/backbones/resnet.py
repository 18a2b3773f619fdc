"""ResNet backbone (50/101), NHWC, detectron2-compatible stage layout.

Covers the reference's ResNet-101 C4 configs
(/root/reference/configs/r_101_c4_cs_foggy_adabn.yaml and
r101_*_single.yaml): stem = 7x7/2 conv + 3x3/2 max-pool, bottleneck stages
res2..res5 with strides (4, 8, 16, 32) and channels (256, 512, 1024, 2048).
The C4 detector consumes "res4" (stride 16, 1024ch). NORM: "BN" keeps live
BatchNorm statistics (required for AdaBN); "FrozenBN" folds stats into a
fixed affine like detectron2's FrozenBatchNorm.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

BLOCK_COUNTS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class _Norm(nn.Module):
    """BN or frozen-BN (affine with non-trainable stats)."""

    kind: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kind == "FrozenBN":
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            mean = self.variable("batch_stats", "mean", jnp.zeros, (c,))
            var = self.variable("batch_stats", "var", jnp.ones, (c,))
            inv = scale / jnp.sqrt(var.value + 1e-5)
            return x * inv + (bias - mean.value * inv)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels,
                (1, 1),
                strides=self.stride,
                use_bias=False,
                dtype=self.dtype,
                name="shortcut",
            )(x)
            shortcut = _Norm(self.norm, self.dtype, name="shortcut_norm")(shortcut, train)
        # detectron2 puts the stride on the 1x1 ("stride_in_1x1" default True
        # for Caffe-style ResNets, which its ImageNet pickles use).
        y = nn.Conv(
            self.bottleneck_channels,
            (1, 1),
            strides=self.stride,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = _Norm(self.norm, self.dtype, name="norm1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.bottleneck_channels,
            (3, 3),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = _Norm(self.norm, self.dtype, name="norm2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = _Norm(self.norm, self.dtype, name="norm3")(y, train)
        return nn.relu(y + shortcut)


class ResNetBackbone(nn.Module):
    depth: int = 101
    norm: str = "BN"
    out_features: Sequence[str] = ("res4",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="stem_conv"
        )(x)
        x = _Norm(self.norm, self.dtype, name="stem_norm")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        blocks = BLOCK_COUNTS[self.depth]
        feats = {}
        out_ch = 256
        bottleneck_ch = 64
        deepest = max(int(f[3]) for f in self.out_features)
        for stage, n_blocks in enumerate(blocks, start=2):
            if stage > deepest:
                break
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 2) else 1
                x = Bottleneck(
                    out_ch,
                    bottleneck_ch,
                    stride,
                    self.norm,
                    self.dtype,
                    name=f"res{stage}_block{b}",
                )(x, train)
            feats[f"res{stage}"] = x
            out_ch *= 2
            bottleneck_ch *= 2
        return feats

    @staticmethod
    def out_channels() -> Dict[str, int]:
        return {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}

    @staticmethod
    def out_strides() -> Dict[str, int]:
        return {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
