"""Tiny 2-conv stem backbone for multi-chip dryrun / CI graphs.

Not part of the reference surface. Its only job is to make the FULL
training graph (teacher inference + pseudo-labelling + student fwd/bwd +
gradient all-reduce) cheap enough that N virtual CPU devices — which execute
near-serially on a 1-core host — can all reach the collective inside
XLA-CPU's fixed ~40s rendezvous window. Structural contract matches
VGG16Backbone (models/backbones/vgg.py): named pooled stages, BatchNorm
running stats in the `batch_stats` collection (AdaBN-compatible), NHWC.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from .vgg import max_pool_2x2

WIDTH = 16
NUM_STAGES = 2


class TinyBackbone(nn.Module):
    bn: bool = True
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """x: [B, H, W, 3] -> {'tiny0': stride 2, 'tiny1': stride 4} (NHWC)."""
        x = x.astype(self.dtype)
        feats = {}
        for i in range(NUM_STAGES):
            x = nn.Conv(
                WIDTH, (3, 3), padding=1, use_bias=True, dtype=self.dtype, name=f"conv{i}"
            )(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn{i}",
                )(x)
            x = nn.relu(x)
            x = max_pool_2x2(x)
            feats[f"tiny{i}"] = x
        return feats

    @staticmethod
    def out_channels() -> Dict[str, int]:
        return {f"tiny{i}": WIDTH for i in range(NUM_STAGES)}

    @staticmethod
    def out_strides() -> Dict[str, int]:
        return {f"tiny{i}": 2 ** (i + 1) for i in range(NUM_STAGES)}
