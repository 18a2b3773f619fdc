"""VGG-16 backbone (optionally with BatchNorm), NHWC, 5 pooled stages.

Re-design of the reference's torch VGG backbone
(/root/reference/daod/modeling/meta_arch/vgg.py:10-114): 13 3x3 convs in the
(2, 2, 3, 3, 3) stage layout, each stage ending in a 2x2/2 max-pool, so stage
outputs "vgg0".."vgg4" have channels (64, 128, 256, 512, 512) and strides
(2, 4, 8, 16, 32). The reference's RPN and ROI heads consume "vgg4"
(stride 32, after the fifth pool — its fixed module-index stage splits put the
last max-pool inside stage 4).

TPU notes: NHWC + bf16-capable compute dtype keeps `lax.conv` on the MXU with
no transposes; BatchNorm running stats live in the `batch_stats` collection so
AdaBN is just "reset collection, run forwards with mutable batch_stats".
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

STAGE_PLAN: Sequence[Sequence[int]] = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool as a reshape + max.

    Identical to nn.max_pool for even spatial dims, but its gradient lowers
    to a cheap one-hot select instead of XLA's SelectAndScatter — which is a
    large share of the conv-net backward cost on TPU. Falls back to the
    window reduction for odd dims (never hit with the standard canvases)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        return nn.max_pool(x, (2, 2), strides=(2, 2))
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


class VGG16Backbone(nn.Module):
    bn: bool = True
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9  # torch BatchNorm2d momentum 0.1 == decay 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """x: [B, H, W, 3] -> {'vgg0': ..., ..., 'vgg4': ...} (NHWC).

        `train` controls BatchNorm: True uses batch statistics (and updates
        the mutable `batch_stats` collection when requested), False uses the
        running averages.
        """
        x = x.astype(self.dtype)
        feats = {}
        conv_i = 0
        for stage_idx, widths in enumerate(STAGE_PLAN):
            for width in widths:
                x = nn.Conv(
                    width,
                    (3, 3),
                    padding=1,
                    use_bias=True,
                    dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                if self.bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=self.bn_momentum,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        name=f"bn{conv_i}",
                    )(x)
                x = nn.relu(x)
                conv_i += 1
            x = max_pool_2x2(x)
            feats[f"vgg{stage_idx}"] = x
        return feats

    @staticmethod
    def out_channels() -> Dict[str, int]:
        return {f"vgg{i}": plan[-1] for i, plan in enumerate(STAGE_PLAN)}

    @staticmethod
    def out_strides() -> Dict[str, int]:
        return {f"vgg{i}": 2 ** (i + 1) for i in range(len(STAGE_PLAN))}
