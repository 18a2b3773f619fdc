"""Domain discriminators + gradient reversal (the reference's
daod/modeling/dann/dann.py, re-built in flax/JAX).

GradientScalarLayer (torch.autograd.Function, dann.py:33-50) becomes a
`jax.custom_vjp` identity-with-scaled-gradient; the convention matches the
call sites: gradient_scalar(x, -alpha) reverses gradients for adversarial
training."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_vjp
def gradient_scalar(x, alpha: float = 1.0):
    return x


def _gs_fwd(x, alpha):
    return x, alpha


def _gs_bwd(alpha, g):
    return (g * alpha, None)


gradient_scalar.defvjp(_gs_fwd, _gs_bwd)


class FCDiscriminatorImg(nn.Module):
    """Image-level discriminator (dann.py:10-30): three 3x3 convs + 1-channel
    classifier, LeakyReLU(0.2). Used by the adaptive-teacher meta-archs."""

    ndf1: int = 256
    ndf2: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x = lrelu(nn.Conv(self.ndf1, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x))
        x = lrelu(nn.Conv(self.ndf2, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x))
        x = lrelu(nn.Conv(self.ndf2, (3, 3), padding=1, dtype=self.dtype, name="conv3")(x))
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="classifier")(x).astype(
            jnp.float32
        )


class DAImgHead(nn.Module):
    """DA-Faster image-level head (dann.py:54-94): 1x1 conv 512 -> relu ->
    1x1 conv 1, per feature level."""

    dtype: Any = jnp.float32
    init_std: float = 0.001

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.normal(self.init_std)
        t = nn.Conv(512, (1, 1), kernel_init=init, dtype=self.dtype, name="conv1")(x)
        t = nn.relu(t)
        return nn.Conv(1, (1, 1), kernel_init=init, dtype=self.dtype, name="conv2")(t).astype(
            jnp.float32
        )


class DAInsHead(nn.Module):
    """DA-Faster instance-level head (dann.py:97-155): fc 1024 -> dropout ->
    fc 1024 -> dropout -> fc 1. Input: flattened pooled ROI features."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        init = nn.initializers.normal(0.01)
        x = nn.relu(nn.Dense(1024, kernel_init=init, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(1024, kernel_init=init, dtype=self.dtype, name="fc2")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(1, kernel_init=init, dtype=self.dtype, name="fc3")(x).astype(jnp.float32)
