"""AdaIN style transfer (the reference's style-enhancement module,
daod/modeling/style_transfer/{net.py, style.py}: VGG-normalised encoder up to
relu4_1, mirrored decoder, adaptive instance normalisation :100-124, optional
CORAL colour alignment via SVD :48-71). Enabled by cfg.STYLE.*: target images
are pushed toward a fog style image before the student sees them
(source_free_adaptive_teacher.py:346-350).

TPU notes: encoder/decoder are plain conv stacks (MXU); AdaIN is two moment
normalisations (VPU); CORAL's SVD maps to jnp.linalg.svd. The whole
`stylize` call is jittable and composes into the adaptation step."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class StyleEncoder(nn.Module):
    """VGG19-normalised encoder through relu4_1 (net.py `net_vgg` prefix).
    Input: RGB [B, H, W, 3] in 0..1 (the AdaIN convention)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # The torch "vgg_normalised" starts with a 1x1 conv that folds the
        # RGB preprocessing, then reflection-padded 3x3 convs.
        x = nn.Conv(3, (1, 1), dtype=self.dtype, name="pre")(x)
        plan = [(64, 2), (128, 2), (256, 4), (512, 1)]
        for stage, (width, n) in enumerate(plan):
            for i in range(n):
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                x = nn.Conv(
                    width, (3, 3), padding="VALID", dtype=self.dtype,
                    name=f"conv{stage}_{i}",
                )(x)
                x = nn.relu(x)
            if stage < len(plan) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x  # relu4_1, stride 8, 512ch


class StyleDecoder(nn.Module):
    """Mirror decoder (net.py `net_decoder`): upsample x2 between stages."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        plan = [(256, 1, True), (256, 3, False), (128, 1, True), (128, 1, False),
                (64, 1, True), (64, 1, False)]
        for i, (width, n, upsample_after) in enumerate(plan):
            for j in range(n):
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                x = nn.Conv(width, (3, 3), padding="VALID", dtype=self.dtype,
                            name=f"conv{i}_{j}")(x)
                x = nn.relu(x)
            if upsample_after:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(3, (3, 3), padding="VALID", dtype=self.dtype, name="out")(x)


def adaptive_instance_normalization(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Normalise content feature moments to the style's (style.py:100-124).
    content/style: [B, H, W, C] (per-sample, per-channel moments). ddof=1
    matches the reference's torch `.var(dim=2)` (unbiased, style.py:57) —
    torch-differential-tested in tests/test_style.py."""
    eps = 1e-5
    c_mean = jnp.mean(content, axis=(1, 2), keepdims=True)
    c_std = jnp.sqrt(jnp.var(content, axis=(1, 2), keepdims=True, ddof=1) + eps)
    s_mean = jnp.mean(style, axis=(1, 2), keepdims=True)
    s_std = jnp.sqrt(jnp.var(style, axis=(1, 2), keepdims=True, ddof=1) + eps)
    return (content - c_mean) / c_std * s_std + s_mean


def coral(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Colour-distribution alignment (style.py `coral` :48-71): whiten the
    source's 3xN pixel matrix and recolour with the target's covariance.
    source/target: [H, W, 3] in 0..1."""
    def flat(img):
        x = img.reshape(-1, 3).T  # [3, N]
        mean = jnp.mean(x, axis=1, keepdims=True)
        # ddof=1: the reference's torch `.std` is unbiased (style.py:69),
        # same discipline as adaptive_instance_normalization above
        std = jnp.std(x, axis=1, keepdims=True, ddof=1) + 1e-8
        norm = (x - mean) / std
        cov = norm @ norm.T + jnp.eye(3)
        return x, mean, std, norm, cov

    xs, ms, ss, ns, cs = flat(source)
    xt, mt, st, nt, ct = flat(target)
    # inverse sqrt via SVD (torch.svd in the reference)
    us, ds, _ = jnp.linalg.svd(cs)
    ut, dt, _ = jnp.linalg.svd(ct)
    whiten = us @ jnp.diag(ds ** -0.5) @ us.T
    recolor = ut @ jnp.diag(dt ** 0.5) @ ut.T
    out = recolor @ (whiten @ ns)
    out = out * st + mt
    return jnp.clip(out.T.reshape(source.shape), 0.0, 1.0)


class StyleTransfer:
    """Bound encoder/decoder + a fixed style image; `stylize` is jittable.

    alpha defaults to the reference constructor's 0.4 (style.py:15): the
    stylized features are a 40% blend, not a full replacement
    (style.py:124 `feat = feat * alpha + content_f * (1 - alpha)`).

    DOCUMENTED DEVIATION — value range: the reference feeds raw 0..255
    stored-channel tensors into the pretrained AdaIN encoder and pushes the
    decoder's ~0..1-range output straight back into the 0..255 detector
    pipeline (sfat.py:350, style.py:123-124 — no scaling anywhere). The
    published pytorch-AdaIN weights' contract is ToTensor [0,1] input, so
    the reference's usage overdrives the encoder 255x and then darkens the
    student view ~255x. This implementation normalizes to [0,1] for the
    enc/dec and rescales the output to 0..255, preserving the AdaIN
    semantics the pretrained weights were trained for."""

    def __init__(self, encoder_vars, decoder_vars, style_image: jnp.ndarray, alpha: float = 0.4, use_coral: bool = True):
        self.encoder = StyleEncoder()
        self.decoder = StyleDecoder()
        self.encoder_vars = encoder_vars
        self.decoder_vars = decoder_vars
        self.style_image = style_image  # [Hs, Ws, 3] in 0..1 RGB
        self.alpha = alpha
        self.use_coral = use_coral

    @staticmethod
    def init(rng, style_image, alpha: float = 0.4, use_coral: bool = True):
        enc = StyleEncoder()
        dec = StyleDecoder()
        dummy = jnp.zeros((1, 64, 64, 3))
        ev = enc.init(rng, dummy)
        feat = enc.apply(ev, dummy)
        dv = dec.init(rng, feat)
        return StyleTransfer(ev, dv, style_image, alpha=alpha, use_coral=use_coral)

    def stylize(self, content: jnp.ndarray) -> jnp.ndarray:
        """content: [B, H, W, 3] 0..255 -> stylised same shape/range."""
        x = content / 255.0
        style = self.style_image
        if self.use_coral:
            style = jax.vmap(lambda c: coral(style, c))(x)
        else:
            style = jnp.broadcast_to(style[None], (x.shape[0],) + style.shape)
        # match style spatial dims to content for encoding
        style = jax.image.resize(style, x.shape, "bilinear")
        f_c = self.encoder.apply(self.encoder_vars, x)
        f_s = self.encoder.apply(self.encoder_vars, style)
        feat = adaptive_instance_normalization(f_c, f_s)
        feat = self.alpha * feat + (1 - self.alpha) * f_c
        out = self.decoder.apply(self.decoder_vars, feat)
        return jnp.clip(out, 0.0, 1.0) * 255.0
