"""AdaIN style transfer: moment matching, CORAL, shapes, weight import."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.models.style_transfer import (
    StyleTransfer,
    adaptive_instance_normalization,
    coral,
)


class TestAdaIN:
    def test_moments_match_style(self):
        rs = np.random.RandomState(0)
        c = jnp.asarray(rs.randn(1, 8, 8, 4), jnp.float32)
        s = jnp.asarray(2.0 + 3.0 * rs.randn(1, 8, 8, 4), jnp.float32)
        out = adaptive_instance_normalization(c, s)
        np.testing.assert_allclose(
            np.asarray(out.mean(axis=(1, 2))), np.asarray(s.mean(axis=(1, 2))), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.std(axis=(1, 2))), np.asarray(s.std(axis=(1, 2))), rtol=1e-3
        )


class TestCoral:
    def test_output_matches_target_stats(self):
        rs = np.random.RandomState(1)
        src = jnp.asarray(rs.rand(16, 16, 3), jnp.float32)
        tgt = jnp.asarray(np.clip(0.5 + 0.1 * rs.randn(16, 16, 3), 0, 1), jnp.float32)
        out = coral(src, tgt)
        assert out.shape == src.shape
        # means move toward the target's channel means
        np.testing.assert_allclose(
            np.asarray(out.reshape(-1, 3).mean(0)),
            np.asarray(tgt.reshape(-1, 3).mean(0)),
            atol=0.05,
        )


class TestStyleTransfer:
    def test_stylize_shapes(self):
        style_img = jnp.full((32, 32, 3), 0.5)
        st = StyleTransfer.init(jax.random.key(0), style_img)
        st.use_coral = False
        content = jnp.asarray(
            np.random.RandomState(2).uniform(0, 255, (1, 64, 64, 3)), jnp.float32
        )
        out = jax.jit(st.stylize)(content)
        assert out.shape == content.shape
        assert float(out.min()) >= 0 and float(out.max()) <= 255


class TestAdainImport:
    def test_key_mapping_covers_all_convs(self):
        from simple_sfod_tpu.checkpoint.torch_import import (
            _ADAIN_DEC_CONVS,
            _ADAIN_DEC_NAMES,
            _ADAIN_VGG_CONVS,
            _ADAIN_VGG_NAMES,
            import_adain_decoder,
            import_adain_encoder,
        )
        from simple_sfod_tpu.models.style_transfer import StyleDecoder, StyleEncoder

        rs = np.random.RandomState(3)
        enc_widths = [3, 64, 64, 128, 128, 256, 256, 256, 256, 512]
        in_c = 3
        sd = {}
        for idx, w in zip(_ADAIN_VGG_CONVS, enc_widths):
            k = 1 if idx == 0 else 3
            sd[f"{idx}.weight"] = rs.randn(w, in_c, k, k).astype(np.float32)
            sd[f"{idx}.bias"] = rs.randn(w).astype(np.float32)
            in_c = w
        params = import_adain_encoder(sd)
        # must exactly match the flax module's parameter tree structure
        ref = StyleEncoder().init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
        assert set(params) == set(ref)
        for name in ref:
            assert params[name]["kernel"].shape == ref[name]["kernel"].shape, name

        dec_widths = [256, 256, 256, 256, 128, 128, 64, 64, 3]
        in_c = 512
        sd = {}
        for idx, w in zip(_ADAIN_DEC_CONVS, dec_widths):
            sd[f"{idx}.weight"] = rs.randn(w, in_c, 3, 3).astype(np.float32)
            sd[f"{idx}.bias"] = rs.randn(w).astype(np.float32)
            in_c = w
        params = import_adain_decoder(sd)
        ref = StyleDecoder().init(jax.random.key(0), jnp.zeros((1, 4, 4, 512)))["params"]
        assert set(params) == set(ref)
        for name in ref:
            assert params[name]["kernel"].shape == ref[name]["kernel"].shape, name


class TestAdainTorchDifferential:
    """Transplant RANDOM torch weights through import_adain_* and assert
    forward parity against a torch replica of the reference nets
    (net.py:6-35 decoder, :38-69 vgg through relu4_1) — closes the
    silent-wrong-mapping failure mode (a bad key/layout mapping would still
    "work" via the random-init fallback in the SFAT trainer)."""

    @staticmethod
    def _torch_nets():
        import torch.nn as nn

        # the reference's vgg, truncated at relu4_1 (net.py:38-69 modules
        # [0:31]) — Sequential indices are the checkpoint key contract
        vgg = nn.Sequential(
            nn.Conv2d(3, 3, 1),
            nn.ReflectionPad2d(1), nn.Conv2d(3, 64, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(64, 64, 3), nn.ReLU(),
            nn.MaxPool2d(2, 2, ceil_mode=True),
            nn.ReflectionPad2d(1), nn.Conv2d(64, 128, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(128, 128, 3), nn.ReLU(),
            nn.MaxPool2d(2, 2, ceil_mode=True),
            nn.ReflectionPad2d(1), nn.Conv2d(128, 256, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 256, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 256, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 256, 3), nn.ReLU(),
            nn.MaxPool2d(2, 2, ceil_mode=True),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 512, 3), nn.ReLU(),
        )
        decoder = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(512, 256, 3), nn.ReLU(),
            nn.Upsample(scale_factor=2, mode="nearest"),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 256, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 256, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 256, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(256, 128, 3), nn.ReLU(),
            nn.Upsample(scale_factor=2, mode="nearest"),
            nn.ReflectionPad2d(1), nn.Conv2d(128, 128, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(128, 64, 3), nn.ReLU(),
            nn.Upsample(scale_factor=2, mode="nearest"),
            nn.ReflectionPad2d(1), nn.Conv2d(64, 64, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(64, 3, 3),
        )
        return vgg, decoder

    def test_stylize_matches_torch(self):
        import torch
        import torch.nn.functional as F

        from simple_sfod_tpu.checkpoint.torch_import import (
            import_adain_decoder,
            import_adain_encoder,
        )
        from simple_sfod_tpu.models.style_transfer import StyleTransfer

        torch.manual_seed(7)
        vgg, dec = self._torch_nets()
        enc_params = import_adain_encoder(
            {k: v.numpy() for k, v in vgg.state_dict().items()}
        )
        dec_params = import_adain_decoder(
            {k: v.numpy() for k, v in dec.state_dict().items()}
        )

        rs = np.random.RandomState(4)
        content = rs.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
        # style image at content size so stylize()'s resize is the identity
        style_img = rs.uniform(0, 1, (32, 32, 3)).astype(np.float32)

        st = StyleTransfer(
            {"params": enc_params}, {"params": dec_params},
            jnp.asarray(style_img), alpha=1.0, use_coral=False,
        )
        out_j = np.asarray(jax.jit(st.stylize)(jnp.asarray(content)))

        # the production default is the reference ctor's alpha=0.4 blend
        # (style.py:15,124): check it against the same torch transcription
        st04 = StyleTransfer(
            {"params": enc_params}, {"params": dec_params},
            jnp.asarray(style_img), use_coral=False,
        )
        assert st04.alpha == 0.4
        out_j04 = np.asarray(jax.jit(st04.stylize)(jnp.asarray(content)))

        # torch transcription of StyleTransfer.style_transfer (style.py:100-137
        # with alpha=1): encode both, AdaIN (unbiased var, :57), decode
        def to_t(x_nhwc):
            return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))

        with torch.no_grad():
            f_c = vgg(to_t(content / 255.0))
            f_s = vgg(to_t(np.broadcast_to(style_img[None], content.shape)))
            n, c = f_c.shape[:2]
            cm = f_c.reshape(n, c, -1).mean(2).view(n, c, 1, 1)
            cs = (f_c.reshape(n, c, -1).var(2) + 1e-5).sqrt().view(n, c, 1, 1)
            sm = f_s.reshape(n, c, -1).mean(2).view(n, c, 1, 1)
            ss = (f_s.reshape(n, c, -1).var(2) + 1e-5).sqrt().view(n, c, 1, 1)
            adain = (f_c - cm) / cs * ss + sm
            out_t = dec(adain)
            out_t04 = dec(0.4 * adain + 0.6 * f_c)
        out_t = np.clip(out_t.numpy().transpose(0, 2, 3, 1), 0.0, 1.0) * 255.0
        out_t04 = np.clip(out_t04.numpy().transpose(0, 2, 3, 1), 0.0, 1.0) * 255.0

        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=5e-3)
        np.testing.assert_allclose(out_j04, out_t04, rtol=1e-4, atol=5e-3)

    def test_encoder_matches_torch(self):
        import torch

        from simple_sfod_tpu.checkpoint.torch_import import import_adain_encoder
        from simple_sfod_tpu.models.style_transfer import StyleEncoder

        torch.manual_seed(8)
        vgg, _ = self._torch_nets()
        params = import_adain_encoder({k: v.numpy() for k, v in vgg.state_dict().items()})
        x = np.random.RandomState(5).uniform(0, 1, (1, 16, 24, 3)).astype(np.float32)
        f_j = np.asarray(StyleEncoder().apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            f_t = vgg(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        np.testing.assert_allclose(
            f_j, f_t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
        )
