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
