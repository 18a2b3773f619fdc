"""Torchvision/PIL-exact differential for the on-device strong augmentation.

The reference composes torchvision transforms over a PIL image
(detection_utils.py:7-37); torchvision's PIL backend ops are thin wrappers
over PIL primitives (ImageEnhance, convert("L"/"HSV"), ImageFilter). The
oracles below are deliberate PIL/numpy TRANSCRIPTIONS of those semantics
(torchvision itself is not installed in this image) — test-only, used as
differential references like tests/torch_mirror.py.

Channel-order contract: the reference wraps its BGR array as an "RGB" PIL
image (two_crop_augmentation_mapper.py:145), so PIL luma/HSV run with R and B
swapped. data/transforms.py reproduces the ops on channels AS STORED; these
tests feed the same raw arrays to both sides, which is exactly the reference
configuration.

Factors are INJECTED identically on both sides; randomness enters only where
the test transcribes the jax draw stream to drive the oracle (erasing).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageEnhance, ImageFilter

from simple_sfod_tpu.data import transforms as T


def _img_u8(seed=0, h=48, w=72):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def _pil(arr):
    return Image.fromarray(arr, "RGB")  # mislabeled-BGR, like the reference


# ---------------------------------------------------------------------------
# PIL transcriptions of torchvision _functional_pil
# ---------------------------------------------------------------------------


def pil_brightness(im, f):
    return ImageEnhance.Brightness(im).enhance(f)


def pil_contrast(im, f):
    return ImageEnhance.Contrast(im).enhance(f)


def pil_saturation(im, f):
    return ImageEnhance.Color(im).enhance(f)


def pil_hue(im, f):
    h, s, v = im.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    with np.errstate(over="ignore"):
        # numpy-2-safe spelling of torchvision's `np_h += np.uint8(f * 255)`
        # (C-cast truncation + wrap)
        np_h += np.uint8(int(np.trunc(f * 255)) % 256)
    return Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)).convert("RGB")


def pil_gray3(im):
    return im.convert("L").convert("RGB")


class TestOpByOp:
    """Each op with the same injected factor on both sides."""

    @pytest.mark.parametrize("f", [0.6, 1.0, 1.4])
    def test_brightness(self, f):
        a = _img_u8(1)
        want = np.asarray(pil_brightness(_pil(a), f), np.float32)
        got = np.asarray(T._pil_u8(T.adjust_brightness(jnp.asarray(a, jnp.float32), f)))
        assert np.abs(got - want).max() <= 1.0

    @pytest.mark.parametrize("f", [0.6, 1.0, 1.4])
    def test_contrast(self, f):
        a = _img_u8(2)
        want = np.asarray(pil_contrast(_pil(a), f), np.float32)
        got = np.asarray(T._pil_u8(T.adjust_contrast(jnp.asarray(a, jnp.float32), f)))
        assert np.abs(got - want).max() <= 1.0

    @pytest.mark.parametrize("f", [0.6, 1.0, 1.4])
    def test_contrast_padded_canvas_scoped_by_true_hw(self, f):
        """The reference enhances the UNPADDED image; on a padded canvas the
        content crop must match PIL contrast of the content alone, and the
        padding must stay exactly zero (it feeds the backbone)."""
        a = _img_u8(7, h=24, w=36)
        canvas = np.zeros((48, 72, 3), np.float32)
        canvas[:24, :36] = a
        want = np.asarray(pil_contrast(_pil(a), f), np.float32)
        got = np.asarray(
            T._pil_u8(
                T.adjust_contrast(
                    jnp.asarray(canvas), f, true_hw=jnp.asarray([24, 36])
                )
            )
        )
        assert np.abs(got[:24, :36] - want).max() <= 1.0
        assert got[24:].max() == 0.0 and got[:, 36:].max() == 0.0

    @pytest.mark.parametrize("f", [0.6, 1.0, 1.4])
    def test_saturation(self, f):
        a = _img_u8(3)
        want = np.asarray(pil_saturation(_pil(a), f), np.float32)
        got = np.asarray(T._pil_u8(T.adjust_saturation(jnp.asarray(a, jnp.float32), f)))
        assert np.abs(got - want).max() <= 1.0

    @pytest.mark.parametrize("d", [-0.1, 0.05, 0.1])
    def test_hue_within_pil_quantization(self, d):
        """Continuous HSV vs PIL's uint8 H-plane: bounded by the 256-level hue
        quantization (measured mean ~1.5/255; the pre-fix YIQ rotation sat at
        mean ~17/255, max ~97)."""
        a = _img_u8(4)
        want = np.asarray(pil_hue(_pil(a), d), np.float32)
        got = np.asarray(T.adjust_hue(jnp.asarray(a, jnp.float32), d))
        err = np.abs(got - want)
        assert err.mean() < 2.5 and err.max() < 25.0, (err.mean(), err.max())

    def test_hue_identity_and_luma_swap_semantics(self):
        a = _img_u8(5)
        got = np.asarray(T.adjust_hue(jnp.asarray(a, jnp.float32), 0.0))
        np.testing.assert_allclose(got, a.astype(np.float32), atol=1e-3)
        # grayscale weights act on channels as stored: channel 0 gets 0.299
        mono = np.zeros((2, 2, 3), np.float32)
        mono[..., 0] = 200.0
        g = np.asarray(T.to_grayscale(jnp.asarray(mono)))
        assert abs(g[0, 0, 0] - np.floor(200 * 0.299 + 0.5)) <= 1e-5

    def test_grayscale(self):
        a = _img_u8(6)
        want = np.asarray(pil_gray3(_pil(a)), np.float32)
        got = np.asarray(T.to_grayscale(jnp.asarray(a, jnp.float32)))
        assert np.abs(got - want).max() <= 1.0


class TestColorJitterComposition:
    def test_same_factors_same_order(self):
        """Replay color_jitter's own factor/permutation draws through the PIL
        transcription: the full 4-op composition must agree to a few LSBs
        (each PIL stage quantizes; our _pil_u8 mirrors it)."""
        a = _img_u8(7)
        rng = jax.random.key(42)
        keys = jax.random.split(rng, 5)
        fb = float(jax.random.uniform(keys[0], (), minval=0.6, maxval=1.4))
        fc = float(jax.random.uniform(keys[1], (), minval=0.6, maxval=1.4))
        fs = float(jax.random.uniform(keys[2], (), minval=0.6, maxval=1.4))
        fh = float(jax.random.uniform(keys[3], (), minval=-0.1, maxval=0.1))
        perm = [int(i) for i in jax.random.permutation(keys[4], 4)]

        im = _pil(a)
        ops = [
            lambda x: pil_brightness(x, fb),
            lambda x: pil_contrast(x, fc),
            lambda x: pil_saturation(x, fs),
            lambda x: pil_hue(x, fh),
        ]
        for i in perm:
            im = ops[i](im)
        want = np.asarray(im, np.float32)

        got = np.asarray(T.color_jitter(rng, jnp.asarray(a, jnp.float32)))
        err = np.abs(got - want)
        # hue contributes its quantization bound once; the other stages ~1 LSB
        assert err.mean() < 3.0 and np.quantile(err, 0.99) < 12.0, (
            err.mean(), err.max())


class TestGaussianBlur:
    def test_interior_matches_pil_at_truncation_floor(self):
        """k=9 truncation at sigma=2 sits at Pillow's own box-blur
        approximation floor: interior error vs PIL is the same order whether
        we truncate at 9 or 25 taps."""
        a = _img_u8(8, 64, 96)
        im = jnp.asarray(a, jnp.float32)
        pb = np.asarray(_pil(a).filter(ImageFilter.GaussianBlur(radius=2.0)), np.float32)
        m = 14
        e9 = np.abs(np.asarray(T.gaussian_blur(im, 2.0, kernel_size=9)) - pb)[m:-m, m:-m]
        e25 = np.abs(np.asarray(T.gaussian_blur(im, 2.0, kernel_size=25)) - pb)[m:-m, m:-m]
        assert e9.mean() < 1.5 and e25.mean() < 1.5
        assert e9.mean() < 2.5 * max(e25.mean(), 0.3)  # truncation ~ at the floor

    def test_edges_renormalized_not_darkened(self):
        """Zero-pad convolution darkened borders by up to ~100/255 before the
        renormalization fix; vs PIL's edge extension the renormalized blur
        stays within a few LSBs even on the border band."""
        a = _img_u8(9, 64, 96)
        im = jnp.asarray(a, jnp.float32)
        for s in (0.5, 1.0, 2.0):
            pb = np.asarray(_pil(a).filter(ImageFilter.GaussianBlur(radius=s)), np.float32)
            got = np.asarray(T.gaussian_blur(im, s, kernel_size=9))
            err = np.abs(got - pb)
            assert err.mean() < 2.0, (s, err.mean())
            assert err.max() < 30.0, (s, err.max())

    def test_true_hw_scopes_blur_to_content(self):
        """With true_hw, the content region blurs as if unpadded (edge
        renormalization at the content boundary) and padding stays zero."""
        h, w, ch, cw = 32, 48, 20, 30
        content = _img_u8(10, ch, cw)
        canvas = np.zeros((h, w, 3), np.uint8)
        canvas[:ch, :cw] = content
        got = np.asarray(
            T.gaussian_blur(
                jnp.asarray(canvas, jnp.float32), 2.0, true_hw=jnp.asarray([ch, cw])
            )
        )
        # padding untouched
        assert (got[ch:] == 0).all() and (got[:, cw:] == 0).all()
        # content blurs like the standalone content image
        alone = np.asarray(T.gaussian_blur(jnp.asarray(content, jnp.float32), 2.0))
        np.testing.assert_allclose(got[:ch, :cw], alone, atol=1e-3)


def _torch_erasing_geometry(target, aspect, u_i, u_j, H, W):
    """numpy transcription of torchvision RandomErasing.get_params: first of
    10 attempts with round()-sized sides strictly inside the image wins."""
    for t, a in zip(target, aspect):
        eh = int(round(np.sqrt(t * a)))
        ew = int(round(np.sqrt(t / a)))
        if eh < H and ew < W:
            i = int(np.floor(u_i * (H - eh + 1)))
            j = int(np.floor(u_j * (W - ew + 1)))
            return i, j, eh, ew
    return None


class TestRandomErasing:
    def _replay(self, key, scale, ratio, th, tw):
        """Replicate random_erasing's internal draw stream (key split + the
        uniform laws) and run the torch transcription on those draws."""
        keys = jax.random.split(key, 5)
        area = float(th * tw)
        target = np.asarray(
            jax.random.uniform(keys[0], (10,), minval=scale[0], maxval=scale[1])
        ) * area
        aspect = np.exp(
            np.asarray(
                jax.random.uniform(
                    keys[1], (10,), minval=np.log(ratio[0]), maxval=np.log(ratio[1])
                )
            )
        )
        u_i = float(jax.random.uniform(keys[2], ()))
        u_j = float(jax.random.uniform(keys[3], ()))
        return _torch_erasing_geometry(target, aspect, u_i, u_j, th, tw)

    @pytest.mark.parametrize("case", range(3))
    def test_geometry_matches_torch_transcription(self, case):
        p, scale, ratio = T._ERASE_PARAMS[case]
        h, w = 40, 64
        img = jnp.zeros((h, w, 3), jnp.float32)
        noise = jnp.ones((h, w, 3), jnp.float32)
        hits = 0
        for s in range(40):
            key = jax.random.key(1000 * case + s)
            out = np.asarray(
                T.random_erasing(key, img, scale=scale, ratio=ratio, noise=noise)
            )
            rect = self._replay(key, scale, ratio, h, w)
            mask = out[..., 0] != 0
            if rect is None:
                assert not mask.any()
                continue
            i, j, eh, ew = rect
            want = np.zeros((h, w), bool)
            want[i:i + eh, j:j + ew] = True
            np.testing.assert_array_equal(mask, want)
            hits += 1
        assert hits > 0  # the law produced at least some valid rectangles

    def test_true_hw_keeps_rect_inside_content(self):
        h, w, ch, cw = 40, 64, 24, 30
        img = jnp.zeros((h, w, 3), jnp.float32)
        noise = jnp.ones((h, w, 3), jnp.float32)
        for s in range(20):
            out = np.asarray(
                T.random_erasing(
                    jax.random.key(s), img, noise=noise,
                    true_hw=jnp.asarray([ch, cw]),
                )
            )
            mask = out[..., 0] != 0
            assert not mask[ch:].any() and not mask[:, cw:].any()

    def test_all_attempts_fail_is_noop(self):
        """Tiny content with a huge requested area: every attempt's side
        reaches the bound, torchvision gives up — so must we."""
        img = jnp.full((32, 32, 3), 7.0)
        out = np.asarray(
            T.random_erasing(
                jax.random.key(0), img, scale=(0.9, 0.99), ratio=(1.0, 1.01),
                noise=jnp.zeros((32, 32, 3)), true_hw=jnp.asarray([4, 4]),
            )
        )
        np.testing.assert_array_equal(out, 7.0)

    def test_fill_is_topilimage_wrap(self):
        """The reference fill is N(0,1) on the [0,1] scale pushed through
        ToPILImage's `.mul(255).byte()` — truncation + uint8 WRAP (verified
        against torch: -433.5 -> 79). Our fill must reproduce that exact law,
        not a clamped gaussian."""
        torch = pytest.importorskip("torch")
        key = jax.random.key(3)
        n = np.asarray(jax.random.normal(key, (64, 64, 3)))
        want = torch.from_numpy(n).mul(255).byte().numpy().astype(np.float32)
        got = np.asarray(T._erasing_fill(key, (64, 64, 3)))
        np.testing.assert_array_equal(got, want)

    def test_strong_augment_emits_reference_range(self):
        img = jnp.asarray(_img_u8(11, 32, 48), jnp.float32)
        out = np.asarray(T.strong_augment(jax.random.key(5), img))
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert np.isfinite(out).all()
