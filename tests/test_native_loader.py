"""Native image codec (native/imgcodec.cpp via data/native_codec.py).

The loader's host hot path — decode + detectron2-exact shortest-edge resize —
as one GIL-releasing C call per image, replacing the reference's PIL/cv2
work inside torch DataLoader worker processes
(/root/reference/daod/data/annotation_mapper.py via detectron2 read_image /
ResizeTransform). The contract everything below locks in: switching codecs
must be INVISIBLE — bit-equality with PIL for the decoders and the resample,
and batch-for-batch equality through DetectionLoader.
"""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from simple_sfod_tpu.data import native_codec as nc
from simple_sfod_tpu.data.loader import DetectionLoader

pytestmark = pytest.mark.skipif(
    not nc.available(), reason="native imgcodec unavailable (no libjpeg/libpng?)"
)


class TestResizeParity:
    def test_bit_exact_vs_pillow_bilinear(self):
        """The fixed-point two-pass resample reproduces Pillow BILINEAR
        byte-for-byte: downscale, upscale, mixed, identity-ish, degenerate
        aspect — the cases d2's ResizeShortestEdge actually produces."""
        rng = np.random.default_rng(0)
        cases = [
            (37, 53, 21, 30),     # downscale both
            (64, 64, 128, 96),    # upscale / mixed
            (600, 800, 600, 1066),  # the flagship cityscapes geometry
            (5, 7, 5, 7),         # no-op (memcpy path)
            (100, 3, 33, 9),      # extreme aspect
            (48, 64, 48, 80),     # horizontal-only
            (48, 64, 36, 64),     # vertical-only
        ]
        for h, w, nh, nw in cases:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ref = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
            out = nc.resize_bilinear(img, nh, nw)
            assert out is not None
            np.testing.assert_array_equal(ref, out, err_msg=f"{(h, w, nh, nw)}")

    def test_single_channel(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (40, 30, 1), dtype=np.uint8)
        ref = np.asarray(
            Image.fromarray(img[:, :, 0]).resize((17, 23), Image.BILINEAR)
        )
        out = nc.resize_bilinear(img, 23, 17)
        np.testing.assert_array_equal(ref, out[:, :, 0])


class TestDecodeParity:
    def test_jpeg_exact(self, tmp_path):
        """libjpeg with PIL-default settings (ISLOW DCT, fancy upsampling)
        decodes byte-identically to PIL — both drive the same library."""
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        for quality in (70, 90, 95):
            p = tmp_path / f"q{quality}.jpg"
            Image.fromarray(img).save(p, quality=quality)
            with Image.open(p) as im:
                ref = np.asarray(im.convert("RGB"), np.uint8)
            out = nc.decode(os.fspath(p))
            assert out is not None
            np.testing.assert_array_equal(ref, out)

    def test_png_modes_exact(self, tmp_path):
        """PNG color types map to PIL convert('RGB') semantics: palette and
        gray expand, alpha drops (no compositing), 16-bit narrows."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
        for mode in ("RGB", "L", "P", "RGBA", "LA"):
            p = tmp_path / f"m_{mode}.png"
            Image.fromarray(img).convert(mode).save(p)
            with Image.open(p) as im:
                ref = np.asarray(im.convert("RGB"), np.uint8)
            out = nc.decode(os.fspath(p))
            assert out is not None, mode
            np.testing.assert_array_equal(ref, out, err_msg=mode)

    def test_failure_paths_return_none(self, tmp_path):
        """Missing / truncated / unknown-format files fall back (None), never
        raise: the loader must keep its PIL fallback reachable."""
        assert nc.decode(os.fspath(tmp_path / "missing.jpg")) is None
        p = tmp_path / "garbage.jpg"
        p.write_bytes(b"\xff\xd8\xffgarbage")
        assert nc.decode(os.fspath(p)) is None
        p2 = tmp_path / "notimage.png"
        p2.write_bytes(b"hello world, not a png")
        assert nc.decode(os.fspath(p2)) is None


def _records(tmp_path, n=4):
    rng = np.random.default_rng(4)
    recs = []
    for i in range(n):
        h, w = int(rng.integers(40, 90)), int(rng.integers(50, 110))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.png"  # lossless: both paths decode identically
        Image.fromarray(img).save(p)
        recs.append(
            {
                "file_name": os.fspath(p),
                "image_id": i,
                "height": h,
                "width": w,
                "boxes": [[5.0, 5.0, float(w // 2), float(h // 2)]],
                "classes": [i % 3],
            }
        )
    return recs


class TestLoaderIntegration:
    def test_native_path_equals_pil_path(self, tmp_path, monkeypatch):
        """DetectionLoader batches are bit-identical whether images flow
        through the native one-C-call path (threaded) or the PIL fallback —
        every field: canvas pixels, sizes, scales, scaled GT."""
        recs = _records(tmp_path)
        kw = dict(
            batch_size=4, canvas_hw=(96, 128), min_size=64, max_size=120,
            gt_capacity=8, training=False, prefetch=0,
        )
        native = next(iter(DetectionLoader(recs, decode_threads=3, **kw)))

        monkeypatch.setattr(nc, "decode", lambda path: None)  # force PIL
        pil = next(iter(DetectionLoader(recs, decode_threads=1, **kw)))

        assert set(native) == set(pil)
        for k in native:
            np.testing.assert_array_equal(native[k], pil[k], err_msg=k)

    def test_resize_fallback_when_native_resize_unavailable(self, tmp_path, monkeypatch):
        """If decode succeeds but the native resize refuses (None), the
        prep falls through to PIL for the whole record — no mixed pipeline."""
        recs = _records(tmp_path, n=2)
        kw = dict(
            batch_size=2, canvas_hw=(96, 128), min_size=64, max_size=120,
            gt_capacity=8, training=False, prefetch=0,
        )
        monkeypatch.setattr(nc, "resize_bilinear", lambda img, nh, nw: None)
        broken = next(iter(DetectionLoader(recs, decode_threads=1, **kw)))
        monkeypatch.setattr(nc, "decode", lambda path: None)
        pil = next(iter(DetectionLoader(recs, decode_threads=1, **kw)))
        for k in pil:
            np.testing.assert_array_equal(broken[k], pil[k], err_msg=k)


class TestResizeParityFuzz:
    def test_random_geometries_bit_exact(self):
        """Property check over random (h, w) -> (nh, nw) pairs, including
        the d2_output_shape geometries real datasets produce: every byte
        equals Pillow BILINEAR."""
        from simple_sfod_tpu.data.loader import d2_output_shape

        rng = np.random.default_rng(7)
        for i in range(25):
            h = int(rng.integers(4, 200))
            w = int(rng.integers(4, 200))
            if i % 2:
                nh, nw = d2_output_shape(h, w, int(rng.integers(8, 160)), 300)
            else:
                nh = int(rng.integers(4, 220))
                nw = int(rng.integers(4, 220))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ref = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
            out = nc.resize_bilinear(img, nh, nw)
            assert out is not None
            np.testing.assert_array_equal(ref, out, err_msg=f"{(h, w, nh, nw)}")
