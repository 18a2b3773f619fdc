"""Tests for the on-device augmentation stage and mosaic/mixup."""

import jax
import jax.numpy as jnp
import numpy as np

from simple_sfod_tpu.data import transforms as T
from simple_sfod_tpu.data.mosaic import mosaic_batch, mixup_batch
from simple_sfod_tpu.structures.instances import Instances


class TestGeometry:
    def test_resize_to_canvas(self):
        img = jnp.ones((100, 200, 3))
        canvas, size, scale = T.resize_to_canvas(img, (64, 128), 60)
        assert canvas.shape == (64, 128, 3)
        assert size.tolist() == [60, 120]
        np.testing.assert_allclose(np.asarray(scale), [0.6, 0.6])
        # valid region filled, padding zero
        assert float(canvas[:60, :120].min()) > 0
        assert float(canvas[:, 120:].max()) == 0.0

    def test_hflip_boxes_roundtrip(self):
        img = jnp.asarray(np.random.RandomState(0).rand(8, 16, 3))
        boxes = jnp.asarray([[2.0, 1.0, 5.0, 4.0]])
        w = jnp.asarray(12)  # true width < canvas width
        f_img, f_boxes = T.hflip(img, boxes, w)
        np.testing.assert_allclose(np.asarray(f_boxes), [[7.0, 1.0, 10.0, 4.0]])
        # double flip restores
        ff_img, ff_boxes = T.hflip(f_img, f_boxes, w)
        np.testing.assert_allclose(np.asarray(ff_boxes), np.asarray(boxes))
        np.testing.assert_allclose(
            np.asarray(ff_img[:, :12]), np.asarray(img[:, :12]), atol=1e-6
        )


class TestPhotometric:
    def test_strong_augment_shape_and_range(self):
        img = jnp.asarray(np.random.RandomState(1).uniform(0, 255, (32, 64, 3)), jnp.float32)
        out = T.strong_augment(jax.random.key(0), img)
        assert out.shape == img.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_grayscale_channels_equal(self):
        img = jnp.asarray(np.random.RandomState(2).uniform(0, 255, (8, 8, 3)), jnp.float32)
        g = T.to_grayscale(img)
        np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(g[..., 1]))

    def test_blur_preserves_constant(self):
        img = jnp.full((16, 16, 3), 100.0)
        out = T.gaussian_blur(img, jnp.asarray(1.5))
        np.testing.assert_allclose(np.asarray(out[4:12, 4:12]), 100.0, rtol=1e-5)

    def test_hue_identity_at_zero(self):
        img = jnp.asarray(np.random.RandomState(3).uniform(0, 255, (8, 8, 3)), jnp.float32)
        out = T.adjust_hue(img, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.5)


def _batched_instances(boxes, classes):
    n = boxes.shape[1]
    return Instances(
        boxes=jnp.asarray(boxes, jnp.float32),
        scores=jnp.ones(boxes.shape[:2], jnp.float32),
        classes=jnp.asarray(classes, jnp.int32),
        valid=jnp.ones(boxes.shape[:2], bool),
    )


class TestMosaicMixup:
    def test_mosaic_shapes_and_validity(self):
        b, h, w = 4, 32, 64
        images = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (b, h, w, 3)), jnp.float32)
        gt = _batched_instances(
            np.tile(np.asarray([[[4, 4, 20, 20]]], np.float32), (b, 1, 1)),
            np.zeros((b, 1), np.int32),
        )
        out, merged = mosaic_batch(jax.random.key(0), images, gt)
        assert out.shape == images.shape
        assert merged.boxes.shape == (b, 4, 4)
        # all surviving boxes lie inside the canvas
        bx = np.asarray(merged.boxes)[np.asarray(merged.valid)]
        if len(bx):
            assert bx[:, 0].min() >= 0 and bx[:, 2].max() <= w
            assert bx[:, 1].min() >= 0 and bx[:, 3].max() <= h

    def test_mixup_blend(self):
        images = jnp.stack([jnp.zeros((8, 8, 3)), jnp.full((8, 8, 3), 100.0)])
        gt = _batched_instances(
            np.asarray([[[1, 1, 3, 3]], [[2, 2, 5, 5]]], np.float32),
            np.asarray([[0], [1]], np.int32),
        )
        out, merged = mixup_batch(jax.random.key(0), images, gt)
        np.testing.assert_allclose(np.asarray(out[0]), 50.0)
        assert merged.boxes.shape == (2, 2, 4)
        assert merged.classes[0].tolist() == [0, 1]


class TestMosaicGeometry:
    def test_hand_computed_box_placement(self):
        """Pin the mosaic layout: with a known center, each tile shows the
        source's corner region facing the center, and boxes shift by the same
        inverse offset."""
        h, w = 32, 64
        # distinct constant images so tiles are identifiable
        images = jnp.stack([jnp.full((h, w, 3), float(v)) for v in (10, 20, 30, 40)])
        # one box per source at a known place
        boxes = np.zeros((4, 1, 4), np.float32)
        boxes[0, 0] = [50, 20, 60, 30]  # source 0, near its bottom-right
        boxes[1, 0] = [2, 24, 12, 31]
        boxes[2, 0] = [52, 2, 62, 10]
        boxes[3, 0] = [2, 2, 12, 10]
        gt = _batched_instances(boxes, np.zeros((4, 1), np.int32))

        from simple_sfod_tpu.data import mosaic as M

        # fix the center by monkeypatching uniform to 0.5 -> cy=16, cx=32
        orig = jax.random.uniform
        try:
            jax.random.uniform = lambda *a, **k: jnp.asarray(0.5)
            out, merged = M.mosaic_batch(jax.random.key(0), images, gt)
        finally:
            jax.random.uniform = orig
        img0 = np.asarray(out[0])
        # TL quadrant shows source0 (value 10), TR source1 (20), etc.
        assert img0[8, 16, 0] == 10
        assert img0[8, 48, 0] == 20
        assert img0[24, 16, 0] == 30
        assert img0[24, 48, 0] == 40
        mb = np.asarray(merged.boxes[0])
        mv = np.asarray(merged.valid[0])
        # source0's box [50,20,60,30] shifts by (cx - w, cy - h) = (-32, -16)
        np.testing.assert_allclose(mb[0], [18, 4, 28, 14])
        assert mv[0]
        # source1's box [2,24,12,31] shifts by (+cx, -16) = [34, 8, 44, 15]
        np.testing.assert_allclose(mb[1], [34, 8, 44, 15])
        assert mv[1]
