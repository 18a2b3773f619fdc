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

    def test_mixup_content_aware_reduces_to_plain_at_full_fill(self):
        """sizes == canvas must reproduce the sizes=None blend exactly."""
        rs = np.random.RandomState(3)
        images = jnp.asarray(rs.uniform(0, 255, (4, 16, 32, 3)), jnp.float32)
        gt = _batched_instances(
            np.tile(np.asarray([[[2, 2, 10, 10]]], np.float32), (4, 1, 1)),
            np.zeros((4, 1), np.int32),
        )
        key = jax.random.key(7)
        out_a, m_a = mixup_batch(key, images, gt, flip=True)
        sizes = jnp.broadcast_to(jnp.asarray([16, 32], jnp.int32), (4, 2))
        out_b, m_b = mixup_batch(key, images, gt, flip=True, sizes=sizes)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
        np.testing.assert_allclose(np.asarray(m_a.boxes), np.asarray(m_b.boxes))
        np.testing.assert_array_equal(np.asarray(m_a.valid), np.asarray(m_b.valid))

    def test_mixup_content_aware_gray_frame_and_clipping(self):
        """At fill < 1: companion padding blends as 114 gray, the blend
        covers only the origin frame (outside stays zero padding), and
        companion GT never lands outside the frame."""
        h, w, ch, cw = 16, 32, 8, 16
        images = np.zeros((4, h, w, 3), np.float32)
        images[:, :ch, :cw] = 50.0  # origin content; companion content = 50 too
        gt = _batched_instances(
            np.tile(np.asarray([[[2, 2, 12, 6]]], np.float32), (4, 1, 1)),
            np.zeros((4, 1), np.int32),
        )
        sizes = jnp.broadcast_to(jnp.asarray([ch, cw], jnp.int32), (4, 2))
        for s in range(4):
            out, merged = mixup_batch(
                jax.random.key(s), jnp.asarray(images), gt, flip=True, sizes=sizes
            )
            out = np.asarray(out)
            # inside the frame: (50+50)/2=50 (content) or (50+114)/2=82 (gray)
            frame = out[:, :ch, :cw]
            vals = set(np.unique(frame).tolist())
            assert vals <= {50.0, 82.0}, vals
            # outside the frame: origin zero padding untouched
            assert (out[:, ch:] == 0).all() and (out[:, :, cw:] == 0).all()
            # companion GT (rows N:) clipped into the frame
            ob = np.asarray(merged.boxes)[:, 1:]
            ov = np.asarray(merged.valid)[:, 1:]
            if ov.any():
                kept = ob[ov]
                assert kept[:, 2].max() <= cw and kept[:, 3].max() <= ch

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

    def test_content_aware_exact_fit(self):
        """With content (16, 32) on a (32, 64) canvas and the center fixed at
        (16, 32), every tile maps exactly onto its source's content: the
        composite contains NO padding and NO gray fill."""
        h, w = 32, 64
        images = np.zeros((4, h, w, 3), np.float32)
        for i, v in enumerate((10, 20, 30, 40)):
            images[i, :16, :32] = v  # content top-left anchored; padding 0
        boxes = np.zeros((4, 1, 4), np.float32)
        boxes[0, 0] = [2, 2, 6, 6]
        gt = _batched_instances(boxes, np.zeros((4, 1), np.int32))
        sizes = jnp.broadcast_to(jnp.asarray([16, 32], jnp.int32), (4, 2))

        from simple_sfod_tpu.data import mosaic as M

        orig = jax.random.uniform
        try:
            jax.random.uniform = lambda *a, **k: jnp.asarray(0.5)
            out, merged = M.mosaic_batch(
                jax.random.key(0), jnp.asarray(images), gt, sizes=sizes
            )
        finally:
            jax.random.uniform = orig
        img0 = np.asarray(out[0])
        assert img0[8, 16, 0] == 10 and img0[8, 48, 0] == 20
        assert img0[24, 16, 0] == 30 and img0[24, 48, 0] == 40
        assert not np.isin(img0, [0.0, 114.0]).any()  # no padding, no gray
        # source0 box [2,2,6,6] shifts by (cx - sw, cy - sh) = (0, 0): the
        # content's bottom-right corner already sits at the center
        mb = np.asarray(merged.boxes[0])
        np.testing.assert_allclose(mb[0], [2, 2, 6, 6])
        assert np.asarray(merged.valid[0])[0]

    def test_content_aware_gray_fill_and_no_padding_leak(self):
        """Content smaller than the tiles: uncovered regions read YOLOX gray
        (114), never the canvas's zero padding; boxes shift by the
        content-aware offset."""
        h, w = 32, 64
        images = np.zeros((4, h, w, 3), np.float32)
        for i, v in enumerate((10, 20, 30, 40)):
            images[i, :8, :16] = v  # fill 0.25
        boxes = np.zeros((4, 1, 4), np.float32)
        boxes[0, 0] = [2, 2, 6, 6]
        gt = _batched_instances(boxes, np.zeros((4, 1), np.int32))
        sizes = jnp.broadcast_to(jnp.asarray([8, 16], jnp.int32), (4, 2))

        from simple_sfod_tpu.data import mosaic as M

        orig = jax.random.uniform
        try:
            jax.random.uniform = lambda *a, **k: jnp.asarray(0.5)
            out, merged = M.mosaic_batch(
                jax.random.key(0), jnp.asarray(images), gt, sizes=sizes
            )
        finally:
            jax.random.uniform = orig
        img0 = np.asarray(out[0])
        # TL tile: dest rows 8..15 x cols 16..31 show source0 content,
        # the rest of the tile is gray
        assert img0[12, 20, 0] == 10
        assert img0[4, 20, 0] == 114 and img0[12, 4, 0] == 114
        assert (img0 != 0.0).all()  # zero padding never leaks
        # source0 box [2,2,6,6] shifts by (cx - sw, cy - sh) = (16, 8)
        np.testing.assert_allclose(np.asarray(merged.boxes[0])[0], [18, 10, 22, 14])
        assert np.asarray(merged.valid[0])[0]

    def test_content_aware_random_centers_never_leak_padding(self):
        """Across random centers, composite pixels are only {content, gray}."""
        h, w = 32, 64
        images = np.zeros((8, h, w, 3), np.float32)
        images[:, :24, :48] = 200.0  # fill 0.75, padding 0
        gt = _batched_instances(
            np.tile(np.asarray([[[4, 4, 20, 20]]], np.float32), (8, 1, 1)),
            np.zeros((8, 1), np.int32),
        )
        sizes = jnp.broadcast_to(jnp.asarray([24, 48], jnp.int32), (8, 2))
        for s in range(4):
            out, _ = mosaic_batch(jax.random.key(s), jnp.asarray(images), gt, sizes=sizes)
            vals = np.unique(np.asarray(out))
            assert set(vals.tolist()) <= {114.0, 200.0}, vals


# ---------------------------------------------------------------------------
# YOLOX random_affine: goldens vs numpy transcriptions of
# yolox/data/data_augment.py get_affine_matrix / apply_affine_to_bboxes /
# cv2.warpAffine(INTER_LINEAR, borderValue=114). The reference constructs
# these knobs (ref mosaic.py:44-45) but the call is commented out
# (mosaic.py:196-206) — see data/mosaic.py.
# ---------------------------------------------------------------------------
import math

from simple_sfod_tpu.data.mosaic import (
    affine_boxes,
    affine_matrix,
    affine_warp,
    random_affine_batch,
    sample_affine_params,
)


def np_yolox_matrix(angle, scale, shear_x, shear_y, tx, ty):
    rad = math.radians(angle)
    a, b = scale * math.cos(rad), scale * math.sin(rad)
    R = np.array([[a, b, 0.0], [-b, a, 0.0]])
    M = np.ones((2, 3))
    M[0] = R[0] + math.tan(math.radians(shear_y)) * R[1]
    M[1] = R[1] + math.tan(math.radians(shear_x)) * R[0]
    M[0, 2], M[1, 2] = tx, ty
    return M


def np_yolox_boxes(targets, M, tw, th):
    n = len(targets)
    pts = np.ones((4 * n, 3))
    pts[:, :2] = targets[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(4 * n, 2)
    pts = pts @ M.T
    pts = pts.reshape(n, 8)
    xs, ys = pts[:, 0::2], pts[:, 1::2]
    nb = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
    nb[:, 0::2] = nb[:, 0::2].clip(0, tw)
    nb[:, 1::2] = nb[:, 1::2].clip(0, th)
    return nb


def np_affine_warp(img, M, pad=114.0):
    h, w = img.shape[:2]
    inv = np.linalg.inv(M[:, :2])
    out = np.zeros(img.shape, np.float64)
    for y in range(h):
        for x in range(w):
            sx, sy = inv @ (np.array([x, y], np.float64) - M[:, 2])
            x0, y0 = math.floor(sx), math.floor(sy)
            fx, fy = sx - x0, sy - y0

            def px(yy, xx):
                if 0 <= xx <= w - 1 and 0 <= yy <= h - 1:
                    return img[yy, xx].astype(np.float64)
                return np.full(img.shape[-1], pad)

            top = px(y0, x0) * (1 - fx) + px(y0, x0 + 1) * fx
            bot = px(y0 + 1, x0) * (1 - fx) + px(y0 + 1, x0 + 1) * fx
            out[y, x] = top * (1 - fy) + bot * fy
    return out


class TestRandomAffine:
    def test_matrix_matches_yolox_construction(self):
        rs = np.random.RandomState(3)
        for _ in range(10):
            p = (
                rs.uniform(-10, 10),     # angle
                rs.uniform(0.5, 1.5),    # scale
                rs.uniform(-2, 2),       # shear_x
                rs.uniform(-2, 2),       # shear_y
                rs.uniform(20, 40),      # tx
                rs.uniform(10, 30),      # ty
            )
            got = np.asarray(affine_matrix(*[jnp.float32(v) for v in p]))
            np.testing.assert_allclose(got, np_yolox_matrix(*p), rtol=2e-6, atol=2e-6)

    def test_boxes_match_yolox_transcription(self):
        rs = np.random.RandomState(4)
        boxes = np.sort(rs.uniform(0, 60, (8, 2, 2)), axis=2).transpose(0, 2, 1).reshape(8, 4)
        boxes = boxes[:, [0, 2, 1, 3]]  # x1,y1,x2,y2 with x1<x2, y1<y2
        M = np_yolox_matrix(7.0, 1.2, 1.5, -1.0, 11.0, -3.0)
        got = np.asarray(affine_boxes(jnp.asarray(boxes, jnp.float32), jnp.asarray(M, jnp.float32), 64, 48))
        np.testing.assert_allclose(got, np_yolox_boxes(boxes, M, 64, 48), rtol=1e-5, atol=1e-4)

    def test_warp_identity_and_translation(self):
        img = jnp.asarray(np.random.RandomState(5).uniform(0, 255, (10, 14, 3)), jnp.float32)
        ident = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        np.testing.assert_allclose(np.asarray(affine_warp(img, ident)), np.asarray(img), atol=1e-4)
        # integer translation by (3, 2): dst(x,y) = src(x-3, y-2), border 114
        tr = jnp.asarray([[1.0, 0, 3.0], [0, 1.0, 2.0]])
        got = np.asarray(affine_warp(img, tr))
        np.testing.assert_allclose(got[2:, 3:], np.asarray(img)[:-2, :-3], atol=1e-4)
        np.testing.assert_allclose(got[:2, :], 114.0)
        np.testing.assert_allclose(got[:, :3], 114.0)

    def test_warp_matches_numpy_oracle(self):
        rs = np.random.RandomState(6)
        img = rs.uniform(0, 255, (12, 16, 3)).astype(np.float32)
        M = np_yolox_matrix(9.0, 0.8, 2.0, -1.5, 6.0, 4.0)
        got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(M, jnp.float32)))
        want = np_affine_warp(img, M)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)

    def test_batch_wrapper_centered_frame(self):
        """random_affine_batch composes M with a center pre-shift; replaying
        the same sampled params through the numpy transcription must match."""
        b, h, w = 2, 12, 16
        rng = jax.random.key(7)
        images = jnp.asarray(np.random.RandomState(7).uniform(0, 255, (b, h, w, 3)), jnp.float32)
        gt = _batched_instances(
            np.asarray([[[2, 2, 9, 8]], [[1, 3, 12, 10]]], np.float32),
            np.zeros((b, 1), np.int32),
        )
        out, ngt = random_affine_batch(rng, images, gt, degrees=10.0, translate=0.1, scales=(0.5, 1.5), shear=2.0)
        rngs = jax.random.split(rng, b)
        for i in range(b):
            p = [float(v) for v in sample_affine_params(rngs[i], (w, h), 10.0, 0.1, (0.5, 1.5), 2.0)]
            M = np_yolox_matrix(*p)
            Me = M.copy()
            Me[:, 2] -= M[:, :2] @ np.array([w / 2.0, h / 2.0])
            np.testing.assert_allclose(
                np.asarray(out[i]), np_affine_warp(np.asarray(images[i], np.float64), Me), rtol=1e-4, atol=2e-3
            )
            np.testing.assert_allclose(
                np.asarray(ngt.boxes[i]), np_yolox_boxes(np.asarray(gt.boxes[i], np.float64), Me, w, h), rtol=1e-4, atol=1e-3
            )


class TestMixupLiveSemantics:
    def test_companion_flip_matches_prediction(self):
        """flip=True: companions flip with p=1/2 about the FULL canvas width
        (reference mixup.py:174,225-227); the bernoulli stream is
        fold_in(rng, 0), so the test can predict which images flipped."""
        b, h, w = 4, 8, 16
        rng = jax.random.key(11)
        rs = np.random.RandomState(11)
        images = jnp.asarray(rs.uniform(0, 255, (b, h, w, 3)), jnp.float32)
        boxes = np.asarray([[[1, 1, 4, 4]], [[2, 0, 6, 5]], [[0, 2, 3, 7]], [[5, 1, 9, 6]]], np.float32)
        gt = _batched_instances(boxes, np.zeros((b, 1), np.int32))
        out, merged = mixup_batch(rng, images, gt, flip=True)
        do = np.asarray(jax.random.bernoulli(jax.random.fold_in(rng, 0), 0.5, (b,)))
        other = np.roll(np.asarray(images), -1, axis=0)
        oboxes = np.roll(boxes, -1, axis=0)
        for i in range(b):
            comp = other[i, :, ::-1, :] if do[i] else other[i]
            np.testing.assert_allclose(np.asarray(out[i]), 0.5 * np.asarray(images[i]) + 0.5 * comp, rtol=1e-5)
            bx = oboxes[i, 0]
            want = [w - bx[2], bx[1], w - bx[0], bx[3]] if do[i] else bx
            np.testing.assert_allclose(np.asarray(merged.boxes[i, 1]), want, rtol=1e-5)

    def test_scale_jitter_half(self):
        """scale_jitter=(0.5, 0.5): deterministic half-size companion about
        the top-left (no crop offset), zero padding (reference mixup.py
        np.zeros padded_img), boxes scaled by 0.5."""
        b, h, w = 2, 8, 16
        rng = jax.random.key(3)
        images = jnp.zeros((b, h, w, 3), jnp.float32)
        images = images.at[1, 0, 0].set(200.0)  # marker at companion origin
        boxes = np.asarray([[[2, 2, 6, 6]], [[4, 2, 12, 8]]], np.float32)
        gt = _batched_instances(boxes, np.zeros((b, 1), np.int32))
        out, merged = mixup_batch(rng, images, gt, flip=False, scale_jitter=(0.5, 0.5))
        # image 0's companion is image 1 halved: marker lands in the top-left
        # 2x2 bilinear footprint, rest of the right/bottom half is zero pad
        assert float(out[0, 0, 0, 0]) > 0
        np.testing.assert_allclose(np.asarray(out[0, h // 2 + 1:, :, :]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(merged.boxes[0, 1]), boxes[1, 0] * 0.5, rtol=1e-5)

    def test_identity_jitter_matches_plain(self):
        b, h, w = 2, 8, 16
        rng = jax.random.key(5)
        rs = np.random.RandomState(5)
        images = jnp.asarray(rs.uniform(0, 255, (b, h, w, 3)), jnp.float32)
        boxes = np.asarray([[[1, 1, 5, 5]], [[3, 2, 9, 7]]], np.float32)
        gt = _batched_instances(boxes, np.zeros((b, 1), np.int32))
        out_j, m_j = mixup_batch(rng, images, gt, flip=False, scale_jitter=(1.0, 1.0))
        out_p, m_p = mixup_batch(rng, images, gt, flip=False, scale_jitter=None)
        np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_p), atol=1e-3)
        np.testing.assert_allclose(np.asarray(m_j.boxes), np.asarray(m_p.boxes), atol=1e-4)
