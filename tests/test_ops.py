"""Golden tests for box ops, anchors, matcher, sampler, NMS, ROIAlign."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.structures import boxes as B
from simple_sfod_tpu.ops.anchors import generate_anchors, generate_cell_anchors
from simple_sfod_tpu.ops.matcher import match_boxes, MatcherConfig, RPN_MATCHER
from simple_sfod_tpu.ops.sampler import subsample_labels, subsample_labels_mask
from simple_sfod_tpu.ops.nms import (
    nms_mask,
    nms_mask_matrix,
    nms_mask_scan,
    batched_class_nms,
)
from simple_sfod_tpu.ops.roi_align import roi_align, roi_align_gather

import golden


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxes:
    def test_iou_matches_golden(self):
        rng = np.random.RandomState(0)
        a, b = random_boxes(rng, 17), random_boxes(rng, 23)
        got = np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
        want = golden.iou_matrix(a, b)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_encode_decode_roundtrip(self):
        rng = np.random.RandomState(1)
        src = random_boxes(rng, 32)
        tgt = random_boxes(rng, 32)
        for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
            deltas = B.encode_deltas(jnp.asarray(src), jnp.asarray(tgt), weights)
            back = B.decode_deltas(deltas, jnp.asarray(src), weights)
            np.testing.assert_allclose(np.asarray(back), tgt, rtol=1e-4, atol=1e-3)

    def test_clip(self):
        bx = jnp.asarray([[-5.0, -5.0, 50.0, 200.0]])
        out = np.asarray(B.clip_boxes(bx, jnp.asarray([100, 40])))
        np.testing.assert_allclose(out, [[0, 0, 40, 100]])

    def test_multiclass_decode_shape(self):
        rng = np.random.RandomState(2)
        src = jnp.asarray(random_boxes(rng, 8))
        deltas = jnp.asarray(rng.randn(8, 4 * 5).astype(np.float32) * 0.1)
        out = B.decode_deltas(deltas, src, (10.0, 10.0, 5.0, 5.0))
        assert out.shape == (8, 20)


class TestAnchors:
    def test_cell_anchor_geometry(self):
        cell = generate_cell_anchors((64,), (0.5, 1.0, 2.0))
        # area preserved, aspect ratio = h/w
        for k, ratio in enumerate([0.5, 1.0, 2.0]):
            w = cell[k, 2] - cell[k, 0]
            h = cell[k, 3] - cell[k, 1]
            np.testing.assert_allclose(w * h, 64.0**2, rtol=1e-5)
            np.testing.assert_allclose(h / w, ratio, rtol=1e-5)

    def test_grid_layout_matches_rowmajor_yxA(self):
        a = np.asarray(generate_anchors((2, 3), 16, (32,), (1.0,)))
        assert a.shape == (6, 4)
        # second anchor should be the x-neighbour (stride 16 in x)
        np.testing.assert_allclose(a[1] - a[0], [16, 0, 16, 0])
        # anchor at (y=1,x=0) is index 3
        np.testing.assert_allclose(a[3] - a[0], [0, 16, 0, 16])


class TestMatcher:
    def test_thresholds_and_low_quality(self):
        gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
        pred = jnp.asarray(
            [
                [0.0, 0.0, 10.0, 10.0],  # IoU 1 with gt0 -> fg
                [0.0, 0.0, 10.0, 20.0],  # IoU 0.5 with gt0 -> ignore zone
                [50.0, 50.0, 60.0, 60.0],  # IoU 0 -> bg
                [21.0, 21.0, 30.0, 30.0],  # best for gt1 but iou<0.7 -> low-quality fg
            ]
        )
        iou = B.pairwise_iou(gt, pred)
        _, labels = match_boxes(iou, jnp.asarray([True, True]), RPN_MATCHER)
        assert labels.tolist() == [1, -1, 0, 1]

    def test_all_padding_gt_gives_background(self):
        gt = jnp.zeros((3, 4))
        pred = jnp.asarray([[0.0, 0.0, 5.0, 5.0]])
        iou = B.pairwise_iou(gt, pred)
        idx, labels = match_boxes(iou, jnp.zeros((3,), bool), RPN_MATCHER)
        assert labels.tolist() == [0]


class TestSampler:
    def test_counts_and_composition(self):
        labels = jnp.asarray([1] * 10 + [0] * 500 + [-1] * 20)
        idx, is_pos, valid = subsample_labels(labels, 256, 0.5, jax.random.key(0))
        assert valid.all()
        assert int(is_pos.sum()) == 10  # only 10 positives available
        assert int((~is_pos).sum()) == 246
        picked = np.asarray(labels)[np.asarray(idx)]
        assert (picked[np.asarray(is_pos)] == 1).all()
        assert (picked[~np.asarray(is_pos)] == 0).all()
        # no duplicates
        assert len(set(np.asarray(idx).tolist())) == 256

    def test_positive_cap(self):
        labels = jnp.asarray([1] * 400 + [0] * 400)
        idx, is_pos, valid = subsample_labels(labels, 256, 0.25, jax.random.key(1))
        assert int(is_pos.sum()) == 64
        assert valid.all()

    def test_scarce_negatives(self):
        labels = jnp.asarray([1] * 4 + [0] * 8 + [-1] * 50)
        idx, is_pos, valid = subsample_labels(labels, 256, 0.5, jax.random.key(2))
        assert int(valid.sum()) == 12
        mask, pos_mask = subsample_labels_mask(labels, 256, 0.5, jax.random.key(2))
        assert int(mask.sum()) == 12
        assert int(pos_mask.sum()) == 4


class TestNMS:
    @pytest.mark.parametrize("n,thr", [(50, 0.5), (300, 0.7), (1000, 0.3)])
    def test_matches_greedy(self, n, thr):
        rng = np.random.RandomState(n)
        bx = random_boxes(rng, n, size=60.0)
        sc = rng.uniform(0.01, 1.0, n).astype(np.float32)
        keep = np.asarray(
            nms_mask(jnp.asarray(bx), jnp.asarray(sc), jnp.ones(n, bool), thr, tile=64)
        )
        want = set(golden.greedy_nms(bx, sc, thr).tolist())
        got = set(np.nonzero(keep)[0].tolist())
        assert got == want

    @pytest.mark.parametrize("n,thr", [(50, 0.5), (300, 0.7), (1000, 0.3)])
    def test_matrix_matches_greedy(self, n, thr):
        rng = np.random.RandomState(n + 13)
        bx = random_boxes(rng, n, size=60.0)
        sc = rng.uniform(0.01, 1.0, n).astype(np.float32)
        keep = np.asarray(
            nms_mask_matrix(jnp.asarray(bx), jnp.asarray(sc), jnp.ones(n, bool), thr)
        )
        want = set(golden.greedy_nms(bx, sc, thr).tolist())
        got = set(np.nonzero(keep)[0].tolist())
        assert got == want

    @pytest.mark.parametrize("n,thr", [(50, 0.5), (300, 0.7), (1000, 0.3)])
    def test_scan_matches_greedy(self, n, thr):
        rng = np.random.RandomState(n + 7)
        bx = random_boxes(rng, n, size=60.0)
        sc = rng.uniform(0.01, 1.0, n).astype(np.float32)
        keep = np.asarray(
            nms_mask_scan(jnp.asarray(bx), jnp.asarray(sc), jnp.ones(n, bool), thr)
        )
        want = set(golden.greedy_nms(bx, sc, thr).tolist())
        got = set(np.nonzero(keep)[0].tolist())
        assert got == want

    def test_scan_max_keep_prefix(self):
        rng = np.random.RandomState(3)
        bx = random_boxes(rng, 200, size=60.0)
        sc = rng.uniform(0.01, 1.0, 200).astype(np.float32)
        full = golden.greedy_nms(bx, sc, 0.5)
        keep = np.asarray(
            nms_mask_scan(jnp.asarray(bx), jnp.asarray(sc), jnp.ones(200, bool), 0.5, max_keep=5)
        )
        got = set(np.nonzero(keep)[0].tolist())
        assert got == set(full[:5].tolist())  # first 5 greedy picks exactly

    def test_respects_valid_mask(self):
        bx = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        sc = jnp.asarray([0.9, 0.8])
        keep = nms_mask(bx, sc, jnp.asarray([False, True]), 0.5)
        assert keep.tolist() == [False, True]

    def test_batched_class_separation(self):
        bx = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        sc = jnp.asarray([0.9, 0.8])
        cls = jnp.asarray([0, 1], jnp.int32)
        keep = batched_class_nms(bx, sc, cls, jnp.ones(2, bool), 0.5)
        assert keep.tolist() == [True, True]  # different classes never suppress


class TestROIAlign:
    @pytest.mark.parametrize("aligned", [True, False])
    @pytest.mark.parametrize("impl", [roi_align, roi_align_gather])
    def test_matches_golden(self, aligned, impl):
        rng = np.random.RandomState(7)
        feat = rng.randn(12, 16, 5).astype(np.float32)
        rois = np.asarray(
            [
                [0.0, 0.0, 64.0, 48.0],
                [10.0, 5.0, 100.0, 90.0],
                [30.0, 30.0, 33.0, 35.0],  # tiny roi
                [-10.0, -10.0, 200.0, 200.0],  # exceeds the map
            ],
            np.float32,
        )
        got = np.asarray(
            impl(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 8, 7, 2, aligned)
        )
        want = golden.roi_align_ref(feat, rois, 1.0 / 8, 7, 2, aligned)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_constant_feature_gives_constant(self):
        feat = jnp.ones((10, 10, 3))
        rois = jnp.asarray([[8.0, 8.0, 60.0, 60.0]])
        out = roi_align(feat, rois, 1.0 / 8, 7, 2, True)
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


class TestROIAlignBf16Coords:
    def test_large_coordinates_not_snapped_in_bf16(self):
        """Bilinear positions/weights must be built in f32 even for bf16
        features: bf16 snaps a coordinate near 1216 to ~8px multiples, so
        two ROIs 4px apart at the canvas's right edge would pool IDENTICAL
        (wrong) features. Regression for the f32-coordinate fix."""
        import jax.numpy as jnp

        from simple_sfod_tpu.ops.roi_align import roi_align

        rng = np.random.default_rng(11)
        feats = jnp.asarray(rng.standard_normal((40, 80, 8)), jnp.bfloat16)
        roi_a = jnp.asarray([[1140.0, 300.0, 1204.0, 364.0]])
        roi_b = roi_a + 4.0  # 4 image px = 0.25 feature px at stride 16
        a = roi_align(feats, roi_a, 1.0 / 16, 7, 2, True)
        b = roi_align(feats, roi_b, 1.0 / 16, 7, 2, True)
        assert float(jnp.abs(a - b).astype(jnp.float32).max()) > 0.0
        # and the bf16 pooling tracks the f32 pooling to bf16 resolution
        f32 = roi_align(feats.astype(jnp.float32), roi_a, 1.0 / 16, 7, 2, True)
        err = float(jnp.abs(a.astype(jnp.float32) - f32).max())
        scale = float(jnp.abs(f32).max())
        assert err <= 0.05 * max(scale, 1e-6), (err, scale)
