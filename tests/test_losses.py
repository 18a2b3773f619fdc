"""BPC / TCD loss tests vs hand-computed values."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.losses.bpc import bpc_loss, _legacy_iou
from simple_sfod_tpu.losses.tcd import tcd_loss
from simple_sfod_tpu.structures.instances import Instances


def make_inst(boxes, scores, classes, valid=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    return Instances(
        boxes=jnp.asarray(boxes),
        scores=jnp.asarray(np.asarray(scores, np.float32)),
        classes=jnp.asarray(np.asarray(classes, np.int32)),
        valid=jnp.asarray(np.ones(n, bool) if valid is None else np.asarray(valid)),
    )


def batched(inst):
    import jax

    return jax.tree.map(lambda x: x[None], inst)


class TestBPC:
    def test_hand_computed(self):
        # one TP with s=0.9 (s>=.5): AC = .9*tanh(.9); one FP with s=0.3:
        # IN = (1-.3)*(1-tanh(.3)); loss = log(1 + IC_AN/denominator)
        gt = make_inst([[0, 0, 10, 10]], [1.0], [0])
        pred = make_inst(
            [[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.3], [0, 0]
        )
        loss = float(bpc_loss(batched(pred), batched(gt)))
        ac = 0.9 * np.tanh(0.9)
        inn = (1 - 0.3) * (1 - np.tanh(0.3))
        want = np.log1p(0.0 / (ac + inn))  # numer = AN + IC = 0
        assert loss == pytest.approx(want, abs=1e-6)

    def test_confident_fp_increases_loss(self):
        gt = make_inst([[0, 0, 10, 10]], [1.0], [0])
        pred_good = make_inst([[0, 0, 10, 10]], [0.9], [0])
        pred_bad = make_inst(
            [[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.95], [0, 0]
        )
        l_good = float(bpc_loss(batched(pred_good), batched(gt)))
        l_bad = float(bpc_loss(batched(pred_bad), batched(gt)))
        assert l_bad > l_good

    def test_padding_ignored(self):
        gt = make_inst([[0, 0, 10, 10], [0, 0, 0, 0]], [1, 0], [0, 0], [True, False])
        pred = make_inst(
            [[0, 0, 10, 10], [0, 0, 0, 0]], [0.9, 0.99], [0, 0], [True, False]
        )
        with_pad = float(bpc_loss(batched(pred), batched(gt)))
        gt2 = make_inst([[0, 0, 10, 10]], [1], [0])
        pred2 = make_inst([[0, 0, 10, 10]], [0.9], [0])
        without = float(bpc_loss(batched(pred2), batched(gt2)))
        assert with_pad == pytest.approx(without, abs=1e-6)

    def test_legacy_iou_plus_one(self):
        a = np.asarray([[0, 0, 9, 9]], np.float32)  # 10x10 in legacy convention
        iou = float(_legacy_iou(jnp.asarray(a), jnp.asarray(a))[0, 0])
        assert iou == pytest.approx(1.0)


class TestTCD:
    def test_perfect_distribution(self):
        pred = make_inst(
            [[0, 0, 5, 5]] * 4, [0.9] * 4, [0, 0, 1, 1]
        )
        target = jnp.asarray([0.5, 0.5])
        assert float(tcd_loss(batched(pred), target)) == pytest.approx(0.0, abs=1e-6)

    def test_skewed_distribution(self):
        pred = make_inst([[0, 0, 5, 5]] * 4, [0.9] * 4, [0, 0, 0, 1])
        target = jnp.asarray([0.5, 0.5])
        assert float(tcd_loss(batched(pred), target)) == pytest.approx(0.5, abs=1e-6)


class TestBPCCandidates:
    """The BPC input must match the reference's convert_bbox_scores
    semantics (source_free_fast_rcnn.py:121 `scores > 0` i.e. no filtering,
    NMS commented out :132-138): every (sampled proposal, fg class) pair is
    one candidate — cardinality S*C — with softmax probability scores."""

    def test_cardinality_and_semantics(self):
        import jax

        from simple_sfod_tpu.models.faster_rcnn import (
            DetectorConfig,
            SampledProposals,
            bpc_candidates,
        )

        cfg = DetectorConfig(num_classes=3)
        b, s, c = 2, 4, 3
        rs = np.random.RandomState(0)
        scores = jnp.asarray(rs.randn(b * s, c + 1).astype(np.float32))
        deltas = jnp.asarray(0.01 * rs.randn(b * s, 4 * c).astype(np.float32))
        boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 30.0, 30.0]]), (b, s, 1)).reshape(b, s, 4)
        valid = jnp.asarray([[True, True, True, False], [True, False, True, True]])
        sampled = SampledProposals(
            boxes=boxes,
            gt_classes=jnp.zeros((b, s), jnp.int32),
            reg_targets=jnp.zeros((b, s, 4)),
            is_fg=valid,
            valid=valid,
        )
        sizes = jnp.asarray([[64, 128], [64, 128]], jnp.int32)
        cand = bpc_candidates(cfg, scores, deltas, sampled, sizes)
        # cardinality: S*C per image, background dropped
        assert cand.boxes.shape == (b, s * c, 4)
        assert cand.scores.shape == (b, s * c)
        # scores are the softmax probs with background dropped — NO filtering
        probs = np.asarray(jax.nn.softmax(scores, axis=-1))[:, :-1].reshape(b, s * c)
        np.testing.assert_allclose(np.asarray(cand.scores), probs, rtol=1e-6)
        # classes cycle 0..C-1 per proposal
        assert np.asarray(cand.classes)[0, :c].tolist() == list(range(c))
        # validity repeats the proposal's validity over its C candidates
        want_valid = np.repeat(np.asarray(valid), c, axis=-1).reshape(b, s * c)
        np.testing.assert_array_equal(np.asarray(cand.valid), want_valid)
        # boxes stay inside the image (reference clips before flattening)
        bx = np.asarray(cand.boxes)
        assert bx[..., 0].min() >= 0 and bx[..., 2].max() <= 128
        assert bx[..., 1].min() >= 0 and bx[..., 3].max() <= 64
