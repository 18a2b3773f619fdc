"""Detector secondary paths: raw (no-NMS) inference, MC-dropout, BPC-in-step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.models.detector import DetectionBatch, Detector
from simple_sfod_tpu.models.faster_rcnn import DetectorConfig
from simple_sfod_tpu.models.uncertainty import mc_dropout_box_outputs
from simple_sfod_tpu.structures.instances import pad_instances


@pytest.fixture(scope="module")
def small_det():
    cfg = DetectorConfig(
        num_classes=3,
        rpn_pre_nms_topk_train=128,
        rpn_post_nms_topk_train=64,
        rpn_pre_nms_topk_test=128,
        rpn_post_nms_topk_test=64,
        roi_batch_size_per_image=32,
        fc_dim=64,
        box_head_dropout=0.5,
    )
    det = Detector(cfg)
    v = det.init(jax.random.key(0), (64, 128))
    return det, v


def batch_of_ones():
    images = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (1, 64, 128, 3)), jnp.float32)
    sizes = jnp.asarray([[64, 128]], jnp.int32)
    return images, sizes


class TestInferRaw:
    def test_no_nms_keeps_overlaps(self, small_det):
        det, v = small_det
        images, sizes = batch_of_ones()
        raw = jax.jit(lambda v, i, s: det.infer_raw(v, i, s, topk=64))(v, images, sizes)
        std = jax.jit(lambda v, i, s: det.infer(v, i, s, topk=64))(v, images, sizes)
        # raw path keeps everything valid (no score filter)
        assert int(raw.num_valid()[0]) == 64
        assert int(std.num_valid()[0]) <= int(raw.num_valid()[0])


class TestTrainModeBNInfer:
    def test_adabn_eval_probe_runs(self, small_det):
        """train_mode_bn=True (the AdaBN eval probe / always-train-mode
        teacher quirk) must run without mutating stored statistics."""
        det, v = small_det
        images, sizes = batch_of_ones()
        before = jax.tree.map(lambda x: np.asarray(x).copy(), v["batch_stats"])
        dets = jax.jit(lambda v, i, s: det.infer(v, i, s, train_mode_bn=True))(v, images, sizes)
        assert dets.boxes.shape[-1] == 4
        after = jax.tree.map(np.asarray, v["batch_stats"])
        diff = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), before, after)
        assert max(jax.tree.leaves(diff)) == 0.0


class TestMCDropout:
    def test_samples_differ_and_average(self, small_det):
        det, v = small_det
        images, sizes = batch_of_ones()
        mean, std, boxes, valid = jax.jit(
            lambda v, i, s: mc_dropout_box_outputs(det, v, i, s, jax.random.key(1), 4)
        )(v, images, sizes)
        assert mean.shape[-1] == 4  # C+1
        assert valid.shape == boxes.shape[:2] and valid.dtype == bool
        assert bool(jnp.all(std >= 0))
        assert float(std.max()) > 0  # dropout produced variance
        np.testing.assert_allclose(np.asarray(mean.sum(-1)), 1.0, atol=1e-4)


class TestBPCInStep:
    def test_bpc_metric_emitted(self, small_det):
        det, v = small_det
        images, sizes = batch_of_ones()
        gt = pad_instances(
            np.asarray([[4, 4, 40, 40]], np.float32), np.asarray([1]), 8
        )
        gt = jax.tree.map(lambda x: x[None], gt)
        _, metrics, _ = jax.jit(
            lambda v, b, r: det.supervised_losses(v, b, r, with_bpc=True)
        )(v, DetectionBatch(images, sizes, gt), jax.random.key(2))
        assert "loss_bpc" in metrics
        assert np.isfinite(float(metrics["loss_bpc"]))


class TestUint8Input:
    def test_uint8_canvas_equals_float_input(self):
        """Loaders ship uint8 canvases; the detector must promote them to f32
        BEFORE mean subtraction. Regression: the mean constant used to be
        built in the INPUT dtype, so uint8 inputs wrapped around under
        `images - mean` and every eval-loop / AdaBN forward saw corrupted
        pixels (training paths cast to f32 in the trainers and were safe)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from simple_sfod_tpu.models.detector import Detector
        from simple_sfod_tpu.models.faster_rcnn import DetectorConfig

        cfg = DetectorConfig(
            num_classes=3,
            backbone="tiny",
            in_feature="tiny1",
            rpn_pre_nms_topk_test=64,
            rpn_post_nms_topk_test=32,
            fc_dim=32,
            detections_per_image=16,
        )
        det = Detector(cfg)
        v = det.init(jax.random.key(0), (32, 64))
        img_u8 = np.random.RandomState(0).randint(0, 256, (1, 32, 64, 3), np.uint8)
        sizes = jnp.asarray([[32, 64]], jnp.int32)
        d_float = det.infer(v, jnp.asarray(img_u8, jnp.float32), sizes)
        d_uint8 = det.infer(v, jnp.asarray(img_u8), sizes)
        np.testing.assert_allclose(
            np.asarray(d_float.boxes), np.asarray(d_uint8.boxes), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(d_float.scores), np.asarray(d_uint8.scores), atol=1e-6
        )
