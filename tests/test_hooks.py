"""Unit tests for anomaly detection and PreciseBN statistics math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.engine.hooks import detect_anomaly, precise_bn
from simple_sfod_tpu.models.detector import Detector
from simple_sfod_tpu.models.faster_rcnn import DetectorConfig


class TestAnomaly:
    def test_passes_finite(self):
        detect_anomaly(3, 1.5, "loss_cls")

    def test_raises_on_nan(self):
        with pytest.raises(FloatingPointError, match="iteration=7"):
            detect_anomaly(7, float("nan"), "loss_cls")

    def test_raises_on_inf(self):
        with pytest.raises(FloatingPointError):
            detect_anomaly(0, float("inf"), "loss_rpn")


class TestPreciseBN:
    def test_stats_converge_to_batch_mean(self):
        cfg = DetectorConfig(
            num_classes=2,
            rpn_pre_nms_topk_train=64,
            rpn_post_nms_topk_train=32,
            rpn_pre_nms_topk_test=64,
            rpn_post_nms_topk_test=32,
            roi_batch_size_per_image=16,
            fc_dim=32,
        )
        det = Detector(cfg)
        v = det.init(jax.random.key(0), (64, 64))
        rs = np.random.RandomState(0)
        batches = [
            jnp.asarray(rs.uniform(0, 255, (1, 64, 64, 3)), jnp.float32) for _ in range(3)
        ]
        stats = precise_bn(det, v, iter(batches), num_iter=3)
        # equal-weight average: feeding the SAME batch thrice must equal the
        # single-batch statistics exactly
        same = [batches[0]] * 3
        stats_same = precise_bn(det, v, iter(same), num_iter=3)
        one = precise_bn(det, v, iter([batches[0]]), num_iter=1)
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), stats_same, one
        )
        # the EMA-undo ((new - m*old)/(1-m)) amplifies f32 roundoff ~10x
        assert max(jax.tree.leaves(diff)) < 5e-3
        # and differ from mixed batches
        any_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), stats, one)
        assert max(jax.tree.leaves(any_diff)) > 1e-6


class TestTensorboardWriter:
    def test_scalars_written(self, tmp_path):
        """Reference default behavior: TB scalars during training
        (base.py:266-267). Uses tensorboardX/torch-tb, skipped when absent."""
        import pytest as _pytest

        from simple_sfod_tpu.engine.events import EventStorage

        try:
            from simple_sfod_tpu.engine.events import TensorboardWriter

            w = TensorboardWriter(str(tmp_path))
        except ImportError:
            _pytest.skip("no tensorboard backend")
        storage = EventStorage()
        storage.put_scalar("loss_cls", 0.5)
        w.write(storage)
        w.add_image("vis", __import__("numpy").zeros((8, 8, 3), "uint8"), 0)
        w.close()
        import glob

        assert glob.glob(str(tmp_path / "events.out.tfevents*"))
