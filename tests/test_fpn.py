"""FPN backbone + multi-level heads (reference build_vgg_fpn_backbone,
meta_arch/vgg.py:122-144 — detectron2 FPN semantics: shared RPN head over all
pyramid levels with per-level pre-NMS top-k then merged NMS, and ROIAlign
with d2's assign_boxes_to_levels box-size rule)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_sfod_tpu.config import get_cfg
from simple_sfod_tpu.config.defaults import detector_config_from_cfg
from simple_sfod_tpu.models.backbones.fpn import FPN
from simple_sfod_tpu.models.backbones.vgg import VGG16Backbone
from simple_sfod_tpu.models.detector import DetectionBatch, Detector
from simple_sfod_tpu.models.faster_rcnn import (
    DetectorConfig,
    anchors_for,
    assign_boxes_to_levels,
    pool_rois,
)
from simple_sfod_tpu.structures.instances import Instances


def fpn_cfg(**overrides):
    kw = dict(
        num_classes=3,
        fpn=True,
        fpn_in_features=("vgg1", "vgg2", "vgg3", "vgg4"),
        fpn_out_channels=32,
        in_feature="p2",
        rpn_in_features=("p2", "p3", "p4", "p5", "p6"),
        roi_in_features=("p2", "p3", "p4", "p5"),
        anchor_sizes_per_level=((32,), (64,), (128,), (256,), (512,)),
        rpn_pre_nms_topk_train=64,
        rpn_post_nms_topk_train=32,
        rpn_pre_nms_topk_test=64,
        rpn_post_nms_topk_test=32,
        roi_batch_size_per_image=16,
        fc_dim=64,
    )
    kw.update(overrides)
    return DetectorConfig(**kw)


class TestFPNModule:
    def test_pyramid_shapes_and_channels(self):
        fpn = FPN(
            bottom_up=VGG16Backbone(bn=True),
            in_features=("vgg1", "vgg2", "vgg3", "vgg4"),
            out_channels=32,
        )
        x = jnp.zeros((1, 64, 128, 3))
        v = fpn.init(jax.random.key(0), x)
        out = fpn.apply(v, x)
        # vgg strides 4..32 -> p2..p5, LastLevelMaxPool -> p6
        assert sorted(out) == ["p2", "p3", "p4", "p5", "p6"]
        for name, f in out.items():
            s = 2 ** int(name[1:])
            assert f.shape[-1] == 32
            if name != "p6":  # p6 = stride-2 pool of p5 (floor division)
                assert f.shape[1:3] == (64 // s, 128 // s), name

    def test_top_down_mixes_coarse_into_fine(self):
        """Zeroing the coarsest lateral must change the finest output
        (the top-down pathway really feeds p5 content into p2)."""
        fpn = FPN(
            bottom_up=VGG16Backbone(bn=False),
            in_features=("vgg3", "vgg4"),
            out_channels=16,
        )
        x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (1, 64, 128, 3)), jnp.float32)
        v = fpn.init(jax.random.key(1), x)
        out = fpn.apply(v, x)
        v_cut = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jnp.zeros_like(leaf)
            if any(getattr(p, "key", None) == "fpn_lateral5" for p in path)
            else leaf,
            v,
        )
        out_cut = fpn.apply(v_cut, x)
        assert float(jnp.abs(out["p4"] - out_cut["p4"]).max()) > 0


class TestLevelAssignment:
    def test_golden_table(self):
        """d2 assign_boxes_to_levels (poolers.py): level = floor(4 +
        log2(sqrt(area)/224 + 1e-8)) clamped to [2, 5]. Hand-computed:

        sqrt(area)  log2(s/224)   raw level   clamped
        28          -3.000        1           2
        56          -2.000        2           2
        112         -1.000        3           3
        223         -0.0065       3 (floor 3.9935)  3
        224          0.000        4           4
        300          0.4215       4 (floor 4.4215)  4
        448          1.000        5           5
        1792        3.000        7           5
        0           log2(1e-8) ~ -26.6 -> clamp 2
        """
        sides = [28.0, 56.0, 112.0, 223.0, 224.0, 300.0, 448.0, 1792.0, 0.0]
        expected = [2, 2, 3, 3, 4, 4, 5, 5, 2]
        boxes = jnp.asarray([[0.0, 0.0, s, s] for s in sides])
        got = assign_boxes_to_levels(boxes, 2, 5)
        assert got.tolist() == expected
        # independent recomputation of the non-degenerate rows
        for s, e in zip(sides[:-1], expected[:-1]):
            raw = math.floor(4 + math.log2(s / 224.0 + 1e-8))
            assert min(max(raw, 2), 5) == e

    def test_rectangles_use_area_not_side(self):
        # 448x112 rectangle: sqrt(area) = 224 -> level 4 (not 5)
        got = assign_boxes_to_levels(jnp.asarray([[0.0, 0.0, 448.0, 112.0]]), 2, 5)
        assert got.tolist() == [4]


class TestPoolRoisRouting:
    def test_boxes_pool_from_assigned_level(self):
        """Give each pyramid level a constant-valued map equal to its level
        number; a box pooled from its assigned level must come back filled
        with that constant."""
        cfg = fpn_cfg()
        h = w = 512
        feature = {
            f"p{l}": jnp.full((1, h // 2 ** l, w // 2 ** l, 4), float(l))
            for l in (2, 3, 4, 5)
        }
        # side 56 -> level 2, side 112 -> level 3, side 224 -> level 4
        boxes = jnp.asarray(
            [[[16.0, 16.0, 72.0, 72.0], [16.0, 16.0, 128.0, 128.0], [20.0, 20.0, 244.0, 244.0]]]
        )
        pooled = pool_rois(cfg, feature, boxes)  # [3, P, P, 4]
        centers = pooled[:, 2:5, 2:5, :]  # interior samples, no border effects
        np.testing.assert_allclose(np.asarray(centers[0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(centers[1]), 3.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(centers[2]), 4.0, rtol=1e-6)


class TestFPNDetector:
    def test_multilevel_anchor_grid_matches_rpn_flatten(self):
        cfg = fpn_cfg()
        anchors = anchors_for(cfg, (64, 128))
        assert isinstance(anchors, tuple) and len(anchors) == 5
        # per-level count = ceil(H/s) * ceil(W/s) * (1 size * 3 ratios)
        for a, lvl in zip(anchors, (2, 3, 4, 5, 6)):
            s = 2 ** lvl
            assert a.shape == (-(-64 // s) * -(-128 // s) * 3, 4)

    def test_end_to_end_inference(self):
        cfg = fpn_cfg()
        det = Detector(cfg)
        v = det.init(jax.random.key(0), (64, 128))
        images = jnp.asarray(
            np.random.RandomState(0).uniform(0, 255, (1, 64, 128, 3)), jnp.float32
        )
        sizes = jnp.asarray([[64, 128]], jnp.int32)
        dets = jax.jit(lambda v, i, s: det.infer(v, i, s, topk=16))(v, images, sizes)
        assert dets.boxes.shape == (1, 16, 4)
        assert cfg.num_anchors == 3  # one size x three ratios, shared head

    def test_training_grads_reach_every_level(self):
        """supervised_losses must backprop into every lateral/output conv —
        the multi-level heads really consume the whole pyramid."""
        cfg = fpn_cfg()
        det = Detector(cfg)
        v = det.init(jax.random.key(0), (64, 128))
        images = jnp.asarray(
            np.random.RandomState(1).uniform(0, 255, (2, 64, 128, 3)), jnp.float32
        )
        sizes = jnp.asarray([[64, 128]] * 2, jnp.int32)
        gt = Instances(
            boxes=jnp.asarray(
                [[[4.0, 4.0, 40.0, 40.0], [60.0, 10.0, 120.0, 50.0]]] * 2
            ),
            scores=jnp.ones((2, 2)),
            classes=jnp.zeros((2, 2), jnp.int32),
            valid=jnp.ones((2, 2), bool),
        )
        batch = DetectionBatch(images, sizes, gt)

        def loss(params):
            total, _, _ = det.supervised_losses(
                {"params": params, "batch_stats": v.get("batch_stats", {})},
                batch,
                jax.random.key(2),
            )
            return total

        grads = jax.jit(jax.grad(loss))(v["params"])
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        touched = {}
        for path, g in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if "fpn_lateral" in name or "fpn_output" in name:
                touched[name] = float(jnp.abs(g).max())
        # 4 laterals + 4 outputs, kernel + bias each
        assert len(touched) >= 8, sorted(touched)
        zero = [k for k, mx in touched.items() if mx == 0.0]
        assert not zero, f"no gradient reached {zero}"


class TestFPNLowering:
    def test_vgg_fpn_defaults_lower_to_d2_fpn(self):
        """build_vgg_fpn_backbone with untouched IN_FEATURES/SIZES lowers to
        detectron2's Base-RCNN-FPN head layout."""
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = "build_vgg_fpn_backbone"
        dc = detector_config_from_cfg(cfg)
        assert dc.fpn and dc.backbone == "vgg16"
        assert dc.fpn_in_features == ("vgg1", "vgg2", "vgg3", "vgg4")
        assert dc.rpn_in_features == ("p2", "p3", "p4", "p5", "p6")
        assert dc.roi_in_features == ("p2", "p3", "p4", "p5")
        assert dc.anchor_sizes_per_level == ((32,), (64,), (128,), (256,), (512,))
        assert dc.num_anchors == 3
        assert dc.feature_channels == 256

    def test_explicit_levels_and_sizes(self):
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = "build_vgg_fpn_backbone"
        cfg.MODEL.RPN.IN_FEATURES = ("p3", "p4", "p5")
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ("p3", "p4")
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = ((64,), (128,), (256,))
        dc = detector_config_from_cfg(cfg)
        assert dc.rpn_in_features == ("p3", "p4", "p5")
        assert dc.roi_in_features == ("p3", "p4")
        assert dc.anchor_sizes_per_level == ((64,), (128,), (256,))
        assert dc.dc_in_feature == "p4"  # coarsest ROI level feeds the DC

    def test_non_pyramid_in_feature_rejected(self):
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = "build_vgg_fpn_backbone"
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ("vgg4",)
        with pytest.raises(ValueError, match="pyramid"):
            detector_config_from_cfg(cfg)

    def test_size_level_mismatch_rejected(self):
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = "build_vgg_fpn_backbone"
        cfg.MODEL.RPN.IN_FEATURES = ("p3", "p4")
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ("p3", "p4")
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = ((64,), (128,), (256,))
        with pytest.raises(ValueError, match="SIZES"):
            detector_config_from_cfg(cfg)


class TestFPNTrainsEndToEnd:
    def test_yaml_trains_and_evals(self):
        """The shipped FPN YAML trains (2 steps, finite losses) and evals
        through the real trainer + COCO evaluator on synthetic data."""
        from simple_sfod_tpu.data.synthetic import register_synthetic
        from simple_sfod_tpu.engine.trainers import build_trainer

        cfg = get_cfg()
        cfg.merge_from_file("configs/synthetic_tiny_fpn.yaml")
        cfg.SOLVER.MAX_ITER = 2
        register_synthetic("synthetic_train", 4, (64, 128), 4, seed=0)
        register_synthetic("synthetic_test", 2, (64, 128), 4, seed=2)
        tr = build_trainer(cfg, synthetic=True)
        batch = next(iter(tr.build_train_loader()))
        metrics = tr.run_step(batch)
        assert np.isfinite(float(metrics["total_loss"]))
        res = tr.test()
        (only,) = res.values()
        assert "AP50" in only, res
