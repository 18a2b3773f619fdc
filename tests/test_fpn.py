"""FPN backbone wrapper (reference build_vgg_fpn_backbone, meta_arch/vgg.py:122)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_sfod_tpu.config import get_cfg
from simple_sfod_tpu.config.defaults import detector_config_from_cfg
from simple_sfod_tpu.models.backbones.fpn import FPN
from simple_sfod_tpu.models.backbones.vgg import VGG16Backbone
from simple_sfod_tpu.models.detector import Detector
from simple_sfod_tpu.models.faster_rcnn import DetectorConfig


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


class TestFPNDetector:
    def test_end_to_end_inference(self):
        cfg = DetectorConfig(
            num_classes=3,
            fpn=True,
            fpn_in_features=("vgg1", "vgg2", "vgg3", "vgg4"),
            fpn_out_channels=32,
            in_feature="p4",
            rpn_pre_nms_topk_test=128,
            rpn_post_nms_topk_test=64,
            fc_dim=64,
        )
        det = Detector(cfg)
        v = det.init(jax.random.key(0), (64, 128))
        images = jnp.asarray(
            np.random.RandomState(0).uniform(0, 255, (1, 64, 128, 3)), jnp.float32
        )
        sizes = jnp.asarray([[64, 128]], jnp.int32)
        dets = jax.jit(lambda v, i, s: det.infer(v, i, s, topk=16))(v, images, sizes)
        assert dets.boxes.shape == (1, 16, 4)
        assert cfg.stride == 16 and cfg.feature_channels == 32


class TestFPNLowering:
    def test_vgg_fpn_config_lowers(self):
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = "build_vgg_fpn_backbone"
        cfg.MODEL.RPN.IN_FEATURES = ("p4",)
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ("p4",)
        dc = detector_config_from_cfg(cfg)
        assert dc.fpn and dc.backbone == "vgg16"
        assert dc.fpn_in_features == ("vgg1", "vgg2", "vgg3", "vgg4")
        assert dc.stride == 16 and dc.feature_channels == 256

    def test_non_pyramid_in_feature_rejected(self):
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = "build_vgg_fpn_backbone"
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ("vgg4",)
        with pytest.raises(ValueError, match="pyramid"):
            detector_config_from_cfg(cfg)
