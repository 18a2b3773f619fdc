"""Data-parallel sharding: the full SFAT adaptation step over a 2-device
mesh inside pytest (the dryrun path, SURVEY §2.3/§5)."""

import numpy as np
import jax
import pytest


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >=2 devices")
def test_sfat_step_on_two_device_mesh():
    from simple_sfod_tpu.config import get_cfg
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = get_cfg()
    cfg.TRAINER = "source_free_adaptive_teacher"
    cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
    cfg.MODEL.RPN.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.IMS_PER_BATCH_TARGET = 2
    cfg.TPU.CANVAS = (64, 128)
    cfg.TPU.GT_CAPACITY = 8
    cfg.TPU.MESH_DATA = 2
    cfg.SEED = 0
    cfg.OUTPUT_DIR = "/tmp/sfod_shard_test"
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    register_synthetic("synthetic_target", 4, (64, 128), 4)
    cfg.DATASETS.TRAIN_TARGET = ("synthetic_target",)
    cfg.freeze()

    tr = build_trainer(cfg, synthetic=True)
    assert tr.mesh.devices.size == 2
    batch = {
        "images": np.random.RandomState(0).uniform(0, 255, (2, 64, 128, 3)).astype(np.uint8),
        "sizes": np.tile(np.asarray([[64, 128]], np.int32), (2, 1)),
    }
    m1 = tr.run_step(batch)
    m2 = tr.run_step(batch)
    assert np.isfinite(float(m1["total_loss"]))
    assert np.isfinite(float(m2["total_loss"]))
    assert int(tr.state.step) == 2


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >=2 devices")
def test_fpn_supervised_step_on_two_device_mesh():
    """Multi-level FPN under GSPMD: the level-dict features, per-level RPN
    concat and level-assigned ROI pooling must partition over a data mesh
    like the single-level path does."""
    from simple_sfod_tpu.config import get_cfg
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic_tiny_fpn.yaml")
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.MESH_DATA = 2
    cfg.OUTPUT_DIR = "/tmp/sfod_fpn_shard_test"
    register_synthetic("synthetic_train", 4, (64, 128), 4, seed=0)
    register_synthetic("synthetic_test", 2, (64, 128), 4, seed=2)
    cfg.freeze()
    tr = build_trainer(cfg, synthetic=True)
    assert tr.mesh.devices.size == 2
    batch = next(iter(tr.build_train_loader()))
    m = tr.run_step(batch)
    assert np.isfinite(float(m["total_loss"]))
