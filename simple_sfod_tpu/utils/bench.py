"""The canonical headline-benchmark workload config, shared by bench.py,
tools/bench_extra.py and tools/profile_step.py so all three measure the SAME
graph (they had hand-copied, drifting config blocks before)."""

from __future__ import annotations


def sfat_bench_cfg(
    batch_target: int = 1,
    trainer: str = "source_free_adaptive_teacher",
    output_dir: str = "/tmp/bench_out",
):
    """SURVEY §6 / BASELINE.md workload: VGG16-BN Faster R-CNN,
    shortest-edge-600 Cityscapes canvas (608x1216), bf16 compute, 8 classes,
    BBOX_THRESHOLD 0.8, EMA keep-rate 0.9996 (the flagship YAML's values)."""
    from ..config import get_cfg

    cfg = get_cfg()
    cfg.TRAINER = trainer
    cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
    cfg.MODEL.RPN.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    cfg.VGG.BN = True
    cfg.SEMISUPNET.BBOX_THRESHOLD = 0.8
    cfg.SEMISUPNET.EMA_KEEP_RATE = 0.9996
    cfg.SOLVER.IMS_PER_BATCH_TARGET = batch_target
    cfg.TPU.CANVAS = (608, 1216)
    cfg.TPU.DTYPE = "bfloat16"
    cfg.SEED = 0
    cfg.OUTPUT_DIR = output_dir
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.freeze()
    return cfg


def synthetic_bench_batch(cfg, n: int = None):
    import numpy as np

    n = n or cfg.SOLVER.IMS_PER_BATCH_TARGET
    rs = np.random.RandomState(0)
    return {
        "images": rs.uniform(0, 255, (n, *cfg.TPU.CANVAS, 3)).astype(np.uint8),
        "sizes": np.tile(np.asarray([[600, 1200]], np.int32), (n, 1)),
    }
