"""Lockstep JAX-vs-torch differential for the WQ (fixed pseudo-label
self-training) workload — driver workload 4 (VERDICT r4 next #7).

The reference's BaseWQTrainer (base_wq.py:41-153) runs a plain supervised
step over the spliced pseudo-GT dataset, with strong augmentation applied by
the dataset mapper. The supervised lockstep (lockstep_runner.py) bounds the
loss/optimizer stack with a HAND-BUILT jax step; this runner instead drives
the REAL `base_wq` trainer — build_trainer, the jitted WQTrainer step, the
solver built from cfg (warmup/schedule/WEIGHT_DECAY_NORM masks),
stop_frozen_gradients — against the torch mirror on IDENTICAL pre-augmented
batches.

Aug bypass contract: both stacks must see the same pixels, so the strong
photometric stage is patched to the identity for the run (the aug
DISTRIBUTION itself is differentialed op-by-op in
tests/test_strong_aug_torch.py — together the step and the distribution are
both covered) and INPUT.RANDOM_FLIP is "none". Sampling is take-all (see
lockstep_runner.lockstep_config) so the matcher/sampler rng is inert.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from simple_sfod_tpu.config import get_cfg
from simple_sfod_tpu.data import transforms as T_mod
from simple_sfod_tpu.data.synthetic import register_synthetic
from simple_sfod_tpu.engine.trainers import build_trainer
from simple_sfod_tpu.models.faster_rcnn import anchors_for

from lockstep_runner import GT_CAP, _flatten_params, make_batches
from torch_mirror import TorchLockstepTrainer, TorchTinyFasterRCNN

CANVAS = (64, 128)
BATCH = 2
LR = 0.02
MOMENTUM = 0.9
WEIGHT_DECAY = 1e-4


def wq_lockstep_cfg():
    cfg = get_cfg()
    cfg.TRAINER = "base_wq"
    cfg.MODEL.BACKBONE.NAME = "build_tiny_backbone"
    cfg.MODEL.RPN.IN_FEATURES = ("tiny1",)
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ("tiny1",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    # take-all contract (see sfat_lockstep_runner): 6 anchors/location x
    # 16x32 locations = 3072 anchors, under every cap
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16, 32]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 4096
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 4096
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 4096
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.INPUT.MIN_SIZE_TRAIN = (CANVAS[0],)
    cfg.INPUT.MIN_SIZE_TEST = CANVAS[0]
    cfg.SOLVER.BASE_LR = LR
    cfg.SOLVER.MOMENTUM = MOMENTUM
    cfg.SOLVER.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.IMS_PER_BATCH = BATCH
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.VAL_LOSS = False
    cfg.TPU.CANVAS = CANVAS
    cfg.TPU.GT_CAPACITY = GT_CAP
    cfg.TPU.MESH_DATA = 1
    cfg.TPU.DTYPE = "float32"
    cfg.SEED = 0
    cfg.OUTPUT_DIR = "/tmp/sfod_lockstep_wq"
    register_synthetic("wq_lockstep_train", 4, CANVAS, 4, seed=0)
    register_synthetic("wq_lockstep_test", 2, CANVAS, 4, seed=2)
    cfg.DATASETS.TRAIN = ("wq_lockstep_train",)
    cfg.DATASETS.TRAIN_TARGET = ("wq_lockstep_train",)
    cfg.DATASETS.TEST = ("wq_lockstep_test",)
    return cfg


def _gt_arrays(boxes, classes):
    b = len(boxes)
    bx = np.zeros((b, GT_CAP, 4), np.float32)
    cl = np.zeros((b, GT_CAP), np.int32)
    vd = np.zeros((b, GT_CAP), bool)
    for i, (bb, cc) in enumerate(zip(boxes, classes)):
        k = len(bb)
        bx[i, :k] = bb
        cl[i, :k] = cc
        vd[i, :k] = True
    return bx, cl, vd


def run_wq_lockstep(n_steps: int = 30, seed: int = 0) -> Dict:
    cfg = wq_lockstep_cfg()
    tr = build_trainer(cfg, synthetic=True)

    torch_model = TorchTinyFasterRCNN(
        num_classes=tr.det_cfg.num_classes,
        num_anchors=tr.det_cfg.num_anchors,
        fc_dim=tr.det_cfg.fc_dim,
        pooler=tr.det_cfg.pooler_resolution,
    )
    torch_model.load_flax(
        jax.device_get(tr.state.params), jax.device_get(tr.state.batch_stats)
    )
    anchors = np.asarray(anchors_for(tr.det_cfg, CANVAS))
    mirror = TorchLockstepTrainer(
        torch_model, tr.det_cfg, anchors,
        lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
    )

    batches = make_batches(n_steps, BATCH, seed + 1)
    sizes = np.asarray([[CANVAS[0], CANVAS[1]]] * BATCH, np.int32)

    jax_losses, torch_losses, loss_rel, drift_curve = [], [], [], []
    rel = {}
    # identity strong aug: both stacks see the identical pre-augmented pixels
    orig_strong = T_mod.strong_augment
    T_mod.strong_augment = lambda rng, img, true_hw=None: img
    try:
        for images, boxes, classes in batches:
            bx, cl, vd = _gt_arrays(boxes, classes)
            metrics = tr.run_step(
                {
                    "images": images,
                    "sizes": sizes,
                    "gt_boxes": bx,
                    "gt_classes": cl,
                    "gt_valid": vd,
                }
            )
            t_metrics = mirror.step(
                images.transpose(0, 3, 1, 2), boxes, classes, CANVAS
            )
            parts = ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg")
            jl = {k: float(metrics[k]) for k in parts}
            jl["total_loss"] = sum(jl.values())
            jax_losses.append(jl)
            torch_losses.append(t_metrics)
            loss_rel.append(
                abs(jl["total_loss"] - t_metrics["total_loss"])
                / max(abs(t_metrics["total_loss"]), 1e-9)
            )
            a = _flatten_params(
                jax.device_get(tr.state.params), jax.device_get(tr.state.batch_stats)
            )
            b = torch_model.export_flax_like()
            rel = {
                k: float(np.linalg.norm(a[k] - b[k]) / max(np.linalg.norm(b[k]), 1e-4))
                for k in b
                if k in a
            }
            drift_curve.append(max(rel.values()))
    finally:
        T_mod.strong_augment = orig_strong

    return {
        "jax_losses": jax_losses,
        "torch_losses": torch_losses,
        "loss_rel": loss_rel,
        "param_drift": drift_curve,
        "worst_leaves": rel,
    }
