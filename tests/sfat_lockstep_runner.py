"""Lockstep JAX-vs-torch differential for the SFAT `_single` ADAPTATION step.

The supervised lockstep (lockstep_runner.py) bounds the drift of the
optimizer/BN/loss stack; this runner extends the differential to the flagship
source-free adaptation semantics — the full chain the reference runs per step
(source_free_adaptive_teacher_single.py run_step): train-mode forward,
test-time inference on the weak view, BBOX_THRESHOLD pseudo-labelling,
student update on the pseudo GT, EMA teacher update. It drives the REAL
trainer (`source_free_adaptive_teacher_single` via build_trainer, jitted
step and all) against the pure-torch mirror (torch_mirror.TorchSFATSingleMirror).

Determinism contract on top of the supervised one (take-all sampling):
INPUT.RANDOM_FLIP "none" + WEAK_STRONG_AUGMENT False (weak == strong view),
SEMISUPNET.SPLIT_VIEW_BN True (reference-exact two-pass BN), DC / adaptive
threshold / style off. The class-1 logit bias of the predictor is raised at
init so the randomly-initialised detector already emits detections above the
0.8 threshold — pseudo-labels flow from step 0 without a pre-training phase
(softmax(+4) over 4 foreground classes + background ~ 0.93).
"""

from __future__ import annotations

import copy
from typing import Dict

import jax
import numpy as np

from simple_sfod_tpu.config import get_cfg
from simple_sfod_tpu.data.synthetic import register_synthetic
from simple_sfod_tpu.engine.trainers import build_trainer
from simple_sfod_tpu.models.faster_rcnn import anchors_for

from lockstep_runner import _flatten_params
from torch_mirror import TorchSFATSingleMirror, TorchTinyFasterRCNN

CANVAS = (64, 128)
BATCH = 2
LR = 0.02
MOMENTUM = 0.9
WEIGHT_DECAY = 1e-4
EMA_KEEP_RATE = 0.99
BBOX_THRESHOLD = 0.8
CLS_BIAS_BOOST = 4.0  # added to the class-1 logit bias at init


def sfat_lockstep_cfg():
    cfg = get_cfg()
    cfg.TRAINER = "source_free_adaptive_teacher_single"
    cfg.MODEL.BACKBONE.NAME = "build_tiny_backbone"
    cfg.MODEL.RPN.IN_FEATURES = ("tiny1",)
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ("tiny1",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    # 6 anchors/location x 16x32 locations = 3072 anchors: under the 4096
    # pre-NMS lowering cap, so pre-NMS top-k is the identity on both sides,
    # and under RPN.BATCH_SIZE_PER_IMAGE for the take-all contract
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16, 32]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 4096
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 4096
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 4096
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64  # >= 32 proposals + 16 pseudo
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.SEMISUPNET.BBOX_THRESHOLD = BBOX_THRESHOLD
    cfg.SEMISUPNET.EMA_KEEP_RATE = EMA_KEEP_RATE
    cfg.SEMISUPNET.TEACHER_UPDATE_ITER = 1
    cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT = 1.0
    cfg.SEMISUPNET.SPLIT_VIEW_BN = True  # reference-exact two-pass BN
    cfg.SEMISUPNET.DIS_TYPE = "tiny1"
    cfg.SEMISUPNET.INS_DC = False
    cfg.DOMAIN_CLASSIFIER.ENABLED = False
    cfg.ADAPTIVE_THRESHOLD.ENABLED = False
    cfg.STYLE.ENABLED = False
    cfg.WEAK_STRONG_AUGMENT = False
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.INPUT.MIN_SIZE_TRAIN = (CANVAS[0],)
    cfg.INPUT.MIN_SIZE_TEST = CANVAS[0]
    cfg.SOLVER.BASE_LR = LR
    cfg.SOLVER.MOMENTUM = MOMENTUM
    cfg.SOLVER.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.IMS_PER_BATCH = BATCH
    cfg.SOLVER.IMS_PER_BATCH_TARGET = BATCH
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.VAL_LOSS = False
    cfg.VIS_PERIOD = 0
    cfg.TPU.CANVAS = CANVAS
    cfg.TPU.GT_CAPACITY = 8
    cfg.TPU.MESH_DATA = 1
    cfg.TPU.DTYPE = "float32"
    cfg.SEED = 0
    cfg.OUTPUT_DIR = "/tmp/sfod_lockstep_sfat"
    register_synthetic("lockstep_target", 4, CANVAS, 4, seed=1)
    register_synthetic("lockstep_test", 2, CANVAS, 4, seed=2)
    cfg.DATASETS.TRAIN = ("lockstep_target",)
    cfg.DATASETS.TRAIN_TARGET = ("lockstep_target",)
    cfg.DATASETS.TEST = ("lockstep_test",)
    return cfg


def _boost_cls_bias(tree):
    """Return a copy of a detector params tree with the class-1 predictor
    logit bias raised by CLS_BIAS_BOOST."""
    tree = copy.deepcopy(jax.device_get(tree))
    bias = np.asarray(tree["predictor"]["cls_score"]["bias"]).copy()
    bias[1] += CLS_BIAS_BOOST
    tree["predictor"]["cls_score"]["bias"] = bias
    return jax.tree.map(lambda x: np.asarray(x), tree)


def run_sfat_lockstep(n_steps: int = 30, seed: int = 0) -> Dict:
    cfg = sfat_lockstep_cfg()
    tr = build_trainer(cfg, synthetic=True)

    # inject the confident class-1 bias into student AND teacher (both are
    # "the source checkpoint" in the reference's terms)
    state = tr.state
    det_params = _boost_cls_bias(state.params["det"])
    params = dict(state.params)
    params["det"] = det_params
    tr.state = state.replace(
        params=params,
        teacher_params=copy.deepcopy(det_params),
    )

    torch_model = TorchTinyFasterRCNN(
        num_classes=tr.det_cfg.num_classes,
        num_anchors=tr.det_cfg.num_anchors,
        fc_dim=tr.det_cfg.fc_dim,
        pooler=tr.det_cfg.pooler_resolution,
    )
    torch_model.load_flax(det_params, jax.device_get(tr.state.batch_stats))
    anchors = np.asarray(anchors_for(tr.det_cfg, CANVAS))
    mirror = TorchSFATSingleMirror(
        torch_model, tr.det_cfg, anchors,
        lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
        bbox_threshold=BBOX_THRESHOLD,
        unsup_weight=float(cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT),
        ema_keep_rate=EMA_KEEP_RATE,
    )

    rs = np.random.RandomState(seed + 17)
    sizes = np.asarray([[CANVAS[0], CANVAS[1]]] * BATCH, np.int32)

    jax_losses, torch_losses, loss_rel = [], [], []
    drift_curve, teacher_drift_curve = [], []
    pseudo_jax, pseudo_torch = [], []
    rel = t_rel = {}
    for _ in range(n_steps):
        images = rs.randint(0, 256, (BATCH, *CANVAS, 3)).astype(np.uint8)
        metrics = tr.run_step({"images": images, "sizes": sizes})
        t_metrics = mirror.adapt_step(
            images.transpose(0, 3, 1, 2).astype(np.float32), CANVAS
        )

        parts = ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg")
        jl = {k: float(metrics[f"{k}_pseudo"]) for k in parts}
        jl["total_loss"] = float(metrics["total_loss"])
        jax_losses.append(jl)
        torch_losses.append(
            {k: t_metrics[k] for k in parts} | {"total_loss": t_metrics["total_loss"]}
        )
        loss_rel.append(
            abs(jl["total_loss"] - t_metrics["total_loss"])
            / max(abs(t_metrics["total_loss"]), 1e-9)
        )
        pseudo_jax.append(int(metrics["num_pseudo"]))
        pseudo_torch.append(int(t_metrics["num_pseudo"]))

        # student drift
        a = _flatten_params(
            jax.device_get(tr.state.params["det"]), jax.device_get(tr.state.batch_stats)
        )
        b = torch_model.export_flax_like()
        rel = {
            k: float(np.linalg.norm(a[k] - b[k]) / max(np.linalg.norm(b[k]), 1e-4))
            for k in b
            if k in a
        }
        drift_curve.append(max(rel.values()))
        # teacher drift (EMA tree)
        ta = _flatten_params(
            jax.device_get(tr.state.teacher_params), jax.device_get(tr.state.teacher_stats)
        )
        t_rel = {
            k: float(
                np.linalg.norm(ta[k] - mirror.teacher[k])
                / max(np.linalg.norm(mirror.teacher[k]), 1e-4)
            )
            for k in mirror.teacher
            if k in ta
        }
        teacher_drift_curve.append(max(t_rel.values()))

    return {
        "jax_losses": jax_losses,
        "torch_losses": torch_losses,
        "loss_rel": loss_rel,
        "param_drift": drift_curve,
        "teacher_drift": teacher_drift_curve,
        "pseudo_jax": pseudo_jax,
        "pseudo_torch": pseudo_torch,
        "worst_leaves": rel,
        "worst_teacher_leaves": t_rel,
    }


def run_sfat_main_lockstep(n_steps: int = 8, seed: int = 0) -> Dict:
    """Lockstep differential for the FIXED-TEACHER main variant
    (`source_free_adaptive_teacher`): pseudo-labels come from a separate
    teacher model that is never .eval()'d (reference sfat.py:385-390, the
    .eval() block at :374-383 commented out), so its pseudo forward runs
    train-mode BN and NUDGES the teacher's running stats; there is no EMA
    (ref :581 commented out). Compares per step: pseudo sets, losses,
    student drift, and the TEACHER tree — params must stay exactly at init
    on both sides while the running stats move in lockstep (means to float
    noise, vars up to the known biased/unbiased factor)."""
    cfg = sfat_lockstep_cfg()
    cfg.TRAINER = "source_free_adaptive_teacher"
    tr = build_trainer(cfg, synthetic=True)

    state = tr.state
    det_params = _boost_cls_bias(state.params["det"])
    # Offset the STUDENT from the (fixed) teacher: at teacher == student the
    # pseudo boxes are the student's own decoded outputs and the
    # box-regression L1 sits at its structural zero (gradient =
    # sign(float-noise) — the `_single` chaos mechanism). A small bbox_pred
    # bias shift, applied identically on both frameworks, makes the
    # regression targets real so the main variant locksteps tightly.
    student_params = copy.deepcopy(det_params)
    student_params["predictor"]["bbox_pred"]["bias"] = (
        np.asarray(student_params["predictor"]["bbox_pred"]["bias"]) + 1e-2
    )
    params = dict(state.params)
    params["det"] = student_params
    tr.state = state.replace(
        params=params,
        teacher_params=copy.deepcopy(det_params),
    )
    stats0 = jax.device_get(tr.state.batch_stats)

    def fresh(tree):
        tm = TorchTinyFasterRCNN(
            num_classes=tr.det_cfg.num_classes,
            num_anchors=tr.det_cfg.num_anchors,
            fc_dim=tr.det_cfg.fc_dim,
            pooler=tr.det_cfg.pooler_resolution,
        )
        tm.load_flax(tree, stats0)
        return tm

    student, teacher = fresh(student_params), fresh(det_params)
    anchors = np.asarray(anchors_for(tr.det_cfg, CANVAS))
    mirror = TorchSFATSingleMirror(
        student, tr.det_cfg, anchors,
        lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
        bbox_threshold=BBOX_THRESHOLD,
        unsup_weight=float(cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT),
    )
    mirror.teacher_model = teacher

    rs = np.random.RandomState(seed + 17)
    sizes = np.asarray([[CANVAS[0], CANVAS[1]]] * BATCH, np.int32)
    teacher_params0 = _flatten_params(det_params, {})

    out = {
        "loss_rel": [], "pseudo_jax": [], "pseudo_torch": [],
        "param_drift": [], "teacher_mean_rel": [], "teacher_var_rel": [],
        "teacher_param_frozen_jax": True, "teacher_param_frozen_torch": True,
    }
    for _ in range(n_steps):
        images = rs.randint(0, 256, (BATCH, *CANVAS, 3)).astype(np.uint8)
        metrics = tr.run_step({"images": images, "sizes": sizes})
        t_metrics = mirror.adapt_step(
            images.transpose(0, 3, 1, 2).astype(np.float32), CANVAS
        )
        out["loss_rel"].append(
            abs(float(metrics["total_loss"]) - t_metrics["total_loss"])
            / max(abs(t_metrics["total_loss"]), 1e-9)
        )
        out["pseudo_jax"].append(int(metrics["num_pseudo"]))
        out["pseudo_torch"].append(int(t_metrics["num_pseudo"]))

        a = _flatten_params(
            jax.device_get(tr.state.params["det"]), jax.device_get(tr.state.batch_stats)
        )
        b = student.export_flax_like()
        out["param_drift"].append(max(
            float(np.linalg.norm(a[k] - b[k]) / max(np.linalg.norm(b[k]), 1e-4))
            for k in b if k in a
        ))
        # teacher tree: params frozen at init, stats nudged in lockstep
        ja = _flatten_params(
            jax.device_get(tr.state.teacher_params),
            jax.device_get(tr.state.teacher_stats),
        )
        tb = teacher.export_flax_like()
        mean_rel, var_rel = 0.0, 0.0
        for k in tb:
            if k not in ja:
                continue
            rel = float(
                np.linalg.norm(ja[k] - tb[k]) / max(np.linalg.norm(tb[k]), 1e-4)
            )
            if k.endswith("/mean"):
                mean_rel = max(mean_rel, rel)
            elif k.endswith("/var"):
                var_rel = max(var_rel, rel)
            else:
                if not np.array_equal(ja[k], teacher_params0[k]):
                    out["teacher_param_frozen_jax"] = False
                if not np.array_equal(tb[k], teacher_params0[k]):
                    out["teacher_param_frozen_torch"] = False
        out["teacher_mean_rel"].append(mean_rel)
        out["teacher_var_rel"].append(var_rel)
    stats0_flat = _flatten_params({}, stats0)
    final = _flatten_params({}, jax.device_get(tr.state.teacher_stats))
    out["teacher_stats_moved"] = any(
        not np.array_equal(final[k], stats0_flat[k]) for k in stats0_flat
    )
    return out


def run_chaos_floor(n_steps: int = 12, seed: int = 0, eps: float = 1e-6) -> Dict:
    """The intrinsic chaos floor of the SFAT adaptation step, measured
    torch-vs-torch: two IDENTICAL mirrors, one with a single eps-perturbed
    backbone weight, driven on the same batches.

    Why this exists: the pseudo-GT boxes are the box head's own decoded
    outputs, so for every (proposal -> its own kept detection) pair the
    box-regression L1 argument is a STRUCTURAL ZERO (decode o encode =
    identity up to float error) and its gradient is sign(eps-noise) — the
    adaptation dynamics are discontinuous at the operating point. Any two
    numerically-distinct executions of the SAME semantics (two torch runs eps
    apart, or torch vs JAX) therefore diverge at a rate set by the algorithm,
    not by framework semantics. The lockstep assertion is that JAX-vs-torch
    drift is bounded by a small multiple of this floor."""
    cfg = sfat_lockstep_cfg()
    tr = build_trainer(cfg, synthetic=True)  # init source only
    det_params = _boost_cls_bias(tr.state.params["det"])
    stats = jax.device_get(tr.state.batch_stats)

    mirrors = []
    for perturb in (False, True):
        tm = TorchTinyFasterRCNN(
            num_classes=tr.det_cfg.num_classes,
            num_anchors=tr.det_cfg.num_anchors,
            fc_dim=tr.det_cfg.fc_dim,
            pooler=tr.det_cfg.pooler_resolution,
        )
        tm.load_flax(det_params, stats)
        if perturb:
            with __import__("torch").no_grad():
                tm.conv0.weight[0, 0, 0, 0] += eps
        anchors = np.asarray(anchors_for(tr.det_cfg, CANVAS))
        mirrors.append(
            TorchSFATSingleMirror(
                tm, tr.det_cfg, anchors,
                lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
                bbox_threshold=BBOX_THRESHOLD,
                unsup_weight=float(cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT),
                ema_keep_rate=EMA_KEEP_RATE,
            )
        )

    rs = np.random.RandomState(seed + 17)  # same batch stream as the lockstep
    drift_curve, pseudo_a, pseudo_b, loss_rel = [], [], [], []
    for _ in range(n_steps):
        images = rs.randint(0, 256, (BATCH, *CANVAS, 3)).astype(np.uint8)
        x = images.transpose(0, 3, 1, 2).astype(np.float32)
        ma = mirrors[0].adapt_step(x, CANVAS)
        mb = mirrors[1].adapt_step(x, CANVAS)
        a = mirrors[0].model.export_flax_like()
        b = mirrors[1].model.export_flax_like()
        drift_curve.append(
            max(
                float(np.linalg.norm(a[k] - b[k]) / max(np.linalg.norm(b[k]), 1e-4))
                for k in b
            )
        )
        pseudo_a.append(ma["num_pseudo"])
        pseudo_b.append(mb["num_pseudo"])
        loss_rel.append(
            abs(ma["total_loss"] - mb["total_loss"]) / max(abs(mb["total_loss"]), 1e-9)
        )
    return {
        "param_drift": drift_curve,
        "pseudo_a": pseudo_a,
        "pseudo_b": pseudo_b,
        "loss_rel": loss_rel,
    }
