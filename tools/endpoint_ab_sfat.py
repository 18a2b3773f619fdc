"""SFAT ADAPTATION endpoint train-to-AP differential: JAX vs the torch mirror.

tools/endpoint_ab.py measures the supervised (`base`) endpoint; this tool
extends the experiment to the source-free adaptation workload, trained all
the way to an eval METRIC on a domain-shifted target set. Two variants:

- --variant single: the `_single` chain (reference
  source_free_adaptive_teacher_single.py:370-581: STUDENT pseudo-labels on
  the weak view, BBOX_THRESHOLD cut, student update on the pseudo GT, EMA
  teacher). MEASURED CAVEAT (PARITY_EVIDENCE round 4): at this experiment's
  model quality the student-pseudo loop is structurally unstable — sub-recall
  pseudo sets label true objects background and both stacks run away to AP 0
  identically (agreement, but vacuous).
- --variant fixed (the measured configuration): the main trainer
  (reference sfat.py: pseudo from a FROZEN teacher that is never .eval()'d,
  so its train-mode pseudo forward nudges its BN stats toward the target;
  no EMA). Stable; adaptation beats the source floor on the teacher arm.

Per seed:
  1. SOURCE phase (JAX only): train the `base` trainer on clean scenes
     (endpoint_ab's generator) with real d2 subsampling. The resulting
     checkpoint is the shared starting point — transplanted bit-exactly into
     BOTH stacks, so the A/B isolates the adaptation semantics.
  2. TARGET domain: the same scene process under "fog" — a global blend
     toward gray (img*(1-a) + 150*a, quantised to uint8). GT is unchanged;
     both stacks see the SAME uint8 target pixels.
  3. ADAPTATION: N steps of `source_free_adaptive_teacher_single` (the real
     jitted trainer) vs tests/torch_mirror.TorchRealSamplingMirror.adapt_step
     (d2-real RPN/ROI subsampling, intentionally different sampling streams),
     same per-seed batch order, weak==strong contract (WEAK_STRONG_AUGMENT
     off, flip off, SPLIT_VIEW_BN two-pass BN), EMA keep 0.99 on both sides
     (the reference's 0.9996 horizon-scaled to the 400-step experiment).
  4. ENDPOINT: student AND EMA-teacher AP50 on held-out FOGGED scenes through
     the same COCOEvaluator, plus the un-adapted source model's target AP50
     (the floor adaptation must beat for the A/B to be non-vacuous).

A semantic gap in the adaptation chain (threshold, pseudo-label routing, BN
bookkeeping, EMA, unsupervised loss weighting) would bias one stack's
endpoint across seeds; framework equivalence predicts agreement within the
seed-noise band.

Usage: python tools/endpoint_ab_sfat.py [--src-steps 300] [--adapt-steps 400]
         [--seeds 3] [--fog 0.45] [--json OUT]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from endpoint_ab import (  # noqa: E402
    BATCH, CANVAS, LR, MOMENTUM, N_EVAL, N_TRAIN, WEIGHT_DECAY,
    ab_cfg, batches_for, eval_ap50, make_dataset, to_batch,
)
import ab_stats  # noqa: E402

FOG_GRAY = 150.0
EMA_KEEP_RATE = 0.99
# The reference default BBOX_THRESHOLD=0.8 assumes a converged VGG16 whose
# positive scores saturate near 1; this experiment's tiny source model
# (300-600 steps) peaks ~0.92 under the train-mode BN the `_single` weak
# pass runs with, and at 0.8 pseudo-labels starve (~4 boxes over the whole
# target set -> self-training suppresses everything, both stacks collapse
# to AP 0 identically — measured, see PARITY_EVIDENCE). 0.5 is the same
# horizon-scaling applied to EMA (0.9996 -> 0.99): ~1 pseudo box/image at
# step 0. Override with --threshold.
BBOX_THRESHOLD = 0.5
UNSUP_WEIGHT = 1.0
# Adaptation-phase LR. The `_single` student-pseudo loop is a positive-
# feedback system: at the source-training LR (0.02) any sub-recall pseudo
# set drives detection suppression faster than the BN/self-training gain
# accrues (the r4 AP-0 collapses). A gentler adaptation LR is the
# reference's own regime (its adaptation schedules run at the tail of a
# warmup-decayed schedule, not the peak source LR). None = same LR.
ADAPT_LR = None


def fog_scene(scene, alpha: float):
    """Target-domain version of a scene: global blend toward FOG_GRAY,
    quantised to uint8 so both stacks consume identical pixels."""
    img, boxes, classes = scene
    fogged = np.clip(img * (1.0 - alpha) + FOG_GRAY * alpha, 0, 255)
    return np.round(fogged).astype(np.uint8), boxes, classes


def make_target_sets(alpha: float, n_train: int = N_TRAIN, n_eval: int = N_EVAL):
    """(adaptation images, held-out fogged eval set). Fresh scene seeds —
    the target domain is a different draw of the same process, fogged."""
    adapt = [fog_scene(s, alpha) for s in make_dataset(n_train, seed=300)]
    evals = [fog_scene(s, alpha) for s in make_dataset(n_eval, seed=400)]
    return adapt, evals


def sfat_cfg(seed: int, trainer: str = "source_free_adaptive_teacher_single"):
    """The real adaptation trainer under the mirror's contract: real d2
    subsampling, weak==strong views, two-pass BN. `_single` = student
    pseudo + EMA teacher; `source_free_adaptive_teacher` = fixed teacher
    (train-mode pseudo forward nudging its BN stats), no EMA."""
    from simple_sfod_tpu.data.synthetic import register_synthetic

    cfg = ab_cfg(seed).clone()
    cfg.defrost()
    cfg.TRAINER = trainer
    if ADAPT_LR is not None:
        cfg.SOLVER.BASE_LR = ADAPT_LR
    cfg.SEMISUPNET.BBOX_THRESHOLD = BBOX_THRESHOLD
    cfg.SEMISUPNET.EMA_KEEP_RATE = EMA_KEEP_RATE
    cfg.SEMISUPNET.TEACHER_UPDATE_ITER = 1
    cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT = UNSUP_WEIGHT
    cfg.SEMISUPNET.SPLIT_VIEW_BN = True
    cfg.SEMISUPNET.DIS_TYPE = "tiny1"
    cfg.SEMISUPNET.INS_DC = False
    cfg.DOMAIN_CLASSIFIER.ENABLED = False
    cfg.ADAPTIVE_THRESHOLD.ENABLED = False
    cfg.STYLE.ENABLED = False
    cfg.WEAK_STRONG_AUGMENT = False
    register_synthetic("endpoint_sfat_target", 4, CANVAS, 4, seed=11)
    register_synthetic("endpoint_sfat_test", 2, CANVAS, 4, seed=12)
    cfg.DATASETS.TRAIN = ("endpoint_sfat_target",)
    cfg.DATASETS.TRAIN_TARGET = ("endpoint_sfat_target",)
    cfg.DATASETS.TEST = ("endpoint_sfat_test",)
    cfg.OUTPUT_DIR = f"/tmp/endpoint_ab_sfat/seed{seed}"
    cfg.freeze()
    return cfg


def train_source_jax(seed: int, steps: int, train):
    """endpoint_ab.run_jax without the eval: returns the source checkpoint
    (det params + batch stats, host numpy) after `steps` of the real `base`
    trainer."""
    import jax

    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = ab_cfg(seed)
    tr = build_trainer(cfg, synthetic=True)
    for idxs in batches_for(train, steps, seed):
        tr.run_step(to_batch(train, idxs))
    params = tr.state.params  # `base` holds the det tree directly
    if isinstance(params, dict) and "det" in params:
        params = params["det"]
    det_params = jax.tree.map(np.asarray, jax.device_get(params))
    stats = jax.tree.map(np.asarray, jax.device_get(tr.state.batch_stats))
    return det_params, stats


def jax_det_fn(det, variables):
    import jax
    import jax.numpy as jnp

    infer = jax.jit(det.infer)
    sizes = jnp.asarray([[CANVAS[0], CANVAS[1]]], jnp.int32)

    def det_fn(img):
        d = jax.device_get(infer(variables, jnp.asarray(img[None], jnp.float32), sizes))
        keep = np.asarray(d.valid[0])
        return (
            np.asarray(d.boxes[0])[keep],
            np.asarray(d.scores[0])[keep],
            np.asarray(d.classes[0])[keep],
        )

    return det_fn


def torch_det_fn(mirror):
    import torch

    mirror.model.eval()

    def det_fn(img):
        with torch.no_grad():
            feat = mirror.model.features(
                mirror.normalize(np.asarray(img, np.float32).transpose(2, 0, 1)[None])
            )
            (b, s, c), = mirror.detect(feat, CANVAS)
        return b.numpy(), s.numpy(), c.numpy()

    return det_fn


def nested_from_flat(flat):
    """export_flax_like {path/leaf: arr} -> (params, batch_stats) trees in
    TorchTinyFasterRCNN.load_flax's expected layout."""
    params, stats = {}, {}
    for k, v in flat.items():
        parts = k.split("/")
        dst = stats if parts[-1] in ("mean", "var") else params
        cur = dst
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = np.asarray(v)
    return params, stats


def run_adapt_jax(seed: int, steps: int, det_params, stats, adapt_set, eval_set,
                  trainer: str = "source_free_adaptive_teacher_single"):
    import jax

    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = sfat_cfg(seed, trainer)
    tr = build_trainer(cfg, synthetic=True)
    params = dict(tr.state.params)
    params["det"] = jax.tree.map(np.copy, det_params)
    tr.state = tr.state.replace(
        params=params,
        batch_stats=jax.tree.map(np.copy, stats),
        teacher_params=jax.tree.map(np.copy, det_params),
        teacher_stats=jax.tree.map(np.copy, stats),
    )
    sizes = np.tile(np.asarray([[CANVAS[0], CANVAS[1]]], np.int32), (BATCH, 1))
    pseudo = []
    for idxs in batches_for(adapt_set, steps, seed):
        images = np.stack([adapt_set[i][0] for i in idxs])
        m = tr.run_step({"images": images, "sizes": sizes})
        pseudo.append(float(m["num_pseudo"]))
    student = {"params": tr.state.params["det"], "batch_stats": tr.state.batch_stats}
    ap_student = eval_ap50(jax_det_fn(tr.detector, student), eval_set)
    ap_teacher = eval_ap50(jax_det_fn(tr.detector, tr.state.teacher_variables()), eval_set)
    return {
        "ap50_student": ap_student,
        "ap50_teacher": ap_teacher,
        "pseudo_per_step": float(np.mean(pseudo)),
        "pseudo_last50": float(np.mean(pseudo[-50:])),
    }


def run_adapt_torch(seed: int, steps: int, det_params, stats, adapt_set, eval_set,
                    trainer: str = "source_free_adaptive_teacher_single",
                    sample_seed_base: int = 7):
    from simple_sfod_tpu.config import detector_config_from_cfg
    from simple_sfod_tpu.models.faster_rcnn import anchors_for

    from torch_mirror import TorchRealSamplingMirror, TorchTinyFasterRCNN

    cfg = sfat_cfg(seed, trainer)
    det_cfg = detector_config_from_cfg(cfg)

    def fresh_model():
        return TorchTinyFasterRCNN(
            num_classes=det_cfg.num_classes,
            num_anchors=det_cfg.num_anchors,
            fc_dim=det_cfg.fc_dim,
            pooler=det_cfg.pooler_resolution,
        )

    tm = fresh_model()
    tm.load_flax(det_params, stats)
    mirror = TorchRealSamplingMirror(
        tm, det_cfg, np.asarray(anchors_for(det_cfg, CANVAS)),
        lr=(ADAPT_LR if ADAPT_LR is not None else LR),
        momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
        sample_seed=seed + sample_seed_base,
    )
    # the SFAT knobs ride the TorchSFATSingleMirror defaults; pin them to the
    # experiment's values explicitly (same numbers on the JAX side's cfg)
    mirror.bbox_threshold = BBOX_THRESHOLD
    mirror.unsup_weight = UNSUP_WEIGHT
    mirror.keep_rate = EMA_KEEP_RATE
    mirror.teacher = {k: v.copy() for k, v in tm.export_flax_like().items()}
    if trainer == "source_free_adaptive_teacher":
        # fixed-teacher main variant: pseudo from a separate teacher model,
        # train-mode forward (nudges its BN stats), no EMA
        teacher_model = fresh_model()
        teacher_model.load_flax(det_params, stats)
        mirror.teacher_model = teacher_model

    pseudo = []
    for idxs in batches_for(adapt_set, steps, seed):
        images = np.stack([adapt_set[i][0] for i in idxs]).astype(np.float32)
        m = mirror.adapt_step(images.transpose(0, 3, 1, 2), CANVAS)
        pseudo.append(float(m["num_pseudo"]))

    ap_student = eval_ap50(torch_det_fn(mirror), eval_set)
    teacher_model = fresh_model()
    teacher_model.load_flax(*nested_from_flat(mirror.teacher))
    teacher_mirror = copy.copy(mirror)
    teacher_mirror.model = teacher_model
    ap_teacher = eval_ap50(torch_det_fn(teacher_mirror), eval_set)
    return {
        "ap50_student": ap_student,
        "ap50_teacher": ap_teacher,
        "pseudo_per_step": float(np.mean(pseudo)),
        "pseudo_last50": float(np.mean(pseudo[-50:])),
    }


def run_seed(seed: int, src_steps: int, adapt_steps: int, alpha: float,
             src_train, adapt_set, eval_set,
             trainer: str = "source_free_adaptive_teacher_single",
             torch_torch: bool = False) -> dict:
    import jax

    from simple_sfod_tpu.config import detector_config_from_cfg
    from simple_sfod_tpu.models.detector import Detector

    det_params, stats = train_source_jax(seed, src_steps, src_train)
    det = Detector(detector_config_from_cfg(ab_cfg(seed)))
    src_vars = {"params": det_params, "batch_stats": stats}
    ap_source = eval_ap50(jax_det_fn(det, src_vars), eval_set)
    if torch_torch:
        # chaos-floor control: the SAME torch mirror twice, differing only in
        # the RPN/ROI sampling-stream seed (endpoint_ab.py --torch-torch
        # analog). The "jax" slot holds torchB so the paired-delta machinery
        # below measures torch-vs-torch sampling chaos directly.
        rj = run_adapt_torch(seed, adapt_steps, det_params, stats, adapt_set,
                             eval_set, trainer, sample_seed_base=1007)
    else:
        rj = run_adapt_jax(seed, adapt_steps, det_params, stats, adapt_set, eval_set, trainer)
    rt = run_adapt_torch(seed, adapt_steps, det_params, stats, adapt_set, eval_set, trainer)
    return {"seed": seed, "ap50_source_on_target": ap_source, "jax": rj, "torch": rt}


def main():
    global BBOX_THRESHOLD, EMA_KEEP_RATE, UNSUP_WEIGHT, ADAPT_LR
    import jax

    jax.config.update("jax_platforms", "cpu")
    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--src-steps", type=int, default=600)
    ap.add_argument("--adapt-steps", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--fog", type=float, default=0.3)
    ap.add_argument("--threshold", type=float, default=BBOX_THRESHOLD)
    ap.add_argument("--ema", type=float, default=EMA_KEEP_RATE,
                    help="EMA keep rate (the `_single` stability knob)")
    ap.add_argument("--unsup-weight", type=float, default=UNSUP_WEIGHT)
    ap.add_argument("--adapt-lr", type=float, default=None,
                    help="adaptation-phase LR (default: the source LR)")
    ap.add_argument("--eval-images", type=int, default=N_EVAL,
                    help="held-out fogged eval set size")
    ap.add_argument(
        "--variant", choices=("single", "fixed"), default="single",
        help="single = `_single` (student pseudo + EMA teacher); fixed = "
        "the main trainer (frozen-teacher pseudo w/ train-mode BN, no EMA)",
    )
    ap.add_argument("--torch-torch", action="store_true",
                    help="chaos-floor control: torchB (sampling stream 1007) "
                    "in the jax slot vs torchA (stream 7); the paired deltas "
                    "then measure pure sampling-stream chaos")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    BBOX_THRESHOLD = args.threshold
    EMA_KEEP_RATE = args.ema
    UNSUP_WEIGHT = args.unsup_weight
    ADAPT_LR = args.adapt_lr
    trainer = {
        "single": "source_free_adaptive_teacher_single",
        "fixed": "source_free_adaptive_teacher",
    }[args.variant]

    src_train = make_dataset(N_TRAIN, seed=100)
    adapt_set, eval_set = make_target_sets(args.fog, n_eval=args.eval_images)

    out = {
        "src_steps": args.src_steps,
        "adapt_steps": args.adapt_steps,
        "fog": args.fog,
        "ema_keep_rate": EMA_KEEP_RATE,
        "bbox_threshold": BBOX_THRESHOLD,
        "unsup_weight": UNSUP_WEIGHT,
        "adapt_lr": ADAPT_LR,
        "eval_images": args.eval_images,
        "variant": args.variant,
        "control": args.torch_torch,
        "per_seed": [],
    }
    if args.torch_torch:
        print("[control] jax slot = torchB (sampling stream 1007)", flush=True)
    for seed in range(args.seeds):
        r = run_seed(seed, args.src_steps, args.adapt_steps, args.fog,
                     src_train, adapt_set, eval_set, trainer,
                     torch_torch=args.torch_torch)
        out["per_seed"].append(r)
        print(
            f"[seed {seed}] source@target AP50={r['ap50_source_on_target']:.2f} | "
            f"jax: stu={r['jax']['ap50_student']:.2f} tea={r['jax']['ap50_teacher']:.2f} "
            f"pseudo={r['jax']['pseudo_per_step']:.1f} | "
            f"torch: stu={r['torch']['ap50_student']:.2f} tea={r['torch']['ap50_teacher']:.2f} "
            f"pseudo={r['torch']['pseudo_per_step']:.1f}",
            flush=True,
        )

    for side in ("jax", "torch"):
        for who in ("student", "teacher"):
            vals = np.asarray([r[side][f"ap50_{who}"] for r in out["per_seed"]])
            out[f"{side}_{who}_mean"] = float(vals.mean())
            out[f"{side}_{who}_std"] = float(vals.std(ddof=1)) if len(vals) > 1 else None
    out["source_mean"] = float(
        np.mean([r["ap50_source_on_target"] for r in out["per_seed"]])
    )
    out["delta_teacher"] = float(
        abs(out["jax_teacher_mean"] - out["torch_teacher_mean"])
    )
    out["delta_student"] = float(
        abs(out["jax_student_mean"] - out["torch_student_mean"])
    )
    # PAIRED per-seed deltas (both arms share the seed's source checkpoint
    # and batch order): the CI on the mean paired delta is the parity claim
    for who in ("student", "teacher"):
        j = [r["jax"][f"ap50_{who}"] for r in out["per_seed"]]
        t = [r["torch"][f"ap50_{who}"] for r in out["per_seed"]]
        if len(j) > 1:
            out[f"paired_{who}"] = ab_stats.paired_stats(j, t)
    # adaptation must beat the source floor for the comparison to be
    # non-vacuous; record the margin explicitly
    out["adaptation_margin_teacher"] = float(
        out["jax_teacher_mean"] - out["source_mean"]
    )
    print(json.dumps({k: v for k, v in out.items() if k != "per_seed"}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
