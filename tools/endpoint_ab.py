"""Endpoint train-to-AP differential: JAX `base` trainer vs the torch mirror
(VERDICT r3 #2; reference workload train_net.py:45-85).

The lockstep differentials (PARITY_EVIDENCE) prove the two stacks are in
semantic lockstep until chaotic decision divergence; this experiment measures
what that divergence does to the ENDPOINT. Both frameworks train the same
tiny Faster R-CNN from the same per-seed init on the SAME learnable synthetic
dataset with detectron2's REAL subsampling active (take-all contract OFF, so
each stack draws its own RPN/ROI sampling stream — intentionally different
RNG), then both are evaluated on the same held-out images through the SAME
COCOEvaluator. If the frameworks are semantically equivalent, their final APs
must agree within the seed-noise band; a semantic gap (loss term, sampling
distribution, BN bookkeeping) would bias one side's endpoint.

The JAX side is the REAL production trainer (build_trainer("base") -> the
jitted donated step), not a test double; the torch side is
tests/torch_mirror.TorchRealSamplingMirror.

Usage: python tools/endpoint_ab.py [--steps 400] [--seeds 3] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ab_stats  # noqa: E402

CANVAS = (64, 128)
GT_CAP = 8
N_TRAIN = 16
N_EVAL = 8
BATCH = 2
LR = 0.02
MOMENTUM = 0.9
WEIGHT_DECAY = 1e-4
# class k paints its rectangles at intensity 80 + 45k on a U(0, 50) noise
# background — learnable by a tiny conv stem, separable by class
CLASS_INTENSITY = (80.0, 125.0, 170.0, 215.0)


def make_scene(rs: np.random.RandomState):
    img = rs.uniform(0, 50, (*CANVAS, 3)).astype(np.float32)
    k = rs.randint(2, 4)
    boxes, classes = [], []
    for _ in range(k):
        w = rs.uniform(20, 48)
        h = rs.uniform(14, 32)
        x1 = rs.uniform(0, CANVAS[1] - w)
        y1 = rs.uniform(0, CANVAS[0] - h)
        c = rs.randint(0, 4)
        img[int(y1) : int(y1 + h), int(x1) : int(x1 + w)] = CLASS_INTENSITY[c]
        boxes.append([x1, y1, x1 + w, y1 + h])
        classes.append(c)
    return img, np.asarray(boxes, np.float32), np.asarray(classes, np.int64)


def make_dataset(n: int, seed: int):
    rs = np.random.RandomState(seed)
    return [make_scene(rs) for _ in range(n)]


def batches_for(train, n_steps: int, seed: int):
    """Batch index stream: per-epoch shuffles from a dedicated RNG (the same
    image stream for both frameworks at a given seed)."""
    rs = np.random.RandomState(seed + 1000)
    order: list = []
    while len(order) < n_steps * BATCH:
        order.extend(rs.permutation(len(train)))
    return [order[i * BATCH : (i + 1) * BATCH] for i in range(n_steps)]


def to_batch(train, idxs):
    imgs = np.stack([train[i][0] for i in idxs])
    bx = np.zeros((len(idxs), GT_CAP, 4), np.float32)
    cl = np.zeros((len(idxs), GT_CAP), np.int32)
    vd = np.zeros((len(idxs), GT_CAP), bool)
    for j, i in enumerate(idxs):
        k = len(train[i][1])
        bx[j, :k] = train[i][1]
        cl[j, :k] = train[i][2]
        vd[j, :k] = True
    return {
        "images": imgs,
        "sizes": np.tile(np.asarray([[CANVAS[0], CANVAS[1]]], np.int32), (len(idxs), 1)),
        "gt_boxes": bx,
        "gt_classes": cl,
        "gt_valid": vd,
    }


def ab_cfg(seed: int):
    """The real trainer's config: tiny backbone, REAL d2 sampling (RPN 64@0.5,
    ROI 32@0.25 — well below the candidate counts), no flip/warmup/freeze."""
    import __graft_entry__ as g

    cfg = g._tiny_cfg(1, canvas=CANVAS, backbone="tiny")
    cfg.TRAINER = "base"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.SOLVER.IMS_PER_BATCH = BATCH
    cfg.SOLVER.IMS_PER_BATCH_TARGET = BATCH
    cfg.SOLVER.BASE_LR = LR
    cfg.SOLVER.MOMENTUM = MOMENTUM
    cfg.SOLVER.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = ()
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.POSITIVE_FRACTION = 0.5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    cfg.TPU.GT_CAPACITY = GT_CAP
    cfg.SEED = seed
    cfg.OUTPUT_DIR = f"/tmp/endpoint_ab/seed{seed}"
    cfg.freeze()
    return cfg


def eval_ap50(det_fn, eval_set) -> float:
    """det_fn(image[H,W,3] f32) -> (boxes, scores, classes) numpy."""
    from simple_sfod_tpu.evaluation.coco_eval import COCOEvaluator

    ev = COCOEvaluator([f"c{i}" for i in range(4)])
    for i, (img, gtb, gtc) in enumerate(eval_set):
        b, s, c = det_fn(img)
        ev.process_image(i, b, s, c, gtb, gtc)
    return float(ev.evaluate()["AP50"])


def run_jax(seed: int, steps: int, train, eval_set) -> dict:
    import jax
    import jax.numpy as jnp

    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = ab_cfg(seed)
    tr = build_trainer(cfg, synthetic=True)
    losses = []
    for idxs in batches_for(train, steps, seed):
        m = tr.run_step(to_batch(train, idxs))
        losses.append(float(m["total_loss"]))

    variables = {
        "params": tr.state.params,
        "batch_stats": tr.state.batch_stats,
    }
    infer = jax.jit(tr.detector.infer)
    sizes = jnp.asarray([[CANVAS[0], CANVAS[1]]], jnp.int32)

    def det_fn(img):
        d = jax.device_get(infer(variables, jnp.asarray(img[None]), sizes))
        keep = np.asarray(d.valid[0])
        return (
            np.asarray(d.boxes[0])[keep],
            np.asarray(d.scores[0])[keep],
            np.asarray(d.classes[0])[keep],
        )

    ap50 = eval_ap50(det_fn, eval_set)
    return {"ap50": ap50, "final_loss": float(np.mean(losses[-20:]))}


def run_torch(seed: int, steps: int, train, eval_set, sample_seed_base: int = 7,
              cross_eval: bool = False) -> dict:
    import jax
    import numpy as _np
    import torch

    from simple_sfod_tpu.config import detector_config_from_cfg
    from simple_sfod_tpu.models.detector import Detector
    from simple_sfod_tpu.models.faster_rcnn import anchors_for

    from torch_mirror import TorchRealSamplingMirror, TorchTinyFasterRCNN

    cfg = ab_cfg(seed)
    det_cfg = detector_config_from_cfg(cfg)
    # same per-seed init as the JAX trainer (base_rng = key(SEED))
    det = Detector(det_cfg)
    variables = det.init(jax.random.key(seed), CANVAS, batch=BATCH)
    tm = TorchTinyFasterRCNN(
        num_classes=det_cfg.num_classes,
        num_anchors=det_cfg.num_anchors,
        fc_dim=det_cfg.fc_dim,
        pooler=det_cfg.pooler_resolution,
    )
    tm.load_flax(
        jax.device_get(variables["params"]), jax.device_get(variables["batch_stats"])
    )
    mirror = TorchRealSamplingMirror(
        tm, det_cfg, _np.asarray(anchors_for(det_cfg, CANVAS)),
        lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
        sample_seed=seed + sample_seed_base,
    )
    losses = []
    for idxs in batches_for(train, steps, seed):
        batch = to_batch(train, idxs)
        m = mirror.step(
            batch["images"].transpose(0, 3, 1, 2),
            [train[i][1] for i in idxs],
            [train[i][2] for i in idxs],
            CANVAS,
        )
        losses.append(m["total_loss"])

    tm.eval()

    def det_fn(img):
        with torch.no_grad():
            feat = tm.features(mirror.normalize(img.transpose(2, 0, 1)[None]))
            (b, s, c), = mirror.detect(feat, CANVAS)
        return b.numpy(), s.numpy(), c.numpy()

    ap50 = eval_ap50(det_fn, eval_set)
    out = {"ap50": ap50, "final_loss": float(np.mean(losses[-20:]))}
    if cross_eval:
        # the torch-TRAINED weights through the JAX eval path: separates a
        # training-dynamics difference from an eval-path bias (if the two
        # eval stacks scored the same weights differently, the A/B delta
        # would be an artifact of mirror.detect, not of training)
        import jax.numpy as jnp

        flat = tm.export_flax_like()
        params, stats = {}, {}
        for k, v in flat.items():
            parts = k.split("/")
            dst = stats if parts[-1] in ("mean", "var") else params
            cur = dst
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = _np.asarray(v)
        jvars = {"params": params, "batch_stats": stats}
        infer = jax.jit(det.infer)
        sizes = jnp.asarray([[CANVAS[0], CANVAS[1]]], jnp.int32)

        def jax_det_fn(img):
            d = jax.device_get(infer(jvars, jnp.asarray(img[None]), sizes))
            keep = _np.asarray(d.valid[0])
            return (
                _np.asarray(d.boxes[0])[keep],
                _np.asarray(d.scores[0])[keep],
                _np.asarray(d.classes[0])[keep],
            )

        out["ap50_jaxeval"] = eval_ap50(jax_det_fn, eval_set)
    return out


def main():
    # CPU differential (torch is CPU-only here); pin before any device use —
    # the axon plugin overrides JAX_PLATFORMS=cpu (CLAUDE.md gotcha)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--eval-images", type=int, default=N_EVAL,
                    help="held-out eval set size (bigger = lower per-seed AP noise)")
    ap.add_argument("--train-images", type=int, default=N_TRAIN)
    ap.add_argument("--torch-torch", action="store_true",
                    help="CONTROL: both arms are the torch mirror with "
                    "different sampling seeds — the endpoint chaos floor "
                    "the jax-vs-torch delta must be judged against")
    ap.add_argument("--cross-eval", action="store_true",
                    help="also score the torch-trained weights through the "
                    "JAX eval path (ap50_jaxeval): eval-path bias control")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    train = make_dataset(args.train_images, seed=100)
    eval_set = make_dataset(args.eval_images, seed=200)

    out = {"steps": args.steps, "eval_images": args.eval_images,
           "train_images": args.train_images, "control": args.torch_torch,
           "jax": [], "torch": []}
    a_name = "torchB" if args.torch_torch else "jax"
    for seed in range(args.seeds):
        if args.torch_torch:
            rj = run_torch(seed, args.steps, train, eval_set, sample_seed_base=1007)
        else:
            rj = run_jax(seed, args.steps, train, eval_set)
        print(f"[seed {seed}] {a_name}: AP50={rj['ap50']:.4f} loss={rj['final_loss']:.4f}", flush=True)
        rt = run_torch(seed, args.steps, train, eval_set, cross_eval=args.cross_eval)
        xe = f" jaxeval={rt['ap50_jaxeval']:.4f}" if args.cross_eval else ""
        print(f"[seed {seed}] torch: AP50={rt['ap50']:.4f} loss={rt['final_loss']:.4f}{xe}", flush=True)
        out["jax"].append(rj)
        out["torch"].append(rt)

    ja = np.asarray([r["ap50"] for r in out["jax"]])
    ta = np.asarray([r["ap50"] for r in out["torch"]])
    out["jax_mean"] = float(ja.mean())
    out["torch_mean"] = float(ta.mean())
    out["delta"] = float(abs(ja.mean() - ta.mean()))
    out["pooled_std"] = float(np.sqrt((ja.var(ddof=1) + ta.var(ddof=1)) / 2)) if len(ja) > 1 else None
    # PAIRED analysis: arm i shares init + batch stream with arm i, so the
    # per-seed difference cancels the (large) common seed effect — the CI
    # this yields is the statement the parity question actually needs
    if len(ja) > 1:
        out["paired"] = ab_stats.paired_stats(ja, ta)
    print(json.dumps({k: v for k, v in out.items() if not isinstance(v, list)}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
