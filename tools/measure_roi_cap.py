#!/usr/bin/env python
"""Measure what roi_inference's NMS candidate cap costs in detections/AP.

roi_inference keeps only the top `max(8*topk, 1024)` of the R*C
(proposal, class) score grid before per-class NMS (faster_rcnn.py). With the
detectron2 test setting (R=1000, C=8, topk=100 -> cap 1024 of 8000) this was
a *named unmeasured residual* in PARITY_EVIDENCE.md. This script measures it:
dense synthetic scenes with crowded, ambiguous class scores (worst case for
the cap), comparing capped vs full-candidate inference on (a) the kept
detection sets, (b) GT recall@0.5, (c) COCO AP50 via the production
evaluator.

Run: JAX_PLATFORMS=cpu python tools/measure_roi_cap.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from simple_sfod_tpu.models.faster_rcnn import DetectorConfig, roi_inference
from simple_sfod_tpu.structures.instances import Instances

R, C, TOPK = 1000, 8, 100
H, W = 608, 1216


def crowded_scene(rs, num_gt=80):
    """GT boxes + R proposals clustered on them + soft (ambiguous) class
    logits: every proposal has 2-3 plausible classes, so thousands of
    (proposal, class) pairs clear the 0.05 score threshold — the regime
    where the cap can bite."""
    cx = rs.uniform(40, W - 40, num_gt)
    cy = rs.uniform(40, H - 40, num_gt)
    bw = rs.uniform(20, 200, num_gt)
    bh = rs.uniform(20, 140, num_gt)
    gt = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    gt = np.clip(gt, 0, [W, H, W, H]).astype(np.float32)
    gt_cls = rs.randint(0, C, num_gt)

    own = rs.randint(0, num_gt, R)
    jitter = rs.normal(0, 12, (R, 4)).astype(np.float32)
    props = np.clip(gt[own] + jitter, 0, [W, H, W, H]).astype(np.float32)

    # logits: matched GT class strong, a random second class close, rest noise
    logits = rs.normal(0, 0.5, (R, C + 1)).astype(np.float32)
    logits[np.arange(R), gt_cls[own]] += rs.uniform(1.0, 4.0, R)
    second = rs.randint(0, C, R)
    logits[np.arange(R), second] += rs.uniform(0.5, 3.0, R)
    # distance-degraded objectness -> background logit up for bad proposals
    from simple_sfod_tpu.structures.boxes import pairwise_iou

    iou = np.asarray(pairwise_iou(jnp.asarray(gt), jnp.asarray(props)))
    best = iou.max(0)
    logits[:, C] += (1.0 - best) * rs.uniform(2.0, 5.0, R)
    return gt, gt_cls, props, logits


def run(cfg, props, logits, cap):
    scores = jnp.asarray(logits)[None]
    deltas = jnp.zeros((1, R, 4 * C), jnp.float32)  # identity decode
    proposals = Instances(
        boxes=jnp.asarray(props)[None],
        scores=jnp.zeros((1, R)),
        classes=jnp.zeros((1, R), jnp.int32),
        valid=jnp.ones((1, R), bool),
    )
    sizes = jnp.asarray([[H, W]], jnp.int32)
    return roi_inference(cfg, scores, deltas, proposals, sizes, topk=TOPK, candidate_cap=cap)


def detection_set(dets, score_round=4):
    keep = np.asarray(dets.valid[0])
    rows = zip(
        np.asarray(dets.boxes[0])[keep].round(1).tolist(),
        np.asarray(dets.scores[0])[keep].round(score_round).tolist(),
        np.asarray(dets.classes[0])[keep].tolist(),
    )
    return {(tuple(b), s, c) for b, s, c in rows}


def recall(dets, gt, thr=0.5):
    from simple_sfod_tpu.structures.boxes import pairwise_iou

    keep = np.asarray(dets.valid[0])
    boxes = np.asarray(dets.boxes[0])[keep]
    if not len(boxes):
        return 0.0
    iou = np.asarray(pairwise_iou(jnp.asarray(gt), jnp.asarray(boxes, np.float32)))
    return float((iou.max(1) >= thr).mean())


def ap50(all_dets, all_gt, all_gt_cls):
    from simple_sfod_tpu.evaluation.coco_eval import COCOEvaluator

    ev = COCOEvaluator([f"c{i}" for i in range(C)])
    for img_id, (dets, gt, gt_cls) in enumerate(zip(all_dets, all_gt, all_gt_cls)):
        keep = np.asarray(dets.valid[0])
        ev.process_image(
            img_id,
            np.asarray(dets.boxes[0])[keep],
            np.asarray(dets.scores[0])[keep],
            np.asarray(dets.classes[0])[keep],
            gt,
            gt_cls,
        )
    return ev.evaluate()["AP50"]


def main():
    cfg = DetectorConfig(num_classes=C)
    full_cap = R * C
    default_cap = max(8 * TOPK, 1024)
    diffs, dropped_max_scores = [], []
    r_def, r_full = [], []
    dets_def_all, dets_full_all, gts, gt_clss = [], [], [], []
    for seed in range(8):
        rs = np.random.RandomState(seed)
        gt, gt_cls, props, logits = crowded_scene(rs)
        d_def = run(cfg, props, logits, default_cap)
        d_full = run(cfg, props, logits, full_cap)
        s_def, s_full = detection_set(d_def), detection_set(d_full)
        diffs.append(len(s_def ^ s_full))
        # strongest candidate excluded by the cap
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))[:, :C].reshape(-1)
        above = np.sort(probs)[::-1]
        dropped_max_scores.append(above[default_cap] if len(above) > default_cap else 0.0)
        r_def.append(recall(d_def, gt))
        r_full.append(recall(d_full, gt))
        dets_def_all.append(d_def)
        dets_full_all.append(d_full)
        gts.append(gt)
        gt_clss.append(gt_cls)
        n_above_thresh = int((probs > cfg.score_thresh_test).sum())
        print(f"seed {seed}: candidates>{cfg.score_thresh_test}: {n_above_thresh:5d}  "
              f"set-diff {diffs[-1]:3d}  best-dropped-score {dropped_max_scores[-1]:.4f}")
    print(f"\ncap {default_cap} vs full {full_cap} over {len(diffs)} dense scenes:")
    print(f"  mean detection-set difference : {np.mean(diffs):.2f} detections")
    print(f"  recall@0.5 capped / full      : {np.mean(r_def):.4f} / {np.mean(r_full):.4f}")
    print(f"  AP50 capped / full            : {ap50(dets_def_all, gts, gt_clss):.4f} / "
          f"{ap50(dets_full_all, gts, gt_clss):.4f}")
    print(f"  max score ever dropped by cap : {max(dropped_max_scores):.4f}")


if __name__ == "__main__":
    main()
