#!/usr/bin/env python
"""Measure proposal-recall delta of the TPU RPN top-k caps vs detectron2's.

detectron2 (reference configs): pre-NMS 12000 train / 6000 test, post-NMS
2000 train / 1000 test. The TPU lowering clamps pre-NMS to 4096 and post-NMS
to 2048/1024 (config/defaults.py) because the matrix-NMS fixpoint cost grows
with K^2. This script quantifies what those caps cost in proposal recall on
synthetic dense scenes with an imperfect-ranking RPN (objectness = max-IoU
with GT + noise), feeding PARITY_EVIDENCE.md.

Run: JAX_PLATFORMS=cpu python tools/measure_rpn_caps.py
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

from simple_sfod_tpu.models.faster_rcnn import DetectorConfig, RPNOutput, anchors_for, propose
from simple_sfod_tpu.structures.boxes import pairwise_iou


def dense_scene(rs, num_gt, h, w):
    cx = rs.uniform(30, w - 30, num_gt)
    cy = rs.uniform(30, h - 30, num_gt)
    bw = rs.uniform(10, 180, num_gt)
    bh = rs.uniform(10, 120, num_gt)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    return np.clip(boxes, 0, [w, h, w, h]).astype(np.float32)


def recall_at(cfg, anchors, gt, obj, deltas, sizes, thr=0.5):
    props = propose(cfg, anchors, RPNOutput(obj, deltas), sizes, training=False)
    iou = pairwise_iou(jnp.asarray(gt), props.boxes[0])
    iou = jnp.where(props.valid[0][None, :], iou, 0.0)
    best = jnp.max(iou, axis=1)
    return float(jnp.mean((best >= thr).astype(jnp.float32)))


def main():
    h, w = 608, 1216
    sizes = jnp.asarray([[h, w]], jnp.int32)
    noise_scale = 0.5
    settings = [  # (pre, post)
        (2048, 1024),
        (4096, 1024),
        (6144, 1024),
        (4096, 2000),
        (6144, 2000),
    ]
    results = {s: [] for s in settings}
    for seed in range(5):
        rs = np.random.RandomState(seed)
        gt = dense_scene(rs, 120, h, w)
        base_cfg = DetectorConfig(num_classes=8)
        anchors = anchors_for(base_cfg, (h, w))
        iou = np.asarray(pairwise_iou(jnp.asarray(gt), jnp.asarray(anchors)))
        # imperfect RPN: score ~ max IoU + noise; deltas nudge anchors toward
        # their best GT with error
        best_gt = iou.argmax(0)
        score = iou.max(0) + noise_scale * rs.randn(len(anchors)).astype(np.float32)
        tgt = gt[best_gt]
        anc = np.asarray(anchors)
        aw = anc[:, 2] - anc[:, 0]
        ah = anc[:, 3] - anc[:, 1]
        acx = (anc[:, 0] + anc[:, 2]) / 2
        acy = (anc[:, 1] + anc[:, 3]) / 2
        tw = tgt[:, 2] - tgt[:, 0]
        th = tgt[:, 3] - tgt[:, 1]
        tcx = (tgt[:, 0] + tgt[:, 2]) / 2
        tcy = (tgt[:, 1] + tgt[:, 3]) / 2
        deltas = np.stack(
            [(tcx - acx) / aw, (tcy - acy) / ah, np.log(tw / aw), np.log(th / ah)], -1
        ).astype(np.float32)
        deltas += 0.08 * rs.randn(*deltas.shape).astype(np.float32)
        obj = jnp.asarray(score[None])
        dl = jnp.asarray(deltas[None])
        for pre, post in settings:
            cfg = dataclasses.replace(
                base_cfg, rpn_pre_nms_topk_test=pre, rpn_post_nms_topk_test=post
            )
            r = recall_at(cfg, anchors, gt, obj, dl, sizes)
            results[(pre, post)].append(r)
            print(f"seed {seed} pre={pre} post={post}: recall@0.5 = {r:.4f}", flush=True)
    print("\n=== mean over seeds ===")
    for s, rr in results.items():
        print(f"pre={s[0]:5d} post={s[1]:5d}: {np.mean(rr):.4f}")


if __name__ == "__main__":
    main()
