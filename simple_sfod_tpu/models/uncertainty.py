"""Monte-Carlo-dropout uncertainty (the reference's experimental MCD stack:
daod/modeling/uncertainty/mcd.py FCDropoutLayers, roi_heads/box_head.py
FastRCNNConvFCHeadWithDropout, roi_heads/fast_rcnn.py
fast_rcnn_inference_with_mcd — never wired into a registered config, SURVEY
§2 item 26; provided for capability parity).

With dropout folded into FastRCNNConvFCHead (heads.py `dropout` field), MCD
is K stochastic box-head passes under vmap-over-rngs: one compiled graph, K
on the batch axis — the TPU-shaped version of the reference's Python loop."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .detector import Detector
from .faster_rcnn import anchors_for, pool_rois, propose


def mc_dropout_box_outputs(
    detector: Detector,
    variables,
    images: jnp.ndarray,
    sizes: jnp.ndarray,
    rng: jax.Array,
    num_samples: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mean_scores [B, R, C+1] softmax, score_std [B, R, C+1],
    proposal boxes [B, R, 4], valid [B, R]). Requires
    cfg.box_head_dropout > 0."""
    cfg = detector.cfg
    anchors = anchors_for(cfg, images.shape[1:3])
    feature = detector._features(variables, images, False)
    rpn_out = detector._rpn(variables, feature)
    proposals = propose(cfg, anchors, rpn_out, sizes, training=False)
    pooled = pool_rois(cfg, feature, proposals.boxes)

    def one_pass(k):
        # train=True only gates dropout here (no BN in the box head)
        scores, _ = detector._box(variables, pooled, train=True, rngs={"dropout": k})
        return jax.nn.softmax(scores, axis=-1)

    keys = jax.random.split(rng, num_samples)
    probs = jax.vmap(one_pass)(keys)  # [K, B*R, C+1]
    b, r = proposals.boxes.shape[:2]
    mean = probs.mean(axis=0).reshape(b, r, -1)
    std = probs.std(axis=0).reshape(b, r, -1)
    # valid distinguishes NMS survivors from fixed-capacity padding — padded
    # rows still emit (often confidently wrong) softmax stats
    return mean, std, proposals.boxes, proposals.valid
