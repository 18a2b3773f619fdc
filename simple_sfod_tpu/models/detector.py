"""High-level detector API: init / training losses / inference as pure fns.

The equivalent of `GeneralizedRCNN.forward`'s branches in the reference
(meta_arch/source_free_adaptive_teacher_rcnn.py:106-339), re-expressed so
that trainers jit exactly what they need:

    det = Detector(cfg)
    variables = det.init(rng, canvas_hw)
    losses, metrics, new_stats = det.supervised_losses(variables, batch, rng)
    detections = det.infer(variables, images, sizes)          # "unsup_data_weak"
    raw = det.infer_raw(variables, images, sizes)             # BPC path: no NMS

`variables` = {'params': ..., 'batch_stats': ...} — the whole model is a
pytree, so the EMA teacher is just a second pytree and the teacher-student
step is one compiled graph.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..structures.instances import Instances
from .faster_rcnn import (
    DetectorConfig,
    FasterRCNN,
    RPNOutput,
    anchors_for,
    label_and_sample_proposals,
    pool_rois,
    propose,
    roi_inference,
    roi_losses,
    rpn_losses,
)


class DetectionBatch(NamedTuple):
    """One training/eval batch. images [B,H,W,3] raw 0-255 pixels (BGR by
    default config), sizes [B,2] true (h,w), gt: padded Instances (leading
    dim B) or None for unlabeled flows."""

    images: jnp.ndarray
    sizes: jnp.ndarray
    gt: Optional[Instances] = None


class Detector:
    """Stateless wrapper binding a DetectorConfig to the pipeline functions.

    Not a pytree: hold one per program, pass `variables` explicitly.
    """

    def __init__(self, cfg: DetectorConfig):
        self.cfg = cfg
        self.module = FasterRCNN(cfg)

    # -- initialisation ----------------------------------------------------
    def init(self, rng: jax.Array, canvas_hw: Tuple[int, int], batch: int = 1):
        images = jnp.zeros((batch, canvas_hw[0], canvas_hw[1], 3), jnp.float32)
        return self.module.init(rng, images, train=False)

    # -- forward pieces ----------------------------------------------------
    def _features(self, variables, images, train: bool, mutable=False):
        return self.module.apply(
            variables,
            images,
            train,
            method=FasterRCNN.features,
            mutable=["batch_stats"] if mutable else False,
        )

    def _rpn(self, variables, feature) -> RPNOutput:
        logits, deltas = self.module.apply(variables, feature, method=FasterRCNN.rpn)
        return RPNOutput(logits, deltas)

    def _box(self, variables, pooled, train: bool = False, rngs=None):
        return self.module.apply(
            variables, pooled, train, method=FasterRCNN.box, rngs=rngs
        )

    # -- training ----------------------------------------------------------
    def losses_from_feature(
        self,
        variables,
        feature: jnp.ndarray,
        batch: DetectionBatch,
        rng: jax.Array,
        loss_weights: Optional[Dict[str, float]] = None,
        with_bpc: bool = False,
    ):
        """Head-side supervised losses on a precomputed backbone feature.

        Split out of supervised_losses so trainers can share ONE backbone
        pass between the loss path and other consumers (domain classifiers,
        the `_single` variant's fused weak+strong forward) — the backbone is
        the step's dominant cost and the step was previously
        backbone-pass-bound (BENCH_NOTES device trace)."""
        cfg = self.cfg
        rng_rpn, rng_roi, rng_drop = jax.random.split(rng, 3)
        anchors = anchors_for(cfg, batch.images.shape[1:3])

        rpn_out = self._rpn(variables, feature)
        losses = rpn_losses(cfg, anchors, rpn_out, batch.gt, rng_rpn)

        proposals = propose(cfg, anchors, rpn_out, batch.sizes, training=True)
        proposals = proposals.replace(boxes=jax.lax.stop_gradient(proposals.boxes))
        sampled = label_and_sample_proposals(cfg, proposals, batch.gt, rng_roi)
        pooled = pool_rois(cfg, feature, sampled.boxes)
        scores, deltas = self._box(
            variables,
            pooled,
            train=True,
            rngs={"dropout": rng_drop} if cfg.box_head_dropout > 0 else None,
        )
        losses.update(roi_losses(cfg, scores, deltas, sampled))

        weights = loss_weights or {}
        total = sum(v * weights.get(k, 1.0) for k, v in losses.items())
        metrics = dict(losses)
        metrics["num_fg"] = jnp.sum(sampled.is_fg.astype(jnp.int32))
        metrics["num_sampled"] = jnp.sum(sampled.valid.astype(jnp.int32))
        if with_bpc:
            # BPC calibration loss over the sampled ROI batch expanded to all
            # (proposal, class) pairs, no thresh / no NMS — exactly what the
            # reference's convert_bbox_scores feeds bpc_loss (meta_arch :293
            # via roi_heads :160). Logged only — the trainer weights it x0.
            from ..losses.bpc import bpc_loss
            from .faster_rcnn import bpc_candidates

            preds = bpc_candidates(cfg, scores, deltas, sampled, batch.sizes)
            metrics["loss_bpc"] = bpc_loss(preds, batch.gt)
        return total, metrics

    def supervised_losses(
        self,
        variables,
        batch: DetectionBatch,
        rng: jax.Array,
        update_bn: bool = True,
        loss_weights: Optional[Dict[str, float]] = None,
        with_bpc: bool = False,
    ):
        """Full supervised Faster R-CNN loss (the reference's "supervised" /
        "supervised_target" branches). Returns (total_loss, metrics, new_batch_stats).
        """
        # train-mode BN always needs a mutable collection; update_bn decides
        # whether the freshly-written statistics are kept or discarded
        feature, mutated = self._features(variables, batch.images, True, mutable=True)
        if update_bn:
            new_stats = mutated.get("batch_stats", {})
        else:
            new_stats = variables.get("batch_stats", {})
        total, metrics = self.losses_from_feature(
            variables, feature, batch, rng, loss_weights=loss_weights, with_bpc=with_bpc
        )
        return total, metrics, new_stats

    # -- inference ---------------------------------------------------------
    def infer_from_feature(
        self,
        variables,
        feature: jnp.ndarray,
        sizes: jnp.ndarray,
        canvas_hw: Tuple[int, int],
        score_thresh: float = None,
        nms_thresh: float = None,
        topk: int = None,
        apply_nms: bool = True,
        apply_score_thresh: bool = True,
    ) -> Instances:
        """Head-side inference on a precomputed backbone feature (see
        losses_from_feature for why the split exists). canvas_hw is the
        padded image canvas the feature was computed from. apply_nms /
        apply_score_thresh=False select the raw BPC path (infer_raw)."""
        cfg = self.cfg
        anchors = anchors_for(cfg, canvas_hw)
        rpn_out = self._rpn(variables, feature)
        proposals = propose(cfg, anchors, rpn_out, sizes, training=False)
        pooled = pool_rois(cfg, feature, proposals.boxes)
        scores, deltas = self._box(variables, pooled)
        b, r = proposals.boxes.shape[:2]
        return roi_inference(
            cfg,
            scores.reshape(b, r, -1),
            deltas.reshape(b, r, -1),
            proposals,
            sizes,
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            topk=topk,
            apply_nms=apply_nms,
            apply_score_thresh=apply_score_thresh,
        )

    def infer(
        self,
        variables,
        images: jnp.ndarray,
        sizes: jnp.ndarray,
        score_thresh: float = None,
        nms_thresh: float = None,
        topk: int = None,
        train_mode_bn: bool = False,
    ) -> Instances:
        """Standard inference -> final detections [B, topk].

        train_mode_bn=True runs BatchNorm on batch statistics without
        updating them — the reference's AdaBN eval probe (model.train() under
        no_grad, base.py:281-299) and its teacher's always-train-mode quirk.
        """
        if train_mode_bn:
            # batch statistics, discarded (flax needs the collection mutable
            # to run BN in train mode even when we don't keep the update)
            feature, _ = self._features(variables, images, True, mutable=True)
        else:
            feature = self._features(variables, images, False, mutable=False)
        return self.infer_from_feature(
            variables,
            feature,
            sizes,
            tuple(images.shape[1:3]),
            score_thresh=score_thresh,
            nms_thresh=nms_thresh,
            topk=topk,
        )

    def infer_raw(
        self, variables, images: jnp.ndarray, sizes: jnp.ndarray, topk: int = 512
    ) -> Instances:
        """No score filter, no NMS — the reference's
        `fast_rcnn_inference_new` (source_free_fast_rcnn.py:121,132-138) that
        feeds raw (box, score) pairs to the BPC loss. Delegates to the one
        shared feature->rpn->pool->box chain (infer_from_feature) so the raw
        path can never silently diverge from standard inference."""
        feature = self._features(variables, images, False, mutable=False)
        return self.infer_from_feature(
            variables,
            feature,
            sizes,
            tuple(images.shape[1:3]),
            topk=topk,
            apply_nms=False,
            apply_score_thresh=False,
        )

    def box_features_from_feature(
        self, variables, feature: jnp.ndarray, sizes: jnp.ndarray, canvas_hw: Tuple[int, int]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Box-head features of the post-NMS RPN proposals on a precomputed
        backbone feature, for the instance-level domain classifier (reference
        meta_arch source_free_adaptive_teacher_rcnn.py:157-203:
        proposal_generator with compute_loss=False -> roi_heads box features
        -> DC_ins).

        Returns (features [B*R, fc_dim], valid [B*R]). Gradients flow into
        the backbone + box head (the GRL sits in the caller), but not through
        the proposal coordinates — matching the supervised path's
        stop_gradient on proposal boxes.
        """
        cfg = self.cfg
        anchors = anchors_for(cfg, canvas_hw)
        rpn_out = self._rpn(variables, feature)
        proposals = propose(cfg, anchors, rpn_out, sizes, training=True)
        boxes = jax.lax.stop_gradient(proposals.boxes)
        pooled = pool_rois(cfg, feature, boxes)
        feats = self.module.apply(variables, pooled, False, method=FasterRCNN.box_feature)
        return feats, proposals.valid.reshape(-1)

    def box_features(
        self, variables, images: jnp.ndarray, sizes: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feature = self._features(variables, images, False, mutable=False)
        return self.box_features_from_feature(
            variables, feature, sizes, tuple(images.shape[1:3])
        )

    def bn_update(self, variables, images: jnp.ndarray):
        """One AdaBN accumulation step: forward in train mode, return updated
        batch_stats (the functional form of base.py:281-299's
        `model.train(); model(data) under no_grad`)."""
        _, mutated = self._features(variables, images, True, mutable=True)
        return mutated["batch_stats"]
