"""Faster R-CNN, TPU-first: one flax module for the parameterised layers plus
pure static-shape functions for proposals / matching / losses / inference.

This replaces the reference's branch-string-dispatched `GeneralizedRCNN`
meta-architectures (/root/reference/daod/modeling/meta_arch/
source_free_adaptive_teacher_rcnn.py:106-339). Instead of
`model(inputs, branch="supervised_target")`, trainers compose:

    feats            = apply(variables, images, train=...)          # backbone
    rpn_out          = apply(..., method="rpn")                     # heads
    proposals        = propose(cfg, anchors, rpn_out, sizes, train)
    sampled          = label_and_sample_proposals(cfg, proposals, gt, rng)
    pooled           = roi_align_batched(feat, sampled.boxes, ...)
    scores, deltas   = apply(..., method="box")
    losses           = rpn_losses(...) | roi_losses(...)
    detections       = roi_inference(cfg, scores, deltas, proposals, sizes)

Every function is jit-safe (static shapes, no data-dependent control flow),
so teacher inference + pseudo-labelling + student update can live in a single
compiled graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import generate_anchors
from ..ops.matcher import MatcherConfig, match_boxes
from ..ops.nms import batched_class_nms, nms_mask_matrix
from ..ops.roi_align import roi_align
from ..ops.losses import sigmoid_ce, smooth_l1, softmax_ce
from ..ops.sampler import subsample_labels, subsample_labels_mask
from ..structures.boxes import BoxTransform, clip_boxes, nonempty, pairwise_iou
from ..structures.instances import Instances
from .backbones.fpn import FPN
from .backbones.resnet import ResNetBackbone
from .backbones.tiny import TinyBackbone
from .backbones.vgg import VGG16Backbone
from .heads import FastRCNNConvFCHead, FastRCNNPredictor, RPNHead


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static architecture + pipeline hyperparameters (hashable: safe to close
    over in jitted functions). Field defaults mirror detectron2's defaults as
    exercised by the reference configs."""

    num_classes: int = 8
    backbone: str = "vgg16"  # "vgg16" | "resnet50" | "resnet101"
    vgg_bn: bool = True
    resnet_norm: str = "BN"
    in_feature: str = "vgg4"
    # FPN (reference registers build_vgg_fpn_backbone, meta_arch/vgg.py:122):
    # when enabled the heads consume a pyramid level ("p2".."p6")
    fpn: bool = False
    fpn_in_features: Tuple[str, ...] = ()
    fpn_out_channels: int = 256
    fpn_norm: str = ""
    fpn_fuse_type: str = "sum"
    # anchors
    anchor_sizes: Tuple[float, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # rpn — d2 defaults as lowered through the clamps in
    # config/defaults.py (d2: 12000/2000 train, 6000/1000 test); measured
    # recall cost of the 4096 clamp vs 6144 on dense scenes: none
    # (tools/measure_rpn_caps.py)
    rpn_pre_nms_topk_train: int = 4096
    rpn_post_nms_topk_train: int = 2000
    rpn_pre_nms_topk_test: int = 4096
    rpn_post_nms_topk_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_smooth_l1_beta: float = 0.0
    rpn_loss_weight: float = 1.0
    # roi heads
    roi_batch_size_per_image: int = 512
    roi_positive_fraction: float = 0.25
    proposal_append_gt: bool = True
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 2
    fc_dim: int = 1024
    num_fc: int = 2
    box_head_dropout: float = 0.0
    # test-time
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    # preprocessing (caffe-style BGR, matching the reference's D2 defaults)
    pixel_mean: Tuple[float, float, float] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # compute
    dtype: Any = jnp.float32

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes) * len(self.anchor_ratios)

    @property
    def stride(self) -> int:
        if self.in_feature.startswith("p"):  # FPN level: stride = 2**level
            return 2 ** int(self.in_feature[1:])
        strides = {"vgg16": VGG16Backbone.out_strides(), "resnet50": ResNetBackbone.out_strides(), "resnet101": ResNetBackbone.out_strides(), "tiny": TinyBackbone.out_strides()}
        return strides[self.backbone][self.in_feature]

    @property
    def feature_channels(self) -> int:
        if self.in_feature.startswith("p"):
            return self.fpn_out_channels
        chans = {"vgg16": VGG16Backbone.out_channels(), "resnet50": ResNetBackbone.out_channels(), "resnet101": ResNetBackbone.out_channels(), "tiny": TinyBackbone.out_channels()}
        return chans[self.backbone][self.in_feature]


RPN_BOX_TRANSFORM = BoxTransform((1.0, 1.0, 1.0, 1.0))
ROI_BOX_TRANSFORM = BoxTransform((10.0, 10.0, 5.0, 5.0))
RPN_MATCHER = MatcherConfig((0.3, 0.7), (0, -1, 1), True)
ROI_MATCHER = MatcherConfig((0.5,), (0, 1), False)


class FasterRCNN(nn.Module):
    """Parameterised layers only; pipeline logic lives in the free functions."""

    cfg: DetectorConfig

    def setup(self):
        c = self.cfg
        if c.backbone == "vgg16":
            bottom_up = VGG16Backbone(bn=c.vgg_bn, dtype=c.dtype)
        elif c.backbone in ("resnet50", "resnet101"):
            depth = 50 if c.backbone == "resnet50" else 101
            feats = c.fpn_in_features if c.fpn else (c.in_feature,)
            bottom_up = ResNetBackbone(
                depth=depth, norm=c.resnet_norm, out_features=feats, dtype=c.dtype
            )
        elif c.backbone == "tiny":
            bottom_up = TinyBackbone(bn=c.vgg_bn, dtype=c.dtype)
        else:
            raise ValueError(f"unknown backbone {c.backbone}")
        if c.fpn:
            if not c.fpn_in_features:
                raise ValueError("fpn=True requires fpn_in_features")
            self.backbone = FPN(
                bottom_up=bottom_up,
                in_features=c.fpn_in_features,
                out_channels=c.fpn_out_channels,
                norm=c.fpn_norm,
                fuse_type=c.fpn_fuse_type,
                dtype=c.dtype,
            )
        else:
            self.backbone = bottom_up
        self.rpn_head = RPNHead(num_anchors=c.num_anchors, dtype=c.dtype)
        self.box_head = FastRCNNConvFCHead(
            fc_dims=(c.fc_dim,) * c.num_fc, dropout=c.box_head_dropout, dtype=c.dtype
        )
        self.predictor = FastRCNNPredictor(num_classes=c.num_classes, dtype=c.dtype)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        """Full forward through backbone + RPN heads (for init)."""
        feat = self.features(images, train)
        logits, deltas = self.rpn(feat)
        # touch the box head so init creates its params
        dummy = jnp.zeros(
            (1, self.cfg.pooler_resolution, self.cfg.pooler_resolution, feat.shape[-1]),
            feat.dtype,
        )
        self.box(dummy, train=False)
        return feat, logits, deltas

    def features(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: [B, H, W, 3] raw pixels -> in_feature map [B, h, w, C]."""
        c = self.cfg
        mean = jnp.asarray(c.pixel_mean, images.dtype)
        std = jnp.asarray(c.pixel_std, images.dtype)
        x = (images - mean) / std
        feats = self.backbone(x, train=train)
        return feats[c.in_feature]

    def rpn(self, feature: jnp.ndarray):
        return self.rpn_head(feature)

    def box(self, pooled: jnp.ndarray, train: bool = False, mc_dropout: bool = False):
        """pooled: [N, P, P, C] -> (scores [N, C+1], deltas [N, 4K])."""
        x = self.box_head(pooled, train=train, mc_dropout=mc_dropout)
        return self.predictor(x)

    def box_feature(self, pooled: jnp.ndarray, train: bool = False):
        """pooled: [N, P, P, C] -> box-head feature [N, fc_dim] (the
        `cls_score.in_features` tensor the reference's instance-level domain
        classifier consumes, meta_arch :70 + instance_dc_loss :341-349)."""
        return self.box_head(pooled, train=train)


# --------------------------------------------------------------------------
# Pure pipeline functions
# --------------------------------------------------------------------------


class RPNOutput(NamedTuple):
    objectness: jnp.ndarray  # [B, N_anchors]
    deltas: jnp.ndarray  # [B, N_anchors, 4]


class SampledProposals(NamedTuple):
    """ROI-head training batch for one image set. All [B, S, ...]."""

    boxes: jnp.ndarray  # [B, S, 4] proposal boxes
    gt_classes: jnp.ndarray  # [B, S] int32; num_classes = background
    reg_targets: jnp.ndarray  # [B, S, 4] encoded deltas to matched GT
    is_fg: jnp.ndarray  # [B, S]
    valid: jnp.ndarray  # [B, S]


def anchors_for(cfg: DetectorConfig, canvas_hw: Tuple[int, int]) -> jnp.ndarray:
    """Anchor grid for a padded canvas (trace-time constant)."""
    stride = cfg.stride
    fh = (canvas_hw[0] + stride - 1) // stride
    fw = (canvas_hw[1] + stride - 1) // stride
    return generate_anchors((fh, fw), stride, cfg.anchor_sizes, cfg.anchor_ratios)


def propose(
    cfg: DetectorConfig,
    anchors: jnp.ndarray,
    rpn_out: RPNOutput,
    image_sizes: jnp.ndarray,
    training: bool,
) -> Instances:
    """RPN proposal selection (detectron2 find_top_rpn_proposals, static).

    Returns Instances batched via leading dim: boxes [B, K, 4] etc.
    Note on pre-NMS top-k: detectron2 uses 12000/6000, chosen for CUDA-speed
    NMS. Here the tiled NMS cost scales with K^2/T, and because the single
    stride-16/32 level has ~10-40k anchors with heavy overlap, 2048 pre-NMS
    candidates retain recall while keeping the NMS fixpoint fast on the VPU.
    """
    pre_k = cfg.rpn_pre_nms_topk_train if training else cfg.rpn_pre_nms_topk_test
    post_k = cfg.rpn_post_nms_topk_train if training else cfg.rpn_post_nms_topk_test
    pre_k = min(pre_k, anchors.shape[0])
    post_k = min(post_k, pre_k)

    def per_image(obj, deltas, size):
        vals, idx = jax.lax.top_k(obj, pre_k)
        sel_anchors = jnp.take(anchors, idx, axis=0)
        sel_deltas = jnp.take(deltas, idx, axis=0)
        boxes = RPN_BOX_TRANSFORM.apply_deltas(sel_deltas, sel_anchors)
        boxes = clip_boxes(boxes, size)
        valid = nonempty(boxes) & jnp.isfinite(vals)
        keep = nms_mask_matrix(boxes, vals, valid, cfg.rpn_nms_thresh)
        inst = Instances(
            boxes=boxes,
            scores=vals,
            classes=jnp.zeros((pre_k,), jnp.int32),
            valid=keep,
        )
        return inst.top_k(post_k)

    return jax.vmap(per_image)(rpn_out.objectness, rpn_out.deltas, image_sizes)


def rpn_losses(
    cfg: DetectorConfig,
    anchors: jnp.ndarray,
    rpn_out: RPNOutput,
    gt: Instances,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """RPN objectness + box regression losses (detectron2 normalisation:
    sum over sampled anchors / (B * rpn_batch_size_per_image))."""
    b = rpn_out.objectness.shape[0]

    def per_image(gt_i: Instances, rng_i):
        iou = pairwise_iou(gt_i.boxes, anchors)  # [M, N]
        matched_idx, labels = match_boxes(iou, gt_i.valid, RPN_MATCHER)
        sel, sel_pos = subsample_labels_mask(
            labels, cfg.rpn_batch_size_per_image, cfg.rpn_positive_fraction, rng_i
        )
        matched_gt = jnp.take(gt_i.boxes, matched_idx, axis=0)
        reg_targets = RPN_BOX_TRANSFORM.get_deltas(anchors, matched_gt)
        return labels, sel, sel_pos, reg_targets

    rngs = jax.random.split(rng, b)
    labels, sel, sel_pos, reg_targets = jax.vmap(per_image)(gt, rngs)

    normalizer = float(b * cfg.rpn_batch_size_per_image)
    obj_loss = sigmoid_ce(rpn_out.objectness, (labels == 1).astype(jnp.float32))
    loss_cls = jnp.sum(obj_loss * sel.astype(jnp.float32)) / normalizer
    reg = smooth_l1(rpn_out.deltas, reg_targets, cfg.rpn_smooth_l1_beta)
    loss_loc = jnp.sum(reg * sel_pos[..., None].astype(jnp.float32)) / normalizer
    return {
        "loss_rpn_cls": loss_cls * cfg.rpn_loss_weight,
        "loss_rpn_loc": loss_loc * cfg.rpn_loss_weight,
    }


def label_and_sample_proposals(
    cfg: DetectorConfig,
    proposals: Instances,
    gt: Instances,
    rng: jax.Array,
) -> SampledProposals:
    """Match proposals to GT, sample the ROI training batch
    (detectron2 ROIHeads.label_and_sample_proposals, static shapes).
    GT boxes are appended to the proposal pool first (proposal_append_gt)."""
    b = proposals.boxes.shape[0]
    s = cfg.roi_batch_size_per_image

    def per_image(prop_i: Instances, gt_i: Instances, rng_i):
        pool = Instances.concatenate(prop_i, gt_i) if cfg.proposal_append_gt else prop_i
        iou = pairwise_iou(gt_i.boxes, pool.boxes)
        matched_idx, match_labels = match_boxes(iou, gt_i.valid, ROI_MATCHER)
        # candidate labels for sampling: 1 fg, 0 bg, -1 ignore/invalid
        cand = jnp.where(pool.valid, match_labels, -1)
        idx, is_pos, valid = subsample_labels(
            cand, s, cfg.roi_positive_fraction, rng_i
        )
        boxes = jnp.take(pool.boxes, idx, axis=0)
        m_idx = jnp.take(matched_idx, idx, axis=0)
        gt_boxes = jnp.take(gt_i.boxes, m_idx, axis=0)
        gt_cls = jnp.take(gt_i.classes, m_idx, axis=0)
        classes = jnp.where(is_pos, gt_cls, cfg.num_classes)
        classes = jnp.where(valid, classes, cfg.num_classes)
        reg_targets = ROI_BOX_TRANSFORM.get_deltas(boxes, gt_boxes)
        return boxes, classes.astype(jnp.int32), reg_targets, is_pos & valid, valid

    rngs = jax.random.split(rng, b)
    boxes, classes, reg_targets, is_fg, valid = jax.vmap(per_image)(proposals, gt, rngs)
    return SampledProposals(boxes, classes, reg_targets, is_fg, valid)


def pool_rois(
    cfg: DetectorConfig, feature: jnp.ndarray, boxes: jnp.ndarray
) -> jnp.ndarray:
    """feature [B, h, w, C], boxes [B, R, 4] -> pooled [B*R, P, P, C]."""
    scale = 1.0 / cfg.stride
    pooled = jax.vmap(
        lambda f, bx: roi_align(
            f, bx, scale, cfg.pooler_resolution, cfg.pooler_sampling_ratio, True
        )
    )(feature, boxes)
    b, r = boxes.shape[:2]
    return pooled.reshape(b * r, cfg.pooler_resolution, cfg.pooler_resolution, -1)


def roi_losses(
    cfg: DetectorConfig,
    scores: jnp.ndarray,  # [B*S, C+1]
    deltas: jnp.ndarray,  # [B*S, 4C]
    sampled: SampledProposals,
) -> Dict[str, jnp.ndarray]:
    """Fast R-CNN classification + class-specific box regression losses
    (detectron2 FastRCNNOutputLayers.losses: CE mean over sampled; smooth-L1
    summed over fg, normalised by total sampled)."""
    b, s = sampled.gt_classes.shape
    classes = sampled.gt_classes.reshape(-1)
    valid = sampled.valid.reshape(-1)
    is_fg = sampled.is_fg.reshape(-1)
    reg_targets = sampled.reg_targets.reshape(-1, 4)

    ce = softmax_ce(scores, classes)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss_cls = jnp.sum(ce * valid.astype(jnp.float32)) / denom

    # gather the deltas of the GT class for fg rows
    k = deltas.shape[-1] // 4
    deltas_k = deltas.reshape(-1, k, 4)
    cls_idx = jnp.clip(classes, 0, k - 1)
    fg_deltas = jnp.take_along_axis(deltas_k, cls_idx[:, None, None].repeat(4, -1), axis=1)[
        :, 0
    ]
    reg = smooth_l1(fg_deltas, reg_targets, 0.0)
    loss_reg = jnp.sum(reg * is_fg[:, None].astype(jnp.float32)) / denom
    return {"loss_cls": loss_cls, "loss_box_reg": loss_reg}


def bpc_candidates(
    cfg: DetectorConfig,
    scores: jnp.ndarray,  # [B*S, C+1] logits
    deltas: jnp.ndarray,  # [B*S, 4C]
    sampled: SampledProposals,
    image_sizes: jnp.ndarray,  # [B, 2]
) -> Instances:
    """The BPC loss's input: every (sampled proposal, foreground class) pair
    as one candidate — S*C per image, NO score filter, NO NMS.

    Parity with the reference's convert_bbox_scores path
    (source_free_fast_rcnn.py:15-38; :121 `filter_mask = scores > 0`; NMS
    commented out :132-138) as invoked from the ROI heads' _forward_box
    (source_free_adaptive_teacher_roi_heads.py:136-160): there the proposal
    boxes are FIRST replaced by predict_boxes_for_gt_classes (the GT class's
    decoded boxes) and convert_bbox_scores then applies the per-class deltas
    relative to those — a double decode we reproduce faithfully. Scores are
    softmax probabilities with background dropped; boxes are clipped to the
    image.
    """
    b, s = sampled.gt_classes.shape
    c = scores.shape[-1] - 1
    probs = jax.nn.softmax(scores, axis=-1)[:, :-1]  # [B*S, C]
    k = deltas.shape[-1] // 4
    deltas_k = deltas.reshape(-1, k, 4)
    prop = sampled.boxes.reshape(-1, 4)
    # predict_boxes_for_gt_classes: decode the matched GT class's deltas
    gt_cls = jnp.clip(sampled.gt_classes.reshape(-1), 0, k - 1)
    gt_deltas = jnp.take_along_axis(
        deltas_k, gt_cls[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    base = ROI_BOX_TRANSFORM.apply_deltas(gt_deltas, prop)  # [B*S, 4]
    # second decode: all per-class deltas relative to the updated boxes
    boxes_all = ROI_BOX_TRANSFORM.apply_deltas(deltas, base)  # [B*S, 4C]
    boxes_all = boxes_all.reshape(b, s * c, 4)

    def clip_b(bx, size):
        return clip_boxes(bx, size)

    boxes_all = jax.vmap(clip_b)(boxes_all, image_sizes)
    return Instances(
        boxes=jax.lax.stop_gradient(boxes_all),
        scores=probs.reshape(b, s * c),
        classes=jnp.tile(jnp.arange(c, dtype=jnp.int32), (b, s)).reshape(b, s * c),
        valid=jnp.repeat(sampled.valid, c, axis=-1).reshape(b, s * c),
    )


def roi_inference(
    cfg: DetectorConfig,
    scores: jnp.ndarray,  # [B, R, C+1] logits
    deltas: jnp.ndarray,  # [B, R, 4C]
    proposals: Instances,
    image_sizes: jnp.ndarray,
    score_thresh: float = None,
    nms_thresh: float = None,
    topk: int = None,
    apply_nms: bool = True,
    apply_score_thresh: bool = True,
    candidate_cap: int = None,
) -> Instances:
    """Fast R-CNN inference (detectron2 fast_rcnn_inference, static shapes).

    The `apply_nms` / `apply_score_thresh` switches reproduce the reference's
    SourceFreeFastRCNNOutputLayers.fast_rcnn_inference_new path
    (source_free_fast_rcnn.py:121,132-138: no score filter, NMS disabled) used
    to feed raw box/score pairs to the BPC loss.
    """
    score_thresh = cfg.score_thresh_test if score_thresh is None else score_thresh
    nms_thresh = cfg.nms_thresh_test if nms_thresh is None else nms_thresh
    topk = cfg.detections_per_image if topk is None else topk
    num_classes = scores.shape[-1] - 1

    def per_image(sc, dl, prop_boxes, prop_valid, size):
        probs = jax.nn.softmax(sc, axis=-1)[:, :-1]  # [R, C]
        boxes_k = ROI_BOX_TRANSFORM.apply_deltas(dl, prop_boxes)  # [R, 4C]
        boxes_k = boxes_k.reshape(-1, num_classes, 4)
        boxes_k = clip_boxes(boxes_k, size)
        r = probs.shape[0]
        flat_boxes = boxes_k.reshape(r * num_classes, 4)
        flat_scores = probs.reshape(r * num_classes)
        flat_classes = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (r,))
        valid = jnp.repeat(prop_valid, num_classes) & nonempty(flat_boxes)
        if apply_score_thresh:
            valid &= flat_scores > score_thresh
        # Cap the NMS candidate set: R*C can be large (512*8 = 4096); top-k
        # first by score keeps the NMS tile loop short. Measured cost of the
        # default cap vs the full R*C set: zero detection/AP delta on dense
        # synthetic scenes (tools/measure_roi_cap.py, PARITY_EVIDENCE.md).
        cap = candidate_cap or max(8 * topk, 1024)
        cap = min(flat_scores.shape[0], cap)
        key = jnp.where(valid, flat_scores, -jnp.inf)
        _, idx = jax.lax.top_k(key, cap)
        cand = Instances(
            boxes=jnp.take(flat_boxes, idx, axis=0),
            scores=jnp.take(flat_scores, idx, axis=0),
            classes=jnp.take(flat_classes, idx, axis=0),
            valid=jnp.take(valid, idx, axis=0),
        )
        if apply_nms:
            keep = batched_class_nms(
                cand.boxes, cand.scores, cand.classes, cand.valid, nms_thresh, max_keep=topk
            )
            cand = cand.mask(keep)
        return cand.top_k(topk)

    return jax.vmap(per_image)(
        scores, deltas, proposals.boxes, proposals.valid, image_sizes
    )
