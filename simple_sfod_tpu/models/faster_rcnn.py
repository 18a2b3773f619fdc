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
    # when enabled the heads consume the pyramid with full detectron2
    # semantics — per-level RPN (shared head, per-level pre-NMS top-k, merged
    # NMS) over `rpn_in_features`, and ROIAlign with box-size level
    # assignment over `roi_in_features` (d2 assign_boxes_to_levels).
    fpn: bool = False
    fpn_in_features: Tuple[str, ...] = ()
    fpn_out_channels: int = 256
    fpn_norm: str = ""
    fpn_fuse_type: str = "sum"
    rpn_in_features: Tuple[str, ...] = ()  # e.g. ("p2","p3","p4","p5","p6")
    roi_in_features: Tuple[str, ...] = ()  # e.g. ("p2","p3","p4","p5")
    # anchors. For FPN, `anchor_sizes_per_level` (one size tuple per RPN
    # level, d2's SIZES=[[32],[64],...] convention) takes precedence; empty =
    # broadcast `anchor_sizes` to every level.
    anchor_sizes: Tuple[float, ...] = (32, 64, 128, 256, 512)
    anchor_sizes_per_level: Tuple[Tuple[float, ...], ...] = ()
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
    def rpn_levels(self) -> Tuple[str, ...]:
        """RPN input level names (FPN mode only)."""
        return self.rpn_in_features or (self.in_feature,)

    @property
    def roi_levels(self) -> Tuple[str, ...]:
        """ROI pooler input level names (FPN mode only)."""
        return self.roi_in_features or (self.in_feature,)

    @property
    def level_anchor_sizes(self) -> Tuple[Tuple[float, ...], ...]:
        """Per-RPN-level anchor size tuples (FPN mode)."""
        if self.anchor_sizes_per_level:
            if len(self.anchor_sizes_per_level) != len(self.rpn_levels):
                raise ValueError(
                    f"anchor_sizes_per_level has {len(self.anchor_sizes_per_level)} "
                    f"entries for {len(self.rpn_levels)} RPN levels"
                )
            return self.anchor_sizes_per_level
        return tuple(self.anchor_sizes for _ in self.rpn_levels)

    @property
    def num_anchors(self) -> int:
        """Anchors per feature location (uniform across levels — the RPN head
        is shared, as in detectron2)."""
        if self.fpn:
            per = {len(s) for s in self.level_anchor_sizes}
            if len(per) != 1:
                raise ValueError(
                    "FPN RPN head is shared across levels; every level must "
                    f"have the same number of anchor sizes (got {per})"
                )
            return per.pop() * len(self.anchor_ratios)
        return len(self.anchor_sizes) * len(self.anchor_ratios)

    @staticmethod
    def _level_stride(name: str) -> int:
        return 2 ** int(name[1:])

    @property
    def stride(self) -> int:
        if self.in_feature.startswith("p"):  # FPN level: stride = 2**level
            return self._level_stride(self.in_feature)
        strides = {"vgg16": VGG16Backbone.out_strides(), "resnet50": ResNetBackbone.out_strides(), "resnet101": ResNetBackbone.out_strides(), "tiny": TinyBackbone.out_strides()}
        return strides[self.backbone][self.in_feature]

    @property
    def feature_channels(self) -> int:
        if self.in_feature.startswith("p"):
            return self.fpn_out_channels
        chans = {"vgg16": VGG16Backbone.out_channels(), "resnet50": ResNetBackbone.out_channels(), "resnet101": ResNetBackbone.out_channels(), "tiny": TinyBackbone.out_channels()}
        return chans[self.backbone][self.in_feature]

    @property
    def dc_in_feature(self) -> str:
        """The single feature map the image-level domain classifier consumes.
        The reference's DAOD heads are single-level (no reference YAML mixes
        FPN and DC); under FPN we pick the coarsest ROI level."""
        return self.roi_in_features[-1] if self.fpn else self.in_feature

    @property
    def dc_stride(self) -> int:
        return self._level_stride(self.dc_in_feature) if self.fpn else self.stride

    @property
    def dc_channels(self) -> int:
        return self.fpn_out_channels if self.fpn else self.feature_channels


RPN_BOX_TRANSFORM = BoxTransform((1.0, 1.0, 1.0, 1.0))
ROI_BOX_TRANSFORM = BoxTransform((10.0, 10.0, 5.0, 5.0))
# single source of truth for the d2 matching thresholds
from ..ops.matcher import RPN_MATCHER, ROI_MATCHER  # noqa: E402


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
        ref = next(iter(feat.values())) if isinstance(feat, dict) else feat
        # touch the box head so init creates its params
        dummy = jnp.zeros(
            (1, self.cfg.pooler_resolution, self.cfg.pooler_resolution, ref.shape[-1]),
            ref.dtype,
        )
        self.box(dummy, train=False)
        return feat, logits, deltas

    def features(self, images: jnp.ndarray, train: bool = False):
        """images: [B, H, W, 3] raw pixels -> in_feature map [B, h, w, C], or
        (FPN mode) the dict of pyramid levels the heads consume.

        Accepts the loaders' uint8 canvases directly: integer inputs are
        promoted to f32 BEFORE mean subtraction — building the mean constant
        in the input dtype would make `images - mean` wrap around in uint8
        arithmetic (a silent all-paths eval corruption caught by the 5-stage
        workflow artifact run; regression test in tests/test_detector_paths.py).
        """
        c = self.cfg
        if not jnp.issubdtype(images.dtype, jnp.floating):
            images = images.astype(jnp.float32)
        mean = jnp.asarray(c.pixel_mean, images.dtype)
        std = jnp.asarray(c.pixel_std, images.dtype)
        x = (images - mean) / std
        feats = self.backbone(x, train=train)
        if c.fpn:
            needed = dict.fromkeys(c.rpn_in_features + c.roi_in_features)
            return {k: feats[k] for k in needed}
        return feats[c.in_feature]

    def rpn(self, feature):
        """Single map -> RPN predictions; FPN dict -> the shared head applied
        per level (detectron2 StandardRPNHead over fpn levels, rpn.py:431),
        flattened and concatenated in `rpn_in_features` order so indices align
        with `anchors_for`'s per-level concatenation."""
        if isinstance(feature, dict):
            logits, deltas = [], []
            for name in self.cfg.rpn_in_features:
                lg, dl = self.rpn_head(feature[name])
                logits.append(lg)
                deltas.append(dl)
            return jnp.concatenate(logits, axis=1), jnp.concatenate(deltas, axis=1)
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


def anchors_for(cfg: DetectorConfig, canvas_hw: Tuple[int, int]):
    """Anchor grid(s) for a padded canvas (trace-time constant).

    Single-level: one [N, 4] array. FPN: a tuple of per-level [N_l, 4] arrays
    in `rpn_in_features` order (matching `FasterRCNN.rpn`'s concatenation) —
    `propose` needs the per-level split for d2's per-level pre-NMS top-k,
    `rpn_losses` concatenates them (d2 matches over all levels at once).
    """
    if cfg.fpn:
        per_level = []
        for name, sizes in zip(cfg.rpn_in_features, cfg.level_anchor_sizes):
            stride = cfg._level_stride(name)
            fh = (canvas_hw[0] + stride - 1) // stride
            fw = (canvas_hw[1] + stride - 1) // stride
            per_level.append(
                generate_anchors((fh, fw), stride, sizes, cfg.anchor_ratios)
            )
        return tuple(per_level)
    stride = cfg.stride
    fh = (canvas_hw[0] + stride - 1) // stride
    fw = (canvas_hw[1] + stride - 1) // stride
    return generate_anchors((fh, fw), stride, cfg.anchor_sizes, cfg.anchor_ratios)


def propose(
    cfg: DetectorConfig,
    anchors,
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

    FPN (`anchors` a per-level tuple): d2 semantics — pre-NMS top-k is taken
    PER LEVEL, candidates from all levels are merged, one NMS runs over the
    merged set, post-NMS top-k across levels (find_top_rpn_proposals,
    proposal_utils.py). The merged set is capped back to `pre_k` by score
    before NMS to bound the fixpoint size (same clamp philosophy as above;
    recall cost measured nil — tools/measure_rpn_caps.py).
    """
    pre_k = cfg.rpn_pre_nms_topk_train if training else cfg.rpn_pre_nms_topk_test
    post_k = cfg.rpn_post_nms_topk_train if training else cfg.rpn_post_nms_topk_test
    if isinstance(anchors, (tuple, list)):
        return _propose_fpn(cfg, anchors, rpn_out, image_sizes, pre_k, post_k)
    assert rpn_out.objectness.shape[1] == anchors.shape[0], (
        f"RPN prediction count {rpn_out.objectness.shape[1]} != anchor count "
        f"{anchors.shape[0]} — feature/anchor grid mismatch (under jit, "
        "jnp.take would silently clip the misaligned indices)"
    )
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


def _propose_fpn(
    cfg: DetectorConfig,
    anchors: Tuple[jnp.ndarray, ...],
    rpn_out: RPNOutput,
    image_sizes: jnp.ndarray,
    pre_k: int,
    post_k: int,
) -> Instances:
    """Multi-level proposal selection (see `propose` docstring)."""
    counts = [a.shape[0] for a in anchors]
    total = rpn_out.objectness.shape[1]
    assert total == sum(counts), (
        f"RPN prediction count {total} != anchor count {sum(counts)} "
        f"(per level {counts}) — feature/anchor grid mismatch"
    )
    merged_k = min(pre_k, sum(min(pre_k, n) for n in counts))
    post_k = min(post_k, merged_k)

    def per_image(obj, deltas, size):
        cand_boxes, cand_scores = [], []
        off = 0
        for a, n in zip(anchors, counts):
            k = min(pre_k, n)
            vals, idx = jax.lax.top_k(obj[off : off + n], k)
            d = jnp.take(deltas[off : off + n], idx, axis=0)
            boxes = RPN_BOX_TRANSFORM.apply_deltas(d, jnp.take(a, idx, axis=0))
            cand_boxes.append(boxes)
            cand_scores.append(vals)
            off += n
        boxes = clip_boxes(jnp.concatenate(cand_boxes), size)
        vals = jnp.concatenate(cand_scores)
        valid = nonempty(boxes) & jnp.isfinite(vals)
        # cap the merged candidate set before the NMS fixpoint
        key = jnp.where(valid, vals, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(key, merged_k)
        boxes = jnp.take(boxes, top_idx, axis=0)
        vals = jnp.take(vals, top_idx, axis=0)
        valid = jnp.take(valid, top_idx, axis=0)
        keep = nms_mask_matrix(boxes, vals, valid, cfg.rpn_nms_thresh)
        inst = Instances(
            boxes=boxes,
            scores=vals,
            classes=jnp.zeros((merged_k,), jnp.int32),
            valid=keep,
        )
        return inst.top_k(post_k)

    return jax.vmap(per_image)(rpn_out.objectness, rpn_out.deltas, image_sizes)


def rpn_losses(
    cfg: DetectorConfig,
    anchors,
    rpn_out: RPNOutput,
    gt: Instances,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """RPN objectness + box regression losses (detectron2 normalisation:
    sum over sampled anchors / (B * rpn_batch_size_per_image)). For FPN,
    anchors from all levels are concatenated and matched jointly — exactly
    d2's label_and_sample_anchors over Boxes.cat(all levels)."""
    if isinstance(anchors, (tuple, list)):
        anchors = jnp.concatenate(anchors, axis=0)
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


def dc_image_feature(cfg: DetectorConfig, feature) -> jnp.ndarray:
    """The single feature map the image-level domain classifier consumes:
    identity for single-level backbones, `cfg.dc_in_feature` (the coarsest
    ROI level) when the backbone is an FPN dict. The reference's DAOD domain
    heads are single-level (no reference YAML combines FPN with DC)."""
    return feature[cfg.dc_in_feature] if isinstance(feature, dict) else feature


def assign_boxes_to_levels(
    boxes: jnp.ndarray,  # [..., 4] XYXY
    min_level: int,
    max_level: int,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """detectron2's ROIPooler level-assignment rule (poolers.py
    assign_boxes_to_levels): level = floor(canonical_level +
    log2(sqrt(area) / canonical_box_size + 1e-8)), clamped to the pyramid.
    Returns int32 levels with the same leading shape as `boxes`."""
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_box_size + 1e-8)
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def pool_rois(cfg: DetectorConfig, feature, boxes: jnp.ndarray) -> jnp.ndarray:
    """feature [B, h, w, C] (or FPN level dict), boxes [B, R, 4] ->
    pooled [B*R, P, P, C].

    FPN: boxes are level-assigned with d2's rule (`assign_boxes_to_levels`)
    and each box is pooled from its assigned level. TPU formulation: pool
    every box on every ROI level (static shapes, the MXU-matmul ROIAlign) and
    one-hot-select per box — a Python loop of L accumulate steps, so only two
    [B*R, P, P, C] buffers are live at once and XLA fuses the mask-multiply
    into each ROIAlign's output contraction. L× ROIAlign FLOPs, but ROIAlign
    is small next to the backbone and gathers/ragged batching would break the
    static-shape contract.
    """
    b, r = boxes.shape[:2]
    if isinstance(feature, dict):
        levels = [int(name[1:]) for name in cfg.roi_in_features]
        assert levels == list(range(min(levels), max(levels) + 1)), (
            f"ROI_HEADS.IN_FEATURES levels {levels} must be contiguous: "
            "assign_boxes_to_levels clamps into [min, max], so a gap level "
            "would zero-pool every box assigned to it (d2's ROIPooler "
            "asserts the same)"
        )
        lvl = assign_boxes_to_levels(boxes, min(levels), max(levels))  # [B, R]
        pooled = None
        for name, l in zip(cfg.roi_in_features, levels):
            scale = 1.0 / (2 ** l)
            p_l = jax.vmap(
                lambda f, bx, s=scale: roi_align(
                    f, bx, s, cfg.pooler_resolution, cfg.pooler_sampling_ratio, True
                )
            )(feature[name], boxes)
            mask = (lvl == l).astype(p_l.dtype)[..., None, None, None]
            pooled = p_l * mask if pooled is None else pooled + p_l * mask
        return pooled.reshape(b * r, cfg.pooler_resolution, cfg.pooler_resolution, -1)
    scale = 1.0 / cfg.stride
    pooled = jax.vmap(
        lambda f, bx: roi_align(
            f, bx, scale, cfg.pooler_resolution, cfg.pooler_sampling_ratio, True
        )
    )(feature, boxes)
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
