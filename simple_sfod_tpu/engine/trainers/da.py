"""DA-Faster-RCNN trainer (+ the conditional-DA variant).

Re-design of the reference's DATrainer (daod/engine/trainers/da.py) with the
DAFasterRCNN / CDAFasterRCNN meta-architectures
(daod/modeling/meta_arch/da_faster_rcnn.py: image_dc_loss :228,
instance_dc_loss :243, consistency_loss :253; cda_faster_rcnn.py:22-243):
supervised source losses + image/instance domain discriminators behind
gradient-reversal (weights DA_FASTER.DC_IMG_GRL_WEIGHT etc.) + an
image<->instance consistency L1. The CDA variant conditions the instance
discriminator on predictions via a multilinear feature (x) prediction map,
with optional CDAN entropy conditioning (DA_FASTER.ENTROPY_CONDITIONING:
per-instance BCE weight 1+e^-H, mean-normalised — cda_faster_rcnn.py:276).
One jitted step over a paired (source, target) batch."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...data.loader import build_train_loader, gt_instances
from ...models.dann import DAImgHead, DAInsHead, gradient_scalar
from ...models.detector import DetectionBatch
from ...models.faster_rcnn import anchors_for, dc_image_feature, propose, pool_rois
from ...ops.losses import sigmoid_ce
from ...structures.instances import Instances
from ...solver.build import apply_gradients, stop_frozen_gradients
from ..train_state import TrainState
from . import register_trainer
from .base import BaseTrainer, _flip_enabled, apply_weak_aug


def dc_losses(
    det,
    params,
    variables,
    feature,
    canvas_hw,
    sizes,
    domain_label,
    rng,
    *,
    w_img: float,
    w_ins: float,
    w_cst: float,
    conditional: bool,
    entropy_conditioning: bool,
    da_img_head,
    da_ins_head,
    num_ins: int = 64,
    deterministic: bool = False,
):
    """One domain's discriminator losses on a PRECOMPUTED train-mode
    backbone feature — the reference computes each domain's features
    ONCE and feeds supervised + DC branches (da_faster_rcnn.py
    :135-220); re-forwarding here was both a second full backbone
    pass per domain and eval-mode BN the reference never uses.

    Reference semantics (da_faster_rcnn.py:228-273,
    cda_faster_rcnn.py:248-300): image BCE behind GRL(-w_img);
    instance BCE on pooled box-head features behind GRL(-w_ins)
    (CDA: feature (x) softmax multilinear map, optional CDAN entropy
    conditioning); consistency = L1 between the ROI-POOLED
    image-probability MAP (aligned over each proposal and averaged —
    not the image mean) and the instance probabilities, each feature
    path entering through a POSITIVE gradient scalar w_cst*w_{img,ins}
    — DC_CONSISTENCY_WEIGHT scales gradients, not the loss value.
    Static-shape note: the reference pools every post-NMS proposal;
    the top num_ins by score bound the DC/consistency batch.

    `deterministic=True` disables the instance head's dropout — used only
    by the torch differential (tests/test_da_lockstep.py), which compares
    values and GRL gradient paths against a direct torch transcription;
    production calls keep dropout live like the reference's DAInsHead.
    Returns (loss_img, loss_ins, loss_cst)."""
    det_cfg = det.cfg
    b = feature.shape[0]
    train_ins = not deterministic
    df = dc_image_feature(det_cfg, feature)
    img_out = da_img_head.apply(
        {"params": params["da_img"]}, gradient_scalar(df, -w_img)
    )
    img_tgt = jnp.full_like(img_out, domain_label)
    loss_img = jnp.mean(sigmoid_ce(img_out, img_tgt))

    # top-k proposals -> pooled box-head features
    anchors = anchors_for(det_cfg, canvas_hw)
    rpn_out = det._rpn(variables, feature)
    proposals = propose(det_cfg, anchors, rpn_out, sizes, training=True)
    boxes = jax.lax.stop_gradient(proposals.boxes[:, :num_ins])
    pooled = pool_rois(det_cfg, feature, boxes)
    feats = det.module.apply(
        variables,
        pooled,
        False,  # box head has no BN; dropout is the MCD extra (0.0)
        method=lambda m, p, t: m.box_head(p, train=t),
    )
    probs = None
    if conditional:
        scores, _ = det.module.apply(
            variables, pooled, False, method=type(det.module).box
        )
        probs = jax.nn.softmax(jax.lax.stop_gradient(scores), axis=-1)
        feats = (feats[:, :, None] * probs[:, None, :]).reshape(feats.shape[0], -1)
    ins_out = da_ins_head.apply(
        {"params": params["da_ins"]},
        gradient_scalar(feats, -w_ins),
        train=train_ins,
        rngs={"dropout": rng},
    )
    ins_tgt = jnp.full_like(ins_out, domain_label)
    ins_bce = sigmoid_ce(ins_out, ins_tgt)
    if entropy_conditioning:
        # CDAN entropy conditioning (cda_faster_rcnn.py:276-283):
        # per-instance weight 1 + e^{-H(softmax)}, mean-normalised
        ent = -jnp.sum(probs * jnp.log(probs + 1e-5), axis=-1)
        w = 1.0 + jnp.exp(-ent)
        w = w / jnp.mean(w)
        ins_bce = ins_bce * w.reshape(ins_out.shape)
    loss_ins = jnp.mean(ins_bce)

    # consistency (reference :253-273): the image head re-runs on the
    # +w_cst*w_img-scaled path, its sigmoid PROBABILITY MAP is
    # ROI-aligned over the same boxes and averaged (avg_pool PxP),
    # and pulled toward the instance probabilities by L1
    img_out_c = da_img_head.apply(
        {"params": params["da_img"]}, gradient_scalar(df, w_cst * w_img)
    )
    prob_map = jax.nn.sigmoid(img_out_c)  # [B, h, w, 1], feature stride
    roi_img_prob = pool_rois(det_cfg, prob_map, boxes)
    roi_img_prob = roi_img_prob.mean(axis=(1, 2, 3)).reshape(b, num_ins)
    ins_out_c = da_ins_head.apply(
        {"params": params["da_ins"]},
        gradient_scalar(feats, w_cst * w_ins),
        train=train_ins,
        rngs={"dropout": jax.random.fold_in(rng, 1)},
    )
    ins_prob = jax.nn.sigmoid(ins_out_c).reshape(b, num_ins)
    loss_cst = jnp.mean(jnp.abs(roi_img_prob - ins_prob))
    return loss_img, loss_ins, loss_cst


class _DATrainerBase(BaseTrainer):
    conditional = False  # CDA: multiply instance features by class probs
    # paired loaders: both the source and target batches are sharded
    _SHARD_BATCH_KEYS = ("IMS_PER_BATCH", "IMS_PER_BATCH_TARGET")
    def stage_chunk(self, batches):
        """Paired (source, target) chunk stacker — targets are pulled in the
        same order as the per-step path; see BaseTrainer.stage_chunk for the
        feeder contract."""
        if self.target_loader is None:
            self.target_loader = iter(self._build_target_loader())
        per = []
        for b in batches:
            t = next(self.target_loader)
            per.append(
                (b["images"], b["sizes"], gt_instances(b, host=True), t["images"], t["sizes"])
            )
        return self._shard(self._stack_steps(per), axis=1)

    def __init__(self, cfg, synthetic: bool = False):
        if cfg.DA_FASTER.ENTROPY_CONDITIONING and not self.conditional:
            raise ValueError(
                "DA_FASTER.ENTROPY_CONDITIONING requires the conditional "
                "trainer (TRAINER: cda) — the plain 'da' instance "
                "discriminator has no class-probability condition to weight by"
            )
        super().__init__(cfg, synthetic=synthetic)
        self.target_loader = None

    def _init_state(self) -> TrainState:
        variables = self.detector.init(self.base_rng, tuple(self.cfg.TPU.CANVAS))
        self.da_img_head = DAImgHead(dtype=self.det_cfg.dtype)
        self.da_ins_head = DAInsHead(dtype=self.det_cfg.dtype)
        feat_hw = (
            self.cfg.TPU.CANVAS[0] // self.det_cfg.dc_stride,
            self.cfg.TPU.CANVAS[1] // self.det_cfg.dc_stride,
        )
        c = self.det_cfg.dc_channels
        img_dummy = jnp.zeros((1, *feat_hw, c))
        ins_dim = self.det_cfg.fc_dim * (
            (self.det_cfg.num_classes + 1) if self.conditional else 1
        )
        params = {
            "det": variables["params"],
            "da_img": self.da_img_head.init(self.base_rng, img_dummy)["params"],
            "da_ins": self.da_ins_head.init(
                self.base_rng, jnp.zeros((1, ins_dim)), train=False
            )["params"],
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(params),
        )

    def _build_target_loader(self):
        return build_train_loader(
            self.cfg,
            dataset_names=self.cfg.DATASETS.TRAIN_TARGET,
            batch_size=self.cfg.SOLVER.IMS_PER_BATCH_TARGET,
            seed=self.cfg.SEED + 1,
            synthetic=self.synthetic,
        )

    def _build_train_step(self):
        det = self.detector
        det_cfg = self.det_cfg
        cfg = self.cfg
        optimizer = self.optimizer
        flip = _flip_enabled(self.cfg)
        freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_AT)
        w_img = float(cfg.DA_FASTER.DC_IMG_GRL_WEIGHT)
        w_ins = float(cfg.DA_FASTER.DC_INS_GRL_WEIGHT)
        w_cst = float(cfg.DA_FASTER.DC_CONSISTENCY_WEIGHT)
        conditional = self.conditional
        entropy_conditioning = conditional and bool(cfg.DA_FASTER.ENTROPY_CONDITIONING)
        da_img_head = self.da_img_head
        da_ins_head = self.da_ins_head
        num_ins = 64

        def dc_losses_fn(params, variables, feature, canvas_hw, sizes, domain_label, rng):
            # module-level dc_losses (torch-differential-tested in
            # tests/test_da_lockstep.py) bound to this trainer's config
            return dc_losses(
                det,
                params,
                variables,
                feature,
                canvas_hw,
                sizes,
                domain_label,
                rng,
                w_img=w_img,
                w_ins=w_ins,
                w_cst=w_cst,
                conditional=conditional,
                entropy_conditioning=entropy_conditioning,
                da_img_head=da_img_head,
                da_ins_head=da_ins_head,
                num_ins=num_ins,
            )

        def step_fn(state, src_images, src_sizes, src_gt: Instances, tgt_images, tgt_sizes, rng):
            src_images = src_images.astype(jnp.float32)
            tgt_images = tgt_images.astype(jnp.float32)
            rng = jax.random.fold_in(rng, state.step)
            k_flip, k_sup, k_dc_s, k_dc_t, k_flip_t = jax.random.split(rng, 5)
            src_images, src_gt = apply_weak_aug(k_flip, src_images, src_sizes, src_gt, flip)
            # the reference maps the TARGET set through the same training
            # mapper (build.py:384-386), so target views flip too — without
            # this the discriminators train on an augmentation-asymmetric
            # domain pair
            if flip:
                b = tgt_images.shape[0]
                dummy_gt = Instances(
                    boxes=jnp.zeros((b, 1, 4), jnp.float32),
                    scores=jnp.zeros((b, 1), jnp.float32),
                    classes=jnp.zeros((b, 1), jnp.int32),
                    valid=jnp.zeros((b, 1), bool),
                )
                tgt_images, _ = apply_weak_aug(
                    k_flip_t, tgt_images, tgt_sizes, dummy_gt, True
                )

            def loss_fn(params):
                params = stop_frozen_gradients(params, freeze_at)
                variables = {"params": params["det"], "batch_stats": state.batch_stats}
                # ONE train-mode backbone pass per domain, features shared by
                # the supervised and DC branches; BN running stats nudged by
                # BOTH passes in source-then-target order (reference forward)
                feat_src, mutated = det._features(variables, src_images, True, mutable=True)
                stats1 = mutated.get("batch_stats", {})
                sup_total, metrics = det.losses_from_feature(
                    variables, feat_src, DetectionBatch(src_images, src_sizes, src_gt), k_sup
                )
                variables_t = {"params": params["det"], "batch_stats": stats1}
                feat_tgt, mutated_t = det._features(variables_t, tgt_images, True, mutable=True)
                new_stats = mutated_t.get("batch_stats", {})
                li_s, ln_s, lc_s = dc_losses_fn(
                    params, variables, feat_src, tuple(src_images.shape[1:3]), src_sizes, 0.0, k_dc_s
                )
                li_t, ln_t, lc_t = dc_losses_fn(
                    params, variables, feat_tgt, tuple(tgt_images.shape[1:3]), tgt_sizes, 1.0, k_dc_t
                )
                # reference loss_dict entries ARE the 0.5-halved sums, each
                # entering the total at weight 1 (da_faster_rcnn.py:222-224)
                metrics["loss_DC_img"] = 0.5 * (li_s + li_t)
                metrics["loss_DC_ins"] = 0.5 * (ln_s + ln_t)
                metrics["loss_consistency"] = 0.5 * (lc_s + lc_t)
                total = (
                    sup_total
                    + metrics["loss_DC_img"]
                    + metrics["loss_DC_ins"]
                    + metrics["loss_consistency"]
                )
                return total, (metrics, new_stats)

            (total, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            new_params, new_opt = apply_gradients(
                optimizer, grads, state.opt_state, state.params
            )
            metrics["total_loss"] = total
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                ),
                metrics,
            )

        self._step_fn_raw = step_fn
        return jax.jit(step_fn, donate_argnums=(0,))

    def run_step(self, batch) -> Dict[str, float]:
        if self.target_loader is None:
            self.target_loader = iter(self._build_target_loader())
        tgt = next(self.target_loader)
        args = (
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["sizes"]),
            gt_instances(batch),
            jnp.asarray(tgt["images"]),
            jnp.asarray(tgt["sizes"]),
        )
        args = self._shard(args)
        self.state, metrics = self._train_step(self.state, *args, self.base_rng)
        return metrics

    def test(self, dataset_names=None):
        # student-only eval; the DA state keys params under "det"
        self._maybe_precise_bn()  # TEST.PRECISE_BN must not be silently inert
        from ...data.datasets import get_dataset
        from ...data.loader import build_test_loader
        from ...evaluation.build import build_evaluators
        from ..eval_loop import inference_on_dataset

        variables = {"params": self.state.params["det"], "batch_stats": self.state.batch_stats}
        results = {}
        for name in dataset_names or self.cfg.DATASETS.TEST:
            ds = get_dataset(name)
            loader = build_test_loader(self.cfg, name, synthetic=self.synthetic)
            res = inference_on_dataset(
                self.detector, variables, loader, ds["thing_classes"],
                build_evaluators(self.cfg, name, ds["thing_classes"]),
                pipeline_depth=self.cfg.TPU.EVAL_PIPELINE_DEPTH,
                spatial=self.cfg.TPU.SPATIAL_SHARD,
                mesh=self.mesh,
            )
            results[name] = res
            ap_line = {
                k: res.get(k) for k in ("AP", "AP50", "VOC_AP50", "F1")
                if res.get(k) is not None
            }
            print(f"[eval] {name}: {ap_line}", flush=True)
        # same persisted summary as BaseTrainer.test — the workflow driver
        # and offline tooling read eval_results.json from every stage
        import json
        import os

        from .base import _jsonable

        with open(os.path.join(self.output_dir, "eval_results.json"), "w") as f:
            json.dump(_jsonable(results), f, indent=2)
        return results


@register_trainer("da")
class DATrainer(_DATrainerBase):
    conditional = False


@register_trainer("cda")
class CDATrainer(_DATrainerBase):
    conditional = True
