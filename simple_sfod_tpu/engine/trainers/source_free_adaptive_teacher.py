"""Source-free adaptive/mean-teacher self-training — the flagship workload.

TPU re-design of the reference's SourceFreeAdaptiveTeacherTrainer
(/root/reference/daod/engine/trainers/source_free_adaptive_teacher.py) and
its `_single` / `_mosaic` variants: teacher inference on the weak view,
confidence- (or FlexMatch-adaptive-) thresholded pseudo-labels, student update
on the strong view, EMA teacher — ALL inside one jitted, donated-argument
step function. The strong view is *derived on device* from the weak batch
(data/transforms.strong_augment), so each step ships one image batch to HBM.

Loss weighting matches the reference run_step (:539-568): every pseudo loss
(cls, box_reg, rpn_cls, rpn_loc) x UNSUP_LOSS_WEIGHT, supervised-source terms
absent (source-free), BPC logged but weighted 0, DC losses x DIS_LOSS_WEIGHT.

Variants (reference file-level forks become flags):
  source_free_adaptive_teacher         pseudo-labels from TEACHER; EMA OFF
                                       (reference :581 comments the update out)
  source_free_adaptive_teacher_single  pseudo-labels from STUDENT; EMA ON
  source_free_adaptive_teacher_mosaic  as main but EMA ON (dead duplicate in
                                       the reference; kept for CLI parity)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...data import transforms as T
from ...data.loader import build_train_loader
from ...models.dann import DAInsHead, FCDiscriminatorImg, gradient_scalar
from ...models.detector import DetectionBatch
from ...models.faster_rcnn import dc_image_feature
from ...ops.losses import sigmoid_ce
from ...structures.instances import Instances
from ...solver.build import apply_gradients, stop_frozen_gradients
from ..train_state import AdaptiveThresholdState, TeacherStudentState, ema_update
from . import register_trainer
from .base import BaseTrainer, _flip_enabled, apply_weak_aug

# Cityscapes classes 0 (person) and 2 (car) are pinned to acc=1 by the
# reference's update_adaptive_threshold (sfat.py:304-309): dominant classes
# whose counts would otherwise flatten every other class's threshold.
PINNED_CLASSES = (0, 2)


class SourceFreeAdaptiveTeacherTrainer(BaseTrainer):
    pseudo_from_student = False
    ema_enabled = False
    # source-free: only the unlabeled target batch is sharded
    _SHARD_BATCH_KEYS = ("IMS_PER_BATCH_TARGET",)

    def __init__(self, cfg, synthetic: bool = False):
        self.dc_enabled = bool(cfg.DOMAIN_CLASSIFIER.ENABLED)
        # Instance-level discriminator: the reference builds DC_ins behind
        # SEMISUPNET.INS_DC (meta_arch :69-71,:88) and weights its losses
        # behind DOMAIN_CLASSIFIER.INSTANCE (sfat.py:557). Setting INSTANCE
        # without INS_DC is a silent no-op there; here either flag builds the
        # module so INSTANCE=True always produces (and weights) the loss.
        self.ins_dc_enabled = self.dc_enabled and (
            bool(cfg.SEMISUPNET.INS_DC) or bool(cfg.DOMAIN_CLASSIFIER.INSTANCE)
        )
        # fail loudly on settable-but-unsupported values instead of silently
        # diverging: the reference raises on unknown PSEUDO_BBOX_SAMPLE too
        # (sfat.py process_pseudo_label), and DIS_TYPE selects the image-DC
        # input feature (meta_arch :68) — we wire the DC to the heads'
        # in_feature, which every shipped reference YAML sets DIS_TYPE to
        if cfg.SEMISUPNET.PSEUDO_BBOX_SAMPLE != "thresholding":
            raise ValueError(
                f"Unknown pseudo label boxes methods {cfg.SEMISUPNET.PSEUDO_BBOX_SAMPLE}"
            )
        if self.dc_enabled:
            from ...config.defaults import detector_config_from_cfg

            dc_feat = detector_config_from_cfg(cfg).dc_in_feature
            if cfg.SEMISUPNET.DIS_TYPE != dc_feat:
                raise ValueError(
                    f"SEMISUPNET.DIS_TYPE={cfg.SEMISUPNET.DIS_TYPE!r} must equal the "
                    f"image DC's input feature {dc_feat!r} (single-level: the heads' "
                    "in-feature; FPN: the coarsest ROI level — "
                    "faster_rcnn.DetectorConfig.dc_in_feature)"
                )
        super().__init__(cfg, synthetic=synthetic)

    # -- state ---------------------------------------------------------------
    def _init_state(self) -> TeacherStudentState:
        variables = self.detector.init(self.base_rng, tuple(self.cfg.TPU.CANVAS))
        det_params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        params = {"det": det_params}
        if self.dc_enabled:
            self.dc_img = FCDiscriminatorImg(dtype=self.det_cfg.dtype)
            feat_hw = (
                self.cfg.TPU.CANVAS[0] // self.det_cfg.dc_stride,
                self.cfg.TPU.CANVAS[1] // self.det_cfg.dc_stride,
            )
            dummy = jnp.zeros((1, *feat_hw, self.det_cfg.dc_channels))
            params["dc"] = self.dc_img.init(self.base_rng, dummy)["params"]
        if self.ins_dc_enabled:
            self.dc_ins = DAInsHead(dtype=self.det_cfg.dtype)
            dummy_bf = jnp.zeros((1, self.det_cfg.fc_dim))
            params["dc_ins"] = self.dc_ins.init(self.base_rng, dummy_bf, train=False)["params"]
        # teacher starts as a COPY of the student (both from the source
        # checkpoint); distinct buffers are required because the jitted step
        # donates the whole state (same-buffer donation is illegal).
        #
        # Fixed-teacher variants (EMA off, reference :581 commented out) keep
        # the teacher in bf16 when compute is bf16: it is inference-only, so
        # this halves the teacher's HBM->VMEM parameter prefetch traffic
        # (BENCH_NOTES round-2 lead #2). EMA variants stay f32 — with
        # keep_rate 0.9996 the (1-keep) increments are below bf16 resolution
        # and the teacher would stop moving.
        teacher_dtype = (
            self.det_cfg.dtype
            if (not self.ema_enabled and self.det_cfg.dtype == jnp.bfloat16)
            else None
        )
        copy = lambda tree: jax.tree.map(
            lambda x: jnp.array(x, dtype=teacher_dtype or x.dtype), tree
        )
        # running stats stay f32 even when the fixed teacher's params are
        # bf16: train-mode BN normalises by batch statistics so they are off
        # the hot path, but they accumulate the pseudo forward's 0.1-momentum
        # nudges (flax writes the f32 update, so f32 also keeps the state
        # pytree dtype stable across the donated/scanned step).
        return TeacherStudentState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            teacher_params=copy(det_params),
            teacher_stats=jax.tree.map(jnp.array, batch_stats),
            thresh=AdaptiveThresholdState.create(
                self.det_cfg.num_classes, self.cfg.ADAPTIVE_THRESHOLD.RESERVE
            ),
        )

    def build_train_loader(self):
        # source-free: the (unlabeled) target domain is the train set
        # (reference build_train_loader, sfat.py:96-103)
        return build_train_loader(
            self.cfg,
            dataset_names=self.cfg.DATASETS.TRAIN_TARGET or self.cfg.DATASETS.TRAIN,
            batch_size=self.cfg.SOLVER.IMS_PER_BATCH_TARGET,
            synthetic=self.synthetic,
        )

    def _build_style_transfer(self):
        """AdaIN style-enhancement module (cfg.STYLE.*). Pretrained
        encoder/decoder load from STYLE.VGG_MODEL / STYLE.DECODER when the
        files exist; otherwise random init with a warning (the path still
        compiles/runs, the enhancement is just untrained)."""
        import os

        import numpy as np

        from ...models.style_transfer import StyleTransfer

        cfg = self.cfg
        if cfg.STYLE.STYLE_IMAGE and os.path.exists(str(cfg.STYLE.STYLE_IMAGE)):
            from PIL import Image

            with Image.open(cfg.STYLE.STYLE_IMAGE) as im:
                style_img = jnp.asarray(
                    np.asarray(im.convert("RGB"), np.float32) / 255.0
                )
        else:
            print("[style] STYLE.STYLE_IMAGE missing; using a flat gray style")
            style_img = jnp.full((64, 64, 3), 0.6, jnp.float32)
        st = StyleTransfer.init(
            self.base_rng, style_img, alpha=float(cfg.STYLE.ALPHA)
        )
        # pretrained AdaIN encoder/decoder (reference STYLE.VGG_MODEL /
        # STYLE.DECODER point at pytorch-AdaIN checkpoints)
        from ...checkpoint.torch_import import (
            import_adain_decoder,
            import_adain_encoder,
            load_torch_file,
        )

        if cfg.STYLE.VGG_MODEL and os.path.exists(str(cfg.STYLE.VGG_MODEL)):
            st.encoder_vars = {"params": import_adain_encoder(load_torch_file(cfg.STYLE.VGG_MODEL))}
        elif cfg.STYLE.VGG_MODEL:
            print(f"[style] VGG_MODEL {cfg.STYLE.VGG_MODEL} missing; random encoder")
        if cfg.STYLE.DECODER and os.path.exists(str(cfg.STYLE.DECODER)):
            st.decoder_vars = {"params": import_adain_decoder(load_torch_file(cfg.STYLE.DECODER))}
        elif cfg.STYLE.DECODER:
            print(f"[style] DECODER {cfg.STYLE.DECODER} missing; random decoder")
        return st

    # -- jitted adaptation step -----------------------------------------------
    def _build_train_step(self):
        det = self.detector
        det_cfg = self.det_cfg
        cfg = self.cfg
        optimizer = self.optimizer
        flip = _flip_enabled(self.cfg)
        freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_AT)
        bbox_threshold = float(cfg.SEMISUPNET.BBOX_THRESHOLD)
        unsup_w = float(cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT)
        dis_w = float(cfg.SEMISUPNET.DIS_LOSS_WEIGHT)
        adaptive_on = bool(cfg.ADAPTIVE_THRESHOLD.ENABLED)
        warm_up = int(cfg.ADAPTIVE_THRESHOLD.WARM_UP)
        reserve_n = int(cfg.ADAPTIVE_THRESHOLD.RESERVE)
        keep_rate = float(cfg.SEMISUPNET.EMA_KEEP_RATE)
        update_iter = max(int(cfg.SEMISUPNET.TEACHER_UPDATE_ITER), 1)
        weak_strong = bool(cfg.WEAK_STRONG_AUGMENT)
        split_view_bn = bool(cfg.SEMISUPNET.SPLIT_VIEW_BN)
        num_classes = det_cfg.num_classes
        pseudo_capacity = det_cfg.detections_per_image
        dc_enabled = self.dc_enabled
        dc_image = bool(cfg.DOMAIN_CLASSIFIER.IMAGE)
        ins_dc_enabled = self.ins_dc_enabled
        dc_instance = bool(cfg.DOMAIN_CLASSIFIER.INSTANCE)
        pseudo_from_student = self.pseudo_from_student
        ema_enabled = self.ema_enabled
        dc_img = getattr(self, "dc_img", None)
        dc_ins = getattr(self, "dc_ins", None)
        style = self._build_style_transfer() if cfg.STYLE.ENABLED else None

        def pseudo_pipeline(dets, thresh: AdaptiveThresholdState, step):
            """Steps 4-5 of the reference run_step: adaptive-threshold
            bookkeeping (sfat.py:393-404 + :282-333) and the FlexMatch convex
            mask after warm-up (adaptive_confidence.py:29)."""
            dets = jax.tree.map(jax.lax.stop_gradient, dets)
            fixed_mask = dets.valid & (dets.scores > bbox_threshold)
            counts = jnp.sum(
                jax.nn.one_hot(dets.classes, num_classes, dtype=jnp.int32)
                * fixed_mask[..., None].astype(jnp.int32),
                axis=(0, 1),
            )
            reserve = jax.lax.dynamic_update_index_in_dim(
                thresh.reserve, counts, step % reserve_n, axis=0
            )
            counter = jnp.sum(reserve, axis=0).astype(jnp.float32)
            counter = counter.at[jnp.asarray(PINNED_CLASSES)].set(0.0)
            acc = counter / jnp.maximum(jnp.max(counter), 1.0)
            acc = acc.at[jnp.asarray(PINNED_CLASSES)].set(1.0)
            new_thresh = AdaptiveThresholdState(
                reserve=reserve, classwise_acc=acc, cursor=thresh.cursor + 1
            )
            per_det_acc = jnp.take(acc, dets.classes, axis=0)
            adaptive_thr = bbox_threshold * per_det_acc / (2.0 - per_det_acc)
            use_adaptive = jnp.asarray(adaptive_on) & (step >= warm_up)
            eff_thr = jnp.where(use_adaptive, adaptive_thr, bbox_threshold)
            pseudo_valid = dets.valid & (dets.scores >= eff_thr)
            pseudo_gt = Instances(
                boxes=dets.boxes,
                scores=dets.scores,
                classes=dets.classes,
                valid=pseudo_valid,
            )
            pstats = {
                "num_pseudo": jnp.sum(pseudo_valid.astype(jnp.int32)),
                "pseudo_mean_conf": jnp.sum(
                    dets.scores * dets.valid.astype(jnp.float32)
                ) / jnp.maximum(jnp.sum(dets.valid.astype(jnp.float32)), 1.0),
            }
            return pseudo_gt, new_thresh, pstats

        def dc_losses(params, variables, feat_s, feat_t, sizes, canvas, rng_dc, metrics, total):
            """Image- and instance-level domain-discriminator losses on
            ALREADY-COMPUTED backbone features: strong/enhanced view labelled
            source(=0), weak view target(=1) (meta_arch :137-210). Reusing
            the loss pass's features removes two full backbone passes per
            step (BENCH_NOTES round-2 leads).

            Zero-weighted discriminators are SKIPPED, not computed: with
            DOMAIN_CLASSIFIER.IMAGE (resp. INSTANCE) False the reference
            multiplies the loss by 0 AND logs the zeroed value
            (metrics_dict = loss_dict, reference sfat.py:540-575), so the
            forward is dead compute with no observable output — the flagship
            YAML (ENABLED: True, IMAGE/INSTANCE: False, INS_DC: True) pays
            two extra backbone/ROI passes per step for losses its own logs
            show as 0. Here the dead forwards are dropped at trace time and
            the same zeros are logged; the DC parameters still exist and
            still weight-decay exactly like the reference's."""
            if dc_enabled and not dc_image:
                metrics["loss_DC_img_s"] = jnp.zeros(())
                metrics["loss_DC_img_t"] = jnp.zeros(())
            elif dc_enabled:
                df_s = dc_image_feature(det_cfg, feat_s)
                df_t = dc_image_feature(det_cfg, feat_t)
                out_s = dc_img.apply({"params": params["dc"]}, gradient_scalar(df_s, -1.0))
                out_t = dc_img.apply({"params": params["dc"]}, gradient_scalar(df_t, -1.0))
                loss_s = jnp.mean(sigmoid_ce(out_s, jnp.zeros_like(out_s)))
                loss_t = jnp.mean(sigmoid_ce(out_t, jnp.ones_like(out_t)))
                metrics["loss_DC_img_s"] = loss_s
                metrics["loss_DC_img_t"] = loss_t
                total = total + dis_w * (loss_s + loss_t)
            if ins_dc_enabled and not dc_instance:
                metrics["loss_DC_ins_s"] = jnp.zeros(())
                metrics["loss_DC_ins_t"] = jnp.zeros(())
            elif ins_dc_enabled:
                # instance-level discriminator on box-head features behind
                # gradient reversal (reference instance_dc_loss, meta_arch
                # :341-349; weighted at sfat.py:557)
                k_ds, k_dt = jax.random.split(rng_dc)
                bf_s, v_s = det.box_features_from_feature(variables, feat_s, sizes, canvas)
                bf_t, v_t = det.box_features_from_feature(variables, feat_t, sizes, canvas)
                out_s = dc_ins.apply(
                    {"params": params["dc_ins"]},
                    gradient_scalar(bf_s, -1.0),
                    train=True,
                    rngs={"dropout": k_ds},
                )[:, 0]
                out_t = dc_ins.apply(
                    {"params": params["dc_ins"]},
                    gradient_scalar(bf_t, -1.0),
                    train=True,
                    rngs={"dropout": k_dt},
                )[:, 0]
                vs = v_s.astype(jnp.float32)
                vt = v_t.astype(jnp.float32)
                loss_ins_s = jnp.sum(
                    sigmoid_ce(out_s, jnp.zeros_like(out_s)) * vs
                ) / jnp.maximum(jnp.sum(vs), 1.0)
                loss_ins_t = jnp.sum(
                    sigmoid_ce(out_t, jnp.ones_like(out_t)) * vt
                ) / jnp.maximum(jnp.sum(vt), 1.0)
                metrics["loss_DC_ins_s"] = loss_ins_s
                metrics["loss_DC_ins_t"] = loss_ins_t
                total = total + dis_w * (loss_ins_s + loss_ins_t)
            return metrics, total

        def step_fn(state: TeacherStudentState, images, sizes, rng):
            images = images.astype(jnp.float32)
            rng = jax.random.fold_in(rng, state.step)
            rng_flip, rng_strong, rng_loss, rng_dc = jax.random.split(rng, 4)

            # 1. weak view: random flip (geometry shared by both views)
            dummy_gt = Instances.empty(1)
            dummy_gt = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (images.shape[0],) + x.shape), dummy_gt
            )
            images_w, _ = apply_weak_aug(rng_flip, images, sizes, dummy_gt, flip)

            # 2. strong/enhanced view, derived on device. STYLE.ENABLED:
            # AdaIN style enhancement of the student view toward the fog
            # style image (reference sfat.py:346-350); otherwise the strong
            # photometric pipeline (reference mapper :141-157)
            if style is not None:
                images_s = style.stylize(images_w)
            elif weak_strong:
                rngs = jax.random.split(rng_strong, images.shape[0])
                images_s = jax.vmap(T.strong_augment)(rngs, images_w, sizes)
            else:
                images_s = images_w
            b = images.shape[0]
            canvas = tuple(images.shape[1:3])

            if pseudo_from_student:
                # `_single` variant: pseudo-labels come from the STUDENT, so
                # weak (inference) and strong (loss) views share ONE fused
                # backbone pass at 2x batch — same FLOPs, half the per-op
                # dispatch/prefetch overhead the device trace showed the step
                # is bound by (BENCH_NOTES round-2 lead #1). The weak half is
                # stop_gradient'd; train-mode BN mirrors the reference's
                # always-train-mode student. KNOWN DEVIATION: BN batch
                # statistics pool over BOTH views here, where the reference's
                # two separate forwards normalise each view by its own stats
                # (and nudge the running stats twice). The views share
                # geometry and differ only photometrically, so the pooled
                # stats sit between the reference's two; the default keeps
                # the fusion, SEMISUPNET.SPLIT_VIEW_BN=True switches to the
                # reference-exact two-pass semantics below.
                def loss_fn(params):
                    params = stop_frozen_gradients(params, freeze_at)
                    variables = {"params": params["det"], "batch_stats": state.batch_stats}
                    if split_view_bn:
                        # SEMISUPNET.SPLIT_VIEW_BN: reference-exact two-pass
                        # semantics — each view normalised by its OWN batch
                        # statistics, running stats nudged twice (weak pass
                        # first, strong pass sees the post-weak stats), at
                        # the cost of the fused pass's dispatch savings.
                        feat_w, mut_w = det._features(
                            variables, images_w, True, mutable=True
                        )
                        vars_s = {
                            "params": params["det"],
                            "batch_stats": mut_w.get("batch_stats", {}),
                        }
                        feat_s, mut_s = det._features(
                            vars_s, images_s, True, mutable=True
                        )
                        new_stats = mut_s.get("batch_stats", {})
                    else:
                        fused = jnp.concatenate([images_w, images_s], axis=0)
                        feat_all, mutated = det._features(variables, fused, True, mutable=True)
                        new_stats = mutated.get("batch_stats", {})
                        # tree.map: feat_all is one array, or a level dict (FPN)
                        feat_w = jax.tree.map(lambda x: x[:b], feat_all)
                        feat_s = jax.tree.map(lambda x: x[b:], feat_all)
                    dets = det.infer_from_feature(
                        variables,
                        jax.lax.stop_gradient(feat_w),
                        sizes,
                        canvas,
                        topk=pseudo_capacity,
                    )
                    pseudo_gt, new_thresh, pstats = pseudo_pipeline(
                        dets, state.thresh, state.step
                    )
                    batch = DetectionBatch(images=images_s, sizes=sizes, gt=pseudo_gt)
                    total, metrics = det.losses_from_feature(
                        variables, feat_s, batch, rng_loss, with_bpc=True
                    )
                    metrics = {f"{k}_pseudo": v for k, v in metrics.items()}
                    total = total * unsup_w
                    metrics, total = dc_losses(
                        params, variables, feat_s, feat_w, sizes, canvas, rng_dc, metrics, total
                    )
                    return total, (metrics, new_stats, new_thresh, pstats)

                (total, (metrics, new_stats, new_thresh, pstats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
            else:
                # 3. teacher pseudo-labels on the weak view (separate
                # parameter tree -> separate pass; bf16 teacher params halve
                # its prefetch traffic). The reference teacher is NEVER put
                # in eval mode — the .eval() block at ref sfat.py:374-383 is
                # commented out — so its pseudo forward runs TRAIN-mode BN
                # (each batch normalised by its own statistics) and, as the
                # torch train-mode side effect, nudges the teacher's running
                # stats toward the target domain (momentum 0.1). Both
                # semantics reproduced: a mutable train-mode forward whose
                # updated batch_stats become the step's new teacher_stats
                # (then EMA-blended where ema_enabled, matching the
                # state_dict() blend of _update_teacher_model :583-603).
                tvars = state.teacher_variables()
                feat_tw, mut_t = det._features(tvars, images_w, True, mutable=True)
                teacher_stats_fwd = mut_t.get("batch_stats", {})
                dets = det.infer_from_feature(
                    tvars, feat_tw, sizes, canvas, topk=pseudo_capacity
                )
                pseudo_gt, new_thresh, pstats = pseudo_pipeline(dets, state.thresh, state.step)
                batch = DetectionBatch(images=images_s, sizes=sizes, gt=pseudo_gt)

                def loss_fn(params):
                    params = stop_frozen_gradients(params, freeze_at)
                    variables = {"params": params["det"], "batch_stats": state.batch_stats}
                    feat_s, mutated = det._features(variables, images_s, True, mutable=True)
                    new_stats = mutated.get("batch_stats", {})
                    total, metrics = det.losses_from_feature(
                        variables, feat_s, batch, rng_loss, with_bpc=True
                    )
                    metrics = {f"{k}_pseudo": v for k, v in metrics.items()}
                    total = total * unsup_w
                    if (dc_enabled and dc_image) or (ins_dc_enabled and dc_instance):
                        # one extra student pass on the weak view (train-mode
                        # BN like the reference, statistics discarded); the
                        # strong side reuses the loss pass's features
                        feat_t, _ = det._features(variables, images_w, True, mutable=True)
                        metrics, total = dc_losses(
                            params, variables, feat_s, feat_t, sizes, canvas, rng_dc, metrics, total
                        )
                    elif dc_enabled or ins_dc_enabled:
                        # every built discriminator is zero-weighted: no
                        # feature pass needed, dc_losses only logs the
                        # reference-parity zeros
                        metrics, total = dc_losses(
                            params, variables, feat_s, None, sizes, canvas, rng_dc, metrics, total
                        )
                    return total, (metrics, new_stats)

                (total, (metrics, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)

            new_params, new_opt = apply_gradients(
                optimizer, grads, state.opt_state, state.params
            )

            # 7. EMA teacher update (reference :583-603; disabled in the main
            # variant, enabled in _single/_mosaic). Teacher-pseudo variants
            # blend on top of the stats the teacher's own train-mode pseudo
            # forward just nudged (the reference's buffer order: BN momentum
            # update during the no_grad forward, then the state_dict EMA).
            teacher_stats_base = (
                state.teacher_stats if pseudo_from_student else teacher_stats_fwd
            )
            if ema_enabled:
                do_update = (state.step % update_iter) == 0
                rate = jnp.where(do_update, keep_rate, 1.0)
                new_teacher_params = ema_update(state.teacher_params, new_params["det"], rate)
                new_teacher_stats = ema_update(teacher_stats_base, new_stats, rate)
            else:
                new_teacher_params = state.teacher_params
                new_teacher_stats = teacher_stats_base

            metrics["total_loss"] = total
            metrics.update(pstats)

            new_state = TeacherStudentState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                teacher_params=new_teacher_params,
                teacher_stats=new_teacher_stats,
                thresh=new_thresh,
            )
            return new_state, metrics

        self._step_fn_raw = step_fn
        return jax.jit(step_fn, donate_argnums=(0,))

    def run_step(self, batch) -> Dict[str, float]:
        images = jnp.asarray(batch["images"])
        sizes = jnp.asarray(batch["sizes"])
        images, sizes = self._shard((images, sizes))
        self.state, metrics = self._train_step(self.state, images, sizes, self.base_rng)
        self._maybe_visualize(batch)
        return metrics

    def run_steps(self, batch, n: int) -> Dict[str, float]:
        """n adaptation steps on one batch inside ONE dispatched executable
        (lax.scan over the step body; per-step RNG still folds on
        state.step, so the steps are NOT identical).

        Exists because each host dispatch pays one tunnel round trip on this
        box — under backend load that gap reached ~100ms/step while the
        executable itself runs 53ms (BENCH_NOTES round 2). Multi-step-per-
        dispatch is also how production TPU training loops are written, so
        bench.py measures the device's step throughput through this path.
        Returns the LAST step's metrics.
        """
        if getattr(self, "_multi_step_n", None) != n:
            step_fn = self._step_fn_raw

            def multi(state, images, sizes, rng):
                def body(st, _):
                    return step_fn(st, images, sizes, rng)

                state, metrics = jax.lax.scan(body, state, None, length=n)
                return state, jax.tree.map(lambda m: m[-1], metrics)

            self._multi_step = jax.jit(multi, donate_argnums=(0,))
            self._multi_step_n = n
        images = jnp.asarray(batch["images"])
        sizes = jnp.asarray(batch["sizes"])
        images, sizes = self._shard((images, sizes))
        self.state, metrics = self._multi_step(self.state, images, sizes, self.base_rng)
        return metrics

    def stage_chunk(self, batches):
        """SFAT-signature chunk stacker (no GT: pseudo-labels are computed
        on device); see BaseTrainer.stage_chunk for the feeder contract."""
        xs = self._stack_steps([(b["images"], b["sizes"]) for b in batches])
        return self._shard(xs, axis=1)

    def run_step_chunk(self, batches, xs=None) -> Dict[str, float]:
        """K steps in ONE dispatch, each consuming its OWN batch
        (TPU.STEPS_PER_DISPATCH; `xs` = pre-staged device tree from the
        feeder). Pseudo-label visualization fires on the chunk's last batch
        (periodicity approximated to chunk boundaries)."""
        metrics = self._dispatch_chunk(self.stage_chunk(batches) if xs is None else xs)
        self._maybe_visualize(batches[-1])
        return metrics

    def _maybe_visualize(self, batch):
        """Teacher pseudo-labels -> TensorBoard every VIS_PERIOD steps
        (the reference's visualize_training, meta_arch :351-393)."""
        period = self.cfg.VIS_PERIOD
        if period <= 0 or (self.storage.iter + 1) % period:
            return
        if not hasattr(self, "_vis_hook"):
            from ...utils.visualize import VisualizationHook

            self._vis_hook = VisualizationHook(
                self.output_dir,
                period,
                input_format=self.cfg.INPUT.FORMAT,
            )
            self._vis_infer = jax.jit(
                lambda v, i, s: self.detector.infer(v, i, s)
            )
        dets = self._vis_infer(
            self.state.teacher_variables(),
            jnp.asarray(batch["images"][:1]),
            jnp.asarray(batch["sizes"][:1]),
        )
        import numpy as np

        keep = np.asarray(dets.valid[0]) & (np.asarray(dets.scores[0]) > self.cfg.SEMISUPNET.BBOX_THRESHOLD)
        self._vis_hook.after_step(
            self.storage.iter,
            batch["images"][0],
            np.asarray(dets.boxes[0])[keep],
            np.asarray(dets.classes[0])[keep],
            np.asarray(dets.scores[0])[keep],
            tag="train/teacher_pseudo_labels",
        )

    # -- evaluation: test BOTH student and teacher (sfat.py:647-675) ----------
    def test(self, dataset_names=None) -> Dict:
        # d2's PreciseBN hook recomputes the STUDENT's stats (the reference
        # registers it on self.model); the teacher keeps its own stats
        self._maybe_precise_bn()
        results = {}
        for tag, variables in (
            ("student", {"params": self.state.params["det"], "batch_stats": self.state.batch_stats}),
            ("teacher", self.state.teacher_variables()),
        ):
            from ...data.datasets import get_dataset
            from ...data.loader import build_test_loader
            from ...evaluation.build import build_evaluators
            from ..eval_loop import inference_on_dataset

            for name in dataset_names or self.cfg.DATASETS.TEST:
                ds = get_dataset(name)
                loader = build_test_loader(self.cfg, name, synthetic=self.synthetic)
                res = inference_on_dataset(
                    self.detector,
                    variables,
                    loader,
                    ds["thing_classes"],
                    build_evaluators(self.cfg, name, ds["thing_classes"]),
                    pipeline_depth=self.cfg.TPU.EVAL_PIPELINE_DEPTH,
                spatial=self.cfg.TPU.SPATIAL_SHARD,
                    mesh=self.mesh,
                )
                results[f"{name}/{tag}"] = res
                # None-safe: VOC-family evaluator sets carry VOC_AP50/F1,
                # not AP/AP50 — formatting None crashed periodic eval AFTER
                # the full inference pass
                ap_line = {
                    k: res.get(k) for k in ("AP", "AP50", "VOC_AP50", "F1")
                    if res.get(k) is not None
                }
                print(f"[eval:{tag}] {name}: {ap_line}", flush=True)
        # same persisted summary as BaseTrainer.test (the workflow driver
        # and offline tooling read eval_results.json from every stage)
        import json
        import os

        from .base import _jsonable

        with open(os.path.join(self.output_dir, "eval_results.json"), "w") as f:
            json.dump(_jsonable(results), f, indent=2)
        return results


@register_trainer("source_free_adaptive_teacher")
class SFATMain(SourceFreeAdaptiveTeacherTrainer):
    pseudo_from_student = False
    ema_enabled = False  # fixed teacher (reference :581 commented out)


@register_trainer("source_free_adaptive_teacher_single")
class SFATSingle(SourceFreeAdaptiveTeacherTrainer):
    pseudo_from_student = True
    ema_enabled = True


@register_trainer("source_free_adaptive_teacher_mosaic")
class SFATMosaic(SourceFreeAdaptiveTeacherTrainer):
    pseudo_from_student = False
    ema_enabled = True
