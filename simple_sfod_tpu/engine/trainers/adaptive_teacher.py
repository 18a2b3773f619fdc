"""Adaptive-Teacher trainer (source-AVAILABLE baseline).

Re-design of /root/reference/daod/engine/trainers/adaptive_teacher.py:
burn-in on labeled source for BURN_UP_STEP iters (:202-213), then copy
student -> teacher at the START of the boundary step (:215-217) and
alternate joint training: supervised source losses over BOTH source views
(strong label_data_q + weak label_data_k concatenated, :203,:290) +
pseudo-labeled target losses (pseudo rpn_loc/box_reg weighted 0, :318-321)
+ image-level domain-discriminator losses with gradient reversal on the
weak source view (:305-314), EMA teacher every TEACHER_UPDATE_ITER on the
(iter - burn_up) phase (:218-223).

The burn-in/joint phase switch is data-independent (a step comparison), so
both phases live in ONE jitted step via lax.cond-style masking of the loss
terms — no recompilation at the phase boundary."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...data import transforms as T
from ...data.loader import build_train_loader, gt_instances
from ...models.dann import gradient_scalar
from ...models.detector import DetectionBatch
from ...models.faster_rcnn import dc_image_feature
from ...ops.losses import sigmoid_ce
from ...structures.instances import Instances
from ...solver.build import apply_gradients, stop_frozen_gradients
from ..train_state import TeacherStudentState, ema_update
from . import register_trainer
from .base import BaseTrainer, _flip_enabled, apply_weak_aug
from .source_free_adaptive_teacher import SourceFreeAdaptiveTeacherTrainer


@register_trainer("adaptive_teacher")
class AdaptiveTeacherTrainer(SourceFreeAdaptiveTeacherTrainer):
    pseudo_from_student = False
    ema_enabled = True
    # source-available: labeled source AND unlabeled target batches shard
    _SHARD_BATCH_KEYS = ("IMS_PER_BATCH", "IMS_PER_BATCH_TARGET")

    def __init__(self, cfg, synthetic: bool = False):
        super().__init__(cfg, synthetic=synthetic)
        self.target_loader = None

    def stage_chunk(self, batches):
        """Paired (source, target) chunk stacker: keep the per-step args as
        host numpy (no per-step device round-trip — _step_args' jnp.asarray
        would upload K times only for _stack_steps to pull each leaf back),
        stack once, one transfer per leaf. Target batches are pulled here in
        step order (the feeder is the stream's single consumer)."""
        if self.target_loader is None:
            self.target_loader = iter(self._build_target_loader())
        per = []
        for b in batches:
            t = next(self.target_loader)
            per.append(
                (b["images"], b["sizes"], gt_instances(b, host=True), t["images"], t["sizes"])
            )
        return self._shard(self._stack_steps(per), axis=1)

    # BaseTrainer's dispatch body, NOT the SFAT parent's: AT intentionally
    # skips SFAT's pseudo-label visualization (its pseudo stream is the
    # separately-pulled target loader, not `batches`)
    run_step_chunk = BaseTrainer.run_step_chunk

    def build_train_loader(self):
        # labeled source loader; the unlabeled target loader is built lazily
        return build_train_loader(
            self.cfg,
            dataset_names=self.cfg.DATASETS.TRAIN,
            batch_size=self.cfg.SOLVER.IMS_PER_BATCH,
            synthetic=self.synthetic,
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
        cfg = self.cfg
        optimizer = self.optimizer
        flip = _flip_enabled(self.cfg)
        freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_AT)
        bbox_threshold = float(cfg.SEMISUPNET.BBOX_THRESHOLD)
        unsup_w = float(cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT)
        sup_w = float(cfg.SEMISUPNET.SUP_LOSS_WEIGHT)
        dis_w = float(cfg.SEMISUPNET.DIS_LOSS_WEIGHT)
        burn_up = int(cfg.SEMISUPNET.BURN_UP_STEP)
        keep_rate = float(cfg.SEMISUPNET.EMA_KEEP_RATE)
        update_iter = max(int(cfg.SEMISUPNET.TEACHER_UPDATE_ITER), 1)
        pseudo_capacity = self.det_cfg.detections_per_image
        det_cfg = self.det_cfg
        dc_enabled = self.dc_enabled
        dc_img = getattr(self, "dc_img", None)
        ins_dc_enabled = self.ins_dc_enabled
        dc_ins = getattr(self, "dc_ins", None)

        def step_fn(
            state: TeacherStudentState,
            src_images,
            src_sizes,
            src_gt: Instances,
            tgt_images,
            tgt_sizes,
            rng,
        ):
            src_images = src_images.astype(jnp.float32)
            tgt_images = tgt_images.astype(jnp.float32)
            rng = jax.random.fold_in(rng, state.step)
            k_flip_s, k_flip_t, k_strong, k_sup, k_unsup, k_dc, k_strong_s = (
                jax.random.split(rng, 7)
            )
            in_burn_up = state.step < burn_up

            src_images, src_gt = apply_weak_aug(k_flip_s, src_images, src_sizes, src_gt, flip)
            # the reference trains supervised on BOTH source views — strong
            # (label_data_q) + weak (label_data_k), concatenated to a 2x
            # batch in burn-in AND joint phase (adaptive_teacher.py:203,290);
            # strong aug is photometric-only so the GT duplicates unchanged.
            # Order q-then-k, so the weak half (the DC branch's input,
            # reference step 6) is sup_*[B:].
            b_src = src_images.shape[0]
            src_strong = jax.vmap(T.strong_augment)(
                jax.random.split(k_strong_s, b_src), src_images, src_sizes
            )
            sup_images = jnp.concatenate([src_strong, src_images], axis=0)
            sup_sizes = jnp.concatenate([src_sizes, src_sizes], axis=0)
            sup_gt = jax.tree.map(
                lambda x: jnp.concatenate([x, x], axis=0), src_gt
            )
            dummy = Instances.empty(1)
            dummy = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (tgt_images.shape[0],) + x.shape), dummy
            )
            tgt_weak, _ = apply_weak_aug(k_flip_t, tgt_images, tgt_sizes, dummy, flip)
            rngs = jax.random.split(k_strong, tgt_images.shape[0])
            tgt_strong = jax.vmap(T.strong_augment)(rngs, tgt_weak, tgt_sizes)

            # teacher: the reference hard-copies student->teacher at the
            # START of iter == BURN_UP_STEP, BEFORE the pseudo forward
            # (adaptive_teacher.py:215-217) — the first joint step's
            # pseudo-labels must come from the burn-in-trained student, not
            # the step-0 teacher.
            at_boundary = state.step == burn_up
            teacher_params_now = jax.tree.map(
                lambda t, s: jnp.where(at_boundary, s.astype(t.dtype), t),
                state.teacher_params,
                state.params["det"],
            )
            teacher_stats_now = jax.tree.map(
                lambda t, s: jnp.where(at_boundary, s.astype(t.dtype), t),
                state.teacher_stats,
                state.batch_stats,
            )
            # teacher pseudo-labels on weak target. Like SFAT, the reference
            # teacher is never .eval()'d (adaptive_teacher.py:237-242): the
            # pseudo forward runs TRAIN-mode BN and nudges the teacher's
            # running stats (torch train-mode side effect, momentum 0.1);
            # during burn-in the nudges are irrelevant — the boundary hard
            # copy replaces the whole teacher tree.
            tvars = {"params": teacher_params_now, "batch_stats": teacher_stats_now}
            feat_teach, mut_t = det._features(tvars, tgt_weak, True, mutable=True)
            teacher_stats_fwd = mut_t.get("batch_stats", {})
            dets = det.infer_from_feature(
                tvars, feat_teach, tgt_sizes, tuple(tgt_images.shape[1:3]),
                topk=pseudo_capacity,
            )
            dets = jax.tree.map(jax.lax.stop_gradient, dets)
            pseudo_gt = Instances(
                boxes=dets.boxes,
                scores=dets.scores,
                classes=dets.classes,
                valid=dets.valid & (dets.scores > bbox_threshold),
            )

            def loss_fn(params):
                params = stop_frozen_gradients(params, freeze_at)
                variables = {"params": params["det"], "batch_stats": state.batch_stats}
                # ONE backbone pass per view; the DC heads reuse these
                # features instead of running their own passes (same
                # restructure as the SFAT step, BENCH_NOTES round-2 leads)
                feat_sup, mutated = det._features(variables, sup_images, True, mutable=True)
                new_stats = mutated.get("batch_stats", {})
                sup_total, sup_metrics = det.losses_from_feature(
                    variables, feat_sup, DetectionBatch(sup_images, sup_sizes, sup_gt), k_sup
                )
                # the DC branch consumes the WEAK source view only
                # (reference step 6, label_data_k) — the k half of the
                # q-then-k concat
                feat_src = jax.tree.map(lambda f: f[b_src:], feat_sup)
                feat_tgt_s, _ = det._features(variables, tgt_strong, True, mutable=True)
                # pseudo bbox regression <- 0 (reference adaptive_teacher.py
                # :318-321 — ACTIVE here, unlike SFAT where the *0 is
                # commented out): localization must not train on noisy
                # teacher boxes; the losses stay logged
                unsup_total, unsup_metrics = det.losses_from_feature(
                    variables,
                    feat_tgt_s,
                    DetectionBatch(tgt_strong, tgt_sizes, pseudo_gt),
                    k_unsup,
                    loss_weights={"loss_rpn_loc": 0.0, "loss_box_reg": 0.0},
                )
                metrics = dict(sup_metrics)
                metrics.update({f"{k}_pseudo": v for k, v in unsup_metrics.items()})
                unsup_gate = jnp.where(in_burn_up, 0.0, 1.0)
                total = sup_w * sup_total + unsup_gate * unsup_w * unsup_total
                if dc_enabled or ins_dc_enabled:
                    feat_tw, _ = det._features(variables, tgt_weak, True, mutable=True)
                if dc_enabled:
                    df_s = dc_image_feature(det_cfg, feat_src)
                    df_t = dc_image_feature(det_cfg, feat_tw)
                    out_s = dc_img.apply({"params": params["dc"]}, gradient_scalar(df_s, -1.0))
                    out_t = dc_img.apply({"params": params["dc"]}, gradient_scalar(df_t, -1.0))
                    loss_s = jnp.mean(sigmoid_ce(out_s, jnp.zeros_like(out_s)))
                    loss_t = jnp.mean(sigmoid_ce(out_t, jnp.ones_like(out_t)))
                    metrics["loss_DC_img_s"] = loss_s
                    metrics["loss_DC_img_t"] = loss_t
                    # the reference's burn-in branch is supervised-ONLY
                    # (adaptive_teacher.py:201-213); discriminators join in
                    # the joint phase, so they share the unsup gate
                    total = total + unsup_gate * dis_w * (loss_s + loss_t)
                if ins_dc_enabled:
                    # instance-level discriminator (reference AT meta_arch
                    # :157-203); the AT trainer's loss weighting leaves
                    # loss_DC_ins_* in the x1 else-branch (adaptive_teacher.py
                    # :316-327), unlike SFAT's DIS_LOSS_WEIGHT
                    canvas_src = tuple(src_images.shape[1:3])
                    canvas_tgt = tuple(tgt_images.shape[1:3])
                    k_ds, k_dt = jax.random.split(k_dc)
                    bf_s, v_s = det.box_features_from_feature(
                        variables, feat_src, src_sizes, canvas_src
                    )
                    bf_t, v_t = det.box_features_from_feature(
                        variables, feat_tw, tgt_sizes, canvas_tgt
                    )
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
                    total = total + unsup_gate * (loss_ins_s + loss_ins_t)
                return total, (metrics, new_stats)

            (total, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            new_params, new_opt = apply_gradients(
                optimizer, grads, state.opt_state, state.params
            )

            # teacher: the boundary hard copy already happened at the START
            # of this step; EMA fires on the reference's phase,
            # (iter - burn_up) % TEACHER_UPDATE_ITER == 0 for iter > burn_up
            # (adaptive_teacher.py:218-222)
            do_ema = (state.step > burn_up) & (
                ((state.step - burn_up) % update_iter) == 0
            )
            rate = jnp.where(do_ema, keep_rate, 1.0)
            new_teacher_params = ema_update(teacher_params_now, new_params["det"], rate)
            new_teacher_stats = ema_update(teacher_stats_fwd, new_stats, rate)

            metrics["total_loss"] = total
            metrics["num_pseudo"] = jnp.sum(pseudo_gt.valid.astype(jnp.int32))
            return (
                TeacherStudentState(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                    teacher_params=new_teacher_params,
                    teacher_stats=new_teacher_stats,
                    thresh=state.thresh,
                ),
                metrics,
            )

        self._step_fn_raw = step_fn
        return jax.jit(step_fn, donate_argnums=(0,))

    def _step_args(self, batch):
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
        return self._shard(args)

    def run_step(self, batch) -> Dict[str, float]:
        args = self._step_args(batch)
        self.state, metrics = self._train_step(self.state, *args, self.base_rng)
        return metrics

    def run_steps(self, batch, n: int) -> Dict[str, float]:
        """n steps on one (source, target) pair inside ONE dispatched
        executable — the AT-signature counterpart of the SFAT run_steps
        (same rationale: one tunnel RTT per dispatch; BENCH_NOTES round 2)."""
        if getattr(self, "_multi_step_n", None) != n:
            step_fn = self._step_fn_raw

            def multi(state, src_images, src_sizes, src_gt, tgt_images, tgt_sizes, rng):
                def body(st, _):
                    return step_fn(
                        st, src_images, src_sizes, src_gt, tgt_images, tgt_sizes, rng
                    )

                state, metrics = jax.lax.scan(body, state, None, length=n)
                return state, jax.tree.map(lambda m: m[-1], metrics)

            self._multi_step = jax.jit(multi, donate_argnums=(0,))
            self._multi_step_n = n
        args = self._step_args(batch)
        self.state, metrics = self._multi_step(self.state, *args, self.base_rng)
        return metrics
