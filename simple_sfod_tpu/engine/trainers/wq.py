"""Fixed pseudo-label self-training trainers (the reference's BaseWQTrainer
family, daod/engine/trainers/base_wq.py + base_mosaic / base_mixup /
base_mosaic_wq / base_mosaic_wq_new — four near-identical forks that differ
only in the dataset wrapper; here they are one trainer with an `aug` flag).

Workflow (SURVEY §3.5): an AdaBN model's detections are spliced into the
target train JSON (tools/prediction_to_gt.py), re-registered as GT, and this
trainer runs supervised training with strong augmentation — WQ (strong
photometric), mosaic, or mixup — all applied on device inside the jitted
step."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data import transforms as T
from ...data.mosaic import mixup_batch, mosaic_batch, random_affine_batch
from ...models.detector import DetectionBatch
from ...structures.instances import Instances
from ...solver.build import apply_gradients, stop_frozen_gradients
from ..train_state import TrainState
from . import register_trainer
from .base import BaseTrainer, _flip_enabled, apply_weak_aug


class WQTrainer(BaseTrainer):
    aug: str = "wq"  # "wq" | "mosaic" | "mixup" | "mosaic_wq"

    def _build_train_step(self):
        det = self.detector
        optimizer = self.optimizer
        flip = _flip_enabled(self.cfg)
        freeze_at = int(self.cfg.MODEL.BACKBONE.FREEZE_AT)
        aug = self.aug
        mcfg = self.cfg.INPUT.MOSAIC
        affine = bool(mcfg.RANDOM_AFFINE)
        affine_kw = dict(
            degrees=float(mcfg.DEGREES),
            translate=float(mcfg.TRANSLATE),
            scales=tuple(mcfg.SCALE),
            shear=float(mcfg.SHEAR),
        )
        mixup_flip = bool(self.cfg.INPUT.MIXUP.FLIP)
        mixup_jitter = tuple(self.cfg.INPUT.MIXUP.SCALE_JITTER) or None

        def step_fn(state: TrainState, images, sizes, gt: Instances, rng):
            images = images.astype(jnp.float32)
            rng = jax.random.fold_in(rng, state.step)
            rng_flip, rng_mix, rng_strong, rng_loss = jax.random.split(rng, 4)
            images, gt = apply_weak_aug(rng_flip, images, sizes, gt, flip)
            if aug in ("mosaic", "mosaic_wq"):
                # content-aware composite: each source's CONTENT corner pins
                # to the mosaic center (sizes carries the unpadded dims), so
                # canvas padding never enters the tiles — see data/mosaic.py
                images, gt = mosaic_batch(rng_mix, images, gt, sizes=sizes)
                if affine:
                    images, gt = random_affine_batch(
                        jax.random.fold_in(rng_mix, 1), images, gt, **affine_kw
                    )
                sizes = jnp.broadcast_to(
                    jnp.asarray(images.shape[1:3], jnp.int32), sizes.shape
                )
            elif aug == "mixup":
                # content-aware: companion padding reads gray, blend covers
                # only the origin frame, companion GT clips to it — matches
                # the reference's gray-canvas + crop geometry (mixup.py:188-245)
                images, gt = mixup_batch(
                    rng_mix,
                    images,
                    gt,
                    flip=mixup_flip,
                    scale_jitter=mixup_jitter,
                    sizes=sizes,
                )
            if aug in ("wq", "mosaic_wq"):
                rngs = jax.random.split(rng_strong, images.shape[0])
                images = jax.vmap(T.strong_augment)(rngs, images, sizes)
            batch = DetectionBatch(images=images, sizes=sizes, gt=gt)

            def loss_fn(params):
                params = stop_frozen_gradients(params, freeze_at)
                variables = {"params": params, "batch_stats": state.batch_stats}
                total, metrics, new_stats = det.supervised_losses(
                    variables, batch, rng_loss
                )
                return total, (metrics, new_stats)

            (total, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
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


@register_trainer("base_wq")
class BaseWQTrainer(WQTrainer):
    aug = "wq"


@register_trainer("base_mosaic")
class BaseMosaicTrainer(WQTrainer):
    aug = "mosaic"


@register_trainer("base_mixup")
class BaseMixupTrainer(WQTrainer):
    aug = "mixup"


@register_trainer("base_mosaic_wq")
class BaseMosaicWQTrainer(WQTrainer):
    # strong aug on the assembled canvas (reference mosaic_wq.py:218-219)
    aug = "mosaic_wq"


@register_trainer("base_mosaic_wq_new")
class BaseMosaicWQNewTrainer(WQTrainer):
    # reference fork applies strong aug per tile (mosaic_wq_new.py:152-153);
    # photometric ops commute with the composite up to erasing placement, so
    # the canvas-level pipeline is reused
    aug = "mosaic_wq"
