"""Lockstep JAX-vs-torch supervised training differential (VERDICT r2 next
#2): run the SAME tiny Faster R-CNN, from the SAME init, on the SAME batches,
with the SAME hyperparameters, N steps in each framework, and measure the
joint drift of optax SGD + functional flax BN against torch SGD + BatchNorm2d
(the reference's stack). See tests/torch_mirror.py for the torch side and the
determinism (take-all sampling) contract.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simple_sfod_tpu.models.detector import DetectionBatch, Detector
from simple_sfod_tpu.models.faster_rcnn import DetectorConfig, anchors_for
from simple_sfod_tpu.structures.instances import Instances

from torch_mirror import TorchLockstepTrainer, TorchTinyFasterRCNN

CANVAS = (64, 128)
GT_CAP = 8
LR = 0.02
MOMENTUM = 0.9
WEIGHT_DECAY = 1e-4
EMA_ALPHA = 0.99


def lockstep_config() -> DetectorConfig:
    """Tiny-backbone config under the take-all sampling contract:
    rpn batch >= #anchors (16*32 locations * 15 anchors = 7680) and roi
    batch >= post-NMS proposals + GT, positive fraction 1.0 — detectron2's
    subsampling becomes the identity, so both frameworks see identical
    training decisions and the measured drift is pure numerics/semantics."""
    return DetectorConfig(
        num_classes=4,
        backbone="tiny",
        in_feature="tiny1",
        rpn_pre_nms_topk_train=7680,
        rpn_post_nms_topk_train=32,
        rpn_pre_nms_topk_test=7680,
        rpn_post_nms_topk_test=32,
        rpn_batch_size_per_image=8192,
        roi_batch_size_per_image=64,
        roi_positive_fraction=1.0,
        fc_dim=64,
        num_fc=2,
    )


def make_batches(n_steps: int, batch: int, seed: int):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        images = rs.uniform(0, 255, (batch, *CANVAS, 3)).astype(np.float32)
        boxes, classes = [], []
        for _ in range(batch):
            k = 3
            x1 = rs.uniform(0, CANVAS[1] - 24, k)
            y1 = rs.uniform(0, CANVAS[0] - 24, k)
            w = rs.uniform(12, 48, k)
            h = rs.uniform(12, 32, k)
            b = np.stack(
                [x1, y1, np.minimum(x1 + w, CANVAS[1]), np.minimum(y1 + h, CANVAS[0])],
                axis=1,
            ).astype(np.float32)
            boxes.append(b)
            classes.append(rs.randint(0, 4, k).astype(np.int64))
        out.append((images, boxes, classes))
    return out


def gt_to_instances(boxes: List[np.ndarray], classes: List[np.ndarray]) -> Instances:
    b = len(boxes)
    bx = np.zeros((b, GT_CAP, 4), np.float32)
    cl = np.zeros((b, GT_CAP), np.int32)
    vd = np.zeros((b, GT_CAP), bool)
    for i, (bb, cc) in enumerate(zip(boxes, classes)):
        k = len(bb)
        bx[i, :k] = bb
        cl[i, :k] = cc
        vd[i, :k] = True
    return Instances(
        boxes=jnp.asarray(bx),
        scores=jnp.asarray(vd, jnp.float32),
        classes=jnp.asarray(cl),
        valid=jnp.asarray(vd),
    )


def _flatten_params(params, stats) -> Dict[str, np.ndarray]:
    out = {}
    for tree, names in ((params, None), (stats, None)):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            out[key] = np.asarray(leaf)
    return out


def run_lockstep(n_steps: int = 50, batch: int = 2, seed: int = 0) -> Dict:
    """Returns per-step loss curves for both frameworks plus the parameter
    relative-drift curve (max over leaves of ||a-b|| / (||b|| + eps))."""
    cfg = lockstep_config()
    det = Detector(cfg)
    variables = det.init(jax.random.key(seed), CANVAS, batch=batch)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    torch_model = TorchTinyFasterRCNN(
        num_classes=cfg.num_classes,
        num_anchors=cfg.num_anchors,
        fc_dim=cfg.fc_dim,
        pooler=cfg.pooler_resolution,
    )
    torch_model.load_flax(jax.device_get(params), jax.device_get(stats))
    anchors = np.asarray(anchors_for(cfg, CANVAS))
    torch_tr = TorchLockstepTrainer(
        torch_model, cfg, anchors, lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY
    )

    tx = optax.chain(
        optax.add_decayed_weights(WEIGHT_DECAY), optax.sgd(LR, momentum=MOMENTUM)
    )
    opt_state = tx.init(params)

    @jax.jit
    def jax_step(params, stats, opt_state, images, sizes, gt):
        def loss_fn(p):
            total, metrics, new_stats = det.supervised_losses(
                {"params": p, "batch_stats": stats},
                DetectionBatch(images, sizes, gt),
                jax.random.key(0),  # sampling is take-all: rng is inert
            )
            return total, (metrics, new_stats)

        (total, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, metrics

    sizes = jnp.asarray([[CANVAS[0], CANVAS[1]]] * batch, jnp.int32)
    batches = make_batches(n_steps, batch, seed + 1)

    jax_losses, torch_losses, drift_curve = [], [], []
    ema_jax = ema_torch = None
    for step, (images, boxes, classes) in enumerate(batches):
        gt = gt_to_instances(boxes, classes)
        params, stats, opt_state, metrics = jax_step(
            params, stats, opt_state, jnp.asarray(images), sizes, gt
        )
        t_metrics = torch_tr.step(
            images.transpose(0, 3, 1, 2), boxes, classes, CANVAS
        )
        parts = ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg")
        jl = {k: float(metrics[k]) for k in parts}
        jl["total_loss"] = sum(jl.values())
        jax_losses.append(jl)
        torch_losses.append(t_metrics)

        a = _flatten_params(jax.device_get(params), jax.device_get(stats))
        b = torch_model.export_flax_like()
        rel = {}
        for k in b:
            ka = k
            if ka not in a:  # flax bn stats live under mean/var keys already
                continue
            num = np.linalg.norm(a[ka] - b[k])
            # denominator floor: leaves that BOTH stacks hold at ~0 (conv
            # biases feeding straight into BN get no effective gradient)
            # would otherwise divide noise by noise
            den = max(np.linalg.norm(b[k]), 1e-4)
            rel[k] = float(num / den)
        drift_curve.append(max(rel.values()))
        # EMA tracks (same update rule both sides)
        if ema_jax is None:
            ema_jax = {k: v.copy() for k, v in a.items() if k in b}
            ema_torch = {k: v.copy() for k, v in b.items()}
        else:
            for k in ema_torch:
                ema_jax[k] = EMA_ALPHA * ema_jax[k] + (1 - EMA_ALPHA) * a[k]
                ema_torch[k] = EMA_ALPHA * ema_torch[k] + (1 - EMA_ALPHA) * b[k]

    ema_drift = max(
        float(np.linalg.norm(ema_jax[k] - ema_torch[k]) / max(np.linalg.norm(ema_torch[k]), 1e-4))
        for k in ema_torch
    )
    loss_rel = [
        abs(j["total_loss"] - t["total_loss"]) / max(abs(t["total_loss"]), 1e-9)
        for j, t in zip(jax_losses, torch_losses)
    ]
    return {
        "jax_losses": jax_losses,
        "torch_losses": torch_losses,
        "param_drift": drift_curve,
        "ema_drift": ema_drift,
        "loss_rel": loss_rel,
        "worst_leaves": rel,
    }
