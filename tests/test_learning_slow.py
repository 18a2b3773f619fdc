"""Slow opt-in learning validation (SFOD_SLOW_TESTS=1): overfit one image and
check the detector localises its GT. The full run was executed during round 1
(see BENCH_NOTES.md / commit cf7168b): after 400 SGD steps the two GT boxes
are recovered within ~2px at 0.99 confidence."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SFOD_SLOW_TESTS"), reason="set SFOD_SLOW_TESTS=1 (slow)"
)


def test_single_image_overfit():
    import jax
    import jax.numpy as jnp
    import optax

    from simple_sfod_tpu.models.detector import DetectionBatch, Detector
    from simple_sfod_tpu.models.faster_rcnn import DetectorConfig
    from simple_sfod_tpu.structures.boxes import pairwise_iou
    from simple_sfod_tpu.structures.instances import pad_instances

    cfg = DetectorConfig(
        num_classes=4,
        rpn_pre_nms_topk_train=256,
        rpn_post_nms_topk_train=128,
        rpn_pre_nms_topk_test=256,
        rpn_post_nms_topk_test=128,
        roi_batch_size_per_image=64,
        fc_dim=128,
    )
    det = Detector(cfg)
    v = det.init(jax.random.key(0), (128, 256))
    img = np.random.RandomState(0).uniform(0, 80, (128, 256, 3)).astype(np.float32)
    img[20:60, 30:110] = 180.0
    img[70:110, 150:230] = 240.0
    gt_np = np.array([[30, 20, 110, 60], [150, 70, 230, 110]], np.float32)
    gt = pad_instances(gt_np, np.array([0, 2]), 8)
    batch = DetectionBatch(
        jnp.asarray(img[None]), jnp.asarray([[128, 256]]), jax.tree.map(lambda x: x[None], gt)
    )
    opt = optax.sgd(0.02, momentum=0.9)
    params, stats, ost = v["params"], v["batch_stats"], None
    ost = opt.init(params)

    @jax.jit
    def step(params, stats, ost, rng):
        def loss_fn(p):
            total, m, ns = det.supervised_losses(
                {"params": p, "batch_stats": stats}, batch, rng
            )
            return total, (m, ns)

        (t, (m, ns)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, ost2 = opt.update(g, ost, params)
        return optax.apply_updates(params, u), ns, ost2, m

    for i in range(400):
        params, stats, ost, m = step(params, stats, ost, jax.random.fold_in(jax.random.key(1), i))

    dets = det.infer(
        {"params": params, "batch_stats": stats}, batch.images, batch.sizes, score_thresh=0.5
    )
    keep = np.asarray(dets.valid[0])
    boxes = np.asarray(dets.boxes[0])[keep]
    classes = np.asarray(dets.classes[0])[keep]
    assert len(boxes) >= 2
    iou = np.asarray(pairwise_iou(jnp.asarray(gt_np), jnp.asarray(boxes[:8])))
    best = iou.max(axis=1)
    assert (best > 0.8).all(), f"GT not recovered: best IoUs {best}"
    assert 0 in classes and 2 in classes
