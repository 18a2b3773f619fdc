"""AdaBN torch-lockstep differential (slow; VERDICT r3 #1).

The AdaBN workload (`train_net_mt.py --eval-only` -> adabn_refinement;
reference base.py:318-337 reset_bn_stats + test_refinement :270-315) is:
zero the BN running means / unit the running vars, run up to 1400 train-mode
no-grad forwards over the target loader, then evaluate with the recomputed
statistics. This differential drives the repo's functional chain
(reset_bn_tree + Detector.bn_update, engine/trainers/base.py:508-572)
against torch BatchNorm2d under `model.train()` + `no_grad` from the SAME
transplanted weights on the SAME batch stream, and establishes:

* the recomputed running MEANS agree leaf-by-leaf to float noise — the
  batch-mean accumulation semantics are identical;
* the running VARS differ by EXACTLY the biased/unbiased factor — flax
  folds the biased batch variance into the running stat, torch the unbiased
  n/(n-1) one (the known semantic delta named in PARITY_EVIDENCE). After
  the closed-form correction

      v_torch = d^K + (v_flax - d^K) * n / (n - 1)

  (d = decay 0.9, K = number of accumulated batches, n = B*H*W elements
  reduced at that BN's input, starting from the reset value 1) the residual
  is float noise, i.e. there is NOTHING ELSE in the delta. Its steady-state
  relative size is 1/(n-1): <= 2.5e-4 at this tiny scale, and <= ~1.2e-4
  for the real VGG16-BN at 600x1200 eval resolution (the smallest-n BN is
  stage 5 at stride 16: n = 1*38*75 = 2850);
* post-AdaBN DETECTIONS on a held-out fixture batch agree (same boxes /
  classes / count, scores to float noise), and the COCO AP computed from
  the two detection sets against the same synthetic GT is identical — the
  measured AP impact of the biased/unbiased delta is 0 at this scale.

Measured on this box (2026-08, recorded in PARITY_EVIDENCE.md): mean rel
err ~3e-7; raw var rel delta 2.2e-4 (= 1/(n1-1) as predicted); corrected
var residual ~1e-7; detections identical, |dAP| = 0. Bounds below give
~10-30x headroom over the measured values.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SFOD_SLOW_TESTS"), reason="set SFOD_SLOW_TESTS=1 (slow)"
)

K = 20  # accumulated batches (1400 in the reference; the algebra is per-K)
BATCH = 2
DECAY = 0.9  # flax BatchNorm momentum == 1 - torch BatchNorm2d momentum 0.1


def _rel(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-3)))


def test_lockstep_adabn():
    import jax
    import jax.numpy as jnp
    import torch

    from simple_sfod_tpu.engine.trainers.base import reset_bn_tree
    from simple_sfod_tpu.models.detector import Detector
    from simple_sfod_tpu.models.faster_rcnn import anchors_for

    from lockstep_runner import CANVAS, lockstep_config, make_batches
    from torch_mirror import TorchSFATSingleMirror, TorchTinyFasterRCNN

    cfg = lockstep_config()
    det = Detector(cfg)
    variables = det.init(jax.random.key(0), CANVAS, batch=BATCH)
    params = variables["params"]

    tm = TorchTinyFasterRCNN(
        num_classes=cfg.num_classes,
        num_anchors=cfg.num_anchors,
        fc_dim=cfg.fc_dim,
        pooler=cfg.pooler_resolution,
    )
    tm.load_flax(jax.device_get(params), jax.device_get(variables["batch_stats"]))
    mirror = TorchSFATSingleMirror(
        tm, cfg, np.asarray(anchors_for(cfg, CANVAS)),
        lr=0.0, momentum=0.0, weight_decay=0.0,
    )

    # -- reset (reference reset_bn_stats, base.py:318-328) -------------------
    stats = reset_bn_tree(variables["batch_stats"])
    with torch.no_grad():
        for m in (tm.bn0, tm.bn1):
            m.running_mean.zero_()
            m.running_var.fill_(1.0)

    # -- K train-mode no-grad forwards on identical batches ------------------
    bn_step = jax.jit(det.bn_update)
    batches = make_batches(K, BATCH, seed=11)
    tm.train()
    for images, _, _ in batches:
        stats = bn_step({"params": params, "batch_stats": stats}, jnp.asarray(images))
        with torch.no_grad():
            tm.features(mirror.normalize(images.transpose(0, 3, 1, 2)))
    stats = jax.device_get(stats)

    # BN input sizes: bn0 sees the full canvas, bn1 the once-pooled canvas
    n_per_bn = {
        0: BATCH * CANVAS[0] * CANVAS[1],
        1: BATCH * (CANVAS[0] // 2) * (CANVAS[1] // 2),
    }
    for i, m in ((0, tm.bn0), (1, tm.bn1)):
        jm = np.asarray(stats["backbone"][f"bn{i}"]["mean"], np.float64)
        jv = np.asarray(stats["backbone"][f"bn{i}"]["var"], np.float64)
        t_mean = m.running_mean.detach().numpy().astype(np.float64)
        t_var = m.running_var.detach().numpy().astype(np.float64)

        # means: identical accumulation semantics, float noise only
        assert _rel(jm, t_mean) < 1e-4, (i, _rel(jm, t_mean))

        # vars: the raw delta is bounded by the unbiased factor...
        n = n_per_bn[i]
        raw = _rel(jv, t_var)
        assert raw < 1.5 / (n - 1), (i, raw, 1.0 / (n - 1))
        # ...and the closed-form n/(n-1) correction explains ALL of it
        pred = DECAY**K + (jv - DECAY**K) * n / (n - 1)
        corrected = _rel(pred, t_var)
        assert corrected < 1e-4, (i, corrected, raw)
        # the correction must actually have bought precision (raw delta is
        # real, not noise-level to begin with)
        assert corrected < raw / 10, (i, corrected, raw)

    # -- post-AdaBN detections on a held-out fixture batch -------------------
    fix_images, fix_boxes, fix_classes = make_batches(1, BATCH, seed=99)[0]
    sizes = jnp.asarray([[CANVAS[0], CANVAS[1]]] * BATCH, jnp.int32)
    jdet = jax.device_get(
        jax.jit(det.infer)(
            {"params": params, "batch_stats": jax.tree.map(jnp.asarray, stats)},
            jnp.asarray(fix_images),
            sizes,
        )
    )
    tm.eval()
    with torch.no_grad():
        feat = tm.features(mirror.normalize(fix_images.transpose(0, 3, 1, 2)))
        tdet = mirror.detect(feat, CANVAS)

    from simple_sfod_tpu.evaluation.coco_eval import COCOEvaluator

    evaluators = [COCOEvaluator([f"c{i}" for i in range(cfg.num_classes)])
                  for _ in range(2)]
    for b in range(BATCH):
        valid = np.asarray(jdet.valid[b])
        jb = np.asarray(jdet.boxes[b])[valid]
        js = np.asarray(jdet.scores[b])[valid]
        jc = np.asarray(jdet.classes[b])[valid]
        tb, ts, tc = (t.numpy() for t in tdet[b])
        # both stacks emit score-descending detections; same count, same
        # classes, boxes/scores to float noise (the var delta is ~2e-4
        # relative on the running stat — far below any NMS/threshold tie)
        assert len(jb) == len(tb), (b, len(jb), len(tb))
        order_j, order_t = np.argsort(-js, kind="stable"), np.argsort(-ts, kind="stable")
        np.testing.assert_array_equal(jc[order_j], tc[order_t])
        np.testing.assert_allclose(js[order_j], ts[order_t], rtol=0, atol=1e-3)
        np.testing.assert_allclose(jb[order_j], tb[order_t], rtol=0, atol=5e-2)
        for ev, (db, ds, dc) in zip(evaluators, ((jb, js, jc), (tb, ts, tc))):
            ev.process_image(b, db, ds, dc, fix_boxes[b], fix_classes[b])

    res_j, res_t = (ev.evaluate() for ev in evaluators)
    # AP impact of the biased/unbiased running-var delta at this scale: zero
    for k in ("AP", "AP50", "AP75"):
        if np.isfinite(res_t[k]):
            assert abs(res_j[k] - res_t[k]) < 1e-9, (k, res_j[k], res_t[k])
