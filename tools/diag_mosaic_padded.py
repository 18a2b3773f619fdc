"""Diagnose the padded-arm AP50~0 anomaly from quantify_mosaic_padding.

Retrains the padded arm (content 96x192 on a 128x256 canvas, fill 0.75) once
and probes the trained model three ways to separate hypotheses:

  1. raw detections on a padded-canvas eval image (top scores + boxes):
     distinguishes "no confident detections" from "confident but misplaced".
  2. AP with eval content placed on a 96x192 canvas (content-fit) using the
     SAME trained variables: if AP recovers, the harm is eval-time
     train/test distribution shift (model never saw content-fit layouts),
     not failed learning.
  3. AP on the training images (padded canvas): did it learn anything at all.
  4. longer schedule (--steps) to see whether padded-arm AP climbs late
     (slow learning vs. broken).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import quantify_mosaic_padding as q  # noqa: E402


def _eval_on(variables, infer, recs, canvas, label):
    import jax
    import jax.numpy as jnp

    from simple_sfod_tpu.evaluation.coco_eval import COCOEvaluator

    ch, cw = q.CONTENT_HW
    ev = COCOEvaluator([f"c{i}" for i in range(q.STEP_CLASSES)])
    for i, rec in enumerate(recs):
        img = np.zeros((*canvas, 3), np.float32)
        img[:ch, :cw] = rec["image"]
        d = jax.device_get(
            infer(variables, jnp.asarray(img[None]), jnp.asarray([[ch, cw]], jnp.int32))
        )
        keep = np.asarray(d.valid[0])
        ev.process_image(
            i,
            np.asarray(d.boxes[0])[keep],
            np.asarray(d.scores[0])[keep],
            np.asarray(d.classes[0])[keep],
            np.asarray(rec["boxes"], np.float32),
            np.asarray(rec["classes"], np.int64),
        )
    ap = float(ev.evaluate()["AP50"])
    print(json.dumps({"probe": label, "canvas": list(canvas), "ap50": round(ap, 2)}), flush=True)
    return ap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--content-aware",
        action="store_true",
        help="train the shipped content-aware composite instead of the "
        "legacy content-blind one this tool exists to diagnose",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()
    import jax.numpy as jnp

    from simple_sfod_tpu.engine.trainers import build_trainer

    train_recs = q._learnable_records(q.TRAIN_N, seed=100)
    eval_recs = q._learnable_records(q.EVAL_N, seed=200)
    q._register("mq_train", train_recs)

    cfg = q._mosaic_cfg((q.H, q.W), "mq_train", args.seed)
    # the documented AP50~0 anomaly is the LEGACY content-blind composite;
    # since round 4 the trainer defaults to content-aware, so reproducing it
    # requires dropping the sizes arg (step_fn binds mosaic_batch at trace
    # time, so the patch must span the training loop)
    import simple_sfod_tpu.engine.trainers.wq as wq_mod

    orig_mb = wq_mod.mosaic_batch
    if not args.content_aware:
        wq_mod.mosaic_batch = lambda rng, im, g, sizes=None: orig_mb(rng, im, g)
    try:
        tr = build_trainer(cfg, synthetic=True)
        loader = iter(tr.build_train_loader())
        losses = []
        for s in range(args.steps):
            m = tr.run_step(dict(next(loader)))
            losses.append(float(np.asarray(m["total_loss"])))
            if (s + 1) % 50 == 0:
                print(f"# step {s+1} loss {np.mean(losses[-20:]):.3f}", flush=True)
    finally:
        wq_mod.mosaic_batch = orig_mb

    variables = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    infer = jax.jit(tr.detector.infer)
    infer_raw = jax.jit(lambda v, im, sz: tr.detector.infer(v, im, sz))

    # probe 1: raw top detections on padded eval image 0
    ch, cw = q.CONTENT_HW
    img = np.zeros((q.H, q.W, 3), np.float32)
    img[:ch, :cw] = eval_recs[0]["image"]
    d = jax.device_get(
        infer(variables, jnp.asarray(img[None]), jnp.asarray([[ch, cw]], jnp.int32))
    )
    order = np.argsort(-np.asarray(d.scores[0]))[:8]
    for r in order:
        print(
            json.dumps(
                {
                    "probe": "raw_det",
                    "score": round(float(d.scores[0][r]), 3),
                    "cls": int(d.classes[0][r]),
                    "valid": bool(d.valid[0][r]),
                    "box": [round(float(x), 1) for x in np.asarray(d.boxes[0][r])],
                }
            ),
            flush=True,
        )
    print(json.dumps({"probe": "gt", "boxes": eval_recs[0]["boxes"], "classes": eval_recs[0]["classes"]}), flush=True)

    # probe 2-4
    _eval_on(variables, infer, eval_recs, (q.H, q.W), "eval_padded_canvas")
    _eval_on(variables, infer_raw, eval_recs, q.CONTENT_HW, "eval_content_fit_canvas")
    _eval_on(variables, infer, train_recs[: q.EVAL_N], (q.H, q.W), "train_imgs_padded_canvas")


if __name__ == "__main__":
    main()
