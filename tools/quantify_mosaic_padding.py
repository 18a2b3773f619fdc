"""Quantify the mosaic padding-band deviation (VERDICT r3 #9).

data/mosaic.py composites tiles cropped from the PADDED static canvases, so
when images do not fill TPU.CANVAS the tile's center-facing corner includes
zero padding — regions the reference's live mosaic
(/root/reference/daod/data/mappers/mosaic.py:113-218: whole images re-upscaled
to original dims, pasted into fixed-center quadrants of a 2x canvas, then
0.5-resized — no per-image padding ever enters) would fill with pixels.

This tool puts numbers on that deviation as a function of the canvas fill
fraction f (content dims / canvas dims):

  A. Geometry (through the real jitted `mosaic_batch`):
     - pad_pixel_frac: fraction of mosaic output pixels that are padding
     - box_survival:   surviving GT fraction (valid out / valid in)
     - boxes_touching_pad: surviving boxes whose 4px-dilated neighbourhood
       overlaps a padding band (context corruption, not coordinate error)
     At f=1.0 the numbers isolate the intended YOLOX crop-clipping; the
     DELTA vs f=1.0 is the deviation.

  B. Learning (three arms): the real `base_mosaic` trainer trains on the
     SAME 96x192 synthetic images placed on
       - a 96x192 canvas (canvas-fit: no padding, reference-like),
       - a 128x256 canvas with the CONTENT-AWARE composite (the shipped
         default: content corners pin to the mosaic center, gray fill),
       - a 128x256 canvas with the legacy content-blind composite (round-3
         behavior: tiles crop from the padded canvases),
     all evaluated on held-out images through the same COCOEvaluator.
     Round-4 measurement: the content-blind padding bands collapse
     short-horizon learning (AP50 0.5 vs 27.6 fit at 250 steps); the
     content-aware composite closes that gap — which is why it is now the
     trainer default.

Usage: python tools/quantify_mosaic_padding.py [--steps 250] [--seeds 2]
       [--skip-learning] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 128, 256
B = 16
N_BOX = 4


# ---------------------------------------------------------------------------
# Part A: geometry through the real mosaic_batch
# ---------------------------------------------------------------------------


def _marker_batch(fill: float, seed: int):
    """Canvases whose content region (fill*H x fill*W, top-left anchored like
    the loader's pad) is the constant 200.0 and padding is 0, with GT boxes
    strictly inside the content."""
    rs = np.random.RandomState(seed)
    ch, cw = int(round(fill * H)), int(round(fill * W))
    imgs = np.zeros((B, H, W, 3), np.float32)
    imgs[:, :ch, :cw] = 200.0
    boxes = np.zeros((B, N_BOX, 4), np.float32)
    classes = np.zeros((B, N_BOX), np.int32)
    valid = np.ones((B, N_BOX), bool)
    for i in range(B):
        for j in range(N_BOX):
            bw = rs.uniform(cw / 8, cw / 3)
            bh = rs.uniform(ch / 8, ch / 3)
            x1 = rs.uniform(0, cw - bw)
            y1 = rs.uniform(0, ch - bh)
            boxes[i, j] = [x1, y1, x1 + bw, y1 + bh]
    return imgs, boxes, classes, valid, (ch, cw)


def geometry(fills, seeds=4, content_aware=False):
    import jax
    import jax.numpy as jnp

    from simple_sfod_tpu.data.mosaic import mosaic_batch
    from simple_sfod_tpu.structures.instances import Instances

    fn = jax.jit(mosaic_batch)
    rows = []
    for fill in fills:
        pad_frac, survival, touch = [], [], []
        for s in range(seeds):
            imgs, bx, cl, vd, (ch, cw) = _marker_batch(fill, seed=1000 + s)
            gt = Instances(
                boxes=jnp.asarray(bx),
                scores=jnp.ones((B, N_BOX), jnp.float32),
                classes=jnp.asarray(cl),
                valid=jnp.asarray(vd),
            )
            sizes = (
                jnp.broadcast_to(jnp.asarray([ch, cw], jnp.int32), (B, 2))
                if content_aware
                else None
            )
            out, ogt = fn(jax.random.key(s), jnp.asarray(imgs), gt, sizes)
            out = np.asarray(out)
            is_pad = out[..., 0] < 1.0  # content is 200, gray fill 114, padding 0
            pad_frac.append(is_pad.mean())
            ovalid = np.asarray(ogt.valid)
            oboxes = np.asarray(ogt.boxes)
            survival.append(ovalid.sum() / (B * 4 * N_BOX))
            # does any padding pixel sit within 4px of a surviving box?
            t = 0
            for i in range(B):
                for b, v in zip(oboxes[i], ovalid[i]):
                    if not v:
                        continue
                    x1, y1, x2, y2 = [int(round(c)) for c in b]
                    win = is_pad[i, max(0, y1 - 4) : y2 + 4, max(0, x1 - 4) : x2 + 4]
                    t += bool(win.any())
            touch.append(t / max(ovalid.sum(), 1))
        rows.append(
            {
                "mode": "content_aware" if content_aware else "content_blind",
                "fill": fill,
                "pad_pixel_frac": round(float(np.mean(pad_frac)), 4),
                "box_survival": round(float(np.mean(survival)), 4),
                "boxes_touching_pad": round(float(np.mean(touch)), 4),
            }
        )
    return rows


# ---------------------------------------------------------------------------
# Part B: learning with vs without canvas-fit
# ---------------------------------------------------------------------------

CONTENT_HW = (96, 192)
EVAL_N = 8
TRAIN_N = 16
BATCH = 4
STEP_CLASSES = 4


def _mosaic_cfg(canvas, name: str, seed: int, trainer: str = "base_mosaic"):
    import __graft_entry__ as g

    cfg = g._tiny_cfg(1, canvas=canvas, backbone="tiny")
    cfg.TRAINER = trainer
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = STEP_CLASSES
    cfg.SOLVER.IMS_PER_BATCH = BATCH
    cfg.SOLVER.IMS_PER_BATCH_TARGET = BATCH
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = ()
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.INPUT.MIN_SIZE_TRAIN = (CONTENT_HW[0],)
    cfg.INPUT.MAX_SIZE_TRAIN = CONTENT_HW[1]
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()
    cfg.SEED = seed
    cfg.OUTPUT_DIR = f"/tmp/mosaic_quant/{name}_s{seed}"
    cfg.freeze()
    return cfg


def _learnable_records(n, seed):
    """Synthetic records at CONTENT_HW whose class is encoded by intensity
    (like tools/endpoint_ab.py) — learnable by the tiny stem."""
    rs = np.random.RandomState(seed)
    ch, cw = CONTENT_HW
    recs = []
    for i in range(n):
        img = rs.uniform(0, 50, (ch, cw, 3)).astype(np.float32)
        k = rs.randint(2, 4)
        boxes, classes = [], []
        for _ in range(k):
            bw, bh = rs.uniform(30, 64), rs.uniform(20, 40)
            x1, y1 = rs.uniform(0, cw - bw), rs.uniform(0, ch - bh)
            c = int(rs.randint(0, STEP_CLASSES))
            img[int(y1) : int(y1 + bh), int(x1) : int(x1 + bw)] = 80.0 + 45.0 * c
            boxes.append([x1, y1, x1 + bw, y1 + bh])
            classes.append(c)
        recs.append(
            {
                "file_name": f"m_{i}.png",
                "height": ch,
                "width": cw,
                "image_id": i + 1,
                "boxes": boxes,
                "classes": classes,
                "image": img,
            }
        )
    return recs


def _register(name, recs):
    from simple_sfod_tpu.data.datasets import DATASET_REGISTRY, register_dataset

    cls = [f"c{i}" for i in range(STEP_CLASSES)]
    register_dataset(name, json_file="", image_root="", thing_classes=cls)
    DATASET_REGISTRY[name]["_cache"] = {
        "records": recs,
        "thing_classes": cls,
        "id_map": {i: i for i in range(STEP_CLASSES)},
    }


def _train_and_eval(
    canvas, name, seed, steps, train_recs, eval_recs, content_blind=False,
    trainer="base_mosaic",
):
    import jax
    import jax.numpy as jnp

    from simple_sfod_tpu.engine.trainers import build_trainer
    from simple_sfod_tpu.evaluation.coco_eval import COCOEvaluator

    cfg = _mosaic_cfg(canvas, name, seed, trainer=trainer)
    # step_fn resolves mosaic_batch/mixup_batch at TRACE time (first
    # run_step), so the legacy patch must stay active through the whole
    # training loop
    import simple_sfod_tpu.engine.trainers.wq as wq_mod

    orig_mb = wq_mod.mosaic_batch
    orig_mx = wq_mod.mixup_batch
    if content_blind:
        # legacy round-3 composites: drop the sizes arg so mosaic tiles crop
        # from the padded canvases / mixup blends the companion's zero
        # padding full-canvas (the deviations this tool quantifies)
        wq_mod.mosaic_batch = lambda rng, im, g, sizes=None: orig_mb(rng, im, g)
        wq_mod.mixup_batch = (
            lambda rng, im, g, sizes=None, **kw: orig_mx(rng, im, g, **kw)
        )
    try:
        tr = build_trainer(cfg, synthetic=True)
        loader = iter(tr.build_train_loader())
        losses = []
        for _ in range(steps):
            m = tr.run_step(dict(next(loader)))
            losses.append(float(np.asarray(m["total_loss"])))
    finally:
        wq_mod.mosaic_batch = orig_mb
        wq_mod.mixup_batch = orig_mx

    variables = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    infer = jax.jit(tr.detector.infer)
    ch, cw = CONTENT_HW
    ev = COCOEvaluator([f"c{i}" for i in range(STEP_CLASSES)])
    for i, rec in enumerate(eval_recs):
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
    return {
        "ap50": float(ev.evaluate()["AP50"]),
        "final_loss": float(np.mean(losses[-20:])),
    }


def learning(steps, seeds, trainer="base_mosaic"):
    train_recs = _learnable_records(TRAIN_N, seed=100)
    eval_recs = _learnable_records(EVAL_N, seed=200)
    _register("mq_train", train_recs)
    out = {"trainer": trainer, "fit": [], "content_aware": [], "content_blind": []}
    for seed in range(seeds):
        fit = _train_and_eval(
            CONTENT_HW, "mq_train", seed, steps, train_recs, eval_recs, trainer=trainer
        )
        aware = _train_and_eval(
            (H, W), "mq_train", seed, steps, train_recs, eval_recs, trainer=trainer
        )
        blind = _train_and_eval(
            (H, W), "mq_train", seed, steps, train_recs, eval_recs,
            content_blind=True, trainer=trainer,
        )
        print(
            f"[{trainer} seed {seed}] canvas-fit AP50={fit['ap50']:.2f} loss={fit['final_loss']:.3f} | "
            f"content-aware(fill=0.75) AP50={aware['ap50']:.2f} loss={aware['final_loss']:.3f} | "
            f"content-blind(fill=0.75) AP50={blind['ap50']:.2f} loss={blind['final_loss']:.3f}",
            flush=True,
        )
        out["fit"].append(fit)
        out["content_aware"].append(aware)
        out["content_blind"].append(blind)
    for arm in ("fit", "content_aware", "content_blind"):
        out[f"{arm}_mean_ap50"] = float(np.mean([r["ap50"] for r in out[arm]]))
    out["delta_blind_ap50"] = out["fit_mean_ap50"] - out["content_blind_mean_ap50"]
    out["delta_aware_ap50"] = out["fit_mean_ap50"] - out["content_aware_mean_ap50"]
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--skip-learning", action="store_true")
    ap.add_argument("--skip-geometry", action="store_true")
    ap.add_argument(
        "--trainer", default="base_mosaic", choices=["base_mosaic", "base_mixup"]
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out = {}
    if not args.skip_geometry:
        fills = [1.0, 0.95, 0.85, 0.75, 0.5]
        out["geometry"] = geometry(fills) + geometry(fills, content_aware=True)
        for r in out["geometry"]:
            print(json.dumps(r), flush=True)
    if not args.skip_learning:
        out["learning"] = learning(args.steps, args.seeds, trainer=args.trainer)
        print(
            json.dumps(
                {k: v for k, v in out["learning"].items() if not isinstance(v, list)}
            )
        )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
