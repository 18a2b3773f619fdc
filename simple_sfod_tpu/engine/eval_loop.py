"""Dataset inference + evaluation loop (the reference's
`DefaultTrainer.test` / `inference_on_dataset` path, SURVEY §3.4)."""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation import COCOEvaluator, F1Evaluator
from ..models.detector import Detector


def inference_on_dataset(
    detector: Detector,
    variables,
    loader,
    thing_classes,
    evaluators: Optional[list] = None,
    train_mode_bn: bool = False,
    jit_infer=None,
) -> Dict:
    """Run inference over a test loader; boxes are mapped back to original
    file coordinates (divide by the resize scale) before evaluation."""
    if evaluators is None:
        evaluators = [COCOEvaluator(thing_classes), F1Evaluator()]

    if jit_infer is None:
        jit_infer = jax.jit(
            lambda v, img, sz: detector.infer(v, img, sz, train_mode_bn=train_mode_bn)
        )

    seen = set()
    for batch in loader:
        dets = jit_infer(variables, jnp.asarray(batch["images"]), jnp.asarray(batch["sizes"]))
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        classes = np.asarray(dets.classes)
        valid = np.asarray(dets.valid)
        for i in range(len(batch["image_ids"])):
            img_id = int(batch["image_ids"][i])
            if img_id in seen:  # final-batch padding repeats records
                continue
            seen.add(img_id)
            keep = valid[i]
            file_boxes = boxes[i][keep] / max(float(batch["scale"][i]), 1e-8)
            # clip to original image bounds
            h, w = float(batch["heights"][i]), float(batch["widths"][i])
            file_boxes = np.clip(file_boxes, 0, [w, h, w, h])
            gt_keep = batch["gt_valid"][i]
            gt_boxes = batch["gt_boxes"][i][gt_keep] / max(float(batch["scale"][i]), 1e-8)
            for ev in evaluators:
                if isinstance(ev, COCOEvaluator):
                    ev.process_image(
                        img_id,
                        file_boxes,
                        scores[i][keep],
                        classes[i][keep],
                        gt_boxes,
                        batch["gt_classes"][i][gt_keep],
                    )
                else:
                    ev.process_image(
                        file_boxes,
                        scores[i][keep],
                        classes[i][keep],
                        gt_boxes,
                        batch["gt_classes"][i][gt_keep],
                    )

    results = {}
    for ev in evaluators:
        results.update(ev.evaluate())
    return results
