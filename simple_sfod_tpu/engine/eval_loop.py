"""Dataset inference + evaluation loop (the reference's
`DefaultTrainer.test` / `inference_on_dataset` path, SURVEY §3.4)."""

from __future__ import annotations

import collections
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation import COCOEvaluator, F1Evaluator
from ..models.detector import Detector


def _allgather_records(records: list) -> list:
    """Exchange per-process record lists across a multi-process run: pickle
    to bytes, allgather lengths, pad to the max, allgather the padded
    buffers, unpickle every process's list (pid order). Every process ends
    up with the SAME concatenated list — the reference gathers DDP eval
    shards to rank 0 (d2 inference_on_dataset / all_gather); gathering to
    ALL ranks costs the same collective and spares a broadcast."""
    from jax.experimental import multihost_utils

    blob = pickle.dumps(records, protocol=pickle.HIGHEST_PROTOCOL)
    n = np.asarray([len(blob)], np.int64)
    lens = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, np.uint8)
    bufs = np.asarray(multihost_utils.process_allgather(buf))
    if bufs.ndim == 1:  # single process: allgather returns the buffer itself
        bufs = bufs[None]
    out = []
    for p in range(len(lens)):
        out.extend(pickle.loads(bufs[p, : int(lens[p])].tobytes()))
    return out


def inference_on_dataset(
    detector: Detector,
    variables,
    loader,
    thing_classes,
    evaluators: Optional[list] = None,
    train_mode_bn: bool = False,
    jit_infer=None,
    dump_json: Optional[str] = None,
    category_ids: Optional[dict] = None,
    pipeline_depth: int = 4,
    mesh=None,
    spatial: bool = False,
) -> Dict:
    """Run inference over a test loader; boxes are mapped back to original
    file coordinates (divide by the resize scale) before evaluation.

    dump_json: optional path for a COCO detections dump
    (`coco_instances_results.json`, the input of
    tools/converters/prediction_to_gt.py — stage 1 of the fixed-pseudo-label
    pipeline, SURVEY §3.5). category_ids maps contiguous ids back to the
    dataset's COCO category ids (default: +1).

    Dispatch is pipelined: a few batches stay in flight on the device while
    earlier results are materialized and post-processed — each materializing
    read pays one tunnel round trip on this box (BENCH_NOTES round 2), so a
    strictly serial dispatch/read loop is RTT-bound instead of device-bound.

    mesh: optional `jax.sharding.Mesh` with a 'data' axis. When its data
    width D > 1, inference runs data-parallel — the reference's multi-GPU
    `inference_on_dataset` under DDP launch (SURVEY §3.4 / §2.3), done the
    GSPMD way: variables are replicated once, each batch is sharded over
    'data' on the image dimension, and the SAME jitted infer graph runs
    with XLA-placed collectives (none at eval-mode BN — images are
    independent, so the sharded pass is numerically identical to the
    single-device pass; equivalence-tested in tests/test_eval_dp.py).
    Batches whose size is not a multiple of D are padded by repeating the
    final record; the padded rows are never visited (only the batch's own
    image_ids are iterated — the image-id dedup handles the LOADER's
    final-batch repeats, not the pad). With `train_mode_bn=True` such
    padding joins the batch statistics, so keep TEST.IMS_PER_BATCH a
    multiple of the mesh width for bit-exact AdaBN evals. Note
    TEST.IMS_PER_BATCH must be >= D for the DP path to give any speedup (a
    warning is emitted otherwise).

    On a MULTI-PROCESS mesh the loop shards BATCHES round-robin across
    processes instead (the reference's DDP eval contract: each rank infers
    its dataset shard, results are gathered — d2 inference_on_dataset):
    each process runs the local single-device infer graph on batches where
    `batch_index % process_count == process_index`, the per-image records
    are exchanged with a byte-level allgather, and EVERY process evaluates
    the merged set (identical results on all ranks). Cross-process
    duplicates from the loader's final-batch repeats are dropped at merge.
    """
    if evaluators is None:
        evaluators = [COCOEvaluator(thing_classes), F1Evaluator()]

    if jit_infer is None:
        jit_infer = jax.jit(
            lambda v, img, sz: detector.infer(v, img, sz, train_mode_bn=train_mode_bn)
        )

    nproc = jax.process_count()
    pid = jax.process_index()
    dp = 1
    multihost = False
    if mesh is not None and "data" in mesh.axis_names and mesh.shape["data"] > 1:
        if nproc > 1:
            # plain device_put of host-local numpy can't target a sharding
            # spanning non-addressable devices — shard batches round-robin
            # across processes and gather records instead (DDP-eval shape).
            multihost = True
        else:
            from ..parallel.mesh import replicate, shard_batch

            dp = int(mesh.shape["data"])
            variables = replicate(mesh, variables)

    warned_pad = []

    def dispatch(batch):
        if dp == 1:
            return jit_infer(
                variables, jnp.asarray(batch["images"]), jnp.asarray(batch["sizes"])
            )
        img = np.asarray(batch["images"])
        sz = np.asarray(batch["sizes"])
        pad = (-img.shape[0]) % dp  # constant per loader: batches are fixed-size
        if pad and not warned_pad:
            warned_pad.append(True)
            import warnings

            warnings.warn(
                f"eval batch of {img.shape[0]} images padded to {img.shape[0] + pad} "
                f"for the {dp}-wide data mesh: {pad}/{img.shape[0] + pad} of device "
                "work is wasted — raise TEST.IMS_PER_BATCH to a multiple of the "
                "mesh width to benefit from data-parallel eval"
            )
        if pad:
            img = np.concatenate([img, np.repeat(img[-1:], pad, axis=0)])
            sz = np.concatenate([sz, np.repeat(sz[-1:], pad, axis=0)])
        # spatial must mirror the trainer's TPU.SPATIAL_SHARD (callers pass
        # it through) — dropping it here would silently eval un-spatially-
        # sharded on large canvases, the hazard BaseTrainer._shard guards
        img, sz = shard_batch(mesh, (img, sz), spatial=spatial)
        return jit_infer(variables, img, sz)

    seen = set()
    records = []

    def process(batch, dets):
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
            # per-axis un-scaling (detectron2 ResizeTransform.apply_coords)
            s = np.asarray(batch["scale"][i], np.float32).reshape(-1)
            if s.size == 1:
                s = np.asarray([s[0], s[0]], np.float32)
            inv = 1.0 / np.maximum(np.concatenate([s, s]), 1e-8)
            file_boxes = boxes[i][keep] * inv
            # clip to original image bounds
            h, w = float(batch["heights"][i]), float(batch["widths"][i])
            file_boxes = np.clip(file_boxes, 0, [w, h, w, h])
            gt_keep = batch["gt_valid"][i]
            records.append(
                {
                    "image_id": img_id,
                    "boxes": file_boxes,
                    "scores": scores[i][keep],
                    "classes": classes[i][keep],
                    "gt_boxes": batch["gt_boxes"][i][gt_keep] * inv,
                    "gt_classes": np.asarray(batch["gt_classes"][i][gt_keep]),
                }
            )

    inflight = collections.deque()
    depth = max(1, int(pipeline_depth))  # TPU.EVAL_PIPELINE_DEPTH
    for bi, batch in enumerate(loader):
        if multihost and bi % nproc != pid:
            continue
        dets = dispatch(batch)
        inflight.append((batch, dets))
        if len(inflight) >= depth:
            process(*inflight.popleft())
    while inflight:
        process(*inflight.popleft())

    if multihost:
        merged, seen = [], set()
        for rec in _allgather_records(records):
            if rec["image_id"] in seen:  # cross-process final-batch repeats
                continue
            seen.add(rec["image_id"])
            merged.append(rec)
        records = sorted(merged, key=lambda r: r["image_id"])

    for rec in records:
        for ev in evaluators:
            ev.process_image(
                rec["image_id"],
                rec["boxes"],
                rec["scores"],
                rec["classes"],
                rec["gt_boxes"],
                rec["gt_classes"],
            )

    if dump_json and (not multihost or pid == 0):
        import json
        import os

        dump = []
        for rec in records:
            for b, sc, c in zip(rec["boxes"], rec["scores"], rec["classes"]):
                cat = category_ids.get(int(c), int(c) + 1) if category_ids else int(c) + 1
                dump.append(
                    {
                        "image_id": rec["image_id"],
                        "category_id": cat,
                        "bbox": [
                            float(b[0]),
                            float(b[1]),
                            float(b[2] - b[0]),
                            float(b[3] - b[1]),
                        ],
                        "score": float(sc),
                    }
                )
        os.makedirs(os.path.dirname(dump_json) or ".", exist_ok=True)
        with open(dump_json, "w") as f:
            json.dump(dump, f)

    results = {}
    for ev in evaluators:
        results.update(ev.evaluate())
    return results
