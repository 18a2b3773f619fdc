"""Host-side batch assembly feeding the on-device augmentation stage.

Division of labour (TPU-first, cf. SURVEY §7.3):
  host   : file decode (PIL), shortest-edge resize, canvas padding, GT
           scaling/padding -> fixed-shape numpy batches (this module)
  device : random flip (geometry, with boxes) + the full strong photometric
           pipeline, fused into the jitted train step (data/transforms.py)

This replaces the reference's torch DataLoader + aspect-ratio-grouped
two-crop batchers (/root/reference/daod/data/build.py:219-357, common.py).
Aspect-ratio grouping exists there to reduce per-batch padding waste with
dynamic shapes; with a static canvas it is unnecessary — the canvas is the
bucket.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Iterator, List, Tuple

import numpy as np

from ..structures.instances import Instances
from .datasets import get_dataset


class ArrayBatch(dict):
    """Plain dict batch: images [B,H,W,3] uint8 (4x less host->device
    traffic; trainers/eval cast to f32 ON DEVICE — feeding these to
    anything that subtracts a mean in the input dtype wraps around),
    sizes [B,2] i32, scale [B,2] f32 (sx,sy), gt_boxes [B,N,4] f32,
    gt_classes [B,N] i32, gt_valid [B,N] bool, image_ids [B] i64
    (host-side metadata, not shipped to device)."""


def _load_image(path: str, fmt: str = "BGR") -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.float32)
    if fmt == "BGR":
        arr = arr[:, :, ::-1]
    return arr


def d2_output_shape(h: int, w: int, min_size: int, max_size: int) -> Tuple[int, int]:
    """detectron2 ResizeShortestEdge.get_output_shape, bit-exact: the shorter
    edge is pinned to min_size (unless the max_size cap kicks in) and final
    dims round half-UP via int(x + 0.5) — NOT Python round()'s half-even."""
    size = float(min_size)
    scale = size / min(h, w)
    if h < w:
        newh, neww = size, scale * w
    else:
        newh, neww = scale * h, size
    if max(newh, neww) > max_size:
        s = max_size / max(newh, neww)
        newh, neww = newh * s, neww * s
    return int(newh + 0.5), int(neww + 0.5)


def _resize_shortest_edge(
    img: np.ndarray, min_size: int, max_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """PIL BILINEAR shortest-edge resize, parity with detectron2's
    ResizeTransform (PIL resize on uint8; boxes map by per-axis factors
    neww/w, newh/h). Returns (image, scale_xy [2] float32)."""
    from PIL import Image

    h, w = img.shape[:2]
    nh, nw = d2_output_shape(h, w, min_size, max_size)
    if (nh, nw) == (h, w):
        return img, np.ones((2,), np.float32)
    pil = Image.fromarray(img.astype(np.uint8))
    out = np.asarray(pil.resize((nw, nh), Image.BILINEAR), dtype=np.float32)
    return out, np.asarray([nw / w, nh / h], np.float32)


class DetectionLoader:
    """Iterates fixed-shape batches over a list of dataset records."""

    def __init__(
        self,
        records: List[dict],
        batch_size: int,
        canvas_hw: Tuple[int, int],
        min_size: int,
        max_size: int = 1333,
        gt_capacity: int = 64,
        training: bool = True,
        seed: int = 0,
        input_format: str = "BGR",
        synthetic: bool = False,
        prefetch: int = 2,
        decode_threads: int = 1,
    ):
        assert records, "empty dataset"
        self.records = records
        self.batch_size = batch_size
        self.canvas_hw = canvas_hw
        # d2 ResizeShortestEdge semantics: a multi-valued MIN_SIZE_TRAIN is
        # sampled per image ("choice" sampling, the d2 default the reference
        # inherits); a scalar (or 1-tuple) pins the size. Samples are drawn
        # on the iterator thread (never the decode pool) so the stream stays
        # deterministic in `seed`.
        self.min_sizes = (
            tuple(int(s) for s in min_size)
            if hasattr(min_size, "__len__")
            else (int(min_size),)
        )
        self.min_size = self.min_sizes[0]
        self.max_size = max_size
        if training and len(self.min_sizes) > 1:
            # multi-scale sampling must fit the static canvas at EVERY size:
            # a sampled scale whose resized image overflows would be silently
            # cropped while the scaled GT kept out-of-canvas coordinates —
            # corrupted supervision with no error. Exact check against the
            # records' true dims (they are required keys).
            try:
                hs = np.asarray([r["height"] for r in records])
                ws = np.asarray([r["width"] for r in records])
            except KeyError:
                import warnings

                warnings.warn(
                    "records lack height/width; the MIN_SIZE_TRAIN "
                    "canvas-overflow check is SKIPPED — oversized samples "
                    "will only surface at the runtime crop"
                )
                hs = ws = None
            if hs is not None:
                for ms in self.min_sizes:
                    nhs_nws = [d2_output_shape(int(h), int(w), ms, max_size) for h, w in zip(hs, ws)]
                    bad = [(nh, nw) for nh, nw in nhs_nws if nh > canvas_hw[0] or nw > canvas_hw[1]]
                    if bad:
                        raise ValueError(
                            f"MIN_SIZE_TRAIN choice {ms} resizes {len(bad)} "
                            f"image(s) beyond TPU.CANVAS {tuple(canvas_hw)} "
                            f"(worst {max(bad)}); raise TPU.CANVAS to fit the "
                            "largest training scale"
                        )
        self.gt_capacity = gt_capacity
        self.training = training
        self.rng = np.random.RandomState(seed)
        self.input_format = input_format
        self.synthetic = synthetic
        self.prefetch = prefetch
        self.decode_threads = max(1, int(decode_threads))
        self._pool = None  # lazy ThreadPoolExecutor for per-image decode

    def __len__(self):
        return (len(self.records) + self.batch_size - 1) // self.batch_size

    def _record_image(self, rec: dict) -> np.ndarray:
        if self.synthetic or "image" in rec:
            if "image" in rec:
                return np.asarray(rec["image"], np.float32)
            # deterministic synthetic content: rectangles on noise
            rs = np.random.RandomState(rec["image_id"] % (2**31))
            img = rs.uniform(0, 80, (rec["height"], rec["width"], 3)).astype(np.float32)
            for box, cls in zip(rec["boxes"], rec["classes"]):
                x1, y1, x2, y2 = [int(v) for v in box]
                img[y1:y2, x1:x2] = 120.0 + 15.0 * (cls + 1)
            return img
        return _load_image(rec["file_name"], self.input_format)

    def _prep_image(self, rec: dict, min_size: int = None) -> Tuple[np.ndarray, np.ndarray]:
        """Per-record host work -> (shortest-edge-resized uint8 image,
        scale_xy). File records take the native codec's one-C-call path
        (decode + Pillow-bit-exact resize, GIL released — data/native_codec.py);
        synthetic/array records and codec failures fall back to PIL.
        `min_size` carries the per-image "choice" sample (multi-valued
        MIN_SIZE_TRAIN); None pins the first size."""
        min_size = self.min_size if min_size is None else min_size
        if not (self.synthetic or "image" in rec):
            from . import native_codec

            arr = native_codec.decode(rec["file_name"])  # RGB uint8 | None
            if arr is not None:
                h, w = arr.shape[:2]
                nh, nw = d2_output_shape(h, w, min_size, self.max_size)
                if (nh, nw) != (h, w):
                    out = native_codec.resize_bilinear(arr, nh, nw)
                    scale = np.asarray([nw / w, nh / h], np.float32)
                else:
                    out, scale = arr, np.ones((2,), np.float32)
                if out is not None:
                    if self.input_format == "BGR":
                        out = out[:, :, ::-1]
                    return out, scale
        img = self._record_image(rec)
        img, scale = _resize_shortest_edge(img, min_size, self.max_size)
        return np.clip(img, 0, 255).astype(np.uint8), scale

    def _make_batch(self, recs: List[dict]) -> ArrayBatch:
        b = len(recs)
        ch, cw = self.canvas_hw
        n = self.gt_capacity
        # uint8 canvas: 4x less host->device traffic; trainers cast on device
        images = np.zeros((b, ch, cw, 3), np.uint8)
        sizes = np.zeros((b, 2), np.int32)
        scales = np.ones((b, 2), np.float32)  # (sx, sy) per image
        gt_boxes = np.zeros((b, n, 4), np.float32)
        gt_classes = np.zeros((b, n), np.int32)
        gt_valid = np.zeros((b, n), bool)
        image_ids = np.zeros((b,), np.int64)
        heights = np.zeros((b,), np.int32)
        widths = np.zeros((b,), np.int32)

        # per-image shortest-edge sample (d2 "choice" sampling) — drawn here
        # on the iterator thread, in record order, so the stream is
        # deterministic regardless of decode_threads
        if self.training and len(self.min_sizes) > 1:
            msizes = [int(self.rng.choice(self.min_sizes)) for _ in recs]
        else:
            msizes = [self.min_size] * len(recs)
        if self.decode_threads > 1 and len(recs) > 1 and not self.synthetic:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(
                    max_workers=self.decode_threads, thread_name_prefix="sfod-decode"
                )
            preps = list(self._pool.map(self._prep_image, recs, msizes))
        else:
            preps = [self._prep_image(rec, ms) for rec, ms in zip(recs, msizes)]

        for i, (rec, (img, scale)) in enumerate(zip(recs, preps)):
            h, w = img.shape[:2]
            cropped = h > ch or w > cw  # single-size outlier aspect ratios
            h, w = min(h, ch), min(w, cw)
            images[i, :h, :w] = img[:h, :w]
            sizes[i] = (h, w)
            scales[i] = scale
            image_ids[i] = rec["image_id"]
            heights[i] = rec["height"]
            widths[i] = rec["width"]
            boxes = np.asarray(rec["boxes"], np.float32).reshape(-1, 4) * np.concatenate(
                [scale, scale]
            )
            classes = np.asarray(rec["classes"], np.int32)
            k = min(len(boxes), n)
            if len(boxes) > n:
                areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                keep = np.argsort(-areas)[:n]
                boxes, classes = boxes[keep], classes[keep]
            if cropped:
                # the image was cropped to the canvas: clip the scaled GT to
                # the placed extent and drop boxes that fell entirely outside
                # (out-of-canvas coordinates would train phantom objects)
                boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
                boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
                alive = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            else:
                alive = np.ones((len(boxes),), bool)
            gt_boxes[i, :k] = boxes[:k]
            gt_classes[i, :k] = classes[:k]
            gt_valid[i, :k] = alive[:k]

        return ArrayBatch(
            images=images,
            sizes=sizes,
            scale=scales,
            gt_boxes=gt_boxes,
            gt_classes=gt_classes,
            gt_valid=gt_valid,
            image_ids=image_ids,
            heights=heights,
            widths=widths,
        )

    def _index_stream(self) -> Iterator[List[int]]:
        n = len(self.records)
        if not self.training:
            for s in range(0, n, self.batch_size):
                idx = list(range(s, min(s + self.batch_size, n)))
                while len(idx) < self.batch_size:  # pad final batch by repeat
                    idx.append(idx[-1])
                yield idx
            return
        # d2 TrainingSampler semantics: one INFINITE index stream of
        # concatenated epoch permutations, chunked into batches — batches
        # span epoch boundaries, so a dataset smaller than the batch size
        # still yields (the old per-epoch slicing dropped the tail and spun
        # forever when n < batch_size). Streams are unchanged whenever
        # batch_size divides n (every existing fixture).
        pool: List[int] = []
        while True:
            while len(pool) < self.batch_size:
                pool.extend(self.rng.permutation(n).tolist())
            yield pool[: self.batch_size]
            del pool[: self.batch_size]

    def __iter__(self) -> Iterator[ArrayBatch]:
        stream = self._index_stream()
        if self.prefetch <= 0:
            for idx in stream:
                yield self._make_batch([self.records[i] for i in idx])
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()
        err: list = []

        def worker():
            try:
                for idx in stream:
                    if abandoned.is_set():
                        # don't build (or draw RNG for) a batch nobody will
                        # consume: a stale worker racing a fresh iteration of
                        # the same loader would interleave RandomState draws
                        # across threads and break seed-determinism
                        return
                    batch = self._make_batch([self.records[i] for i in idx])
                    while not abandoned.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue_mod.Full:
                            continue
                    if abandoned.is_set():
                        return
            except BaseException as e:
                # surface in the consumer — a swallowed decode error would
                # end iteration cleanly and silently truncate an eval pass
                err.append(e)
            finally:
                # non-blocking with retry: an unbounded put could pin this
                # thread forever if the consumer abandons and the queue
                # refills in the drain race
                while not abandoned.is_set():
                    try:
                        q.put_nowait(stop)
                        break
                    except queue_mod.Full:
                        abandoned.wait(0.1)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # consumer abandoned the iterator (e.g. AdaBN's max_batches
            # break on an infinite training loader): unblock and retire the
            # worker instead of leaking a thread pinned on a full queue of
            # canvas batches for the life of the process
            abandoned.set()
            try:
                while True:
                    q.get_nowait()
            except queue_mod.Empty:
                pass


def gt_instances(batch: ArrayBatch, host: bool = False) -> Instances:
    """GT view of a batch (leading dim = batch). host=True keeps numpy
    leaves — the chunked multi-step stackers (run_step_chunk) host-stack K
    steps and upload ONCE; jnp leaves there would cost K uploads plus K
    readbacks per chunk over the tunnel."""
    if host:
        return Instances(
            boxes=np.asarray(batch["gt_boxes"]),
            scores=np.ones(batch["gt_classes"].shape, np.float32),
            classes=np.asarray(batch["gt_classes"]),
            valid=np.asarray(batch["gt_valid"]),
        )
    import jax.numpy as jnp

    return Instances(
        boxes=jnp.asarray(batch["gt_boxes"]),
        scores=jnp.ones(batch["gt_classes"].shape, jnp.float32),
        classes=jnp.asarray(batch["gt_classes"]),
        valid=jnp.asarray(batch["gt_valid"]),
    )


def divide_label_unlabel(records, sup_percent: float, random_seed: int):
    """Deterministic labeled/unlabeled split (reference data/build.py:31-56:
    DATALOADER.SUP_PERCENT of the set is treated as labeled, chosen by
    RANDOM_DATA_SEED). Returns (labeled, unlabeled)."""
    n = len(records)
    n_label = int(n * sup_percent / 100.0)
    rs = np.random.RandomState(random_seed)
    perm = rs.permutation(n)
    labeled = [records[i] for i in sorted(perm[:n_label])]
    unlabeled = [records[i] for i in sorted(perm[n_label:])]
    return labeled, unlabeled


def build_train_loader(cfg, dataset_names=None, batch_size=None, seed=None, labeled=True, **kw):
    names = dataset_names or cfg.DATASETS.TRAIN
    records = []
    for name in names:
        records.extend(get_dataset(name)["records"])
    if cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS:
        # d2's get_detection_dataset_dicts filters no-annotation images for
        # TRAIN loaders only (ref build.py:62), BEFORE the sup-percent split;
        # test loaders keep every image (ref build.py:118 filter_empty=False)
        records = [r for r in records if len(r.get("boxes", ()))]
    sup = float(cfg.DATALOADER.SUP_PERCENT)
    if sup < 100.0:
        lab, unlab = divide_label_unlabel(records, sup, cfg.DATALOADER.RANDOM_DATA_SEED)
        records = lab if labeled else unlab
    return DetectionLoader(
        records,
        batch_size or cfg.SOLVER.IMS_PER_BATCH,
        tuple(cfg.TPU.CANVAS),
        tuple(cfg.INPUT.MIN_SIZE_TRAIN),  # multi-valued: per-image "choice"
        cfg.INPUT.MAX_SIZE_TRAIN,
        cfg.TPU.GT_CAPACITY,
        training=True,
        seed=cfg.SEED if seed is None else seed,
        input_format=cfg.INPUT.FORMAT,
        # DATALOADER.NUM_WORKERS maps to prefetch-queue depth AND the decode
        # thread-pool width: the torch worker-process pool becomes a bounded
        # queue fed by N GIL-free native decode threads (data/native_codec.py);
        # 0 keeps d2's semantics (no background worker: synchronous loading)
        **{
            "prefetch": int(cfg.DATALOADER.NUM_WORKERS),
            "decode_threads": int(cfg.DATALOADER.NUM_WORKERS),
            **kw,
        },
    )


def build_test_loader(cfg, dataset_name, **kw):
    records = get_dataset(dataset_name)["records"]
    return DetectionLoader(
        records,
        cfg.TEST.IMS_PER_BATCH,
        tuple(cfg.TPU.CANVAS),
        cfg.INPUT.MIN_SIZE_TEST,
        cfg.INPUT.MAX_SIZE_TEST,
        cfg.TPU.GT_CAPACITY,
        training=False,
        input_format=cfg.INPUT.FORMAT,
        **{"decode_threads": int(cfg.DATALOADER.NUM_WORKERS), **kw},
    )
