"""ctypes bindings for the native C++ COCO evaluator (native/cocoeval.cpp).

Replaces the reference's dependency on detectron2's COCOeval_opt C++
extension. Falls back silently to the numpy implementation in coco_eval.py
when the shared library hasn't been built (`make -C native`); builds it on
demand when a compiler is available."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_LIB = None
_TRIED = False
_LOCK = threading.Lock()

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
NUM_THR = 10
NUM_AREAS = 4
BLOCK = NUM_AREAS * NUM_THR + 1


def _src_hash(src_cpp: str) -> str:
    with open(src_cpp, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load() -> Optional[ctypes.CDLL]:
    with _LOCK:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(NATIVE_DIR, "libcocoeval.so")
    src_cpp = os.path.join(NATIVE_DIR, "cocoeval.cpp")
    # Content-hash staleness (a sidecar written by the Makefile): checkout
    # mtimes on a fresh clone are arbitrary, so an mtime check can trigger a
    # blocking 2-minute -O3 rebuild over a perfectly good committed binary.
    sidecar = so + ".srchash"
    stale = False
    if os.path.exists(src_cpp):
        try:
            with open(sidecar) as f:
                stale = f.read().strip() != _src_hash(src_cpp)
        except OSError:
            stale = True  # no sidecar: unknown provenance, rebuild
        stale = stale or not os.path.exists(so)
    if stale:
        # Cross-process exclusion is best-effort: build to a per-pid temp
        # name and rename into place (rename is atomic on one filesystem),
        # so a concurrent process never dlopens a half-written .so.
        tmp = f"{so}.build.{os.getpid()}"
        try:
            subprocess.run(
                ["make", "-C", NATIVE_DIR, "-B", "cocoeval_out",
                 f"OUT={os.path.basename(tmp)}"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)
            with open(sidecar + f".{os.getpid()}", "w") as f:
                f.write(_src_hash(src_cpp))
            os.replace(sidecar + f".{os.getpid()}", sidecar)
        except Exception:
            try:
                os.remove(tmp)
            except OSError:
                pass
            if not os.path.exists(so):
                return None
    try:
        lib = ctypes.CDLL(so)
        # layout handshake: refuse a library whose block layout disagrees
        # with this module's constants (a silent mismatch would misparse
        # APs into wrong slots); AttributeError also covers an older or
        # truncated .so missing the expected symbols — fall back to numpy
        nt = ctypes.c_int32(0)
        na = ctypes.c_int32(0)
        lib.coco_layout(ctypes.byref(nt), ctypes.byref(na))
        if nt.value != NUM_THR or na.value != NUM_AREAS:
            return None
        lib.coco_evaluate.restype = ctypes.c_int
    except (OSError, AttributeError):
        return None
    lib.coco_evaluate.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def coco_map_native(
    detections: Dict[int, dict],
    ground_truth: Dict[int, dict],
    num_classes: int,
    max_dets: int = 100,
) -> Optional[dict]:
    """Same contract as coco_eval.coco_map; returns None if the native lib is
    unavailable."""
    lib = _load()
    if lib is None:
        return None

    def flatten(d, with_scores):
        img, cat, score, box = [], [], [], []
        for image_id, rec in d.items():
            boxes = np.asarray(rec["boxes"], np.float64).reshape(-1, 4)
            classes = np.asarray(rec["classes"], np.int32).reshape(-1)
            n = len(classes)
            # the C side indexes det_box by the classes count — a mismatched
            # record must fail LOUDLY here (the numpy path raises on the same
            # input), not read past the end of the box buffer
            if len(boxes) != n:
                raise ValueError(
                    f"record {image_id!r}: {len(boxes)} boxes vs {n} classes"
                )
            if with_scores:
                s = np.asarray(rec["scores"], np.float64).reshape(-1)
                if len(s) != n:
                    raise ValueError(
                        f"record {image_id!r}: {len(s)} scores vs {n} classes"
                    )
                score.extend(s.tolist())
            img.extend([image_id] * n)
            cat.extend(classes.tolist())
            box.append(boxes)
        box_arr = np.concatenate(box, axis=0) if box else np.zeros((0, 4))
        return (
            np.asarray(img, np.int64),
            np.asarray(cat, np.int32),
            np.asarray(score, np.float64),
            np.ascontiguousarray(box_arr),
        )

    # the C ABI carries int64 image ids; filename-stem style string ids
    # (the VOC/F1/toolkit convention) go to the numpy fallback instead of
    # crashing mid-eval
    if not all(
        isinstance(k, (int, np.integer))
        for d in (detections, ground_truth)
        for k in d
    ):
        return None

    d_img, d_cat, d_score, d_box = flatten(detections, True)
    g_img, g_cat, _, g_box = flatten(ground_truth, False)
    image_ids = np.asarray(sorted(ground_truth.keys()), np.int64)

    out = np.full((num_classes * BLOCK,), -1.0, np.float64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.coco_evaluate(
        ptr(d_img, ctypes.c_int64),
        ptr(d_cat, ctypes.c_int32),
        ptr(d_score, ctypes.c_double),
        ptr(d_box, ctypes.c_double),
        len(d_img),
        ptr(g_img, ctypes.c_int64),
        ptr(g_cat, ctypes.c_int32),
        ptr(g_box, ctypes.c_double),
        len(g_img),
        ptr(image_ids, ctypes.c_int64),
        len(image_ids),
        num_classes,
        max_dets,
        ptr(out, ctypes.c_double),
    )
    if rc != 0:
        return None

    out = out.reshape(num_classes, BLOCK)
    aps = out[:, : NUM_AREAS * NUM_THR].reshape(num_classes, NUM_AREAS, NUM_THR)
    ar = out[:, -1]

    def mean_valid(x):
        valid = x >= 0
        return float(x[valid].mean()) if valid.any() else float("nan")

    per_class_ap = np.where(np.all(aps[:, 0] >= 0, axis=1), aps[:, 0].mean(axis=1), np.nan)
    per_class_ap50 = np.where(aps[:, 0, 0] >= 0, aps[:, 0, 0], np.nan)
    per_class_ap75 = np.where(aps[:, 0, 5] >= 0, aps[:, 0, 5], np.nan)

    def nanmean(x):
        ok = ~np.isnan(x)
        return float(x[ok].mean()) if ok.any() else float("nan")

    return {
        "AP": 100 * nanmean(per_class_ap),
        "AP50": 100 * nanmean(per_class_ap50),
        "AP75": 100 * nanmean(per_class_ap75),
        "APs": 100 * mean_valid(aps[:, 1].reshape(-1)),
        "APm": 100 * mean_valid(aps[:, 2].reshape(-1)),
        "APl": 100 * mean_valid(aps[:, 3].reshape(-1)),
        "AR100": 100 * mean_valid(ar),
        "per_class_AP": (100 * per_class_ap).tolist(),
        "per_class_AP50": (100 * per_class_ap50).tolist(),
    }
