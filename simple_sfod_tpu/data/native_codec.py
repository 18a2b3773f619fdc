"""ctypes bindings for the native image codec (native/imgcodec.cpp).

The loader's host hot path — file decode + detectron2-exact shortest-edge
resize — as one C call per image. The reference does this work in PIL/cv2
from torch DataLoader worker PROCESSES (SURVEY §2.2 "cv2/PIL aug kernels";
/root/reference/daod/data/annotation_mapper.py via detectron2 read_image);
here a C call releases the GIL, so plain Python THREADS scale across host
cores with no process pool, no pickling, and one copy.

The native resample is bit-exact with Pillow's BILINEAR (fixed-point
two-pass, tests/test_native_loader.py), so switching codecs cannot move the
measured ResizeShortestEdge parity (tests/test_loader.py). Belt and braces:
the first successful native decode is cross-checked against PIL once at
runtime; any mismatch logs and permanently falls back to PIL.

Falls back silently to PIL when the shared library cannot be built/loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False
_LOCK = threading.Lock()
_CHECKED = {"jpeg": False, "png": False}  # per-format one-shot PIL cross-check
_DISABLED = False

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(NATIVE_DIR, "libimgcodec.so")
        src = os.path.join(NATIVE_DIR, "imgcodec.cpp")
        stale = os.path.exists(src) and (
            not os.path.exists(so) or os.path.getmtime(src) > os.path.getmtime(so)
        )
        if stale:
            # build to a per-pid temp name and atomically rename: a
            # concurrent process (multihost runs) must never dlopen a
            # half-written .so — a truncated-yet-loadable mapping can
            # SIGSEGV on the first decode instead of falling back to PIL
            tmp = f"{so}.build.{os.getpid()}"
            try:
                subprocess.run(
                    ["make", "-C", NATIVE_DIR, "-B", "imgcodec_out",
                     f"IMG_OUT={os.path.basename(tmp)}"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp, so)
            except Exception:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                if not os.path.exists(so):
                    return None  # no binary at all; else: use committed .so
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.sfod_image_decode.restype = ctypes.c_int
        lib.sfod_image_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sfod_resize_bilinear.restype = ctypes.c_int
        lib.sfod_resize_bilinear.argtypes = [u8p] + [ctypes.c_int32] * 3 + [u8p] + [ctypes.c_int32] * 2
        lib.sfod_image_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def available() -> bool:
    return not _DISABLED and _load() is not None


def _sniff_format(path: str) -> Optional[str]:
    try:
        with open(path, "rb") as f:
            magic = f.read(8)
    except OSError:
        return None
    if magic[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if magic == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


def decode(path: str) -> Optional[np.ndarray]:
    """Decode a JPEG/PNG to RGB uint8 [H, W, 3]; None on failure (caller
    falls back to PIL).

    Belt-and-braces runtime guard on top of the parity tests: the first
    decode of EACH format is cross-checked byte-for-byte against PIL before
    it is returned (under the lock, so no thread can return an unverified
    array while the check is pending); any mismatch — e.g. a system libjpeg
    whose fancy upsampling differs from Pillow's bundled libjpeg-turbo —
    disables the native codec for the process and falls back to PIL."""
    global _DISABLED
    lib = _load()
    if lib is None or _DISABLED:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.sfod_image_decode(
        os.fspath(path).encode(), ctypes.byref(out), ctypes.byref(h), ctypes.byref(w)
    )
    if rc != 0:
        return None
    arr = np.ctypeslib.as_array(out, shape=(h.value, w.value, 3)).copy()
    lib.sfod_image_free(out)
    fmt = _sniff_format(path)
    if fmt is not None and not _CHECKED[fmt]:
        with _LOCK:
            if _DISABLED:
                return None
            if not _CHECKED[fmt]:
                try:
                    from PIL import Image

                    with Image.open(path) as im:
                        ref = np.asarray(im.convert("RGB"), np.uint8)
                    if ref.shape != arr.shape or not np.array_equal(ref, arr):
                        print(
                            f"[native_codec] {fmt} decode mismatch vs PIL on "
                            f"{path}; disabling the native codec"
                        )
                        _DISABLED = True
                        return None
                    _CHECKED[fmt] = True
                except ImportError:
                    _CHECKED[fmt] = True  # no PIL: trust the parity tests
                except Exception:
                    pass  # PIL couldn't read THIS file: retry the check on
                    # the next decode of this format; the native array is
                    # still the only working decode of the file
    return arr


def resize_bilinear(img: np.ndarray, nh: int, nw: int) -> Optional[np.ndarray]:
    """Pillow-BILINEAR-bit-exact resize of a uint8 [H, W, C] array; None if
    the native library is unavailable."""
    lib = _load()
    if lib is None or _DISABLED:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    dst = np.empty((nh, nw, c), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.sfod_resize_bilinear(
        img.ctypes.data_as(u8p), h, w, c, dst.ctypes.data_as(u8p), nh, nw
    )
    if rc != 0:
        return None
    return dst
