"""HTTP detection service over an exported artifact (engine/export.py).

Completes the deployment path the reference lacks (its eval CLI is the
closest thing): `python tools/serve_model.py --artifact model.sfodx` loads
the serialized StableHLO program — NOT the model-building code — and serves
detections on localhost. Preprocessing mirrors the test loader exactly
(data/loader.py::_resize_shortest_edge shortest-edge resize -> uint8 canvas
padding), and boxes are mapped back to original-image coordinates the same
way the eval loop does (engine/eval_loop.py per-axis inverse scale + clip).

  GET  /          artifact + serving info (canvas, batch, classes, platforms)
  POST /predict   body = image file (anything PIL opens) or a raw .npy
                  HxWx3 uint8 array; optional ?min_score=S
                  -> {"width", "height", "detections": [{"box" xyxy in file
                     coords, "score", "class", "class_name"}, ...]}

Concurrent requests MICRO-BATCH: ThreadingHTTPServer handles each request
on its own thread, and the service coalesces up to `batch` of them (within
a short wait window) into ONE device call — a batch-8 artifact measures
5.4x the batch-1 throughput on the chip (BENCH_NOTES serving table), and
batching is how that capacity reaches HTTP clients.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class _MicroBatcher:
    """Coalesce concurrent predict() calls into batched device calls.

    Submitting threads block on an event; one worker thread drains the
    queue — it waits `max_wait_s` after the first arrival to let
    concurrent requests pile up (bounded latency cost), then runs
    `run_batch` on up to `max_batch` of them."""

    def __init__(self, run_batch, max_batch: int, max_wait_s: float = 0.005):
        self._run_batch = run_batch
        self.max_batch = max(int(max_batch), 1)
        self.max_wait_s = float(max_wait_s)
        self._queue: List[dict] = []
        self._cv = threading.Condition()
        self.calls = 0  # device calls issued (observable for tests/metrics)
        self._gate = threading.Event()  # tests clear() to hold draining
        self._gate.set()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, payload):
        item = {"payload": payload, "done": threading.Event(), "out": None}
        with self._cv:
            self._queue.append(item)
            self._cv.notify()
        item["done"].wait()
        if isinstance(item["out"], BaseException):
            raise item["out"]
        return item["out"]

    def _loop(self):
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                if self.max_wait_s > 0:
                    # coalescing window: wake EARLY once a full batch is
                    # queued — only partial batches pay the wait
                    self._cv.wait_for(
                        lambda: len(self._queue) >= self.max_batch,
                        timeout=self.max_wait_s,
                    )
            self._gate.wait()
            with self._cv:
                batch, self._queue = (
                    self._queue[: self.max_batch],
                    self._queue[self.max_batch :],
                )
            try:
                self.calls += 1
                outs = self._run_batch([it["payload"] for it in batch])
                for it, out in zip(batch, outs):
                    it["out"] = out
            except BaseException as e:  # deliver failures to the waiters
                for it in batch:
                    it["out"] = e
            for it in batch:
                it["done"].set()


class DetectionService:
    """Wraps a loaded artifact with loader-parity pre/post-processing."""

    def __init__(self, artifact_path: str, variables=None, max_wait_ms: float = 5.0):
        import jax

        from .export import load_exported

        self.exported, self.meta = load_exported(artifact_path)
        if not self.meta.get("bundle_params", True) and variables is None:
            raise ValueError(
                "artifact was exported with --no-bundle-params; serving it "
                "requires the weights pytree (variables=...)"
            )
        self.variables = variables
        # in_avals is the FLAT leaf tuple: with call-time weights the images
        # aval sits after ALL variables leaves — i.e. always second-to-last
        # (images, sizes are the final two args in both layouts)
        img_aval = self.exported.in_avals[-2]
        self.canvas = tuple(self.meta.get("canvas") or img_aval.shape[1:3])
        if "batch" in self.meta:
            b = self.meta.get("batch")
        else:
            # artifacts saved without meta (save_exported(..., meta=None)):
            # derive the batch from the input aval like the canvas above —
            # a symbolic leading dim means a poly-batch export
            b0 = img_aval.shape[0]
            b = int(b0) if isinstance(b0, int) else None
        # fixed-batch artifacts pay the full batch per call regardless —
        # micro-batching (below) turns that capacity into HTTP throughput;
        # poly artifacts batch up to 8, padded to powers of two (below)
        self.batch = int(b) if b else 8
        self.poly = not b
        self.min_size = int(self.meta.get("min_size", 600))
        self.max_size = int(self.meta.get("max_size", 1333))
        self.image_format = self.meta.get("image_format", "BGR")
        self.class_names: Optional[List[str]] = self.meta.get("class_names")
        # jit caches the executable across requests (Exported.call retraces)
        self._call = jax.jit(self.exported.call)
        self._batcher = _MicroBatcher(
            self._run_batch,
            self.batch,
            max_wait_s=(max_wait_ms / 1000.0) if self.batch > 1 else 0.0,
        )

    def info(self) -> Dict:
        return {
            "canvas": list(self.canvas),
            "batch": self.meta.get("batch", 1),
            "min_size": self.min_size,
            "max_size": self.max_size,
            "image_format": self.image_format,
            "class_names": self.class_names,
            "platforms": list(self.exported.platforms),
            "model": self.meta.get("model"),
            "config": self.meta.get("config"),
        }

    def _prepare(self, img: np.ndarray):
        """Loader-parity resize + canvas placement for ONE image ->
        (canvas [ch,cw,3] uint8, (h,w), scale, (ow,oh))."""
        from ..data.loader import _resize_shortest_edge

        oh, ow = img.shape[:2]
        resized, scale = _resize_shortest_edge(
            img.astype(np.float32), self.min_size, self.max_size
        )
        ch, cw = self.canvas
        h, w = min(resized.shape[0], ch), min(resized.shape[1], cw)
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:h, :w] = np.clip(resized[:h, :w], 0, 255).astype(np.uint8)
        return canvas, (h, w), scale, (ow, oh)

    def _run_batch(self, payloads: List[tuple]) -> List[Dict[str, np.ndarray]]:
        """One device call for K<=batch prepared canvases; returns each
        request's output slot."""
        k = len(payloads)
        if self.poly:
            # pad to the next power of two <= batch: jit caches per shape,
            # so raw k would compile a fresh executable for every distinct
            # coalesced count (minutes each, stalling all queued requests);
            # pow2 padding bounds the compile set to {1, 2, 4, 8}
            b = min(max(1 << (k - 1).bit_length(), 1), self.batch)
            b = max(b, k)
        else:
            b = self.batch
        ch, cw = self.canvas
        images = np.zeros((b, ch, cw, 3), np.uint8)
        sizes = np.zeros((b, 2), np.int32)
        sizes[:] = payloads[0][1]  # pad slots reuse a real size (any valid hw)
        for i, (canvas, hw, _, _) in enumerate(payloads):
            images[i] = canvas
            sizes[i] = hw
        args = (images, sizes) if self.variables is None else (self.variables, images, sizes)
        out = self._call(*args)
        out = {key: np.asarray(val) for key, val in out.items()}
        return [{key: val[i] for key, val in out.items()} for i in range(k)]

    def predict_array(self, img: np.ndarray, min_score: float = 0.0) -> Dict:
        """img: HxWx3 uint8 in the artifact's pixel format (meta
        image_format, reference default BGR)."""
        payload = self._prepare(img)
        out = self._batcher.submit(payload)
        _, _, scale, (ow, oh) = payload
        boxes, scores, classes = out["boxes"], out["scores"], out["classes"]
        keep = out["valid"] & (scores >= min_score)
        inv = 1.0 / np.maximum(np.concatenate([scale, scale]), 1e-8)
        file_boxes = np.clip(boxes[keep] * inv, 0, [ow, oh, ow, oh])
        dets = []
        for b, s, c in zip(file_boxes, scores[keep], classes[keep]):
            name = (
                self.class_names[int(c)]
                if self.class_names and 0 <= int(c) < len(self.class_names)
                else str(int(c))
            )
            dets.append(
                {
                    "box": [float(v) for v in b],
                    "score": float(s),
                    "class": int(c),
                    "class_name": name,
                }
            )
        dets.sort(key=lambda d: -d["score"])
        return {"width": ow, "height": oh, "detections": dets}

    def predict_bytes(self, raw: bytes, min_score: float = 0.0) -> Dict:
        """Decode an image file (PIL) or a .npy uint8 array, then predict."""
        if raw[:6] == b"\x93NUMPY":
            arr = np.load(io.BytesIO(raw))
        else:
            from PIL import Image

            with Image.open(io.BytesIO(raw)) as im:
                arr = np.asarray(im.convert("RGB"))
            if self.image_format == "BGR":
                arr = arr[:, :, ::-1]
        arr = np.ascontiguousarray(arr, np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError(f"expected an HxWx3 image, got shape {arr.shape}")
        return self.predict_array(arr, min_score=min_score)


class _Handler(BaseHTTPRequestHandler):
    service: DetectionService  # set by make_server

    def log_message(self, fmt, *args):
        pass

    def _json(self, obj, code: int = 200):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if urlparse(self.path).path == "/":
            return self._json(self.service.info())
        return self._json({"error": "unknown endpoint"}, 404)

    def do_POST(self):
        parsed = urlparse(self.path)
        if parsed.path != "/predict":
            return self._json({"error": "unknown endpoint"}, 404)
        try:
            qs = parse_qs(parsed.query)
            min_score = float(qs.get("min_score", ["0"])[0])
            raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            return self._json(self.service.predict_bytes(raw, min_score=min_score))
        except Exception as e:
            return self._json({"error": f"{type(e).__name__}: {e}"}, 400)


def make_server(
    service: DetectionService, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve_in_thread(service: DetectionService, host: str = "127.0.0.1", port: int = 0):
    """Start on a daemon thread; returns (server, base_url)."""
    srv = make_server(service, host, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://{host}:{srv.server_address[1]}"
