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
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class DetectionService:
    """Wraps a loaded artifact with loader-parity pre/post-processing."""

    def __init__(self, artifact_path: str, variables=None):
        import jax

        from .export import load_exported

        self.exported, self.meta = load_exported(artifact_path)
        if not self.meta.get("bundle_params", True) and variables is None:
            raise ValueError(
                "artifact was exported with --no-bundle-params; serving it "
                "requires the weights pytree (variables=...)"
            )
        self.variables = variables
        img_aval = self.exported.in_avals[0 if variables is None else 1]
        self.canvas = tuple(self.meta.get("canvas") or img_aval.shape[1:3])
        b = self.meta.get("batch", 1)
        self.batch = int(b) if b else 1  # poly artifacts serve batch 1
        self.min_size = int(self.meta.get("min_size", 600))
        self.max_size = int(self.meta.get("max_size", 1333))
        self.image_format = self.meta.get("image_format", "BGR")
        self.class_names: Optional[List[str]] = self.meta.get("class_names")
        # jit caches the executable across requests (Exported.call retraces)
        self._call = jax.jit(self.exported.call)

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

    def predict_array(self, img: np.ndarray, min_score: float = 0.0) -> Dict:
        """img: HxWx3 uint8 in the artifact's pixel format (meta
        image_format, reference default BGR)."""
        from ..data.loader import _resize_shortest_edge

        oh, ow = img.shape[:2]
        resized, scale = _resize_shortest_edge(
            img.astype(np.float32), self.min_size, self.max_size
        )
        ch, cw = self.canvas
        h, w = min(resized.shape[0], ch), min(resized.shape[1], cw)
        images = np.zeros((self.batch, ch, cw, 3), np.uint8)
        images[0, :h, :w] = np.clip(resized[:h, :w], 0, 255).astype(np.uint8)
        sizes = np.zeros((self.batch, 2), np.int32)
        sizes[:] = (h, w)
        args = (images, sizes) if self.variables is None else (self.variables, images, sizes)
        out = self._call(*args)
        boxes = np.asarray(out["boxes"][0])
        scores = np.asarray(out["scores"][0])
        classes = np.asarray(out["classes"][0])
        keep = np.asarray(out["valid"][0]) & (scores >= min_score)
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
