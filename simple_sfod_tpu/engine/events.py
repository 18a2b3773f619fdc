"""Metric logging: EventStorage + writers (console / JSON / TensorBoard).

Functional replacement for detectron2's EventStorage + PeriodicWriter stack
the reference logs through (base.py:186-220,260-267; sfat.py:402-424)."""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional


class EventStorage:
    def __init__(self, start_iter: int = 0, window: int = 20):
        self.iter = start_iter
        self._window = window
        self._history = defaultdict(lambda: deque(maxlen=1000))
        self._latest: Dict[str, tuple] = {}

    def put_scalar(self, name: str, value):
        value = float(value)
        self._history[name].append((self.iter, value))
        self._latest[name] = (self.iter, value)

    def put_scalars(self, **kw):
        for k, v in kw.items():
            self.put_scalar(k, v)

    def median(self, name: str, window: Optional[int] = None) -> float:
        vals = sorted(v for _, v in list(self._history[name])[-(window or self._window):])
        return vals[len(vals) // 2] if vals else float("nan")

    def latest(self) -> Dict[str, tuple]:
        return dict(self._latest)

    def step(self):
        self.iter += 1


class JSONWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, storage: EventStorage):
        rec = {"iteration": storage.iter}
        rec.update({k: v for k, (_, v) in storage.latest().items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class ConsoleWriter:
    def __init__(self, max_iter: int):
        self.max_iter = max_iter
        self._t0 = time.time()

    def write(self, storage: EventStorage):
        losses = {
            k: storage.median(k)
            for k in sorted(storage._history)
            if k.startswith("loss") or k.endswith("_val")
        }
        lr = storage._latest.get("lr", (0, float("nan")))[1]
        loss_str = "  ".join(f"{k}: {v:.4g}" for k, v in losses.items())
        print(
            f"iter {storage.iter}/{self.max_iter}  {loss_str}  lr: {lr:.2e}  "
            f"({time.time() - self._t0:.0f}s)",
            flush=True,
        )


class TensorboardWriter:
    """Scalar/image TensorBoard writer (the reference writes TB by default on
    rank 0, base.py:266-267). Prefers tensorboardX, falls back to
    torch.utils.tensorboard; construction raises ImportError when neither is
    available — callers wire it best-effort."""

    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            from torch.utils.tensorboard import SummaryWriter

        self._w = SummaryWriter(log_dir)

    def write(self, storage: EventStorage):
        for k, (it, v) in storage.latest().items():
            if it == storage.iter:
                self._w.add_scalar(k, v, it)

    def add_image(self, tag: str, img_hwc, step: int):
        """img_hwc: uint8 [H, W, 3] (reference put_image, meta_arch :391)."""
        self._w.add_image(tag, img_hwc, step, dataformats="HWC")

    def close(self):
        self._w.close()
