"""Orbax-backed checkpointing with detectron2-style resume_or_load semantics
(reference base.py:67-91 + DetectionTSCheckpointer: periodic save, a
`last_checkpoint` marker, resume restores step/optimizer, plain load restores
weights only)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, output_dir: str):
        self.dir = os.path.abspath(output_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def save(self, name: str, state: Any):
        path = self._path(name)
        self._ckpt.save(path, jax.device_get(state), force=True)
        with open(os.path.join(self.dir, "last_checkpoint"), "w") as f:
            f.write(name)

    def load(self, path_or_name: str, target: Optional[Any] = None) -> Any:
        path = path_or_name if os.path.isabs(path_or_name) else self._path(path_or_name)
        if target is not None:
            return self._ckpt.restore(path, item=target)
        return self._ckpt.restore(path)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.dir, "last_checkpoint"))

    def last_checkpoint(self) -> Optional[str]:
        marker = os.path.join(self.dir, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return f.read().strip()

    def resume_or_load(self, weights_path: str, target: Any, resume: bool) -> Any:
        """resume=True + existing checkpoint: restore the full train state.
        Otherwise: load weights_path (if given) into params/batch_stats only."""
        if resume and self.has_checkpoint():
            return self.load(self.last_checkpoint(), target)
        if weights_path:
            loaded = self.load(weights_path)
            return _merge_weights(target, loaded)
        return target


def _merge_weights(target: Any, loaded: Any) -> Any:
    """Copy params/batch_stats (or teacher/student variants) from a loaded
    tree into the target state, keeping step/opt_state fresh."""
    import dataclasses

    updates = {}
    for field in ("params", "batch_stats", "teacher_params", "teacher_stats"):
        if isinstance(loaded, dict) and field in loaded and hasattr(target, field):
            updates[field] = loaded[field]
    if dataclasses.is_dataclass(target) and updates:
        return dataclasses.replace(target, **updates)
    return loaded
