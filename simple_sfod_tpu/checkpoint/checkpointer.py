"""Orbax-backed checkpointing with detectron2-style resume_or_load semantics
(reference base.py:67-91 + DetectionTSCheckpointer: periodic save, a
`last_checkpoint` marker, resume restores step/optimizer, plain load restores
weights only)."""

from __future__ import annotations

import os
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, output_dir: str, det_cfg: Optional[Any] = None):
        self.dir = os.path.abspath(output_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt_impl: Optional[ocp.Checkpointer] = None
        # DetectorConfig enabling direct MODEL.WEIGHTS = *.pth/*.pkl loading
        # (reference detection_ts_checkpointer.py:12-90 consumes torch files
        # with name-matching heuristics)
        self.det_cfg = det_cfg
        self._pending: Optional[threading.Thread] = None
        self._save_err: Optional[BaseException] = None

    @property
    def _ckpt(self) -> ocp.Checkpointer:
        """Orbax checkpointer, built lazily (after any jax.distributed init).

        Multi-process: orbax's own save/restore barriers span every process
        by default, while this class enforces single-writer semantics (only
        process 0 enters save) — rank 0 would deadlock at orbax's
        'Checkpointer:save_start' barrier waiting for ranks that never call
        it. Scoping each rank's orbax instance to ITSELF
        (active_processes={me}, primary_host=me) makes every orbax barrier
        trivial and every blob write local; cross-process coordination
        stays where this framework owns it (replicated state + rank-0
        writer + shared filesystem). Handler options mirror
        PyTreeCheckpointer's defaults so single- and multi-process runs
        read each other's checkpoints."""
        if self._ckpt_impl is None:
            if jax.process_count() > 1:
                me = jax.process_index()
                self._ckpt_impl = ocp.Checkpointer(
                    ocp.PyTreeCheckpointHandler(
                        use_ocdbt=True, use_zarr3=False
                    ),
                    multiprocessing_options=ocp.options.MultiprocessingOptions(
                        primary_host=me, active_processes={me}
                    ),
                )
            else:
                self._ckpt_impl = ocp.PyTreeCheckpointer()
        return self._ckpt_impl

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def wait(self):
        """Block until any in-flight async save is durable; re-raise its
        error (a failed checkpoint must not be silently lost)."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._save_err is not None:
            err, self._save_err = self._save_err, None
            raise err

    def save(self, name: str, state: Any, block: bool = True):
        """Save `state`; durable on return by default. block=False (the
        train loop's PERIODIC saves) snapshots to host here but writes the
        blob on a background thread so the loop doesn't stall for the disk —
        the `last_checkpoint` marker is written only AFTER the blob is
        complete (resume can never see a half-written checkpoint), the
        thread is non-daemon (process exit waits for durability), and every
        other Checkpointer entry point joins it first. Cross-INSTANCE readers
        in the same process should use the default durable mode.

        Multi-process: single-writer. The train state is replicated (or its
        shards reconstructible) across processes, so only process 0 persists
        it — concurrent orbax saves from every rank into the same directory
        would race on the blob and the marker (reference: d2 checkpoints on
        the main process only). Every rank calls save() at the same loop
        point (the train loop runs on all processes), so a collective
        barrier below is safe — and REQUIRED: without it a non-writer rank
        has no durability signal and can read a stale or in-flight
        `last_checkpoint` marker while rank 0 is still writing, silently
        restoring diverged steps across ranks. Multi-process saves are
        forced synchronous for the same reason (an async blob would leave
        the barrier meaningless)."""
        if jax.process_count() > 1:
            if jax.process_index() == 0:
                host_state = jax.device_get(state)
                self.wait()
                try:
                    self._ckpt.save(self._path(name), host_state, force=True)
                    with open(os.path.join(self.dir, "last_checkpoint"), "w") as f:
                        f.write(name)
                finally:
                    # peers must not deadlock on a failed writer; the error
                    # propagates on rank 0 after the barrier releases them
                    from jax.experimental import multihost_utils

                    multihost_utils.sync_global_devices(f"sfod-ckpt-{name}")
            else:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"sfod-ckpt-{name}")
            return
        host_state = jax.device_get(state)  # materializes the step's result
        self.wait()  # one save in flight at a time; surfaces earlier errors
        path = self._path(name)

        def work():
            try:
                self._ckpt.save(path, host_state, force=True)
                with open(os.path.join(self.dir, "last_checkpoint"), "w") as f:
                    f.write(name)
            except BaseException as e:
                self._save_err = e

        self._pending = threading.Thread(
            target=work, daemon=False, name="sfod-ckpt-save"
        )
        self._pending.start()
        if block:
            self.wait()

    def load(self, path_or_name: str, target: Optional[Any] = None) -> Any:
        self.wait()
        path = path_or_name if os.path.isabs(path_or_name) else self._path(path_or_name)
        if target is not None:
            return self._ckpt.restore(path, item=target)
        return self._ckpt.restore(path)

    def has_checkpoint(self) -> bool:
        self.wait()
        return os.path.exists(os.path.join(self.dir, "last_checkpoint"))

    def last_checkpoint(self) -> Optional[str]:
        self.wait()
        marker = os.path.join(self.dir, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return f.read().strip()

    def resume_or_load(self, weights_path: str, target: Any, resume: bool) -> Any:
        """resume=True + existing checkpoint: restore the full train state.
        Otherwise: load weights_path (if given) into params/batch_stats only.
        Torch files (.pth/.pt/.pkl/.pth.tar) are routed through the importer,
        so a reference YAML's `MODEL.WEIGHTS: .../model.pth` loads directly
        (reference DetectionTSCheckpointer._load_model behavior)."""
        if resume and self.has_checkpoint():
            return self.load(self.last_checkpoint(), target)
        if weights_path:
            if _is_torch_file(weights_path):
                return self._load_torch(weights_path, target)
            loaded = self.load(weights_path)
            return _merge_weights(target, loaded)
        return target

    def _load_torch(self, weights_path: str, target: Any) -> Any:
        """Import a torch/detectron2 checkpoint into the target train state.
        Non-strict like the reference's name-matching heuristics: present
        tensors load, absent ones keep their fresh initialisation. For
        teacher-student states BOTH copies start from the source checkpoint
        (reference sfat.py:50-64), with distinct buffers (donation-safe)."""
        if self.det_cfg is None:
            raise ValueError(
                f"MODEL.WEIGHTS={weights_path!r} is a torch file but this "
                "Checkpointer has no det_cfg; pass DetectorConfig at "
                "construction or convert via tools/import_weights.py"
            )
        from .torch_import import import_torch_checkpoint, load_torch_file

        sd = load_torch_file(weights_path)
        params, stats = import_torch_checkpoint(sd, self.det_cfg, strict=False)
        return _merge_torch(target, params, stats)


def _is_torch_file(path: str) -> bool:
    return path.endswith((".pth", ".pt", ".pkl", ".pth.tar"))


def _overlay(base: Any, new: Any, copy: bool = False) -> Any:
    """Recursively replace leaves of `base` with same-named leaves of `new`;
    keys absent from `new` keep their base values (non-strict import).
    Shape- and structure-checked: a checkpoint leaf whose shape disagrees
    with the target (e.g. chaining stages with different NUM_CLASSES/FC_DIM)
    keeps the fresh init with a warning, instead of being spliced in
    verbatim and failing later as an opaque XLA shape/donation error —
    the reference's name-matching load skips shape mismatches the same way."""
    import jax.numpy as jnp

    if isinstance(base, dict):
        if new is not None and not isinstance(new, dict):
            print(f"[checkpoint] skipping leaf-for-subtree mismatch (kept init)")
            return base
        out = dict(base)
        for k, v in (new or {}).items():
            if k in out:
                out[k] = _overlay(out[k], v, copy)
        return out
    if new is None:
        return base
    if isinstance(new, dict):
        print(f"[checkpoint] skipping subtree-for-leaf mismatch (kept init)")
        return base
    base_shape = getattr(base, "shape", None)
    # np.shape: zero-copy (checkpoint leaves are host numpy; jnp.asarray here
    # would upload ~0.5 GB to the device once per load just to read .shape)
    import numpy as _np

    new_shape = _np.shape(new)
    if base_shape is not None and new_shape != base_shape:
        print(
            f"[checkpoint] shape mismatch {new_shape} vs target {base_shape}; "
            "keeping fresh init for this leaf"
        )
        return base
    # preserve the target leaf's dtype (e.g. a bf16 fixed-teacher tree)
    dtype = getattr(base, "dtype", None)
    arr = jnp.asarray(new, dtype=dtype)
    return jnp.array(arr, copy=True) if copy else arr


def _merge_torch(target: Any, params: Any, stats: Any) -> Any:
    """Splice imported (params, batch_stats) into a TrainState or
    TeacherStudentState pytree."""
    import dataclasses

    updates = {}
    tparams = target.params
    if isinstance(tparams, dict) and "det" in tparams:
        new_p = dict(tparams)
        new_p["det"] = _overlay(tparams["det"], params)
        updates["params"] = new_p
    else:
        updates["params"] = _overlay(tparams, params)
    if hasattr(target, "batch_stats"):
        updates["batch_stats"] = _overlay(target.batch_stats, stats)
    if hasattr(target, "teacher_params"):
        # copy=True: teacher must not alias student buffers (the jitted step
        # donates the whole state)
        updates["teacher_params"] = _overlay(target.teacher_params, params, copy=True)
        updates["teacher_stats"] = _overlay(target.teacher_stats, stats, copy=True)
    if dataclasses.is_dataclass(target):
        return dataclasses.replace(target, **updates)
    out = dict(target)
    out.update(updates)
    return out


def _merge_weights(target: Any, loaded: Any) -> Any:
    """Copy weights from a loaded train-state tree into the target state,
    keeping step/opt_state fresh — STRUCTURE-AWARE across trainer types
    (the reference's DetectionTSCheckpointer load is similarly promiscuous:
    any stage's model_final feeds any later stage, WORKFLOWS §1-4):

      * base/wq checkpoints keep detector params at the top level; DC and
        teacher-student trainers nest them under params["det"] — the
        detector tree is unwrapped/rewrapped to fit the target.
      * extra param groups present in both (dc, dc_ins, da_*) overlay by
        name; groups absent from the checkpoint keep their fresh init
        (non-strict, like the torch import path).
      * teacher copies load from the checkpoint's teacher if it has one,
        else BOTH teacher and student start from the checkpoint's detector
        (reference sfat.py:50-64), with distinct buffers (donation-safe).
    """
    import dataclasses

    if not (isinstance(loaded, dict) and "params" in loaded):
        # raw variables tree (not a saved train state)
        return loaded

    loaded_params = loaded["params"]
    det_p = (
        loaded_params["det"]
        if isinstance(loaded_params, dict) and "det" in loaded_params
        else loaded_params
    )
    stats = loaded.get("batch_stats", {})
    teacher_p = loaded.get("teacher_params", det_p)
    teacher_s = loaded.get("teacher_stats", stats)

    updates = {}
    tparams = target.params
    if isinstance(tparams, dict) and "det" in tparams:
        new_p = dict(tparams)
        new_p["det"] = _overlay(tparams["det"], det_p)
        for k in new_p:
            if k != "det" and isinstance(loaded_params, dict) and k in loaded_params:
                new_p[k] = _overlay(new_p[k], loaded_params[k])
        updates["params"] = new_p
    else:
        updates["params"] = _overlay(tparams, det_p)
    if hasattr(target, "batch_stats"):
        updates["batch_stats"] = _overlay(target.batch_stats, stats)
    if hasattr(target, "teacher_params"):
        updates["teacher_params"] = _overlay(target.teacher_params, teacher_p, copy=True)
        updates["teacher_stats"] = _overlay(target.teacher_stats, teacher_s, copy=True)
    if dataclasses.is_dataclass(target):
        return dataclasses.replace(target, **updates)
    out = dict(target)
    out.update(updates)
    return out
