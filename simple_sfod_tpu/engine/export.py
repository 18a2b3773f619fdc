"""Serialized serving artifacts: AOT export of the detector's inference path.

The reference deploys a trained/adapted detector by re-running its eval CLI
inside the full training codebase (/root/reference/train_net.py:79 `--eval-only`
re-imports detectron2, rebuilds the model, reloads the checkpoint); it ships no
standalone serving artifact. On TPU the natural deployment unit is the compiled
program itself: `jax.export` lowers the jitted inference function to StableHLO
once, serializes it into one portable blob — with the weights baked in as
constants (self-contained, the default) or passed at call time — and any JAX
process reloads and runs it WITHOUT this package's model-building code. The
batch dimension can be left symbolic so one artifact serves every batch size.

Inputs/outputs use only plain types so nothing in the calling convention
depends on this package:
    images uint8 [B, H, W, 3]  (the loaders' canvas layout; the model does the
                                wraparound-safe uint8 -> f32 mean subtraction,
                                models/faster_rcnn.py `features`)
    sizes  int32 [B, 2]        (valid h, w inside the padded canvas)
->  {"boxes": f32 [B, K, 4], "scores": f32 [B, K], "classes": i32 [B, K],
     "valid": bool [B, K]}     (fixed-capacity masked detections, K =
                                TEST.DETECTIONS_PER_IMAGE)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

# Artifact file layout: MAGIC, u64-le metadata length, metadata JSON (the
# serving context: canvas, resize rule, pixel format, class names), then
# jax.export's (internally versioned) serialized Exported.
_MAGIC = b"SFODX1\n"


def cast_floating(variables, dtype):
    """Cast every floating leaf of a params pytree to `dtype` (ints/bools
    untouched). The export-time weight cast behind params_dtype."""
    target = jnp.dtype(dtype)
    return jax.tree.map(
        lambda a: a.astype(target)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else a,
        variables,
    )


def detection_infer_fn(detector, train_mode_bn: bool = False):
    """The detector's standard inference as a plain-pytree function.

    Returns dicts (not the package's Instances pytree) so the exported
    calling convention carries no custom pytree registrations."""

    def infer(variables, images, sizes):
        dets = detector.infer(variables, images, sizes, train_mode_bn=train_mode_bn)
        return {
            "boxes": dets.boxes,
            "scores": dets.scores,
            "classes": dets.classes,
            "valid": dets.valid,
        }

    return infer


def export_inference(
    detector,
    variables,
    canvas_hw: Tuple[int, int],
    *,
    batch: Optional[int] = 1,
    bundle_params: bool = True,
    platforms: Optional[Sequence[str]] = None,
    train_mode_bn: bool = False,
    params_dtype: Optional[str] = None,
) -> "jax_export.Exported":
    """Lower + export the inference function for `canvas_hw` canvases.

    batch=None leaves the batch dimension symbolic ("b"): the artifact then
    accepts any batch size at call time. bundle_params=True closes over
    `variables`, baking the weights into the StableHLO as constants — the blob
    is self-contained; bundle_params=False keeps them as a call-time argument
    (same pytree structure as `variables`). `platforms` pins the lowering
    platforms (e.g. ("tpu", "cpu")); default is the current default backend.
    params_dtype="bfloat16" casts float params before export — halves the
    self-contained blob, matching the trainers' bf16 fixed-teacher option
    (engine/train_state.py); compute dtype is whatever the detector's graph
    already uses (TPU.DTYPE).
    """
    if params_dtype:
        variables = cast_floating(variables, params_dtype)
    h, w = int(canvas_hw[0]), int(canvas_hw[1])
    b = jax_export.symbolic_shape("b")[0] if batch is None else int(batch)
    img_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    size_spec = jax.ShapeDtypeStruct((b, 2), jnp.int32)
    fn = detection_infer_fn(detector, train_mode_bn=train_mode_bn)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    if bundle_params:
        jfn = jax.jit(lambda images, sizes: fn(variables, images, sizes))
        return jax_export.export(jfn, **kwargs)(img_spec, size_spec)
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), variables
    )
    return jax_export.export(jax.jit(fn), **kwargs)(var_spec, img_spec, size_spec)


def save_exported(
    exported: "jax_export.Exported", path: str, meta: Optional[dict] = None
) -> int:
    """Serialize an Exported (+ JSON-able serving metadata) to `path`;
    returns the byte size written."""
    import json
    import struct

    meta_blob = json.dumps(meta or {}).encode()
    blob = _MAGIC + struct.pack("<Q", len(meta_blob)) + meta_blob + exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str) -> Tuple["jax_export.Exported", dict]:
    """Reload a serialized artifact -> (Exported, metadata). `Exported.call`
    runs it (jittable, shardable — a regular JAX callable on the loading
    side)."""
    import json
    import struct

    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(_MAGIC):
        raise ValueError(f"{path} is not a simple_sfod_tpu exported model")
    off = len(_MAGIC)
    (meta_len,) = struct.unpack("<Q", blob[off : off + 8])
    off += 8
    meta = json.loads(blob[off : off + meta_len].decode())
    return jax_export.deserialize(blob[off + meta_len :]), meta
