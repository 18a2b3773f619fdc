"""JAX -> Torch/Detectron2 checkpoint exporter (inverse of torch_import).

The reference's training artifact is a `.pth` directly consumable by its own
eval stack (reference daod/checkpoint/detection_ts_checkpointer.py:11-90 loads
the plain-detector or EnsembleTSModel state dict saved by fvcore's
Checkpointer: ``torch.save({"model": sd, "iteration": N}, f)``). This module
emits that exact artifact from our flax (params, batch_stats) trees, so a
JAX-trained checkpoint can be handed to the reference stack for off-box
absolute-mAP validation.

Layout conversions (each the exact inverse of torch_import):
  conv kernel : flax [kh, kw, I, O] -> torch [O, I, kh, kw]
  linear      : flax [I, O]         -> torch [O, I]
  first box-head FC: flax flattens pooled NHWC (P*P*C); torch flattens NCHW
  (C*P*P) — the input dim is un-permuted in _export_fc0.

BatchNorm running stats are exported VERBATIM. The flax/torch n/(n-1)
running-var semantic (PARITY_EVIDENCE "AdaBN recompute": flax accumulates the
biased batch var, torch the unbiased one) is a *training-dynamics* delta — the
stats stored in a finished checkpoint are just numbers, and eval-side parity
requires normalizing with the SAME numbers, so no correction is applied (nor
could one be, without the per-layer update count and batch element count).
`num_batches_tracked` is emitted as 0 for every BN layer so torch's strict
`load_state_dict` accepts the exported dict.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .torch_import import (
    _D2_STAGE_BNS_BN,
    _D2_STAGE_CONVS_BN,
    _D2_STAGE_CONVS_NOBN,
    _RESNET_BLOCKS,
)


def _np(x) -> np.ndarray:
    """Materialize a (possibly device/bf16) leaf as float32 numpy — torch has
    no bfloat16-from-numpy path and the reference stack evals in f32."""
    a = np.asarray(x)
    if a.dtype != np.float32:
        a = a.astype(np.float32)
    return a


def _deconv(w) -> np.ndarray:
    return np.transpose(_np(w), (3, 2, 0, 1))


def _defc(w) -> np.ndarray:
    return np.transpose(_np(w), (1, 0))


def _export_fc0(w, pool: int, channels: int) -> np.ndarray:
    """Un-permute the first FC's input dim from P*P*C (NHWC flatten) back to
    C*P*P (NCHW flatten). Inverse of torch_import._import_fc0."""
    w = _defc(w)  # [out, P*P*C]
    out_dim = w.shape[0]
    w = w.reshape(out_dim, pool, pool, channels)
    return np.transpose(w, (0, 3, 1, 2)).reshape(out_dim, channels * pool * pool)


def _export_bn(sd: Dict[str, np.ndarray], key: str, scale, bias, mean, var) -> None:
    sd[f"{key}.weight"] = _np(scale)
    sd[f"{key}.bias"] = _np(bias)
    sd[f"{key}.running_mean"] = _np(mean)
    sd[f"{key}.running_var"] = _np(var)
    sd[f"{key}.num_batches_tracked"] = np.zeros((), np.int64)


def _export_norm(sd, key, params_src, stats_src, flax_name, frozen) -> None:
    """Inverse of torch_import._import_norm: our _Norm submodule -> d2
    `<key>.norm.*` block (frozen = flat scale/bias, else nested BatchNorm_0)."""
    p = params_src[flax_name]
    s = stats_src[flax_name]
    if not frozen:
        p, s = p["BatchNorm_0"], s["BatchNorm_0"]
    _export_bn(sd, f"{key}.norm", p["scale"], p["bias"], s["mean"], s["var"])


def _export_resnet(params, stats, detector_cfg, sd) -> None:
    """Inverse of torch_import._import_resnet (d2 backbone.stem/res{2..5})."""
    frozen = detector_cfg.resnet_norm == "FrozenBN"
    depth = 50 if detector_cfg.backbone == "resnet50" else 101
    sd["backbone.stem.conv1.weight"] = _deconv(params["stem_conv"]["kernel"])
    _export_norm(sd, "backbone.stem.conv1", params, stats, "stem_norm", frozen)
    deepest = int(detector_cfg.in_feature[3])
    for stage, n_blocks in enumerate(_RESNET_BLOCKS[depth], start=2):
        if stage > deepest:
            break
        for b in range(n_blocks):
            src_name = f"res{stage}_block{b}"
            if src_name not in params:
                continue
            block_p, block_s = params[src_name], stats[src_name]
            dst = f"backbone.res{stage}.{b}"
            for i in (1, 2, 3):
                sd[f"{dst}.conv{i}.weight"] = _deconv(block_p[f"conv{i}"]["kernel"])
                _export_norm(sd, f"{dst}.conv{i}", block_p, block_s, f"norm{i}", frozen)
            if "shortcut" in block_p:
                sd[f"{dst}.shortcut.weight"] = _deconv(block_p["shortcut"]["kernel"])
                _export_norm(sd, f"{dst}.shortcut", block_p, block_s, "shortcut_norm", frozen)


def export_torch_checkpoint(
    params: Dict[str, Any],
    stats: Dict[str, Any],
    detector_cfg,
) -> Dict[str, np.ndarray]:
    """Flax FasterRCNN (params, batch_stats) -> reference/detectron2-named
    state dict (the exact key set torch_import.import_torch_checkpoint
    consumes, plus num_batches_tracked buffers)."""
    sd: Dict[str, np.ndarray] = {}

    if detector_cfg.backbone == "vgg16":
        bn = detector_cfg.vgg_bn
        bp, bs = params["backbone"], stats.get("backbone", {})
        conv_i = 0
        stage_convs = _D2_STAGE_CONVS_BN if bn else _D2_STAGE_CONVS_NOBN
        for stage, conv_idxs in enumerate(stage_convs):
            for j, idx in enumerate(conv_idxs):
                key = f"backbone.vgg{stage}.{idx}"
                conv = bp[f"conv{conv_i}"]
                sd[f"{key}.weight"] = _deconv(conv["kernel"])
                sd[f"{key}.bias"] = _np(conv["bias"])
                if bn:
                    bkey = f"backbone.vgg{stage}.{_D2_STAGE_BNS_BN[stage][j]}"
                    _export_bn(
                        sd, bkey,
                        bp[f"bn{conv_i}"]["scale"], bp[f"bn{conv_i}"]["bias"],
                        bs[f"bn{conv_i}"]["mean"], bs[f"bn{conv_i}"]["var"],
                    )
                conv_i += 1
    elif detector_cfg.backbone in ("resnet50", "resnet101"):
        _export_resnet(params["backbone"], stats.get("backbone", {}), detector_cfg, sd)
    else:
        raise NotImplementedError(
            f"no reference naming exists for backbone {detector_cfg.backbone!r} "
            "(vgg16/resnet50/resnet101 are exportable)"
        )

    rpn = params["rpn_head"]
    for ours, theirs in (
        ("conv", "proposal_generator.rpn_head.conv"),
        ("objectness", "proposal_generator.rpn_head.objectness_logits"),
        ("deltas", "proposal_generator.rpn_head.anchor_deltas"),
    ):
        sd[f"{theirs}.weight"] = _deconv(rpn[ours]["kernel"])
        sd[f"{theirs}.bias"] = _np(rpn[ours]["bias"])

    pool = detector_cfg.pooler_resolution
    chans = detector_cfg.feature_channels
    for i in range(detector_cfg.num_fc):
        fc = params["box_head"][f"fc{i}"]
        key = f"roi_heads.box_head.fc{i + 1}"
        sd[f"{key}.weight"] = (
            _export_fc0(fc["kernel"], pool, chans) if i == 0 else _defc(fc["kernel"])
        )
        sd[f"{key}.bias"] = _np(fc["bias"])
    for ours, theirs in (
        ("cls_score", "roi_heads.box_predictor.cls_score"),
        ("bbox_pred", "roi_heads.box_predictor.bbox_pred"),
    ):
        sd[f"{theirs}.weight"] = _defc(params["predictor"][ours]["kernel"])
        sd[f"{theirs}.bias"] = _np(params["predictor"][ours]["bias"])

    # pixel_mean/std buffers: present in every d2 GeneralizedRCNN state dict;
    # the reference loader re-derives them from config when absent, but
    # emitting them makes strict consumers happy too. d2 stores [C,1,1] BGR.
    pm = np.asarray(detector_cfg.pixel_mean, np.float32).reshape(3, 1, 1)
    ps = np.asarray(detector_cfg.pixel_std, np.float32).reshape(3, 1, 1)
    sd["pixel_mean"] = pm
    sd["pixel_std"] = ps
    return sd


def export_ensemble(
    student_params: Dict[str, Any],
    student_stats: Dict[str, Any],
    teacher_params: Dict[str, Any],
    teacher_stats: Dict[str, Any],
    detector_cfg,
) -> Dict[str, np.ndarray]:
    """Teacher-student pair -> EnsembleTSModel state dict (modelTeacher./
    modelStudent. prefixes, reference ts_ensemble.py + what
    DetectionTSCheckpointer saves for the MT trainers)."""
    sd: Dict[str, np.ndarray] = {}
    teacher = export_torch_checkpoint(teacher_params, teacher_stats, detector_cfg)
    student = export_torch_checkpoint(student_params, student_stats, detector_cfg)
    # reference EnsembleTSModel registers modelTeacher first (ts_ensemble.py)
    for k, v in teacher.items():
        sd[f"modelTeacher.{k}"] = v
    for k, v in student.items():
        sd[f"modelStudent.{k}"] = v
    return sd


def export_train_state(
    state: Any,
    detector_cfg,
    which: str = "auto",
) -> Dict[str, np.ndarray]:
    """Extract the detector tree(s) from a TrainState/TeacherStudentState
    (or the raw dict orbax restores) and export.

    which: "auto" (ensemble when the state has a teacher, else plain),
    "student"/"teacher" (plain dict from that copy), "ensemble".
    """
    get = (lambda k, d=None: state.get(k, d)) if isinstance(state, dict) else (
        lambda k, d=None: getattr(state, k, d)
    )
    params = get("params")
    stats = get("batch_stats", {}) or {}
    det_p = params["det"] if isinstance(params, dict) and "det" in params else params
    teacher_p = get("teacher_params")
    teacher_s = get("teacher_stats", {}) or {}

    if which == "auto":
        which = "ensemble" if teacher_p is not None else "student"
    if which == "student":
        return export_torch_checkpoint(det_p, stats, detector_cfg)
    if which == "teacher":
        if teacher_p is None:
            raise ValueError("state has no teacher_params; cannot export teacher")
        return export_torch_checkpoint(teacher_p, teacher_s, detector_cfg)
    if which == "ensemble":
        if teacher_p is None:
            raise ValueError("state has no teacher_params; cannot export ensemble")
        return export_ensemble(det_p, stats, teacher_p, teacher_s, detector_cfg)
    raise ValueError(f"which={which!r} (expected auto|student|teacher|ensemble)")


def save_torch_file(
    sd: Dict[str, np.ndarray], path: str, iteration: Optional[int] = None
) -> None:
    """Write the fvcore-Checkpointer wrapper the reference stack reads:
    torch.save({"model": <tensors>, "iteration": N}) (fvcore Checkpointer.save;
    DetectionTSCheckpointer._load_model pops checkpoint["model"])."""
    import torch

    data: Dict[str, Any] = {
        "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    }
    if iteration is not None:
        data["iteration"] = int(iteration)
    torch.save(data, path)
