"""Torch/Detectron2 checkpoint -> JAX weight importer.

Replaces the reference's convert_pretrained_model/ scripts (torchvision VGG ->
detectron2 pickle, convert_vgg_bn.py:63-120) and the Caffe2 name-matching in
DetectionTSCheckpointer — and additionally enables loading the reference's
*trained* detector checkpoints for mAP-parity testing.

Layout conversions handled here:
  conv weight  : torch [O, I, kh, kw]  -> flax [kh, kw, I, O]
  linear weight: torch [O, I]          -> flax [I, O]
  first box-head FC: torch flattens pooled NCHW ([C,P,P] -> C*P*P); flax
  flattens NHWC ([P,P,C] -> P*P*C) — the input dim must be permuted, or every
  imported detection head would silently scramble (handled in _import_fc0).
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth (torch.save) or .pkl (detectron2 pickle) into numpy."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        sd = data.get("model", data.get("state_dict", data))
    return {k: _to_numpy(v) for k, v in sd.items() if not k.endswith("num_batches_tracked")}


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _fc(w):
    return np.transpose(w, (1, 0))


def _import_fc0(w: np.ndarray, pool: int, channels: int) -> np.ndarray:
    """Permute the first FC's input dim from C*P*P (NCHW flatten) to P*P*C."""
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, pool, pool)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, pool * pool * channels)
    return _fc(w)


def _import_norm(sd, key, params_dst, stats_dst, flax_name, frozen):
    """d2 norm block `<key>.norm.*` -> our _Norm submodule `flax_name`."""
    if frozen:
        params_dst[flax_name] = {
            "scale": sd[f"{key}.norm.weight"],
            "bias": sd[f"{key}.norm.bias"],
        }
        stats_dst[flax_name] = {
            "mean": sd[f"{key}.norm.running_mean"],
            "var": sd[f"{key}.norm.running_var"],
        }
    else:
        params_dst[flax_name] = {
            "BatchNorm_0": {
                "scale": sd[f"{key}.norm.weight"],
                "bias": sd[f"{key}.norm.bias"],
            }
        }
        stats_dst[flax_name] = {
            "BatchNorm_0": {
                "mean": sd[f"{key}.norm.running_mean"],
                "var": sd[f"{key}.norm.running_var"],
            }
        }


_RESNET_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _import_resnet(sd, detector_cfg, params, stats, strict):
    """detectron2 ResNet keys (backbone.stem.*, backbone.res{2..5}.{b}.*) ->
    our ResNetBackbone tree (stem_conv/stem_norm, res{s}_block{b}/...)."""
    frozen = detector_cfg.resnet_norm == "FrozenBN"
    depth = 50 if detector_cfg.backbone == "resnet50" else 101
    params["stem_conv"] = {"kernel": _conv(sd["backbone.stem.conv1.weight"])}
    _import_norm(sd, "backbone.stem.conv1", params, stats, "stem_norm", frozen)
    deepest = int(detector_cfg.in_feature[3])
    for stage, n_blocks in enumerate(_RESNET_BLOCKS[depth], start=2):
        if stage > deepest:
            break
        for b in range(n_blocks):
            src = f"backbone.res{stage}.{b}"
            dst_name = f"res{stage}_block{b}"
            if f"{src}.conv1.weight" not in sd:
                if strict:
                    raise KeyError(f"missing {src}.conv1.weight")
                continue
            block_p, block_s = {}, {}
            for i in (1, 2, 3):
                block_p[f"conv{i}"] = {"kernel": _conv(sd[f"{src}.conv{i}.weight"])}
                _import_norm(sd, f"{src}.conv{i}", block_p, block_s, f"norm{i}", frozen)
            if f"{src}.shortcut.weight" in sd:
                block_p["shortcut"] = {"kernel": _conv(sd[f"{src}.shortcut.weight"])}
                _import_norm(sd, f"{src}.shortcut", block_p, block_s, "shortcut_norm", frozen)
            params[dst_name] = block_p
            stats[dst_name] = block_s


# pytorch-AdaIN module layouts (reference style_transfer/net.py: the
# torch Sequential indices of the conv layers inside vgg_normalised /
# decoder checkpoints, reflection pads + relus interleaved)
_ADAIN_VGG_CONVS = [0, 2, 5, 9, 12, 16, 19, 22, 25, 29]  # through relu4_1
_ADAIN_VGG_NAMES = [
    "pre",
    "conv0_0", "conv0_1",
    "conv1_0", "conv1_1",
    "conv2_0", "conv2_1", "conv2_2", "conv2_3",
    "conv3_0",
]
_ADAIN_DEC_CONVS = [1, 5, 8, 11, 14, 18, 21, 25, 28]
_ADAIN_DEC_NAMES = [
    "conv0_0",
    "conv1_0", "conv1_1", "conv1_2",
    "conv2_0", "conv3_0", "conv4_0", "conv5_0",
    "out",
]


def import_adain_encoder(sd: Dict[str, np.ndarray]) -> Dict:
    """vgg_normalised.pth (sequential '<idx>.weight') -> StyleEncoder params."""
    params = {}
    for idx, name in zip(_ADAIN_VGG_CONVS, _ADAIN_VGG_NAMES):
        params[name] = {
            "kernel": _conv(sd[f"{idx}.weight"]),
            "bias": sd[f"{idx}.bias"],
        }
    return params


def import_adain_decoder(sd: Dict[str, np.ndarray]) -> Dict:
    """decoder_iter_*.pth(.tar) -> StyleDecoder params."""
    params = {}
    for idx, name in zip(_ADAIN_DEC_CONVS, _ADAIN_DEC_NAMES):
        params[name] = {
            "kernel": _conv(sd[f"{idx}.weight"]),
            "bias": sd[f"{idx}.bias"],
        }
    return params


# torchvision vgg16_bn `features.*` conv indices in definition order
_TV_VGG16_BN_CONVS = [0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40]
_TV_VGG16_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
# detectron2-style stage-module keys produced by the reference's converter
# (convert_vgg_bn.py): backbone.vgg{stage}.{idx}.weight; per-stage conv module
# indices for the BN layout (conv,bn,relu triplets + trailing pool)
_D2_STAGE_CONVS_BN = [(0, 3), (0, 3), (0, 3, 6), (0, 3, 6), (0, 3, 6)]
_D2_STAGE_BNS_BN = [(1, 4), (1, 4), (1, 4, 7), (1, 4, 7), (1, 4, 7)]
# Without BN the reference's FIXED slice boundaries (meta_arch/vgg.py:70-74,
# tuned for the 3-modules-per-conv BN layout) re-partition the 31-module
# sequence so pools land mid-stage and stage 4 is EMPTY: stage0 = 2 convs +
# pool + 1 conv, ..., stage3 ends the net, stage4 = identity. The COMPOSED
# network is still canonical VGG16 (13 convs, pools after convs 2/4/7/10/13),
# so our canonical-stage backbone computes the identical "vgg4" feature —
# only the checkpoint's per-stage conv indices shift:
_D2_STAGE_CONVS_NOBN = [(0, 2, 5), (0, 3, 5), (0, 3, 5, 7), (0, 2, 4), ()]


def import_torchvision_vgg(
    sd: Dict[str, np.ndarray], bn: bool = True
) -> Tuple[Dict, Dict]:
    """torchvision vgg16(_bn) `features.*` state_dict -> (params, batch_stats)
    for our VGG16Backbone (conv0..conv12 / bn0..bn12)."""
    convs = _TV_VGG16_BN_CONVS if bn else _TV_VGG16_CONVS
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, idx in enumerate(convs):
        params[f"conv{i}"] = {
            "kernel": _conv(sd[f"features.{idx}.weight"]),
            "bias": sd[f"features.{idx}.bias"],
        }
        if bn:
            params[f"bn{i}"] = {
                "scale": sd[f"features.{idx + 1}.weight"],
                "bias": sd[f"features.{idx + 1}.bias"],
            }
            stats[f"bn{i}"] = {
                "mean": sd[f"features.{idx + 1}.running_mean"],
                "var": sd[f"features.{idx + 1}.running_var"],
            }
    return params, stats


def import_torch_checkpoint(
    sd: Dict[str, np.ndarray],
    detector_cfg,
    strict: bool = True,
) -> Tuple[Dict, Dict]:
    """Full detector state_dict (reference daod/detectron2 naming) ->
    (params, batch_stats) matching models/FasterRCNN.

    Handles the EnsembleTSModel prefixes (modelTeacher./modelStudent. —
    student taken) and DDP 'module.' prefixes, like the reference's
    DetectionTSCheckpointer._load_student_model.
    """
    # strip wrappers
    if any(k.startswith("modelStudent.") for k in sd):
        sd = {k[len("modelStudent."):]: v for k, v in sd.items() if k.startswith("modelStudent.")}
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}

    params: Dict[str, Any] = {"backbone": {}, "rpn_head": {}, "box_head": {}, "predictor": {}}
    stats: Dict[str, Any] = {"backbone": {}}

    if detector_cfg.backbone == "vgg16":
        bn = detector_cfg.vgg_bn
        conv_i = 0
        stage_convs = _D2_STAGE_CONVS_BN if bn else _D2_STAGE_CONVS_NOBN
        for stage, conv_idxs in enumerate(stage_convs):
            for j, idx in enumerate(conv_idxs):
                key = f"backbone.vgg{stage}.{idx}"
                if f"{key}.weight" not in sd:
                    if strict:
                        raise KeyError(f"missing {key}.weight")
                    conv_i += 1
                    continue
                params["backbone"][f"conv{conv_i}"] = {
                    "kernel": _conv(sd[f"{key}.weight"]),
                    "bias": sd[f"{key}.bias"],
                }
                if bn:
                    bkey = f"backbone.vgg{stage}.{_D2_STAGE_BNS_BN[stage][j]}"
                    params["backbone"][f"bn{conv_i}"] = {
                        "scale": sd[f"{bkey}.weight"],
                        "bias": sd[f"{bkey}.bias"],
                    }
                    stats["backbone"][f"bn{conv_i}"] = {
                        "mean": sd[f"{bkey}.running_mean"],
                        "var": sd[f"{bkey}.running_var"],
                    }
                conv_i += 1
    elif detector_cfg.backbone in ("resnet50", "resnet101"):
        _import_resnet(sd, detector_cfg, params["backbone"], stats["backbone"], strict)
    else:
        raise NotImplementedError(f"unknown backbone {detector_cfg.backbone}")

    # RPN head (d2: proposal_generator.rpn_head.{conv,objectness_logits,anchor_deltas})
    m = {
        "conv": "proposal_generator.rpn_head.conv",
        "objectness": "proposal_generator.rpn_head.objectness_logits",
        "deltas": "proposal_generator.rpn_head.anchor_deltas",
    }
    for ours, theirs in m.items():
        if f"{theirs}.weight" in sd:
            params["rpn_head"][ours] = {
                "kernel": _conv(sd[f"{theirs}.weight"]),
                "bias": sd[f"{theirs}.bias"],
            }
        elif strict:
            raise KeyError(f"missing {theirs}.weight")

    # box head (d2: roi_heads.box_head.fc1/fc2), predictor (cls_score/bbox_pred)
    pool = detector_cfg.pooler_resolution
    chans = detector_cfg.feature_channels
    for i in range(detector_cfg.num_fc):
        key = f"roi_heads.box_head.fc{i + 1}"
        if f"{key}.weight" not in sd:
            if strict:
                raise KeyError(f"missing {key}.weight")
            continue
        w = sd[f"{key}.weight"]
        params["box_head"][f"fc{i}"] = {
            "kernel": _import_fc0(w, pool, chans) if i == 0 else _fc(w),
            "bias": sd[f"{key}.bias"],
        }
    for ours, theirs in (("cls_score", "roi_heads.box_predictor.cls_score"), ("bbox_pred", "roi_heads.box_predictor.bbox_pred")):
        if f"{theirs}.weight" in sd:
            params["predictor"][ours] = {
                "kernel": _fc(sd[f"{theirs}.weight"]),
                "bias": sd[f"{theirs}.bias"],
            }
        elif strict:
            raise KeyError(f"missing {theirs}.weight")

    return params, stats
