#!/usr/bin/env python
"""Import torch/detectron2 checkpoints into orbax train states (replaces the
reference's convert_pretrained_model/ scripts and enables loading its trained
detectors for parity evaluation).

Usage:
  # torchvision VGG16-BN backbone init:
  python tools/import_weights.py --torch vgg16_bn.pth --kind torchvision_vgg \
      --config-file configs/faster_rcnn_VGG_cityscapes_source_new.yaml --output weights/vgg16_bn

  # full reference detector checkpoint (.pth from daod / detectron2):
  python tools/import_weights.py --torch model_final.pth --kind detector \
      --config-file configs/faster_rcnn_VGG_cityscapes_foggy_test.yaml --output weights/source_model
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True, help=".pth or .pkl file")
    ap.add_argument("--kind", choices=["torchvision_vgg", "detector"], required=True)
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--output", required=True, help="orbax checkpoint dir")
    args = ap.parse_args()

    from simple_sfod_tpu.checkpoint.torch_import import (
        import_torch_checkpoint,
        import_torchvision_vgg,
        load_torch_file,
    )
    from simple_sfod_tpu.checkpoint.checkpointer import Checkpointer
    from simple_sfod_tpu.config import get_cfg, detector_config_from_cfg

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file, allow_new=True)
    det_cfg = detector_config_from_cfg(cfg)

    sd = load_torch_file(args.torch)
    if args.kind == "torchvision_vgg":
        backbone_params, backbone_stats = import_torchvision_vgg(sd, bn=cfg.VGG.BN)
        # initialise the rest of the detector fresh, splice the backbone in
        import jax

        from simple_sfod_tpu.models.detector import Detector

        det = Detector(det_cfg)
        variables = det.init(jax.random.key(0), tuple(cfg.TPU.CANVAS))
        params = dict(variables["params"])
        stats = dict(variables.get("batch_stats", {}))
        params["backbone"] = backbone_params
        stats["backbone"] = backbone_stats
    else:
        params, stats = import_torch_checkpoint(sd, det_cfg)

    ckpt = Checkpointer(os.path.dirname(args.output) or ".")
    ckpt.save(os.path.basename(args.output), {"params": params, "batch_stats": stats})
    print(f"imported {args.torch} -> {args.output}")


if __name__ == "__main__":
    main()
