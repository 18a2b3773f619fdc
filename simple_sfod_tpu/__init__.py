"""simple_sfod_tpu — TPU-native source-free domain-adaptive object detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EPFL-IMOS/simple-SFOD (ECCV 2024, "Simplifying Source-Free Domain Adaptation
for Object Detection"): Faster R-CNN (VGG16 / ResNet-101 backbones), AdaBN,
fixed-pseudo-label self-training, and mean-/adaptive-teacher self-training —
all expressed as pure jitted functions over static-shape pytrees, data-parallel
via `jax.sharding.Mesh`.

Layout:
    structures/  fixed-capacity box/instance containers (masked, static shapes)
    ops/         detection kernels: IoU, NMS, ROIAlign, anchors, matching, sampling
    models/      flax backbones (VGG16±BN, ResNet), RPN, ROI heads, discriminators
    losses/      BPC / TCD auxiliary losses
    data/        COCO-JSON registry, host decode, on-device jitted augmentation
    engine/      trainers (base, adabn, wq/mosaic/mixup, [source-free] adaptive teacher, da)
    evaluation/  COCO mAP (own impl; pycocotools-free), F1, DECE, Sim10k/KITTI remap
    solver/      optax SGD + WarmupMultiStep schedule
    parallel/    mesh construction + data-parallel sharding of the train step
    checkpoint/  orbax checkpointing + torch->JAX weight importer
    config/      yacs-style CfgNode mirroring the reference YAML schema
"""

__version__ = "0.1.0"
