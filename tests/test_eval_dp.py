"""Data-parallel dataset evaluation (engine/eval_loop.py `mesh` path).

The reference runs multi-GPU evaluation by wrapping the model in DDP and
letting detectron2's `inference_on_dataset` split the loader across ranks
(SURVEY §3.4 / reference train_net.py `launch`). Here the SAME jitted
infer graph runs with the batch sharded over the mesh's 'data' axis and
variables replicated — GSPMD places the work; images are independent at
eval-mode BN, so the sharded pass must match the single-device pass.

These tests assert that equivalence on the virtual CPU mesh, including
the in-call padding path (batch size not a multiple of the mesh width).
"""

import json
import os

import jax
import numpy as np
import pytest


def _setup(ims_per_batch):
    import __graft_entry__ as g
    from simple_sfod_tpu.config import detector_config_from_cfg
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.models.detector import Detector

    cfg = g._tiny_cfg(1, canvas=(64, 128), backbone="tiny")
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.TEST.IMS_PER_BATCH = ims_per_batch
    register_synthetic("synthetic_eval_dp", 10, (64, 128), 4)
    det = Detector(detector_config_from_cfg(cfg))
    variables = det.init(jax.random.key(0), tuple(cfg.TPU.CANVAS))
    return cfg, det, variables


def _run(cfg, det, variables, mesh, out_dir, tag):
    from simple_sfod_tpu.data.datasets import get_dataset
    from simple_sfod_tpu.data.loader import build_test_loader
    from simple_sfod_tpu.engine.eval_loop import inference_on_dataset

    ds = get_dataset("synthetic_eval_dp")
    loader = build_test_loader(cfg, "synthetic_eval_dp", synthetic=True)
    dump = os.path.join(out_dir, f"dets_{tag}.json")
    res = inference_on_dataset(
        det,
        variables,
        loader,
        ds["thing_classes"],
        dump_json=dump,
        mesh=mesh,
    )
    with open(dump) as f:
        dets = json.load(f)
    return res, dets


def _assert_same(res1, resN, dets1, detsN):
    # identical detection sets (order is deterministic: loader order)
    assert len(dets1) == len(detsN) and len(dets1) > 0
    for a, b in zip(dets1, detsN):
        assert a["image_id"] == b["image_id"]
        assert a["category_id"] == b["category_id"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], rtol=0, atol=1e-4)
        np.testing.assert_allclose(a["score"], b["score"], rtol=0, atol=1e-5)
    # identical evaluator output (COCO AP table + F1)
    assert set(res1) == set(resN)
    for k, v in res1.items():
        if isinstance(v, (int, float)):
            # a metric must not regress to NaN on one side only (ADVICE r3)
            assert np.isfinite(v) == np.isfinite(resN[k]), k
            if np.isfinite(v):
                np.testing.assert_allclose(resN[k], v, rtol=0, atol=1e-6, err_msg=k)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_dp_eval_equals_single_device_even_split(tmp_path):
    """TEST.IMS_PER_BATCH divisible by the mesh width: no padding."""
    from simple_sfod_tpu.parallel.mesh import make_mesh

    cfg, det, variables = _setup(ims_per_batch=4)
    res1, dets1 = _run(cfg, det, variables, None, str(tmp_path), "single")
    resN, detsN = _run(cfg, det, variables, make_mesh(4), str(tmp_path), "dp4")
    _assert_same(res1, resN, dets1, detsN)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_dp_bn_update_equals_single_device():
    """AdaBN's per-batch BN statistics are a full-batch reduction: sharding
    the batch over 'data' must leave the updated running stats identical
    (GSPMD inserts the cross-device mean). Guards the sharded
    test_refinement chunk upload (engine/trainers/base.py)."""
    from simple_sfod_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg, det, variables = _setup(ims_per_batch=4)
    rng = np.random.RandomState(3)
    images = rng.randint(0, 256, (4, 64, 128, 3)).astype(np.uint8)

    bn = jax.jit(lambda v, img: det.bn_update(v, img))
    stats1 = bn(variables, images)

    mesh = make_mesh(4)
    statsN = bn(replicate(mesh, variables), shard_batch(mesh, images))
    flat1 = jax.tree.leaves(jax.device_get(stats1))
    flatN = jax.tree.leaves(jax.device_get(statsN))
    assert len(flat1) == len(flatN) and len(flat1) > 0
    for a, b in zip(flat1, flatN):
        # cross-device psum vs single-device reduce reorders the f32 sum:
        # measured rel drift ~8e-7 on the variance leaves (magnitude ~700)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_dp_eval_pads_uneven_batches(tmp_path):
    """Batch of 3 over a 4-wide mesh: every dispatch pads one repeated
    record; the image-id dedup must drop it from evaluation entirely."""
    from simple_sfod_tpu.parallel.mesh import make_mesh

    cfg, det, variables = _setup(ims_per_batch=3)
    res1, dets1 = _run(cfg, det, variables, None, str(tmp_path), "single3")
    resN, detsN = _run(cfg, det, variables, make_mesh(4), str(tmp_path), "dp4p")
    _assert_same(res1, resN, dets1, detsN)
