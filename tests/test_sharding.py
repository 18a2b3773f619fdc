"""Data/tensor-parallel sharding: the full SFAT adaptation step over a
2-device mesh, and the supervised step over a 2x2 ('data','model') mesh
with Megatron-sharded box-head fc layers, inside pytest (the dryrun path,
SURVEY §2.3/§5)."""

import numpy as np
import jax
import pytest


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >=2 devices")
def test_sfat_step_on_two_device_mesh():
    from simple_sfod_tpu.config import get_cfg
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = get_cfg()
    cfg.TRAINER = "source_free_adaptive_teacher"
    cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
    cfg.MODEL.RPN.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ("vgg4",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.IMS_PER_BATCH_TARGET = 2
    cfg.TPU.CANVAS = (64, 128)
    cfg.TPU.GT_CAPACITY = 8
    cfg.TPU.MESH_DATA = 2
    cfg.SEED = 0
    cfg.OUTPUT_DIR = "/tmp/sfod_shard_test"
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    register_synthetic("synthetic_target", 4, (64, 128), 4)
    cfg.DATASETS.TRAIN_TARGET = ("synthetic_target",)
    cfg.freeze()

    tr = build_trainer(cfg, synthetic=True)
    assert tr.mesh.devices.size == 2
    batch = {
        "images": np.random.RandomState(0).uniform(0, 255, (2, 64, 128, 3)).astype(np.uint8),
        "sizes": np.tile(np.asarray([[64, 128]], np.int32), (2, 1)),
    }
    m1 = tr.run_step(batch)
    m2 = tr.run_step(batch)
    assert np.isfinite(float(m1["total_loss"]))
    assert np.isfinite(float(m2["total_loss"]))
    assert int(tr.state.step) == 2


def test_spatial_shard_without_model_axis_raises():
    """Set-but-inert config keys fail loudly (the honesty rule)."""
    import __graft_entry__ as g
    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = g._tiny_cfg(1, canvas=(32, 64), backbone="tiny")
    cfg.TPU.SPATIAL_SHARD = True
    cfg.freeze()
    with pytest.raises(ValueError, match="SPATIAL_SHARD.*MESH_MODEL"):
        build_trainer(cfg, synthetic=True)


def _fc_leaf(params, fc, leaf):
    """The box-head fc leaf by path suffix, wherever the tree nests it."""
    for path, x in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        if "box_head" in names and fc in names and names[-1] == leaf:
            return x
    raise AssertionError(f"no {fc}/{leaf} under box_head")


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_tp_model_axis_numerically_equals_single_device():
    """TPU.MESH_MODEL=2 on a 2x2 ('data','model') mesh: fc0 column- and fc1
    row-parallel must produce the same loss and updated params as the same
    total batch on one device — the TP collectives XLA inserts partition the
    math, they must not change it."""
    import __graft_entry__ as g
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.engine.trainers import build_trainer

    results = {}
    for tp in (2, 1):
        cfg = g._tiny_cfg(2, canvas=(32, 64), backbone="tiny")
        cfg.TRAINER = "base"
        cfg.TPU.MESH_DATA = 2 if tp == 2 else 1
        cfg.TPU.MESH_MODEL = tp
        cfg.OUTPUT_DIR = f"/tmp/sfod_tp_test_{tp}"
        register_synthetic("synthetic_train", 8, (32, 64), 8, seed=0)
        cfg.DATASETS.TRAIN = ("synthetic_train",)
        cfg.freeze()
        tr = build_trainer(cfg, synthetic=True)
        if tp == 2:
            assert dict(tr.mesh.shape) == {"data": 2, "model": 2}
            k0 = _fc_leaf(tr.state.params, "fc0", "kernel")
            k1 = _fc_leaf(tr.state.params, "fc1", "kernel")
            assert "model" in str(k0.sharding.spec), k0.sharding
            assert "model" in str(k1.sharding.spec), k1.sharding
            assert len(k0.sharding.device_set) == 4
        batch = next(iter(tr.build_train_loader()))
        m = tr.run_step(batch)
        if tp == 2:
            # the updated fc kernel is still model-sharded after the step
            # (no silent gather-back: the sharding survives the update)
            k0_new = _fc_leaf(tr.state.params, "fc0", "kernel")
            assert "model" in str(k0_new.sharding.spec), k0_new.sharding
        results[tp] = (float(m["total_loss"]), jax.device_get(tr.state.params))
    loss_tp, p_tp = results[2]
    loss_1, p_1 = results[1]
    assert abs(loss_tp - loss_1) / max(1.0, abs(loss_1)) < 1e-4, (loss_tp, loss_1)
    worst = max(
        jax.tree.leaves(jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p_tp, p_1))
    )
    assert worst < 1e-5, worst


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 devices")
def test_tp_checkpoint_roundtrip(tmp_path):
    """Checkpoint save/resume under a tensor-sharded state: orbax writes the
    (single-host) sharded arrays, and resume_or_load re-places them on the
    2x2 mesh with the fc kernels model-sharded again."""
    import __graft_entry__ as g
    from simple_sfod_tpu.engine.trainers import build_trainer

    from simple_sfod_tpu.data.synthetic import register_synthetic

    def tp_trainer(out):
        cfg = g._tiny_cfg(2, canvas=(32, 64), backbone="tiny")
        cfg.TRAINER = "base"
        cfg.TPU.MESH_DATA = 2
        cfg.TPU.MESH_MODEL = 2
        cfg.OUTPUT_DIR = out
        register_synthetic("synthetic_train", 8, (32, 64), 8, seed=0)
        cfg.DATASETS.TRAIN = ("synthetic_train",)
        cfg.freeze()
        return build_trainer(cfg, synthetic=True)

    out = str(tmp_path / "tp_ckpt")
    tr = tp_trainer(out)
    tr.run_step(next(iter(tr.build_train_loader())))
    tr.checkpointer.save("model_tp", tr.state)
    want = jax.device_get(tr.state.params)

    tr2 = tp_trainer(out)
    tr2.resume_or_load(resume=True)
    got = jax.device_get(tr2.state.params)
    worst = max(
        jax.tree.leaves(jax.tree.map(lambda a, b: float(np.abs(a - b).max()), got, want))
    )
    assert worst == 0.0, worst
    assert int(tr2.state.step) == 1
    k0 = _fc_leaf(tr2.state.params, "fc0", "kernel")
    assert "model" in str(k0.sharding.spec), k0.sharding


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >=2 devices")
def test_spatial_shard_numerically_equals_single_device():
    """TPU.SPATIAL_SHARD on a (1 data x 2 model) mesh: each device owns a
    horizontal band of every image (GSPMD halo-exchanges the convs). The
    step must equal the unsharded one — spatial partitioning is the
    parallelism that still applies at per-chip batch 1."""
    import __graft_entry__ as g
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.engine.trainers import build_trainer

    results = {}
    for sp in (True, False):
        cfg = g._tiny_cfg(1, canvas=(32, 64), backbone="tiny")
        cfg.TRAINER = "base"
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.SOLVER.IMS_PER_BATCH_TARGET = 2
        cfg.TPU.MESH_DATA = 1
        cfg.TPU.MESH_MODEL = 2 if sp else 1
        cfg.TPU.SPATIAL_SHARD = sp
        cfg.OUTPUT_DIR = f"/tmp/sfod_sp_test_{int(sp)}"
        register_synthetic("synthetic_train", 8, (32, 64), 8, seed=0)
        cfg.DATASETS.TRAIN = ("synthetic_train",)
        cfg.freeze()
        tr = build_trainer(cfg, synthetic=True)
        batch = next(iter(tr.build_train_loader()))
        if sp:
            from simple_sfod_tpu.parallel.mesh import shard_batch

            placed = shard_batch(
                tr.mesh,
                (jax.numpy.asarray(batch["images"]),),
                spatial=True,
            )[0]
            assert "model" in str(placed.sharding.spec), placed.sharding
        m = tr.run_step(batch)
        results[sp] = (float(m["total_loss"]), jax.device_get(tr.state.params))
    loss_sp, p_sp = results[True]
    loss_1, p_1 = results[False]
    assert abs(loss_sp - loss_1) / max(1.0, abs(loss_1)) < 1e-4, (loss_sp, loss_1)
    worst = max(
        jax.tree.leaves(jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p_sp, p_1))
    )
    assert worst < 1e-5, worst


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >=2 devices")
def test_fpn_supervised_step_on_two_device_mesh():
    """Multi-level FPN under GSPMD: the level-dict features, per-level RPN
    concat and level-assigned ROI pooling must partition over a data mesh
    like the single-level path does."""
    from simple_sfod_tpu.config import get_cfg
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.engine.trainers import build_trainer

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic_tiny_fpn.yaml")
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.MESH_DATA = 2
    cfg.OUTPUT_DIR = "/tmp/sfod_fpn_shard_test"
    register_synthetic("synthetic_train", 4, (64, 128), 4, seed=0)
    register_synthetic("synthetic_test", 2, (64, 128), 4, seed=2)
    cfg.freeze()
    tr = build_trainer(cfg, synthetic=True)
    assert tr.mesh.devices.size == 2
    batch = next(iter(tr.build_train_loader()))
    m = tr.run_step(batch)
    assert np.isfinite(float(m["total_loss"]))
