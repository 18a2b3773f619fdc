"""Trainer-level tests on tiny shapes (virtual CPU devices).

Covers the reference's workload semantics: one SFAT adaptation step (pseudo
labels + student update + EMA), the WQ/mosaic strong-aug step, AdaBN stat
reset/recompute, and the LR schedule."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.config import get_cfg
from simple_sfod_tpu.data.synthetic import register_synthetic
from simple_sfod_tpu.engine.trainers import build_trainer
from simple_sfod_tpu.solver.build import warmup_multistep_schedule


def tiny_cfg(trainer="base", **overrides):
    cfg = get_cfg()
    cfg.TRAINER = trainer
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
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.VAL_LOSS = False
    cfg.TPU.CANVAS = (64, 128)
    cfg.TPU.GT_CAPACITY = 8
    # single-device: the XLA CPU SPMD partitioner takes 15-25 min per graph
    # on this 1-core host; only tests/test_sharding.py exercises a mesh
    cfg.TPU.MESH_DATA = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.SEED = 0
    cfg.OUTPUT_DIR = "/tmp/sfod_test_trainers"
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    register_synthetic("synthetic_train", 4, (64, 128), 4, seed=0)
    register_synthetic("synthetic_target", 4, (64, 128), 4, seed=1)
    register_synthetic("synthetic_test", 2, (64, 128), 4, seed=2)
    cfg.DATASETS.TRAIN = ("synthetic_train",)
    cfg.DATASETS.TRAIN_TARGET = ("synthetic_target",)
    cfg.DATASETS.TEST = ("synthetic_test",)
    return cfg


def one_batch(cfg, loader):
    return next(iter(loader))


class TestSFATStep:
    def test_split_view_bn_matches_two_pass_reference_semantics(self):
        """SEMISUPNET.SPLIT_VIEW_BN=True must produce EXACTLY the
        reference's two-forward BN bookkeeping: running statistics nudged
        twice, each view by its own batch stats. With flip and strong aug
        disabled the two views are identical, so the post-step stats must
        equal two sequential train-mode BN passes on the same images."""
        cfg = tiny_cfg("source_free_adaptive_teacher_single")
        cfg.INPUT.RANDOM_FLIP = "none"
        cfg.WEAK_STRONG_AUGMENT = False
        cfg.SEMISUPNET.SPLIT_VIEW_BN = True
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        v0 = {
            "params": jax.device_get(tr.state.params["det"]),
            "batch_stats": jax.device_get(tr.state.batch_stats),
        }
        imgs = jnp.asarray(batch["images"], jnp.float32)
        s1 = tr.detector.bn_update(v0, imgs)
        s2 = tr.detector.bn_update({"params": v0["params"], "batch_stats": s1}, imgs)
        tr.run_step(batch)
        got = jax.device_get(tr.state.batch_stats)
        want = jax.device_get(s2)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5), got, want
        )

    def test_step_updates_student_keeps_fixed_teacher(self):
        tr = build_trainer(tiny_cfg("source_free_adaptive_teacher"), synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        t_before = jax.device_get(tr.state.teacher_params)
        s_before = jax.device_get(tr.state.params["det"])
        metrics = tr.run_step(batch)
        assert np.isfinite(float(metrics["total_loss"]))
        # student moved
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s_before, jax.device_get(tr.state.params["det"])
        )
        assert max(jax.tree.leaves(moved)) > 0
        # main variant: teacher fixed (EMA commented out in reference :581)
        same = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), t_before, jax.device_get(tr.state.teacher_params)
        )
        assert max(jax.tree.leaves(same)) == 0
        # threshold bookkeeping advanced
        assert int(tr.state.thresh.cursor) == 1

    def test_main_variant_teacher_bn_nudge(self):
        """The reference teacher is never .eval()'d (sfat.py:374-390, the
        .eval() block commented out): its pseudo forward runs TRAIN-mode BN
        and — the torch train-mode side effect — nudges the teacher's
        running stats. The step's new teacher_stats must equal exactly one
        mutable train-mode forward of the PRE-step teacher on the weak view
        (flip off -> the raw batch), while teacher params stay fixed."""
        cfg = tiny_cfg(
            "source_free_adaptive_teacher",
            **{"INPUT.RANDOM_FLIP": "none", "WEAK_STRONG_AUGMENT": False},
        )
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        tvars0 = jax.device_get(tr.state.teacher_variables())
        tr.run_step(batch)
        got = jax.device_get(tr.state.teacher_stats)
        images = jnp.asarray(batch["images"]).astype(jnp.float32)
        _, mut = tr.detector._features(
            jax.tree.map(jnp.asarray, tvars0), images, True, mutable=True
        )
        want = jax.device_get(mut["batch_stats"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
            got,
            want,
        )
        # the nudge is real: stats moved off their init values
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), tvars0["batch_stats"], got
        )
        assert max(jax.tree.leaves(moved)) > 0

    def test_single_variant_ema_moves_teacher(self):
        cfg = tiny_cfg("source_free_adaptive_teacher_single")
        cfg.SEMISUPNET.EMA_KEEP_RATE = 0.5
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        t_before = jax.device_get(tr.state.teacher_params)
        tr.run_step(batch)
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), t_before, jax.device_get(tr.state.teacher_params)
        )
        assert max(jax.tree.leaves(diff)) > 0

    def test_instance_domain_classifier(self):
        """DOMAIN_CLASSIFIER.INSTANCE=True: loss_DC_ins_s/t appear in metrics
        and gradients flow into params['dc_ins'] (VERDICT r1 missing #1;
        reference meta_arch :341-393 + sfat.py:557). Tiny backbone keeps the
        extra graph cheap to compile on the 1-core host."""
        cfg = tiny_cfg(
            "source_free_adaptive_teacher",
            **{
                "MODEL.BACKBONE.NAME": "build_tiny_backbone",
                "MODEL.RPN.IN_FEATURES": ("tiny1",),
                "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
            },
        )
        cfg.SEMISUPNET.DIS_TYPE = "tiny1"
        cfg.DOMAIN_CLASSIFIER.ENABLED = True
        cfg.DOMAIN_CLASSIFIER.INSTANCE = True
        tr = build_trainer(cfg, synthetic=True)
        assert "dc_ins" in tr.state.params
        dc_before = jax.device_get(tr.state.params["dc_ins"])
        batch = one_batch(tr.cfg, tr.build_train_loader())
        metrics = tr.run_step(batch)
        assert np.isfinite(float(metrics["loss_DC_ins_s"]))
        assert np.isfinite(float(metrics["loss_DC_ins_t"]))
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            dc_before,
            jax.device_get(tr.state.params["dc_ins"]),
        )
        assert max(jax.tree.leaves(moved)) > 0

    def test_zero_weighted_dc_is_skipped_but_trajectory_equal(self):
        """The flagship YAML combination (DOMAIN_CLASSIFIER.ENABLED + INS_DC
        with IMAGE/INSTANCE False) zero-weights every discriminator. The
        reference still runs the DC branch and logs the ZEROED values
        (metrics_dict = loss_dict, reference sfat.py:540-575); we skip the
        dead forwards at trace time. Guards: the logged zeros match the
        reference's logs, the DC parameters still exist (and weight-decay),
        and the detector trajectory is IDENTICAL to a DC-disabled run."""
        kw = {
            "MODEL.BACKBONE.NAME": "build_tiny_backbone",
            "MODEL.RPN.IN_FEATURES": ("tiny1",),
            "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
        }
        cfg = tiny_cfg("source_free_adaptive_teacher", **kw)
        cfg.SEMISUPNET.DIS_TYPE = "tiny1"
        cfg.DOMAIN_CLASSIFIER.ENABLED = True
        cfg.SEMISUPNET.INS_DC = True  # IMAGE/INSTANCE stay False (defaults)
        tr = build_trainer(cfg, synthetic=True)
        assert "dc" in tr.state.params and "dc_ins" in tr.state.params
        batch = one_batch(tr.cfg, tr.build_train_loader())
        m = tr.run_step(batch)
        assert float(m["loss_DC_img_s"]) == 0.0 and float(m["loss_DC_img_t"]) == 0.0
        assert float(m["loss_DC_ins_s"]) == 0.0 and float(m["loss_DC_ins_t"]) == 0.0

        cfg2 = tiny_cfg("source_free_adaptive_teacher", **kw)
        cfg2.SEMISUPNET.DIS_TYPE = "tiny1"
        tr2 = build_trainer(cfg2, synthetic=True)
        m2 = tr2.run_step(batch)
        # identical trajectory (tolerance only for cross-executable fusion
        # differences; the traced det subgraph is the same)
        np.testing.assert_allclose(
            float(m["total_loss"]), float(m2["total_loss"]), rtol=1e-6
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
            jax.device_get(tr.state.params["det"]),
            jax.device_get(tr2.state.params["det"]),
        )

    def test_run_steps_scan_advances_like_run_step(self):
        """run_steps(batch, n) = n steps in ONE dispatched executable
        (lax.scan). Guard: state advances n steps, RNG folds per step (the
        scanned steps are not clones), metrics are the last step's."""
        cfg = tiny_cfg(
            "source_free_adaptive_teacher",
            **{
                "MODEL.BACKBONE.NAME": "build_tiny_backbone",
                "MODEL.RPN.IN_FEATURES": ("tiny1",),
                "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
            },
        )
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        m = tr.run_steps(batch, 3)
        assert int(tr.state.step) == 3
        assert int(tr.state.thresh.cursor) == 3
        assert np.isfinite(float(m["total_loss"]))
        # reference run: fresh trainer, 3 single dispatches, same batch/rng
        tr2 = build_trainer(cfg, synthetic=True)
        for _ in range(3):
            m2 = tr2.run_step(batch)
        np.testing.assert_allclose(
            float(m["total_loss"]), float(m2["total_loss"]), rtol=1e-5
        )

    def test_pinned_classes_acc_is_one(self):
        tr = build_trainer(tiny_cfg("source_free_adaptive_teacher"), synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        tr.run_step(batch)
        acc = np.asarray(tr.state.thresh.classwise_acc)
        assert acc[0] == 1.0 and acc[2] == 1.0  # reference pins person & car


class TestAdaptiveTeacherStep:
    def test_burn_in_then_boundary_copy(self):
        """Source-available AT (reference adaptive_teacher.py): during
        burn-in the unsup loss is gated off; at step == BURN_UP_STEP the
        teacher becomes a hard copy of the student. DC img+ins losses ride
        the same step (reference :316-327)."""
        cfg = tiny_cfg(
            "adaptive_teacher",
            **{
                "MODEL.BACKBONE.NAME": "build_tiny_backbone",
                "MODEL.RPN.IN_FEATURES": ("tiny1",),
                "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
            },
        )
        cfg.SEMISUPNET.BURN_UP_STEP = 1
        cfg.SEMISUPNET.EMA_KEEP_RATE = 0.9
        cfg.SEMISUPNET.DIS_TYPE = "tiny1"
        cfg.DOMAIN_CLASSIFIER.ENABLED = True
        cfg.DOMAIN_CLASSIFIER.INSTANCE = True
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        # step 0: burn-in — teacher stays the init copy
        t0 = jax.device_get(tr.state.teacher_params)
        m = tr.run_step(batch)
        assert np.isfinite(float(m["total_loss"]))
        assert np.isfinite(float(m["loss_DC_img_s"]))
        assert np.isfinite(float(m["loss_DC_ins_t"]))
        same = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), t0, jax.device_get(tr.state.teacher_params)
        )
        assert max(jax.tree.leaves(same)) == 0
        # step 1 == BURN_UP_STEP: the reference hard-copies at the START of
        # the boundary step (adaptive_teacher.py:215-217), BEFORE this
        # step's gradient update — the teacher must equal the
        # end-of-burn-in student (captured here), NOT the post-step student
        s_burn_in = jax.device_get(tr.state.params["det"])
        tr.run_step(batch)
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            jax.device_get(tr.state.teacher_params),
            s_burn_in,
        )
        assert max(jax.tree.leaves(diff)) == 0
        # and the student has moved past the copied snapshot
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            jax.device_get(tr.state.params["det"]),
            s_burn_in,
        )
        assert max(jax.tree.leaves(moved)) > 0


    def test_run_steps_scan(self):
        """AT's run_steps (its own signature: paired source/target args) runs
        n steps in one dispatch — guards the inherited-API crash where the
        SFAT wrapper couldn't drive the 7-arg AT step."""
        cfg = tiny_cfg(
            "adaptive_teacher",
            **{
                "MODEL.BACKBONE.NAME": "build_tiny_backbone",
                "MODEL.RPN.IN_FEATURES": ("tiny1",),
                "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
            },
        )
        cfg.SEMISUPNET.BURN_UP_STEP = 1
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        m = tr.run_steps(batch, 2)
        assert int(tr.state.step) == 2
        assert np.isfinite(float(m["total_loss"]))


class TestChunkedStepping:
    """TPU.STEPS_PER_DISPATCH: K different batches per dispatched executable
    must produce the same state trajectory as K single dispatches."""

    def _tiny(self, trainer):
        return tiny_cfg(
            trainer,
            **{
                "MODEL.BACKBONE.NAME": "build_tiny_backbone",
                "MODEL.RPN.IN_FEATURES": ("tiny1",),
                "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
            },
        )

    @pytest.mark.parametrize("trainer", ["base", "source_free_adaptive_teacher"])
    def test_chunk_matches_single_dispatch(self, trainer):
        cfg = self._tiny(trainer)
        a = build_trainer(cfg, synthetic=True)
        batches = []
        it = iter(a.build_train_loader())
        for _ in range(4):
            batches.append(next(it))
        for b in batches:
            a.run_step(b)
        b_tr = build_trainer(cfg, synthetic=True)
        b_tr.run_step_chunk(batches[:2])
        b_tr.run_step_chunk(batches[2:])
        pa = a.state.params
        pb = b_tr.state.params
        for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(pa),
            jax.tree_util.tree_leaves_with_path(pb),
        ):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6, err_msg=str(ka)
            )
        assert int(b_tr.state.step) == 4

    @pytest.mark.parametrize("trainer", ["base", "da"])
    def test_feeder_staged_chunks_match_synchronous(self, trainer):
        """TPU.CHUNK_STAGE_AHEAD: the background feeder thread (loader pull
        + stack + device upload off the main thread) must reproduce the
        synchronous trajectory exactly — full chunks AND the unstaged tail
        (MAX_ITER=5 with chunk=2 exercises both paths through train());
        'da' additionally covers the paired-loader stage_chunk on the
        feeder thread (target stream pulled in step order)."""
        finals = []
        for ahead in (0, 1):
            cfg = self._tiny(trainer)
            cfg.SOLVER.MAX_ITER = 5
            cfg.TPU.STEPS_PER_DISPATCH = 2
            cfg.TPU.CHUNK_STAGE_AHEAD = ahead
            cfg.OUTPUT_DIR = f"/tmp/sfod_test_feeder_{trainer}_{ahead}"
            tr = build_trainer(cfg, synthetic=True)
            tr.train()
            assert int(tr.state.step) == 5
            finals.append(jax.device_get(tr.state.params))
        for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(finals[0]),
            jax.tree_util.tree_leaves_with_path(finals[1]),
        ):
            np.testing.assert_array_equal(va, vb, err_msg=str(ka))

    @pytest.mark.parametrize("trainer", ["da", "adaptive_teacher"])
    def test_paired_loader_chunk_matches_single_dispatch(self, trainer):
        """The dual-loader chunk path must consume the SAME (source, target)
        pairing as per-step dispatch and land on the same params."""
        cfg = self._tiny(trainer)
        a = build_trainer(cfg, synthetic=True)
        batches = []
        it = iter(a.build_train_loader())
        for _ in range(2):
            batches.append(next(it))
        for b in batches:
            a.run_step(b)
        b_tr = build_trainer(cfg, synthetic=True)
        b_tr.run_step_chunk(batches)
        for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(a.state.params),
            jax.tree_util.tree_leaves_with_path(b_tr.state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6, err_msg=str(ka)
            )
        assert int(b_tr.state.step) == 2


class TestWQStep:
    @pytest.mark.parametrize("trainer", ["base_wq", "base_mosaic", "base_mixup"])
    def test_step_runs(self, trainer):
        tr = build_trainer(tiny_cfg(trainer), synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        metrics = tr.run_step(batch)
        assert np.isfinite(float(metrics["total_loss"]))


class TestDAStep:
    def test_da_step_produces_dc_losses(self):
        tr = build_trainer(tiny_cfg("da"), synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        metrics = tr.run_step(batch)
        for k in ("loss_DC_img", "loss_DC_ins", "loss_consistency", "total_loss"):
            assert np.isfinite(float(metrics[k])), k

    def test_cda_entropy_conditioning_reweights_ins_loss(self):
        """CDAN entropy conditioning (reference cda_faster_rcnn.py:276-283):
        the flag must change loss_DC_ins (per-instance 1+e^-H weights), and
        both variants must step with finite losses. At init the 0.01-std
        classifier gives near-uniform softmax -> every weight normalises to
        ~1 and the flag is invisible, so boost the cls head first to spread
        the per-instance entropies."""

        def boost_cls(tr):
            det = dict(tr.state.params["det"])
            pred = jax.tree.map(lambda x: x * 100.0, det["predictor"])
            det["predictor"] = pred
            tr.state = tr.state.replace(params={**tr.state.params, "det": det})

        m_plain = build_trainer(tiny_cfg("cda"), synthetic=True)
        batch = one_batch(m_plain.cfg, m_plain.build_train_loader())
        boost_cls(m_plain)
        r_plain = m_plain.run_step(batch)

        m_ent = build_trainer(
            tiny_cfg("cda", **{"DA_FASTER.ENTROPY_CONDITIONING": True}), synthetic=True
        )
        boost_cls(m_ent)
        r_ent = m_ent.run_step(batch)
        for r in (r_plain, r_ent):
            assert np.isfinite(float(r["loss_DC_ins"]))
        assert float(r_plain["loss_DC_ins"]) != float(r_ent["loss_DC_ins"])


class TestAdaBN:
    def test_reset_and_recompute(self):
        tr = build_trainer(tiny_cfg("base"), synthetic=True)
        # run one step so stats deviate from init
        batch = one_batch(tr.cfg, tr.build_train_loader())
        tr.run_step(batch)
        tr.reset_bn_stats()
        means = [
            np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(tr.state.batch_stats)
            if any(getattr(p, "key", "") == "mean" for p in k)
        ]
        assert all(np.allclose(m, 0) for m in means)
        new_stats = jax.jit(tr.detector.bn_update)(
            tr.state.variables(), jnp.asarray(batch["images"])
        )
        tr.state = tr.state.replace(batch_stats=new_stats)
        means2 = [
            np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(tr.state.batch_stats)
            if any(getattr(p, "key", "") == "mean" for p in k)
        ]
        assert any(np.abs(m).max() > 0 for m in means2)

    def test_chunked_refinement_matches_per_batch(self):
        """The scan-chunked BN refinement (one dispatch per 2 batches here)
        must produce exactly the per-batch statistics sequence."""
        cfg = tiny_cfg(
            "base",
            **{
                "MODEL.BACKBONE.NAME": "build_tiny_backbone",
                "MODEL.RPN.IN_FEATURES": ("tiny1",),
                "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
            },
        )
        cfg.TEST.EVAL_PERIOD = 0
        a = build_trainer(cfg, synthetic=True)
        b = build_trainer(cfg, synthetic=True)
        a.test = lambda *args, **kw: {}  # skip the eval stage; stats are the subject
        b.test = lambda *args, **kw: {}
        a.test_refinement(max_batches=4, chunk=2)      # 2 scan chunks
        b.test_refinement(max_batches=4, chunk=99)     # all tail = per-batch
        for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(a.state.batch_stats),
            jax.tree_util.tree_leaves_with_path(b.state.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), rtol=1e-6, atol=1e-7, err_msg=str(pa)
            )

    def test_test_refinement_drifts_without_reset_and_saves_adabn(self):
        """train_net.py --eval-only semantics (reference base.py:270-315):
        BN stats drift from their CURRENT values (no reset), the eval runs,
        and an "adabn" checkpoint lands in OUTPUT_DIR."""
        import os
        import shutil

        cfg = tiny_cfg("base")
        cfg.OUTPUT_DIR = "/tmp/sfod_test_refinement"
        shutil.rmtree(cfg.OUTPUT_DIR, ignore_errors=True)
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        tr.run_step(batch)  # stats now non-initial
        means_before = [
            np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(tr.state.batch_stats)
            if any(getattr(p, "key", "") == "mean" for p in k)
        ]
        assert any(np.abs(m).max() > 0 for m in means_before)  # no reset happened
        tr.test_refinement(max_batches=2)
        means_after = [
            np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(tr.state.batch_stats)
            if any(getattr(p, "key", "") == "mean" for p in k)
        ]
        # drifted, but from the previous values (not from zero)
        assert any(np.abs(a - b).max() > 0 for a, b in zip(means_after, means_before))
        assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "adabn"))


class TestSchedule:
    def test_warmup_and_steps(self):
        sched = warmup_multistep_schedule(
            1.0, steps=[10, 20], gamma=0.1, factor_list=None, warmup_iters=4, warmup_factor=0.25
        )
        assert float(sched(0)) == pytest.approx(0.25)
        assert float(sched(4)) == pytest.approx(1.0)
        assert float(sched(15)) == pytest.approx(0.1)
        assert float(sched(25)) == pytest.approx(0.01)

    def test_factor_list(self):
        sched = warmup_multistep_schedule(
            2.0, steps=[5, 10], factor_list=[1, 0.5, 0.25], warmup_iters=0
        )
        assert float(sched(1)) == pytest.approx(2.0)
        assert float(sched(7)) == pytest.approx(1.0)
        assert float(sched(12)) == pytest.approx(0.5)


class TestAutoScale:
    def test_linear_scaling_rule(self):
        from simple_sfod_tpu.solver.build import auto_scale_workers

        cfg = tiny_cfg("base")
        cfg.SOLVER.REFERENCE_WORLD_SIZE = 1
        cfg.SOLVER.BASE_LR = 0.01
        cfg.SOLVER.MAX_ITER = 1000
        cfg.SOLVER.STEPS = (600,)
        cfg.SOLVER.WARMUP_ITERS = 100
        out = auto_scale_workers(cfg, 4)
        assert out.SOLVER.BASE_LR == 0.04
        assert out.SOLVER.MAX_ITER == 250
        assert out.SOLVER.STEPS == (150,)
        assert out.SOLVER.WARMUP_ITERS == 25
        # d2 scales the GLOBAL batch too (per-worker batch constant)
        assert out.SOLVER.IMS_PER_BATCH == cfg.SOLVER.IMS_PER_BATCH * 4
        assert out.SOLVER.IMS_PER_BATCH_TARGET == cfg.SOLVER.IMS_PER_BATCH_TARGET * 4
        # no-op when unset
        cfg2 = tiny_cfg("base")
        assert auto_scale_workers(cfg2, 4) is cfg2


class TestAutoMeshWidth:
    """TPU.MESH_DATA=-1 must gcd ONLY over the batch sizes the trainer
    actually shards: a supervised run must not be collapsed to a 1-device
    mesh by the default (unused) IMS_PER_BATCH_TARGET=1."""

    def _mesh_data(self, trainer, ims, target):
        cfg = tiny_cfg(
            trainer,
            **{
                "SOLVER.IMS_PER_BATCH": ims,
                "SOLVER.IMS_PER_BATCH_TARGET": target,
                "TPU.MESH_DATA": -1,
            },
        )
        cfg.freeze()
        tr = build_trainer(cfg, synthetic=True)
        return tr.mesh.shape["data"]

    def test_supervised_ignores_target_batch(self):
        # 8 virtual devices (conftest); TARGET=1 is the global default
        assert self._mesh_data("base", 8, 1) == 8

    def test_sfat_ignores_source_batch(self):
        assert self._mesh_data("source_free_adaptive_teacher", 1, 8) == 8

    def test_da_divides_both(self):
        assert self._mesh_data("da", 8, 4) == 4


class TestPreemption:
    """SIGTERM mid-run (preemptible TPU fleets deliver it before eviction):
    the loop finishes the in-flight chunk, writes a durable model_preempt_*
    checkpoint, returns cleanly — and --resume continues to MAX_ITER."""

    def test_sigterm_checkpoints_and_resume_completes(self):
        import os
        import signal
        import threading

        kw = {
            "MODEL.BACKBONE.NAME": "build_tiny_backbone",
            "MODEL.RPN.IN_FEATURES": ("tiny1",),
            "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
        }
        cfg = tiny_cfg("base", **kw)
        cfg.SOLVER.MAX_ITER = 6
        cfg.TPU.STEPS_PER_DISPATCH = 2
        cfg.OUTPUT_DIR = "/tmp/sfod_test_preempt"
        import shutil

        shutil.rmtree(cfg.OUTPUT_DIR, ignore_errors=True)
        tr = build_trainer(cfg, synthetic=True)

        orig = tr.run_step_chunk
        fired = threading.Event()

        def slow_chunk(batches, xs=None):
            # deliver SIGTERM while a chunk is in flight (once)
            if not fired.is_set():
                fired.set()
                os.kill(os.getpid(), signal.SIGTERM)
            return orig(batches, xs=xs)

        tr.run_step_chunk = slow_chunk
        tr.train()  # returns cleanly instead of dying
        stopped_at = int(tr.state.step)
        assert 0 < stopped_at < 6
        last = tr.checkpointer.last_checkpoint()
        assert last and last.startswith("model_preempt_"), last
        assert not os.path.exists(os.path.join(cfg.OUTPUT_DIR, "model_final"))
        # default SIGTERM disposition is restored after train()
        assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.Handlers.SIG_DFL)

        tr2 = build_trainer(cfg, synthetic=True)
        tr2.resume_or_load(resume=True)
        assert int(tr2.state.step) == stopped_at
        tr2.train()
        assert int(tr2.state.step) == 6
        assert tr2.checkpointer.last_checkpoint() == "model_final"


class TestATBurnInSupervisedOnly:
    def test_dc_losses_gated_off_during_burn_in(self):
        """The reference's burn-in branch is supervised-only (reference
        adaptive_teacher.py:201-213): with DOMAIN_CLASSIFIER enabled, a
        burn-in step must leave the DETECTOR on the same trajectory as a
        DC-disabled run (DC losses are logged but gated with the unsup
        term until the joint phase)."""
        kw = {
            "MODEL.BACKBONE.NAME": "build_tiny_backbone",
            "MODEL.RPN.IN_FEATURES": ("tiny1",),
            "MODEL.ROI_HEADS.IN_FEATURES": ("tiny1",),
        }
        cfg = tiny_cfg("adaptive_teacher", **kw)
        cfg.SEMISUPNET.BURN_UP_STEP = 5
        cfg.SEMISUPNET.DIS_TYPE = "tiny1"
        cfg.DOMAIN_CLASSIFIER.ENABLED = True
        cfg.DOMAIN_CLASSIFIER.INSTANCE = True
        tr = build_trainer(cfg, synthetic=True)
        batch = one_batch(tr.cfg, tr.build_train_loader())
        m = tr.run_step(batch)
        assert np.isfinite(float(m["loss_DC_img_s"]))  # logged

        cfg2 = tiny_cfg("adaptive_teacher", **kw)
        cfg2.SEMISUPNET.BURN_UP_STEP = 5
        cfg2.SEMISUPNET.DIS_TYPE = "tiny1"
        tr2 = build_trainer(cfg2, synthetic=True)
        m2 = tr2.run_step(batch)
        np.testing.assert_allclose(
            float(m["total_loss"]), float(m2["total_loss"]), rtol=1e-6
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
            jax.device_get(tr.state.params["det"]),
            jax.device_get(tr2.state.params["det"]),
        )
