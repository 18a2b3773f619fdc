"""Checkpoint round-trip + torch weight importer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.checkpoint.checkpointer import Checkpointer
from simple_sfod_tpu.checkpoint.torch_import import (
    import_torch_checkpoint,
    import_torchvision_vgg,
    _import_fc0,
)
from simple_sfod_tpu.models.faster_rcnn import DetectorConfig


class TestCheckpointer:
    def test_save_load_roundtrip(self, tmp_path):
        ckpt = Checkpointer(str(tmp_path))
        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7, jnp.int32),
        }
        ckpt.save("model_0000007", state)
        assert ckpt.has_checkpoint()
        assert ckpt.last_checkpoint() == "model_0000007"
        loaded = ckpt.load("model_0000007")
        np.testing.assert_allclose(loaded["params"]["w"], np.arange(6).reshape(2, 3))
        assert int(loaded["step"]) == 7

    def test_shape_mismatched_leaves_keep_fresh_init(self, tmp_path):
        """A checkpoint whose leaf shapes disagree with the target (e.g.
        different NUM_CLASSES between chained stages) must keep the fresh
        init for those leaves instead of splicing them in and failing later
        inside XLA (reference name-matching load skips mismatches too)."""
        from simple_sfod_tpu.checkpoint.checkpointer import _merge_weights

        import dataclasses

        @dataclasses.dataclass
        class State:
            params: dict
            batch_stats: dict

        target = State(
            params={"cls": jnp.zeros((4, 9)), "shared": jnp.zeros((3,))},
            batch_stats={},
        )
        loaded = {
            "params": {"cls": np.ones((4, 5)), "shared": np.ones((3,))},
            "batch_stats": {},
        }
        out = _merge_weights(target, loaded)
        assert out.params["cls"].shape == (4, 9)
        np.testing.assert_allclose(out.params["cls"], 0.0)  # fresh init kept
        np.testing.assert_allclose(out.params["shared"], 1.0)  # loaded

    def test_cross_trainer_load_base_into_sfat(self, tmp_path):
        """WORKFLOWS §1-4 chain a base/wq model_final into the SFAT trainer
        (MODEL.WEIGHTS): the flat base params must be rewrapped into the
        teacher-student {'det': ...} structure, with BOTH teacher and student
        initialised from the checkpoint (distinct buffers). Regression for
        the KeyError('det') the 5-stage workflow run exposed."""
        import jax as jax_

        from test_trainers import tiny_cfg  # noqa: E402 (tests dir on path)
        from simple_sfod_tpu.engine.trainers import build_trainer

        base_cfg = tiny_cfg("base")
        base_cfg.OUTPUT_DIR = str(tmp_path / "base")
        base_tr = build_trainer(base_cfg, synthetic=True)
        base_tr.checkpointer.save("model_final", base_tr.state)

        sfat_cfg = tiny_cfg("source_free_adaptive_teacher")
        sfat_cfg.OUTPUT_DIR = str(tmp_path / "sfat")
        sfat_cfg.MODEL.WEIGHTS = str(tmp_path / "base" / "model_final")
        sfat_tr = build_trainer(sfat_cfg, synthetic=True)
        sfat_tr.resume_or_load(resume=False)

        assert "det" in sfat_tr.state.params
        src = jax_.device_get(base_tr.state.params)
        got_student = jax_.device_get(sfat_tr.state.params["det"])
        got_teacher = jax_.device_get(sfat_tr.state.teacher_params)
        jax_.tree.map(np.testing.assert_allclose, got_student, src)
        jax_.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), got_teacher, src
        )
        # one SFAT step runs on the loaded state (the workflow's stage 5)
        batch = next(iter(sfat_tr.build_train_loader()))
        m = sfat_tr.run_step(batch)
        assert np.isfinite(float(m["total_loss"]))

    def test_cross_trainer_load_sfat_into_base(self, tmp_path):
        """The reverse direction (eval a SFAT model with the base trainer):
        the nested {'det': ...} checkpoint unwraps onto flat base params."""
        import jax as jax_

        from test_trainers import tiny_cfg  # noqa: E402
        from simple_sfod_tpu.engine.trainers import build_trainer

        sfat_cfg = tiny_cfg("source_free_adaptive_teacher")
        sfat_cfg.OUTPUT_DIR = str(tmp_path / "sfat")
        sfat_tr = build_trainer(sfat_cfg, synthetic=True)
        sfat_tr.checkpointer.save("model_final", sfat_tr.state)

        base_cfg = tiny_cfg("base")
        base_cfg.OUTPUT_DIR = str(tmp_path / "base")
        base_cfg.MODEL.WEIGHTS = str(tmp_path / "sfat" / "model_final")
        base_tr = build_trainer(base_cfg, synthetic=True)
        base_tr.resume_or_load(resume=False)

        src = jax_.device_get(sfat_tr.state.params["det"])
        got = jax_.device_get(base_tr.state.params)
        jax_.tree.map(np.testing.assert_allclose, got, src)


def _fake_torch_vgg_sd(bn=True):
    """Construct a torchvision-layout vgg16_bn state dict with numpy arrays."""
    rs = np.random.RandomState(0)
    sd = {}
    conv_idxs = [0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40]
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    in_c = 3
    for idx, w in zip(conv_idxs, widths):
        # small weights keep 13 stacked convs' activations O(1) so the
        # float32 comparison is meaningful
        sd[f"features.{idx}.weight"] = (0.05 * rs.randn(w, in_c, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = (0.1 * rs.randn(w)).astype(np.float32)
        if bn:
            sd[f"features.{idx + 1}.weight"] = rs.rand(w).astype(np.float32)
            sd[f"features.{idx + 1}.bias"] = rs.randn(w).astype(np.float32)
            sd[f"features.{idx + 1}.running_mean"] = rs.randn(w).astype(np.float32)
            sd[f"features.{idx + 1}.running_var"] = rs.rand(w).astype(np.float32)
        in_c = w
    return sd


class TestTorchImport:
    def test_torchvision_vgg_import_matches_forward(self):
        """Imported backbone must produce the same features as a torch
        forward pass on the same input (the real parity check)."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        sd = _fake_torch_vgg_sd(bn=True)
        params, stats = import_torchvision_vgg(sd, bn=True)

        # torch-side model (features only)
        layers = []
        widths = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
        in_c = 3
        for v in widths:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.BatchNorm2d(v), tnn.ReLU()]
                in_c = v
        model = tnn.Sequential(*layers)
        model.load_state_dict({k[len("features."):]: torch.from_numpy(v) for k, v in sd.items()})
        model.eval()

        x = np.random.RandomState(1).randn(1, 3, 32, 64).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(x)).numpy()  # [1, 512, 1, 2]

        from simple_sfod_tpu.models.backbones.vgg import VGG16Backbone

        backbone = VGG16Backbone(bn=True)
        variables = {"params": params, "batch_stats": stats}
        feats = backbone.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        got = np.asarray(feats["vgg4"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_fc0_permutation(self):
        """The NCHW->NHWC flatten permutation must preserve the linear map."""
        rs = np.random.RandomState(2)
        c, p, out = 8, 3, 5
        w = rs.randn(out, c * p * p).astype(np.float32)
        feat_nchw = rs.randn(c, p, p).astype(np.float32)
        want = w @ feat_nchw.reshape(-1)
        w_jax = _import_fc0(w, p, c)  # [p*p*c, out]
        got = feat_nchw.transpose(1, 2, 0).reshape(-1) @ w_jax
        np.testing.assert_allclose(got, want, rtol=1e-4)


def _fake_d2_detector_sd(num_classes=4, fc_dim=64, fan_in_scaled=False):
    """Reference/detectron2-named full-detector state dict (VGG16-BN,
    d2 module-index naming per torch_import._D2_STAGE_CONVS_BN).
    fan_in_scaled=True keeps activations O(1) through all 13 convs so
    end-to-end inference produces meaningful detections."""
    rs = np.random.RandomState(3)

    def t(*s):
        w = rs.randn(*s).astype(np.float32)
        if fan_in_scaled and w.ndim > 1:
            fan_in = int(np.prod(s[1:]))
            return (w / np.sqrt(fan_in)).astype(np.float32)
        return (0.05 * w).astype(np.float32)
    sd = {}
    plan = [(64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512)]
    conv_idxs = [(0, 3), (0, 3), (0, 3, 6), (0, 3, 6), (0, 3, 6)]
    bn_idxs = [(1, 4), (1, 4), (1, 4, 7), (1, 4, 7), (1, 4, 7)]
    in_c = 3
    for stage, widths in enumerate(plan):
        for j, w in enumerate(widths):
            sd[f"backbone.vgg{stage}.{conv_idxs[stage][j]}.weight"] = t(w, in_c, 3, 3)
            sd[f"backbone.vgg{stage}.{conv_idxs[stage][j]}.bias"] = t(w)
            b = bn_idxs[stage][j]
            if fan_in_scaled:
                # near-identity BN keeps the 13-conv stack O(1)
                sd[f"backbone.vgg{stage}.{b}.weight"] = (
                    1.0 + 0.1 * rs.randn(w)
                ).astype(np.float32)
                sd[f"backbone.vgg{stage}.{b}.bias"] = (0.1 * rs.randn(w)).astype(np.float32)
                sd[f"backbone.vgg{stage}.{b}.running_mean"] = (
                    0.1 * rs.randn(w)
                ).astype(np.float32)
                sd[f"backbone.vgg{stage}.{b}.running_var"] = rs.uniform(0.8, 1.2, w).astype(
                    np.float32
                )
            else:
                sd[f"backbone.vgg{stage}.{b}.weight"] = rs.rand(w).astype(np.float32)
                sd[f"backbone.vgg{stage}.{b}.bias"] = t(w)
                sd[f"backbone.vgg{stage}.{b}.running_mean"] = t(w)
                sd[f"backbone.vgg{stage}.{b}.running_var"] = rs.rand(w).astype(np.float32)
            in_c = w
    a = 15  # anchors
    sd["proposal_generator.rpn_head.conv.weight"] = t(512, 512, 3, 3)
    sd["proposal_generator.rpn_head.conv.bias"] = t(512)
    sd["proposal_generator.rpn_head.objectness_logits.weight"] = t(a, 512, 1, 1)
    sd["proposal_generator.rpn_head.objectness_logits.bias"] = t(a)
    sd["proposal_generator.rpn_head.anchor_deltas.weight"] = t(4 * a, 512, 1, 1) * (
        0.1 if fan_in_scaled else 1.0
    )
    sd["proposal_generator.rpn_head.anchor_deltas.bias"] = t(4 * a) * (
        0.1 if fan_in_scaled else 1.0
    )
    sd["roi_heads.box_head.fc1.weight"] = t(fc_dim, 512 * 7 * 7)
    sd["roi_heads.box_head.fc1.bias"] = t(fc_dim)
    sd["roi_heads.box_head.fc2.weight"] = t(fc_dim, fc_dim)
    sd["roi_heads.box_head.fc2.bias"] = t(fc_dim)
    sd["roi_heads.box_predictor.cls_score.weight"] = t(num_classes + 1, fc_dim)
    sd["roi_heads.box_predictor.cls_score.bias"] = t(num_classes + 1)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = t(4 * num_classes, fc_dim)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = t(4 * num_classes)
    return sd


class TestTorchWeightsRouting:
    """MODEL.WEIGHTS = *.pth goes straight through the importer inside
    Checkpointer.resume_or_load (VERDICT r1 missing #4; reference
    detection_ts_checkpointer.py:12-90 loads torch files directly)."""

    def _state_and_cfg(self):
        from simple_sfod_tpu.models.detector import Detector

        det_cfg = DetectorConfig(
            num_classes=4,
            backbone="vgg16",
            in_feature="vgg4",
            fc_dim=64,
            # pinned: the golden detections depend on the proposal caps
            rpn_pre_nms_topk_test=2048,
            rpn_post_nms_topk_test=512,
        )
        det = Detector(det_cfg)
        variables = det.init(jax.random.key(0), (64, 128))
        return det_cfg, det, variables

    def test_pth_via_resume_or_load(self, tmp_path):
        torch = pytest.importorskip("torch")
        from simple_sfod_tpu.checkpoint.torch_import import _conv
        from simple_sfod_tpu.engine.train_state import TrainState

        sd = _fake_d2_detector_sd()
        pth = str(tmp_path / "model.pth")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

        det_cfg, det, variables = self._state_and_cfg()
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=(),
        )
        ckpt = Checkpointer(str(tmp_path), det_cfg=det_cfg)
        loaded = ckpt.resume_or_load(pth, state, resume=False)
        np.testing.assert_allclose(
            np.asarray(loaded.params["backbone"]["conv0"]["kernel"]),
            _conv(sd["backbone.vgg0.0.weight"]),
        )
        np.testing.assert_allclose(
            np.asarray(loaded.params["predictor"]["cls_score"]["kernel"]),
            sd["roi_heads.box_predictor.cls_score.weight"].T,
        )
        # forward still runs with the spliced weights
        dets = det.infer(
            {"params": loaded.params, "batch_stats": loaded.batch_stats},
            jnp.zeros((1, 64, 128, 3)),
            jnp.asarray([[64, 128]], jnp.int32),
        )
        assert np.all(np.isfinite(np.asarray(dets.scores)))

    def test_pth_fills_teacher_and_student_distinct_buffers(self, tmp_path):
        torch = pytest.importorskip("torch")
        from simple_sfod_tpu.engine.train_state import TeacherStudentState

        sd = _fake_d2_detector_sd()
        pth = str(tmp_path / "model.pth")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

        det_cfg, det, variables = self._state_and_cfg()
        copy = lambda tree: jax.tree.map(jnp.array, tree)
        state = TeacherStudentState(
            step=jnp.zeros((), jnp.int32),
            params={"det": variables["params"]},
            batch_stats=variables.get("batch_stats", {}),
            opt_state=(),
            teacher_params=copy(variables["params"]),
            teacher_stats=copy(variables.get("batch_stats", {})),
        )
        ckpt = Checkpointer(str(tmp_path), det_cfg=det_cfg)
        loaded = ckpt.resume_or_load(pth, state, resume=False)
        s_leaf = loaded.params["det"]["backbone"]["conv0"]["kernel"]
        t_leaf = loaded.teacher_params["backbone"]["conv0"]["kernel"]
        np.testing.assert_allclose(np.asarray(s_leaf), np.asarray(t_leaf))
        # distinct device buffers (donation-safety)
        assert s_leaf.unsafe_buffer_pointer() != t_leaf.unsafe_buffer_pointer()


class TestNoBNImportFidelity:
    """Reference nobn topology check (VERDICT r1 next-round #10): the fixed
    stage slices (reference meta_arch/vgg.py:70-74) re-partition the nobn
    module sequence (pools mid-stage, empty stage 4) but COMPOSE to canonical
    VGG16 — so our canonical backbone + the nobn key mapping must reproduce
    the reference's actual forward bit-for-bit."""

    def test_nobn_d2_checkpoint_forward_parity(self):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        # the reference's make_layers(vgg16, batch_norm=False) sequence
        widths = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                  512, 512, 512, "M", 512, 512, 512, "M"]
        layers = []
        in_c = 3
        for v in widths:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.ReLU()]
                in_c = v
        seq = layers
        # the reference's fixed slice boundaries (meta_arch/vgg.py:70-74)
        stages = [tnn.Sequential(*seq[0:7]), tnn.Sequential(*seq[7:14]),
                  tnn.Sequential(*seq[14:24]), tnn.Sequential(*seq[24:34]),
                  tnn.Sequential(*seq[34:])]
        rs = np.random.RandomState(7)
        for m in [m for s in stages for m in s if isinstance(m, tnn.Conv2d)]:
            m.weight.data = torch.from_numpy(
                (0.05 * rs.randn(*m.weight.shape)).astype(np.float32))
            m.bias.data = torch.from_numpy((0.1 * rs.randn(*m.bias.shape)).astype(np.float32))
        # d2-named state dict exactly as the reference checkpoints name it
        sd = {}
        for si, stage in enumerate(stages):
            for name, tensor in stage.state_dict().items():
                sd[f"backbone.vgg{si}.{name}"] = tensor.numpy()
        assert len(sd) == 26  # 13 convs x (weight, bias)

        from simple_sfod_tpu.config import detector_config_from_cfg, get_cfg

        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
        cfg.VGG.BN = False
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ("vgg4",)
        det_cfg = detector_config_from_cfg(cfg)
        params, stats = import_torch_checkpoint(sd, det_cfg, strict=False)

        x = np.random.RandomState(8).randn(1, 3, 32, 64).astype(np.float32)
        with torch.no_grad():
            t = torch.from_numpy(x)
            for stage in stages:
                t = stage(t)  # empty stage 4 is identity
            want = t.numpy()

        from simple_sfod_tpu.models.backbones.vgg import VGG16Backbone

        backbone = VGG16Backbone(bn=False)
        feats = backbone.apply(
            {"params": params["backbone"]}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
        got = np.asarray(feats["vgg4"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


class TestEndToEndGolden:
    """Imported-weights forward parity extended THROUGH RPN+ROI to final
    boxes on a fixture image, locked as golden (VERDICT r1 next-round #2a).
    Any change to the backbone, RPN proposal selection, ROIAlign, box head,
    delta decoding, or NMS that shifts these detections fails here."""

    GOLD_BOXES = [
        [0.0, 9.887, 87.173, 53.832],
        [45.463, 6.353, 82.122, 34.403],
        [32.621, 10.491, 110.808, 53.873],
        [76.627, 5.964, 112.621, 32.151],
        [12.665, 6.686, 53.144, 37.811],
    ]
    GOLD_SCORES = [0.527234, 0.492414, 0.484139, 0.478268, 0.470242]
    GOLD_CLASSES = [2, 2, 2, 2, 2]

    def test_detections_match_golden(self):
        from simple_sfod_tpu.models.detector import Detector

        det_cfg = DetectorConfig(
            num_classes=4,
            backbone="vgg16",
            in_feature="vgg4",
            fc_dim=64,
            # pinned: the golden detections depend on the proposal caps
            rpn_pre_nms_topk_test=2048,
            rpn_post_nms_topk_test=512,
        )
        det = Detector(det_cfg)
        sd = _fake_d2_detector_sd(fan_in_scaled=True)
        params, stats = import_torch_checkpoint(sd, det_cfg, strict=False)
        variables = det.init(jax.random.key(0), (64, 128))
        p = dict(variables["params"])
        p.update(params)
        s = dict(variables.get("batch_stats", {}))
        s.update(stats)
        img = np.random.RandomState(11).uniform(0, 255, (1, 64, 128, 3)).astype(np.float32)
        dets = det.infer(
            {"params": p, "batch_stats": s},
            jnp.asarray(img),
            jnp.asarray([[64, 128]], np.int32),
            score_thresh=0.0,
        )
        v = np.asarray(dets.valid[0])
        scores = np.asarray(dets.scores[0])
        order = [i for i in np.argsort(-scores) if v[i]][:5]
        assert int(v.sum()) == 100
        np.testing.assert_allclose(
            np.asarray(dets.boxes[0])[order], self.GOLD_BOXES, atol=2e-2
        )
        np.testing.assert_allclose(scores[order], self.GOLD_SCORES, atol=1e-4)
        assert np.asarray(dets.classes[0])[order].tolist() == self.GOLD_CLASSES

    def test_bf16_eval_drift_bounded(self):
        """TPU.DTYPE=bfloat16 eval vs the f32 goldens: same imported weights,
        same image — quantifies the bf16-compute drift the reference's f32
        eval does not have (PARITY_EVIDENCE). Measured: aligned detections
        drift <0.2px in boxes and <6e-3 in score; detections whose f32
        scores are within ~5e-3 of each other (ranks 4/5 here) can swap
        places, and WHICH near-tie wins is environment-sensitive in bf16 —
        so only the clear-margin top 4 are asserted by identity, and rank 5
        by score level."""
        import jax.numpy as jnp_

        from simple_sfod_tpu.models.detector import Detector

        det_cfg = DetectorConfig(
            num_classes=4,
            backbone="vgg16",
            in_feature="vgg4",
            fc_dim=64,
            rpn_pre_nms_topk_test=2048,
            rpn_post_nms_topk_test=512,
            dtype=jnp_.bfloat16,
        )
        det = Detector(det_cfg)
        sd = _fake_d2_detector_sd(fan_in_scaled=True)
        params, stats = import_torch_checkpoint(sd, det_cfg, strict=False)
        variables = det.init(jax.random.key(0), (64, 128))
        p = dict(variables["params"])
        p.update(params)
        s = dict(variables.get("batch_stats", {}))
        s.update(stats)
        img = np.random.RandomState(11).uniform(0, 255, (1, 64, 128, 3)).astype(np.float32)
        dets = det.infer(
            {"params": p, "batch_stats": s},
            jnp.asarray(img),
            jnp.asarray([[64, 128]], np.int32),
            score_thresh=0.0,
        )
        v = np.asarray(dets.valid[0])
        scores = np.asarray(dets.scores[0])
        order = [i for i in np.argsort(-scores) if v[i]][:5]
        np.testing.assert_allclose(
            np.asarray(dets.boxes[0])[order[:4]], self.GOLD_BOXES[:4], atol=1.0
        )
        np.testing.assert_allclose(scores[order[:4]], self.GOLD_SCORES[:4], atol=1e-2)
        assert np.asarray(dets.classes[0])[order[:4]].tolist() == self.GOLD_CLASSES[:4]
        # rank 5 is a near-tie: assert the score level, not the identity
        assert abs(scores[order[4]] - self.GOLD_SCORES[4]) < 1e-2


class TestAsyncSave:
    """Periodic saves write on a background thread; the last_checkpoint
    marker appears only once the blob is durable, and wait()/load() join."""

    def test_async_save_round_trip(self, tmp_path):
        import jax.numpy as jnp
        from simple_sfod_tpu.checkpoint.checkpointer import Checkpointer

        ck = Checkpointer(str(tmp_path))
        state = {"w": jnp.arange(8, dtype=jnp.float32), "step": jnp.int32(7)}
        ck.save("model_0000007", state, block=False)  # async
        # load() joins the in-flight save before reading
        out = ck.load("model_0000007")
        assert int(out["step"]) == 7
        assert ck.last_checkpoint() == "model_0000007"

    def test_save_error_surfaces_on_wait(self, tmp_path, monkeypatch):
        import jax.numpy as jnp
        import pytest
        from simple_sfod_tpu.checkpoint.checkpointer import Checkpointer

        ck = Checkpointer(str(tmp_path))

        def boom(*a, **k):
            raise RuntimeError("disk full")

        monkeypatch.setattr(ck._ckpt, "save", boom)
        ck.save("model_x", {"w": jnp.zeros(2)}, block=False)
        with pytest.raises(RuntimeError, match="disk full"):
            ck.wait()
        # the marker must not exist for the failed save
        assert ck.last_checkpoint() is None
