"""JAX -> Detectron2 `.pth` reverse exporter (checkpoint/torch_export.py).

The exporter is the bridge to off-box absolute-mAP validation: a JAX-trained
checkpoint becomes the exact artifact the reference eval stack consumes
(fvcore-Checkpointer wrapper, d2 key naming, EnsembleTSModel prefixes —
reference daod/checkpoint/detection_ts_checkpointer.py:11-90). Coverage:

  * sd-level round trip: reference-named sd -> import -> export reproduces
    every tensor bit-for-bit (VGG16-BN full detector, ResNet backbone).
  * params-level round trip: random flax detector -> export -> re-import ->
    bit-equal params => bit-equal detector forward.
  * torch forward from the exported file: a torch VGG (d2 stage layout)
    loaded with `load_state_dict(strict=True)` from our export matches the
    flax backbone forward to the import-test tolerance; a torch box head +
    predictor from the export matches FasterRCNN.box (covers the fc0
    NCHW/NHWC flatten inverse on real modules).
  * ensemble export (modelTeacher./modelStudent.) and the fvcore save wrapper.
  * tools/export_weights.py CLI end-to-end from an orbax train state.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.checkpoint.torch_export import (
    export_ensemble,
    export_torch_checkpoint,
    export_train_state,
    save_torch_file,
)
from simple_sfod_tpu.checkpoint.torch_import import (
    import_torch_checkpoint,
    load_torch_file,
)
from simple_sfod_tpu.models.faster_rcnn import DetectorConfig

from test_checkpoint import _fake_d2_detector_sd  # noqa: E402 (tests dir on path)


VGG_CFG = DetectorConfig(num_classes=4, backbone="vgg16", in_feature="vgg4", fc_dim=64)


def _init_detector(det_cfg, canvas=(32, 64)):
    from simple_sfod_tpu.models.detector import Detector

    det = Detector(det_cfg)
    variables = det.init(jax.random.key(0), canvas)
    return det, variables


def _assert_tree_bitequal(got, want, path=""):
    assert set(got) == set(want), f"{path}: {set(got) ^ set(want)}"
    for k in want:
        g, w = got[k], want[k]
        if isinstance(w, dict):
            _assert_tree_bitequal(g, w, f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=f"{path}/{k}"
            )


class TestSdRoundTrip:
    """import(sd) -> export reproduces the reference-named tensors exactly."""

    def test_vgg_bn_full_detector(self):
        sd = _fake_d2_detector_sd()
        params, stats = import_torch_checkpoint(sd, VGG_CFG, strict=False)
        out = export_torch_checkpoint(params, stats, VGG_CFG)
        for k, v in sd.items():
            np.testing.assert_array_equal(out[k], v, err_msg=k)
        extras = set(out) - set(sd)
        assert all(
            k.endswith("num_batches_tracked") or k in ("pixel_mean", "pixel_std")
            for k in extras
        ), extras

    def test_vgg_nobn(self):
        # no-BN layout: the reference's FIXED stage slices shift the per-stage
        # conv indices (torch_import._D2_STAGE_CONVS_NOBN); the exporter must
        # emit those exact shifted names back.
        cfg = DetectorConfig(
            num_classes=4, backbone="vgg16", vgg_bn=False, in_feature="vgg4", fc_dim=64
        )
        rs = np.random.RandomState(5)
        sd = {}
        conv_idxs = [(0, 2, 5), (0, 3, 5), (0, 3, 5, 7), (0, 2, 4), ()]
        widths = [(64, 64, 128), (128, 256, 256), (256, 512, 512, 512), (512, 512, 512), ()]
        in_c = 3
        for stage, (idxs, ws) in enumerate(zip(conv_idxs, widths)):
            for idx, w in zip(idxs, ws):
                sd[f"backbone.vgg{stage}.{idx}.weight"] = rs.randn(w, in_c, 3, 3).astype(np.float32)
                sd[f"backbone.vgg{stage}.{idx}.bias"] = rs.randn(w).astype(np.float32)
                in_c = w
        # heads are layout-independent; reuse the BN fixture's head tensors
        sd.update(
            {k: v for k, v in _fake_d2_detector_sd().items() if not k.startswith("backbone.")}
        )
        params, stats = import_torch_checkpoint(sd, cfg, strict=False)
        out = export_torch_checkpoint(params, stats, cfg)
        for k, v in sd.items():
            np.testing.assert_array_equal(out[k], v, err_msg=k)

    def test_resnet_backbone(self):
        # flax-init resnet50 (through res4) -> export -> import: tree-exact.
        cfg = DetectorConfig(
            num_classes=4,
            backbone="resnet50",
            resnet_norm="FrozenBN",
            in_feature="res4",
            fc_dim=32,
        )
        det, variables = _init_detector(cfg)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables.get("batch_stats", {}))
        sd = export_torch_checkpoint(params, stats, cfg)
        assert "backbone.stem.conv1.weight" in sd
        assert "backbone.res4.5.conv3.weight" in sd  # resnet50 res4 has 6 blocks
        assert not any(k.startswith("backbone.res5") for k in sd)
        re_params, re_stats = import_torch_checkpoint(sd, cfg, strict=False)
        _assert_tree_bitequal(re_params["backbone"], params["backbone"])


class TestParamsRoundTrip:
    def test_flax_export_reimport_bitequal_forward(self):
        """Random flax detector -> export -> re-import: bit-equal params, and
        therefore a bit-equal detector forward (the verdict's done-criterion)."""
        det, variables = _init_detector(VGG_CFG)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables.get("batch_stats", {}))
        sd = export_torch_checkpoint(params, stats, VGG_CFG)
        re_params, re_stats = import_torch_checkpoint(sd, VGG_CFG, strict=True)
        for top in ("backbone", "rpn_head", "box_head", "predictor"):
            _assert_tree_bitequal(re_params[top], params[top], top)
        _assert_tree_bitequal(re_stats["backbone"], stats["backbone"], "stats")

        img = np.random.RandomState(1).uniform(0, 255, (1, 32, 64, 3)).astype(np.float32)
        sizes = jnp.asarray([[32, 64]], jnp.int32)
        p = dict(params)
        p.update(re_params)
        want = det.infer({"params": params, "batch_stats": stats}, jnp.asarray(img), sizes)
        got = det.infer({"params": p, "batch_stats": re_stats}, jnp.asarray(img), sizes)
        np.testing.assert_array_equal(np.asarray(got.boxes), np.asarray(want.boxes))
        np.testing.assert_array_equal(np.asarray(got.scores), np.asarray(want.scores))

    def test_bf16_state_exports_as_f32(self):
        det, variables = _init_detector(VGG_CFG)
        params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables["params"])
        sd = export_torch_checkpoint(
            jax.device_get(params16), jax.device_get(variables.get("batch_stats", {})), VGG_CFG
        )
        assert all(
            v.dtype in (np.float32, np.int64) for v in sd.values()
        ), {k: v.dtype for k, v in sd.items() if v.dtype not in (np.float32, np.int64)}


class TestTorchForwardFromExport:
    """The exported file drives real torch modules: load_state_dict(strict)
    accepts it and the torch forward matches the jax forward (import-test
    tolerance, rtol=1e-3/atol=1e-2 like TestNoBNImportFidelity)."""

    @pytest.mark.parametrize("bn", [True, False])
    def test_backbone_forward(self, bn):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        cfg = DetectorConfig(
            num_classes=4, backbone="vgg16", vgg_bn=bn, in_feature="vgg4", fc_dim=64
        )
        det, variables = _init_detector(cfg)
        # tame the random init so 13 stacked convs keep activations O(1)
        params = jax.device_get(variables["params"])
        sd = export_torch_checkpoint(
            params, jax.device_get(variables.get("batch_stats", {})), cfg
        )

        # the reference's make_layers(vgg16, batch_norm=bn) sequence, sliced
        # at the FIXED boundaries (reference meta_arch/vgg.py:70-74)
        widths = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                  512, 512, 512, "M", 512, 512, 512, "M"]
        layers = []
        in_c = 3
        for v in widths:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_c, v, 3, padding=1))
                if bn:
                    layers.append(tnn.BatchNorm2d(v))
                layers.append(tnn.ReLU())
                in_c = v
        bounds = [(0, 7), (7, 14), (14, 24), (24, 34), (34, len(layers))]
        stages = [tnn.Sequential(*layers[a:b]) for a, b in bounds]
        backbone_sd = {
            k[len("backbone."):]: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()
            if k.startswith("backbone.")
        }
        holder = tnn.Module()
        for i, s in enumerate(stages):
            holder.add_module(f"vgg{i}", s)
        holder.load_state_dict(backbone_sd, strict=True)
        holder.eval()

        x = np.random.RandomState(8).randn(1, 3, 32, 64).astype(np.float32)
        with torch.no_grad():
            t = torch.from_numpy(x)
            for s in stages:
                t = s(t)
            want = t.numpy()

        from simple_sfod_tpu.models.backbones.vgg import VGG16Backbone

        backbone = VGG16Backbone(bn=bn)
        vb = {"params": params["backbone"]}
        if bn:
            vb["batch_stats"] = jax.device_get(variables["batch_stats"])["backbone"]
        feats = backbone.apply(vb, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        got = np.asarray(feats["vgg4"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)

    def test_box_head_forward(self):
        """fc0 inverse on real torch Linears: torch flattens pooled NCHW, we
        flatten NHWC — the exported fc1 must make both paths agree."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        det, variables = _init_detector(VGG_CFG)
        params = jax.device_get(variables["params"])
        sd = export_torch_checkpoint(
            params, jax.device_get(variables.get("batch_stats", {})), VGG_CFG
        )

        fc1 = tnn.Linear(512 * 7 * 7, 64)
        fc2 = tnn.Linear(64, 64)
        cls = tnn.Linear(64, 5)
        reg = tnn.Linear(64, 16)
        with torch.no_grad():
            for mod, key in (
                (fc1, "roi_heads.box_head.fc1"),
                (fc2, "roi_heads.box_head.fc2"),
                (cls, "roi_heads.box_predictor.cls_score"),
                (reg, "roi_heads.box_predictor.bbox_pred"),
            ):
                mod.weight.copy_(torch.from_numpy(sd[f"{key}.weight"]))
                mod.bias.copy_(torch.from_numpy(sd[f"{key}.bias"]))

        rs = np.random.RandomState(9)
        pooled_nhwc = rs.randn(3, 7, 7, 512).astype(np.float32) * 0.1
        with torch.no_grad():
            t = torch.from_numpy(pooled_nhwc.transpose(0, 3, 1, 2)).flatten(1)
            t = torch.relu(fc1(t))
            t = torch.relu(fc2(t))
            want_scores, want_deltas = cls(t).numpy(), reg(t).numpy()

        from simple_sfod_tpu.models.faster_rcnn import FasterRCNN

        model = FasterRCNN(VGG_CFG)
        scores, deltas = model.apply(
            {"params": params}, jnp.asarray(pooled_nhwc), method=FasterRCNN.box
        )
        np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(deltas), want_deltas, rtol=1e-4, atol=1e-4)


class TestEnsembleAndStates:
    def test_ensemble_prefixes_and_student_reimport(self):
        sd0 = _fake_d2_detector_sd()
        s_params, s_stats = import_torch_checkpoint(sd0, VGG_CFG, strict=False)
        t_params = jax.tree.map(lambda x: x + 1.0, s_params)
        t_stats = jax.tree.map(lambda x: x * 2.0, s_stats)
        sd = export_ensemble(s_params, s_stats, t_params, t_stats, VGG_CFG)
        assert any(k.startswith("modelTeacher.") for k in sd)
        assert any(k.startswith("modelStudent.") for k in sd)
        # reference EnsembleTSModel registers modelTeacher first
        assert next(iter(sd)).startswith("modelTeacher.")
        # the importer's ensemble routing picks the student back out
        re_params, _ = import_torch_checkpoint(sd, VGG_CFG, strict=False)
        _assert_tree_bitequal(re_params["backbone"], jax.device_get(s_params)["backbone"])
        # teacher values really differ
        tk = sd["modelTeacher.backbone.vgg0.0.weight"]
        sk = sd["modelStudent.backbone.vgg0.0.weight"]
        assert np.all(tk != sk)

    def test_export_train_state_routing(self):
        sd0 = _fake_d2_detector_sd()
        params, stats = import_torch_checkpoint(sd0, VGG_CFG, strict=False)
        flat = {"params": params, "batch_stats": stats, "step": 3}
        assert "modelTeacher.backbone.vgg0.0.weight" not in export_train_state(flat, VGG_CFG)

        ts = {
            "params": {"det": params},
            "batch_stats": stats,
            "teacher_params": jax.tree.map(lambda x: x + 1.0, params),
            "teacher_stats": stats,
            "step": 3,
        }
        sd = export_train_state(ts, VGG_CFG)  # auto -> ensemble
        assert "modelTeacher.backbone.vgg0.0.weight" in sd
        student = export_train_state(ts, VGG_CFG, which="student")
        np.testing.assert_array_equal(
            student["backbone.vgg0.0.weight"], sd0["backbone.vgg0.0.weight"]
        )
        teacher = export_train_state(ts, VGG_CFG, which="teacher")
        np.testing.assert_array_equal(
            teacher["backbone.vgg0.0.weight"], sd0["backbone.vgg0.0.weight"] + 1.0
        )
        with pytest.raises(ValueError):
            export_train_state(flat, VGG_CFG, which="teacher")

    def test_save_torch_file_fvcore_wrapper(self, tmp_path):
        torch = pytest.importorskip("torch")
        sd0 = _fake_d2_detector_sd()
        params, stats = import_torch_checkpoint(sd0, VGG_CFG, strict=False)
        sd = export_torch_checkpoint(params, stats, VGG_CFG)
        path = str(tmp_path / "model_final.pth")
        save_torch_file(sd, path, iteration=1234)
        raw = torch.load(path, map_location="cpu", weights_only=False)
        assert set(raw) == {"model", "iteration"} and raw["iteration"] == 1234
        assert all(isinstance(v, torch.Tensor) for v in raw["model"].values())
        # our own .pth reader consumes it (and strips num_batches_tracked)
        back = load_torch_file(path)
        assert not any(k.endswith("num_batches_tracked") for k in back)
        for k, v in sd0.items():
            np.testing.assert_array_equal(back[k], v, err_msg=k)


class TestExportCLI:
    def test_cli_from_orbax_train_state(self, tmp_path, monkeypatch):
        """tools/export_weights.py end-to-end: orbax train state -> .pth ->
        re-import reproduces the detector tree."""
        torch = pytest.importorskip("torch")
        from simple_sfod_tpu.checkpoint.checkpointer import Checkpointer
        from simple_sfod_tpu.engine.train_state import TrainState

        sd0 = _fake_d2_detector_sd()
        params, stats = import_torch_checkpoint(sd0, VGG_CFG, strict=False)
        state = TrainState(
            step=jnp.asarray(17, jnp.int32),
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, stats),
            opt_state=(),
        )
        ckpt = Checkpointer(str(tmp_path / "out"))
        ckpt.save("model_final", state)

        cfg_file = tmp_path / "cfg.yaml"
        cfg_file.write_text(
            "MODEL:\n"
            "  BACKBONE:\n    NAME: build_vgg_backbone\n"
            "  ROI_HEADS:\n    IN_FEATURES: [vgg4]\n    NUM_CLASSES: 4\n"
        )
        out = tmp_path / "model_final.pth"
        import sys

        import tools.export_weights as ew

        monkeypatch.setattr(
            sys,
            "argv",
            [
                "export_weights.py",
                "--ckpt", str(tmp_path / "out" / "model_final"),
                "--config-file", str(cfg_file),
                "--output", str(out),
            ],
        )
        ew.main()
        back = load_torch_file(str(out))
        for k, v in sd0.items():
            np.testing.assert_array_equal(back[k], v, err_msg=k)
        raw = torch.load(str(out), map_location="cpu", weights_only=False)
        assert raw["iteration"] == 17
