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
