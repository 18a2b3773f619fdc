"""Serving-artifact export (engine/export.py): serialize -> reload -> same
detections as direct inference, including the symbolic-batch and
weights-as-argument modes."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_detector():
    import jax

    import __graft_entry__ as g
    from simple_sfod_tpu.config.defaults import detector_config_from_cfg
    from simple_sfod_tpu.models.detector import Detector

    cfg = g._tiny_cfg(1, canvas=(32, 64), backbone="tiny")
    cfg.freeze()
    det = Detector(detector_config_from_cfg(cfg))
    variables = det.init(jax.random.key(0), (32, 64))
    return det, variables


def _batch(n, seed=0):
    rs = np.random.RandomState(seed)
    return (
        rs.uniform(0, 255, (n, 32, 64, 3)).astype(np.uint8),
        np.tile(np.asarray([[32, 64]], np.int32), (n, 1)),
    )


def _direct(det, variables, images, sizes):
    import jax

    return jax.jit(lambda v, i, s: det.infer(v, i, s))(variables, images, sizes)


def _assert_matches(got, want):
    np.testing.assert_allclose(np.asarray(got["boxes"]), np.asarray(want.boxes), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["scores"]), np.asarray(want.scores), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["classes"]), np.asarray(want.classes))
    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(want.valid))


def test_export_roundtrip_bundled(tiny_detector, tmp_path):
    from simple_sfod_tpu.engine.export import export_inference, load_exported, save_exported

    det, variables = tiny_detector
    exported = export_inference(det, variables, (32, 64), batch=2)
    path = str(tmp_path / "model.sfodx")
    size = save_exported(exported, path)
    assert size > 1000

    reloaded, _ = load_exported(path)
    images, sizes = _batch(2)
    got = reloaded.call(images, sizes)
    _assert_matches(got, _direct(det, variables, images, sizes))


def test_export_symbolic_batch(tiny_detector, tmp_path):
    """batch=None exports a symbolic batch dim: one artifact, any batch size."""
    from simple_sfod_tpu.engine.export import export_inference, load_exported, save_exported

    det, variables = tiny_detector
    exported = export_inference(det, variables, (32, 64), batch=None)
    path = str(tmp_path / "poly.sfodx")
    save_exported(exported, path)
    reloaded, _ = load_exported(path)
    for n in (1, 3):
        images, sizes = _batch(n, seed=n)
        got = reloaded.call(images, sizes)
        assert np.asarray(got["boxes"]).shape[0] == n
        _assert_matches(got, _direct(det, variables, images, sizes))


def test_export_params_as_argument(tiny_detector, tmp_path):
    """bundle_params=False: the same artifact serves updated weights."""
    import jax

    from simple_sfod_tpu.engine.export import export_inference, load_exported, save_exported

    det, variables = tiny_detector
    exported = export_inference(det, variables, (32, 64), batch=1, bundle_params=False)
    path = str(tmp_path / "arg.sfodx")
    save_exported(exported, path)
    reloaded, _ = load_exported(path)
    images, sizes = _batch(1)
    _assert_matches(reloaded.call(variables, images, sizes), _direct(det, variables, images, sizes))
    # perturbed weights flow through the SAME artifact
    bumped = jax.tree.map(lambda a: a * 1.05 if a.dtype == np.float32 else a, variables)
    _assert_matches(reloaded.call(bumped, images, sizes), _direct(det, bumped, images, sizes))


def test_export_params_dtype_bf16(tiny_detector, tmp_path):
    """params_dtype='bfloat16' halves the bundled weights and the artifact
    still reproduces direct inference over the SAME cast tree exactly."""
    import jax

    from simple_sfod_tpu.engine.export import (
        cast_floating,
        export_inference,
        load_exported,
        save_exported,
    )

    det, variables = tiny_detector
    f32_path = str(tmp_path / "f32.sfodx")
    bf16_path = str(tmp_path / "bf16.sfodx")
    f32_size = save_exported(export_inference(det, variables, (32, 64), batch=1), f32_path)
    bf16_size = save_exported(
        export_inference(det, variables, (32, 64), batch=1, params_dtype="bfloat16"),
        bf16_path,
    )
    assert bf16_size < f32_size  # weights dominate the blob; bf16 shrinks it

    cast = cast_floating(variables, "bfloat16")
    leaves = jax.tree.leaves(cast)
    assert any(a.dtype == jax.numpy.bfloat16 for a in leaves)
    assert all(a.dtype != np.float32 or not np.issubdtype(a.dtype, np.floating) for a in leaves)

    reloaded, _ = load_exported(bf16_path)
    images, sizes = _batch(1)
    _assert_matches(reloaded.call(images, sizes), _direct(det, cast, images, sizes))


def test_export_serves_data_parallel(tiny_detector, tmp_path):
    """The serving story is TPU-native end to end: one reloaded artifact jits
    under a data-sharded mesh and matches the unsharded call — batch-parallel
    serving over N chips needs no model code on the serving host."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from simple_sfod_tpu.engine.export import export_inference, load_exported, save_exported

    det, variables = tiny_detector
    # symbolic batch: the SAME artifact serves any per-host batch, so the
    # mesh size is a deployment choice, not an export-time constant
    path = str(tmp_path / "serve.sfodx")
    save_exported(export_inference(det, variables, (32, 64), batch=None), path)
    reloaded, _ = load_exported(path)

    devices = jax.devices()
    assert len(devices) >= 8, "conftest forces 8 virtual devices"
    mesh = Mesh(np.asarray(devices[:8]), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    sharded = jax.jit(
        reloaded.call, in_shardings=(batch_sharding, batch_sharding)
    )

    images, sizes = _batch(8, seed=7)
    got = sharded(jnp.asarray(images), jnp.asarray(sizes))
    # outputs really are distributed over the mesh
    assert len(got["boxes"].sharding.device_set) == 8
    _assert_matches(got, _direct(det, variables, images, sizes))


def test_load_rejects_non_artifact(tmp_path):
    from simple_sfod_tpu.engine.export import load_exported

    p = tmp_path / "junk.bin"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="not a simple_sfod_tpu exported model"):
        load_exported(str(p))
