"""HTTP serving of exported artifacts (engine/serve.py): artifact metadata,
loader-parity preprocessing, file-coordinate postprocessing, HTTP round
trip."""

import io
import json
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """A tiny-backbone artifact with serving metadata, like export_model.py
    writes."""
    import jax

    import __graft_entry__ as g
    from simple_sfod_tpu.config.defaults import detector_config_from_cfg
    from simple_sfod_tpu.engine.export import export_inference, save_exported
    from simple_sfod_tpu.models.detector import Detector

    cfg = g._tiny_cfg(1, canvas=(32, 64), backbone="tiny")
    cfg.freeze()
    det = Detector(detector_config_from_cfg(cfg))
    variables = det.init(jax.random.key(0), (32, 64))
    exported = export_inference(det, variables, (32, 64), batch=1)
    path = str(tmp_path_factory.mktemp("serve") / "tiny.sfodx")
    save_exported(
        exported,
        path,
        meta={
            "canvas": [32, 64],
            "batch": 1,
            "min_size": 32,
            "max_size": 64,
            "image_format": "BGR",
            "class_names": [f"c{i}" for i in range(8)],
            "model": "teacher",
            "bundle_params": True,
            "config": "tiny-test",
        },
    )
    return path, det, variables


def test_service_info_and_predict(artifact):
    from simple_sfod_tpu.engine.serve import DetectionService

    path, det, variables = artifact
    svc = DetectionService(path)
    info = svc.info()
    assert info["canvas"] == [32, 64] and info["class_names"][2] == "c2"

    rs = np.random.RandomState(0)
    img = rs.uniform(0, 255, (32, 64, 3)).astype(np.uint8)
    res = svc.predict_array(img)
    assert res["width"] == 64 and res["height"] == 32
    for d in res["detections"]:
        x0, y0, x1, y1 = d["box"]
        assert 0 <= x0 <= x1 <= 64 and 0 <= y0 <= y1 <= 32
        assert d["class_name"] == f"c{d['class']}"
    # min_score filters
    if res["detections"]:
        hi = svc.predict_array(img, min_score=res["detections"][0]["score"] + 1e-3)
        assert len(hi["detections"]) < len(res["detections"]) or not hi["detections"]


def test_predict_matches_direct_inference(artifact):
    """Service output equals direct infer on an exactly-canvas-sized image
    (no resize: boxes should match the raw detections bit-for-bit)."""
    import jax

    from simple_sfod_tpu.engine.serve import DetectionService

    path, det, variables = artifact
    svc = DetectionService(path)
    rs = np.random.RandomState(1)
    img = rs.uniform(0, 255, (32, 64, 3)).astype(np.uint8)
    res = svc.predict_array(img)

    dets = jax.jit(lambda v, i, s: det.infer(v, i, s))(
        variables, img[None], np.asarray([[32, 64]], np.int32)
    )
    valid = np.asarray(dets.valid[0])
    want = np.clip(np.asarray(dets.boxes[0])[valid], 0, [64, 32, 64, 32])
    order = np.argsort(-np.asarray(dets.scores[0])[valid], kind="stable")
    got = np.asarray([d["box"] for d in res["detections"]]).reshape(-1, 4)
    np.testing.assert_allclose(got, want[order], rtol=1e-5, atol=1e-4)


def test_microbatch_coalesces_concurrent_requests(artifact):
    """Concurrent predicts share ONE device call on a batch>1 artifact, and
    each requester still gets its own image's detections."""
    import threading

    import jax

    import __graft_entry__ as g
    from simple_sfod_tpu.config.defaults import detector_config_from_cfg
    from simple_sfod_tpu.engine.export import export_inference, save_exported
    from simple_sfod_tpu.engine.serve import DetectionService
    from simple_sfod_tpu.models.detector import Detector

    path, det, variables = artifact
    import os
    import tempfile

    b4_path = os.path.join(tempfile.mkdtemp(), "tiny_b4.sfodx")
    save_exported(
        export_inference(det, variables, (32, 64), batch=4),
        b4_path,
        meta={"canvas": [32, 64], "batch": 4, "min_size": 32, "max_size": 64,
              "image_format": "BGR", "bundle_params": True, "config": "tiny-b4"},
    )
    svc = DetectionService(b4_path)
    svc._run_batch([svc._prepare(np.zeros((32, 64, 3), np.uint8))])  # warm compile
    calls_before = svc._batcher.calls

    rs = np.random.RandomState(3)
    imgs = [rs.uniform(0, 255, (32, 64, 3)).astype(np.uint8) for _ in range(4)]
    results = [None] * 4

    def worker(i):
        results[i] = svc.predict_array(imgs[i])

    # deterministic on a loaded 1-core box: hold the drain gate until all 4
    # requests are enqueued, so coalescing never races thread scheduling
    svc._batcher._gate.clear()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    import time

    deadline = time.monotonic() + 30
    while len(svc._batcher._queue) < 4:
        assert time.monotonic() < deadline, "requests never enqueued"
        time.sleep(0.005)
    svc._batcher._gate.set()
    for t in threads:
        t.join()
    assert svc._batcher.calls - calls_before == 1  # coalesced, not 4 calls

    # per-request correctness: each answer equals that image's direct infer
    infer = jax.jit(lambda v, i, s: det.infer(v, i, s))
    for img, res in zip(imgs, results):
        dets = infer(variables, img[None], np.asarray([[32, 64]], np.int32))
        valid = np.asarray(dets.valid[0])
        want = np.clip(np.asarray(dets.boxes[0])[valid], 0, [64, 32, 64, 32])
        order = np.argsort(-np.asarray(dets.scores[0])[valid], kind="stable")
        got = np.asarray([d["box"] for d in res["detections"]]).reshape(-1, 4)
        np.testing.assert_allclose(got, want[order], rtol=1e-5, atol=1e-4)


def test_http_round_trip(artifact):
    from simple_sfod_tpu.engine.serve import DetectionService, serve_in_thread

    path, _, _ = artifact
    srv, base = serve_in_thread(DetectionService(path))
    try:
        info = json.load(urllib.request.urlopen(f"{base}/"))
        assert info["canvas"] == [32, 64]

        # .npy body
        rs = np.random.RandomState(2)
        img = rs.uniform(0, 255, (32, 64, 3)).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(), method="POST")
        res = json.load(urllib.request.urlopen(req))
        assert res["width"] == 64 and "detections" in res

        # PNG body (PIL decode path + BGR conversion)
        from PIL import Image

        pbuf = io.BytesIO()
        Image.fromarray(img[:, :, ::-1]).save(pbuf, format="PNG")  # file is RGB
        req = urllib.request.Request(f"{base}/predict", data=pbuf.getvalue(), method="POST")
        res_png = json.load(urllib.request.urlopen(req))
        assert [d["box"] for d in res_png["detections"]] == [d["box"] for d in res["detections"]]

        # bad body -> 400 with an error message
        req = urllib.request.Request(f"{base}/predict", data=b"garbage", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_metaless_artifact_is_servable(artifact, tmp_path):
    """save_exported(..., meta=None) is a public path (bench_serving writes
    artifacts this way): the service must derive batch — like it already
    derives canvas — from the input avals instead of assuming 1."""
    import jax
    import numpy as np

    from simple_sfod_tpu.engine.export import export_inference, save_exported
    from simple_sfod_tpu.engine.serve import DetectionService

    _, det, variables = artifact
    exported = export_inference(det, variables, (32, 64), batch=2)
    path = str(tmp_path / "metaless.sfodx")
    save_exported(exported, path, meta=None)
    svc = DetectionService(path, max_wait_ms=0.0)
    assert svc.batch == 2 and not svc.poly
    assert svc.canvas == (32, 64)
    rng = np.random.default_rng(0)
    out = svc.predict_array(rng.integers(0, 256, (32, 64, 3), dtype=np.uint8))
    assert out["detections"] and out["height"] == 32


def test_poly_artifact_service_pads_to_pow2(artifact, tmp_path):
    """Symbolic-batch artifacts serve any K, but the service pads each call
    to the next power of two so jit compiles at most {1,2,4,8} shapes
    instead of one per coalesced request count."""
    import numpy as np

    from simple_sfod_tpu.engine.export import export_inference, save_exported
    from simple_sfod_tpu.engine.serve import DetectionService

    _, det, variables = artifact
    exported = export_inference(det, variables, (32, 64), batch=None)
    path = str(tmp_path / "poly.sfodx")
    save_exported(exported, path, meta=None)
    svc = DetectionService(path, max_wait_ms=0.0)
    assert svc.poly and svc.batch == 8  # symbolic dim detected without meta
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 64, 3), dtype=np.uint8)
    out = svc.predict_array(img)  # k=1 -> b=1
    assert out["height"] == 32
    payloads = [svc._prepare(img) for _ in range(3)]  # k=3 -> padded b=4
    outs = svc._run_batch(payloads)
    assert len(outs) == 3
    for o, ref in zip(outs[1:], outs[:-1]):
        np.testing.assert_allclose(o["boxes"], ref["boxes"], rtol=1e-5)
