"""Worker for the multi-host (multi-process) EVAL test.

Run by tests/test_multihost.py in 2 separate processes, each with one CPU
device: exercises engine/eval_loop.inference_on_dataset's multi-process
path — round-robin batch sharding across processes, local inference, and
the byte-allgather record merge — against the reference's DDP eval
contract (d2 inference_on_dataset under launch(num_machines=...): each
rank infers its shard, results are gathered).

Every process independently computes the single-process result on the
full dataset and asserts the multihost result matches it exactly — the
sharded eval must be invisible in the metrics.

argv: coordinator num_procs pid ims_per_batch
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    ims_per_batch = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()

    from simple_sfod_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs

    import __graft_entry__ as g
    from simple_sfod_tpu.config import detector_config_from_cfg
    from simple_sfod_tpu.data.datasets import get_dataset
    from simple_sfod_tpu.data.loader import build_test_loader
    from simple_sfod_tpu.data.synthetic import register_synthetic
    from simple_sfod_tpu.engine.eval_loop import inference_on_dataset
    from simple_sfod_tpu.models.detector import Detector

    cfg = g._tiny_cfg(1, canvas=(64, 128), backbone="tiny")
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.TEST.IMS_PER_BATCH = ims_per_batch
    register_synthetic("synthetic_eval_mh", 10, (64, 128), 4)
    det = Detector(detector_config_from_cfg(cfg))
    # same seed on every process -> identical variables (the trainers hold
    # replicated state; here the deterministic init stands in for it)
    variables = det.init(jax.random.key(0), tuple(cfg.TPU.CANVAS))
    ds = get_dataset("synthetic_eval_mh")

    def run(mesh):
        loader = build_test_loader(cfg, "synthetic_eval_mh", synthetic=True)
        return inference_on_dataset(
            det, variables, loader, ds["thing_classes"], mesh=mesh
        )

    mesh = make_mesh()  # num_procs-wide 'data' mesh spanning the processes
    assert mesh.devices.size == num_procs
    res_mh = run(mesh)
    res_single = run(None)  # full dataset, local device, no mesh

    assert set(res_mh) == set(res_single), (
        sorted(res_mh), sorted(res_single))
    for k, v in res_single.items():
        if isinstance(v, (int, float)):
            assert np.isfinite(v) == np.isfinite(res_mh[k]), k
            if np.isfinite(v):
                np.testing.assert_allclose(res_mh[k], v, rtol=0, atol=1e-6, err_msg=k)
    print(f"MULTIHOST_EVAL_OK proc={pid}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
