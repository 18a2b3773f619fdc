"""Pallas kernel golden tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_sfod_tpu.ops.pallas_kernels import nms_mask_pallas, suppress_relation
from simple_sfod_tpu.structures.boxes import pairwise_iou

import golden


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestSuppressRelation:
    @pytest.mark.parametrize("n", [50, 200])
    def test_matches_dense(self, n):
        rng = np.random.RandomState(n)
        bx = jnp.asarray(random_boxes(rng, n, 60.0))
        valid = jnp.asarray(rng.rand(n) > 0.1)
        rel = np.asarray(suppress_relation(bx, valid, 0.5, interpret=True))
        iou = np.asarray(pairwise_iou(bx, bx))
        rows, cols = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        v = np.asarray(valid)
        want = (iou > 0.5) & (rows < cols) & v[:, None] & v[None, :]
        np.testing.assert_array_equal(rel, want)


class TestPallasNMS:
    @pytest.mark.parametrize("n,thr", [(60, 0.5), (300, 0.7)])
    def test_matches_greedy(self, n, thr):
        rng = np.random.RandomState(n + 3)
        bx = random_boxes(rng, n, 60.0)
        sc = rng.uniform(0.01, 1.0, n).astype(np.float32)
        keep = np.asarray(
            nms_mask_pallas(jnp.asarray(bx), jnp.asarray(sc), jnp.ones(n, bool), thr, interpret=True)
        )
        want = set(golden.greedy_nms(bx, sc, thr).tolist())
        assert set(np.nonzero(keep)[0].tolist()) == want
