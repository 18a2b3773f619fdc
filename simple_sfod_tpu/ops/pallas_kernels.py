"""Pallas TPU kernels for the detection hot ops.

The NMS fixpoint's dominant compute is building the [N, N] suppression
relation (pairwise IoU > threshold, upper triangle, validity-masked). As
plain XLA this materialises the full f32 IoU matrix in HBM; the Pallas
kernel tiles it through VMEM and emits only the boolean relation — an
O(N^2) f32 HBM round-trip saved.

Kernels follow /opt/skills/guides/pallas_guide.md conventions: 128-aligned
tiles, VMEM block specs, broadcasted_iota for index math. `interpret=True`
paths let the CPU test suite golden-check the kernels without a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _suppress_relation_kernel(boxes_ref, valid_ref, thr_ref, out_ref):
    """One (TILE, TILE) tile of the suppression relation.

    boxes_ref: [4, N] transposed coords (full, VMEM — N on the lane axis, so
               the whole array is a handful of aligned vector rows; the
               direct [N, 4] layout would put 4 on the lanes AND needs loads
               from ANY-space refs, which the TPU backend rejects)
    valid_ref: [1, N] float (full, VMEM)
    thr_ref:   [1, 1] (SMEM)          out_ref:   [TILE, TILE] bool tile
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = i * TILE
    col0 = j * TILE

    rows = boxes_ref[:, pl.ds(row0, TILE)]  # [4, T] suppressor candidates
    cols = boxes_ref[:, pl.ds(col0, TILE)]  # [4, T] suppressees

    lt_x = jnp.maximum(rows[0][:, None], cols[0][None, :])
    lt_y = jnp.maximum(rows[1][:, None], cols[1][None, :])
    rb_x = jnp.minimum(rows[2][:, None], cols[2][None, :])
    rb_y = jnp.minimum(rows[3][:, None], cols[3][None, :])
    inter = jnp.maximum(rb_x - lt_x, 0.0) * jnp.maximum(rb_y - lt_y, 0.0)
    area_r = (rows[2] - rows[0]) * (rows[3] - rows[1])
    area_c = (cols[2] - cols[0]) * (cols[3] - cols[1])
    union = area_r[:, None] + area_c[None, :] - inter
    iou = jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)

    # strict upper triangle in GLOBAL indices (row suppresses later col)
    gi = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    gj = col0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    # validity combined in f32: Mosaic only supports minor-dim insertion
    # (the [T] -> [T, 1] broadcast) for 32-bit types, not i1 vectors
    vr = valid_ref[0, pl.ds(row0, TILE)]  # [T] float
    vc = valid_ref[0, pl.ds(col0, TILE)]
    vmask = (vr[:, None] * vc[None, :]) > 0.25

    out_ref[:, :] = (iou > thr_ref[0, 0]) & (gi < gj) & vmask


def suppress_relation(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, 4] score-sorted boxes + [N] valid -> [N, N] bool relation
    (row may suppress col). N is padded to a multiple of 128."""
    n = boxes.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    if n_pad != n:
        boxes = jnp.pad(boxes, ((0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, ((0, n_pad - n),))
    grid = (n_pad // TILE, n_pad // TILE)
    thr = jnp.asarray([[iou_threshold]], jnp.float32)

    rel = pl.pallas_call(
        _suppress_relation_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.bool_),
        grid=grid,
        in_specs=[
            # whole [4, N] / [1, N] arrays live in VMEM for every tile (N on
            # the lane axis; a few KB even at N=4096) — loads from ANY-space
            # refs are illegal on the TPU backend
            pl.BlockSpec((4, n_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        boxes.astype(jnp.float32).T,
        valid.astype(jnp.float32)[None, :],
        thr,
    )
    return rel[:n, :n]


def nms_mask_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact greedy NMS: Pallas-built suppression relation + the same
    certain-suppression fixpoint as ops.nms.nms_mask_matrix."""
    n = boxes.shape[0]
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order)

    rel = suppress_relation(sboxes, svalid, iou_threshold, interpret=interpret)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        sup, _ = state
        alive = svalid & ~sup
        threatened = jnp.any(rel & alive[:, None], axis=0)
        certain = alive & ~threatened
        new_sup = sup | jnp.any(rel & certain[:, None], axis=0)
        return new_sup, jnp.any(new_sup != sup)

    sup, _ = jax.lax.while_loop(cond, body, (jnp.zeros((n,), bool), jnp.asarray(True)))
    keep_sorted = svalid & ~sup
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)
