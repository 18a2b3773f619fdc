"""Training-state pytrees.

Everything a trainer mutates lives in one pytree so each workload is a single
donated-argument jitted step: params, BN running stats, optimizer state, the
EMA teacher replica, and the adaptive-threshold statistics (the reference
keeps the latter as Python-side tensors, source_free_adaptive_teacher.py:
116-120,297-333 — here they ride inside the compiled graph)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdaptiveThresholdState:
    """FlexMatch-style per-class dynamic threshold statistics
    (reference adaptive_thresh/adaptive_confidence.py + trainer :282-333):
    a rolling reserve matrix of per-class pseudo-label counts over the last
    RESERVE steps; classwise_acc = count_c / max_c(count)."""

    reserve: jnp.ndarray  # [RESERVE, C] int32 rolling counts
    classwise_acc: jnp.ndarray  # [C] float32
    cursor: jnp.ndarray  # scalar int32

    @staticmethod
    def create(num_classes: int, reserve: int = 500) -> "AdaptiveThresholdState":
        return AdaptiveThresholdState(
            reserve=jnp.zeros((reserve, num_classes), jnp.int32),
            classwise_acc=jnp.zeros((num_classes,), jnp.float32),
            cursor=jnp.zeros((), jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TeacherStudentState(TrainState):
    """Student in the TrainState slots; teacher replica + threshold state.

    The reference stores both in an EnsembleTSModel nn.Module
    (meta_arch/ts_ensemble.py); here the teacher is literally a second
    (params, batch_stats) pytree and the EMA update is a tree_map."""

    teacher_params: Any = None
    teacher_stats: Any = None
    thresh: Optional[AdaptiveThresholdState] = None

    def teacher_variables(self):
        return {"params": self.teacher_params, "batch_stats": self.teacher_stats}


def ema_update(teacher, student, keep_rate: float):
    """EMA teacher update (reference _update_teacher_model,
    source_free_adaptive_teacher.py:583-603): t = keep*t + (1-keep)*s."""
    return jax.tree.map(
        lambda t, s: t * keep_rate + s.astype(t.dtype) * (1.0 - keep_rate),
        teacher,
        student,
    )
