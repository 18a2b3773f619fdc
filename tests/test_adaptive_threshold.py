"""FlexMatch adaptive-threshold semantics (reference
adaptive_thresh/adaptive_confidence.py:29 convex rule + trainer
update_adaptive_threshold sfat.py:297-333)."""

import numpy as np
import jax.numpy as jnp

from simple_sfod_tpu.engine.train_state import AdaptiveThresholdState


def reference_mask(conf, classes, acc, thr):
    # convex rule: conf >= thr * acc_c / (2 - acc_c)
    a = acc[classes]
    return conf >= thr * a / (2.0 - a)


class TestConvexRule:
    def test_full_acc_equals_fixed_threshold(self):
        acc = np.ones(4)
        conf = np.asarray([0.79, 0.80, 0.81])
        classes = np.asarray([0, 1, 2])
        mask = reference_mask(conf, classes, acc, 0.8)
        assert mask.tolist() == [False, True, True]

    def test_rare_class_lower_threshold(self):
        acc = np.asarray([1.0, 0.2, 1.0, 1.0])
        thr = 0.8
        eff = thr * acc[1] / (2 - acc[1])  # ~0.089
        assert eff < 0.1
        mask = reference_mask(np.asarray([0.15]), np.asarray([1]), acc, thr)
        assert mask.tolist() == [True]


class TestReserveMatrix:
    def test_counter_and_pinning(self):
        state = AdaptiveThresholdState.create(num_classes=4, reserve=3)
        # simulate 3 steps of counts; classes 0 and 2 pinned by the trainer
        counts = [
            np.asarray([5, 1, 9, 0]),
            np.asarray([3, 2, 7, 1]),
            np.asarray([4, 0, 8, 0]),
        ]
        reserve = state.reserve
        for i, c in enumerate(counts):
            reserve = reserve.at[i % 3].set(jnp.asarray(c, jnp.int32))
        counter = np.asarray(jnp.sum(reserve, axis=0), np.float32)
        counter[[0, 2]] = 0.0
        acc = counter / max(counter.max(), 1)
        acc[[0, 2]] = 1.0
        # class 1 saw 3 of max 3 non-pinned counts -> acc 1; class 3: 1/3
        np.testing.assert_allclose(acc, [1.0, 1.0, 1.0, 1 / 3])
