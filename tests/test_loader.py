"""DetectionLoader geometry: resize scaling, GT scaling, padding, epochs."""

import numpy as np

from simple_sfod_tpu.data.loader import DetectionLoader


def records_with_image(h0, w0):
    img = np.zeros((h0, w0, 3), np.float32)
    img[10:20, 30:50] = 200.0
    return [
        {
            "file_name": "mem.png",
            "height": h0,
            "width": w0,
            "image_id": 1,
            "boxes": [[30.0, 10.0, 50.0, 20.0]],
            "classes": [1],
            "image": img,
        }
    ]


class TestLoaderGeometry:
    def test_resize_scales_gt_and_records_size(self):
        # 100x200 original, min_size 50 -> scale 0.5 -> 50x100 on a 64x128 canvas
        recs = records_with_image(100, 200)
        loader = DetectionLoader(
            recs, batch_size=1, canvas_hw=(64, 128), min_size=50, gt_capacity=4,
            training=False, prefetch=0,
        )
        batch = next(iter(loader))
        assert batch["images"].shape == (1, 64, 128, 3)
        assert batch["images"].dtype == np.uint8
        np.testing.assert_allclose(batch["scale"], [[0.5, 0.5]])
        assert batch["sizes"][0].tolist() == [50, 100]
        np.testing.assert_allclose(batch["gt_boxes"][0, 0], [15, 5, 25, 10])
        assert batch["gt_valid"][0, 0]
        # padding region is zero
        assert batch["images"][0, 55:, :].max() == 0
        assert batch["images"][0, :, 105:].max() == 0

    def test_eval_pads_final_batch_by_repeat(self):
        recs = records_with_image(64, 128) * 1
        recs = [dict(recs[0], image_id=i + 1) for i in range(3)]
        loader = DetectionLoader(
            recs, batch_size=2, canvas_hw=(64, 128), min_size=64, gt_capacity=4,
            training=False, prefetch=0,
        )
        batches = list(loader)
        assert len(batches) == 2
        # final batch repeats the last record to fill
        assert batches[1]["image_ids"].tolist() == [3, 3]

    def test_train_stream_is_infinite_and_shuffled(self):
        recs = [dict(records_with_image(64, 128)[0], image_id=i + 1) for i in range(4)]
        loader = DetectionLoader(
            recs, batch_size=2, canvas_hw=(64, 128), min_size=64, gt_capacity=4,
            training=True, seed=0, prefetch=0,
        )
        it = iter(loader)
        ids = [tuple(next(it)["image_ids"].tolist()) for _ in range(6)]
        assert len(ids) == 6  # keeps producing past one epoch
        flat = [i for t in ids for i in t]
        assert set(flat) == {1, 2, 3, 4}


class TestSupPercent:
    def test_divide_label_unlabel_deterministic(self):
        from simple_sfod_tpu.data.loader import divide_label_unlabel

        recs = [{"image_id": i} for i in range(10)]
        lab1, unlab1 = divide_label_unlabel(recs, 30.0, random_seed=0)
        lab2, unlab2 = divide_label_unlabel(recs, 30.0, random_seed=0)
        assert lab1 == lab2 and unlab1 == unlab2
        assert len(lab1) == 3 and len(unlab1) == 7
        ids = {r["image_id"] for r in lab1} | {r["image_id"] for r in unlab1}
        assert ids == set(range(10))
        lab3, _ = divide_label_unlabel(recs, 30.0, random_seed=1)
        assert lab3 != lab1  # seed changes the split


class TestResizeParityD2:
    """Bit-parity of the host resize with detectron2's ResizeShortestEdge
    (VERDICT r1 next-round #2c): identical output dims (int(x+0.5) rounding,
    shortest edge pinned) and identical PIL BILINEAR pixels."""

    def test_output_shape_rounds_half_up(self):
        from simple_sfod_tpu.data.loader import d2_output_shape

        # scale = 250/200 = 1.25; 402 * 1.25 = 502.5 -> d2 rounds UP to 503
        # (Python round() half-even would give 502)
        assert d2_output_shape(200, 402, 250, 1333) == (250, 503)
        assert round(402 * 1.25) == 502  # the divergence this guards against
        # cityscapes 1024x2048 -> cap at max_size 1333: 2048*600/1024=1200 ok
        assert d2_output_shape(1024, 2048, 600, 1333) == (600, 1200)
        # max_size cap engages: 500x2000, min 600 -> w=2400 > 1333
        h, w = d2_output_shape(500, 2000, 600, 1333)
        assert w == 1333 and h == int(500 * (1333 / 2000) + 0.5)

    def test_pixels_match_pil_reference(self):
        from PIL import Image

        from simple_sfod_tpu.data.loader import _resize_shortest_edge, d2_output_shape

        rs = np.random.RandomState(0)
        img = rs.randint(0, 255, (101, 217, 3)).astype(np.float32)
        out, scale = _resize_shortest_edge(img, 60, 1333)
        nh, nw = d2_output_shape(101, 217, 60, 1333)
        want = np.asarray(
            Image.fromarray(img.astype(np.uint8)).resize((nw, nh), Image.BILINEAR),
            np.float32,
        )
        np.testing.assert_array_equal(out, want)
        np.testing.assert_allclose(scale, [nw / 217, nh / 101])


class TestRegistryPathConsistency:
    def test_eager_and_lazy_registration_agree_on_json_paths(self):
        """register_all_datasets (eager) and _register_by_pattern (lazy) must
        resolve the same name to the same annotation file — the 5-stage
        workflow run caught them disagreeing on the foggy base dir and the
        _adabn filename (reference semantics: daod/data/datasets.py:45-62,
        foggy under cityscapes_foggy/, arbitrary {fog} suffix)."""
        from simple_sfod_tpu.data import datasets as D

        names = [
            "cityscapes_instancesonly_foggy_train_foggy_beta_0.02",
            "cityscapes_instancesonly_foggy_val_foggy_beta_0.02",
            "cityscapes_instancesonly_foggy_train_adabn",
            "cityscapes_instancesonly_val",
        ]
        saved = dict(D.DATASET_REGISTRY)
        try:
            for name in names:
                D.DATASET_REGISTRY.clear()
                D._register_by_pattern(name, root="/R")
                lazy = D.DATASET_REGISTRY[name]["json_file"]
                D.DATASET_REGISTRY.clear()
                D.register_all_datasets(root="/R")
                eager = D.DATASET_REGISTRY[name]["json_file"]
                assert lazy == eager, (name, lazy, eager)
        finally:
            D.DATASET_REGISTRY.clear()
            D.DATASET_REGISTRY.update(saved)


class TestMultiScaleChoice:
    """Multi-valued MIN_SIZE_TRAIN = d2 ResizeShortestEdge "choice" sampling:
    a per-image size drawn on the iterator thread, deterministic in seed."""

    def _recs(self, n=6):
        base = records_with_image(100, 200)[0]
        return [dict(base, image_id=i + 1) for i in range(n)]

    def test_choice_samples_both_sizes_deterministically(self):
        kw = dict(
            batch_size=2, canvas_hw=(96, 192), min_size=(50, 80), gt_capacity=4,
            training=True, prefetch=0, seed=3,
        )
        seen = set()
        a_sizes, b_sizes = [], []
        for sizes_out, loader in (
            (a_sizes, DetectionLoader(self._recs(), **kw)),
            (b_sizes, DetectionLoader(self._recs(), **kw)),
        ):
            it = iter(loader)
            for _ in range(6):
                batch = next(it)
                for hw, sc in zip(batch["sizes"], batch["scale"]):
                    assert tuple(hw.tolist()) in {(50, 100), (80, 160)}
                    seen.add(tuple(hw.tolist()))
                    # GT scale follows the per-image sample
                    np.testing.assert_allclose(sc, [hw[0] / 100] * 2)
                sizes_out.extend(map(tuple, batch["sizes"].tolist()))
        assert seen == {(50, 100), (80, 160)}, seen
        assert a_sizes == b_sizes  # same seed -> identical stream

    def test_single_size_is_pinned(self):
        loader = DetectionLoader(
            self._recs(2), batch_size=2, canvas_hw=(96, 192), min_size=(50,),
            gt_capacity=4, training=True, prefetch=0,
        )
        batch = next(iter(loader))
        assert set(map(tuple, batch["sizes"].tolist())) == {(50, 100)}

    def test_eval_never_samples(self):
        loader = DetectionLoader(
            self._recs(2), batch_size=2, canvas_hw=(96, 192), min_size=(50, 80),
            gt_capacity=4, training=False, prefetch=0,
        )
        batch = next(iter(loader))
        assert set(map(tuple, batch["sizes"].tolist())) == {(50, 100)}

    def test_multi_scale_overflow_raises(self):
        """A sampled scale whose resized image cannot fit TPU.CANVAS must
        fail at construction (silent cropping would corrupt the scaled GT)."""
        import pytest

        with pytest.raises(ValueError, match="beyond TPU.CANVAS"):
            DetectionLoader(
                self._recs(2), batch_size=2, canvas_hw=(96, 192),
                min_size=(50, 120), gt_capacity=4, training=True, prefetch=0,
            )


class TestSmallDatasetAndAbandonment:
    def test_training_smaller_than_batch_yields(self):
        """d2 TrainingSampler semantics: the infinite index stream spans
        epoch permutations, so n < batch_size still yields full batches
        (the old per-epoch slicing spun forever)."""
        recs = records_with_image(64, 128)
        loader = DetectionLoader(
            recs, batch_size=3, canvas_hw=(64, 128), min_size=64,
            gt_capacity=4, training=True, prefetch=0,
        )
        it = iter(loader)
        for _ in range(3):
            batch = next(it)
            assert batch["images"].shape[0] == 3

    def test_abandoned_prefetch_iterator_retires_worker(self):
        """Breaking out of a prefetching loader (AdaBN's max_batches) must
        not leak a worker thread pinned on a full queue."""
        import threading
        import time

        recs = [dict(records_with_image(64, 128)[0], image_id=i) for i in range(4)]
        before = {t.name for t in threading.enumerate()}
        it = iter(DetectionLoader(
            recs, batch_size=2, canvas_hw=(64, 128), min_size=64,
            gt_capacity=4, training=True, prefetch=2,
        ))
        next(it)
        it.close()  # GeneratorExit -> finally -> abandoned.set + drain
        deadline = time.time() + 10
        while time.time() < deadline:
            leaked = {t.name for t in threading.enumerate()} - before
            if not any("Thread" in n or "worker" in n.lower() for n in leaked):
                break
            time.sleep(0.1)
        leaked = {t.name for t in threading.enumerate()} - before
        assert not leaked, leaked
