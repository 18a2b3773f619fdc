"""Supervised trainer + AdaBN refinement.

TPU re-design of the reference's BaseTrainer
(/root/reference/daod/engine/trainers/base.py): the whole run_step —
weak augmentation (random flip), forward, losses, backward, SGD update, BN
stat update — is ONE jitted, donated-argument function; AdaBN
(base.py:318-337) is a jitted BN-statistics scan over the target loader.

Data parallelism: the step function is jitted over a `Mesh(('data',))` with
batch inputs sharded on the data axis and state replicated — XLA inserts the
gradient all-reduce (the NCCL DDP equivalent, SURVEY §5)."""

from __future__ import annotations

import os
import queue as queue_mod
import threading
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...checkpoint.checkpointer import Checkpointer
from ...config.defaults import detector_config_from_cfg
from ...data.loader import build_test_loader, build_train_loader, gt_instances
from ...data.datasets import get_dataset
from ...data import transforms as T
from ...models.detector import DetectionBatch, Detector
from ...parallel.mesh import make_mesh, shard_batch, shard_state
from ...solver.build import build_optimizer, warmup_multistep_schedule
from ...structures.instances import Instances
from ...solver.build import apply_gradients, stop_frozen_gradients
from ..eval_loop import inference_on_dataset
from ..events import ConsoleWriter, EventStorage, JSONWriter
from ..train_state import TrainState
from . import register_trainer


def _flip_enabled(cfg) -> bool:
    """INPUT.RANDOM_FLIP lowering: detectron2 accepts horizontal|vertical|
    none; the reference pipelines only ever use horizontal. Rejecting
    vertical beats silently flipping the wrong axis."""
    mode = cfg.INPUT.RANDOM_FLIP
    if mode not in ("horizontal", "none"):
        raise ValueError(f"INPUT.RANDOM_FLIP={mode!r} unsupported (horizontal|none)")
    return mode != "none"


def apply_weak_aug(rng, images, sizes, gt: Instances, enabled: bool = True):
    """Random horizontal flip of image + GT, batched (the 'weak' pipeline of
    the reference's mappers). Runs inside the jitted step. `enabled=False`
    (INPUT.RANDOM_FLIP: "none") passes the batch through untouched."""
    if not enabled:
        return images, gt

    def per_image(rng_i, img, size, boxes):
        w = size[1]
        flipped, fboxes, did = T.random_hflip(rng_i, img, boxes, w)
        return flipped, fboxes

    rngs = jax.random.split(rng, images.shape[0])
    images, boxes = jax.vmap(per_image)(rngs, images, sizes, gt.boxes)
    return images, gt.replace(boxes=boxes)


class _ChunkFeeder:
    """Background staging for the chunked train loop (TPU.CHUNK_STAGE_AHEAD).

    One daemon thread pulls each chunk's batches from the loader, host-stacks
    them, and starts the sharded device upload (trainer.stage_chunk), keeping
    up to `depth` staged chunks in a bounded queue. The main loop then only
    dispatches — chunk j+1's host work and transfer ride under chunk j's
    device execution instead of serializing after it. The batch stream and
    the compiled graphs are exactly the synchronous path's, so trajectories
    are unchanged; tail chunks (k < chunk) are passed through unstaged for
    the loop's single-step path. Exceptions (loader or transfer) re-raise in
    the main thread at the next get()."""

    def __init__(self, trainer, it, chunk: int, total_steps: int, depth: int = 1):
        self._q = queue_mod.Queue(maxsize=max(1, depth))
        self._err = None
        self._stopped = False

        def work():
            try:
                done = 0
                while done < total_steps and not self._stopped:
                    k = min(chunk, total_steps - done)
                    t0 = time.perf_counter()
                    batches = [next(it) for _ in range(k)]
                    xs = trainer.stage_chunk(batches) if k == chunk and k > 1 else None
                    self._q.put((k, batches, xs, time.perf_counter() - t0))
                    done += k
            except BaseException as e:  # surface in the consumer
                self._err = e
            self._q.put(None)

        self._thread = threading.Thread(
            target=work, daemon=True, name="sfod-chunk-feeder"
        )
        self._thread.start()

    def stop(self):
        """Join the producer before the train loop returns early (preemption)
        or re-raises: an orphaned feeder would keep staging device uploads —
        competing with the pre-eviction checkpoint — and then die mid
        host->device transfer at interpreter exit (the tunnel-wedging
        condition). Drains the queue so a producer blocked in put() wakes,
        sees the stop flag, and exits."""
        self._stopped = True
        while self._thread.is_alive():
            try:
                self._q.get_nowait()
            except queue_mod.Empty:
                pass
            self._thread.join(timeout=0.2)

    def get(self):
        """Next (k, batches, staged_xs_or_None, stage_time), or None at end;
        re-raises any producer exception."""
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise RuntimeError("chunk feeder exhausted before the train loop")
        return item


@register_trainer("base")
class BaseTrainer:
    """cfg.TRAINER = "base": supervised source training (SURVEY §3.1)."""

    # Batch sizes this trainer actually shards over the data mesh axis.
    # The auto mesh width (TPU.MESH_DATA = -1) must divide every one of
    # these — and ONLY these: including an unused batch size (e.g. the
    # default IMS_PER_BATCH_TARGET=1 for a supervised trainer) would
    # silently collapse a multi-chip run to a 1-device mesh.
    _SHARD_BATCH_KEYS = ("IMS_PER_BATCH",)

    def __init__(self, cfg, synthetic: bool = False):
        self.cfg = cfg
        self.det_cfg = detector_config_from_cfg(cfg)
        self.detector = Detector(self.det_cfg)
        mesh_m = max(cfg.TPU.MESH_MODEL, 1)
        if cfg.TPU.SPATIAL_SHARD and mesh_m <= 1:
            # set-but-inert keys fail loudly (the config honesty rule)
            raise ValueError(
                "TPU.SPATIAL_SHARD=True requires TPU.MESH_MODEL > 1 "
                "(the image height bands live on the 'model' mesh axis)"
            )
        if cfg.TPU.MESH_DATA > 0:
            mesh_n = cfg.TPU.MESH_DATA
        else:
            # data-parallel width must divide every batch it shards (and,
            # with a model axis, leave enough devices for data x model)
            import math

            mesh_n = len(jax.devices()) // mesh_m
            for key in self._SHARD_BATCH_KEYS:
                mesh_n = math.gcd(mesh_n, max(getattr(cfg.SOLVER, key), 1))
        self.mesh = make_mesh(mesh_n, mesh_m)
        # linear-scaling rule when SOLVER.REFERENCE_WORLD_SIZE is set
        # (reference base.py:38 auto_scale_workers)
        from ...solver.build import auto_scale_workers

        cfg = auto_scale_workers(cfg, mesh_n)
        if cfg.TPU.MESH_DATA <= 0:
            # the scaling may have SHRUNK the batch below the auto-derived
            # width (gcd was taken on the pre-scale value); re-derive so the
            # data axis still divides every sharded batch
            import math

            new_n = mesh_n
            for key in self._SHARD_BATCH_KEYS:
                new_n = math.gcd(new_n, max(getattr(cfg.SOLVER, key), 1))
            if new_n != mesh_n:
                mesh_n = new_n
                self.mesh = make_mesh(mesh_n, mesh_m)
        self.cfg = cfg
        self.output_dir = cfg.OUTPUT_DIR
        os.makedirs(self.output_dir, exist_ok=True)
        self.checkpointer = Checkpointer(self.output_dir, det_cfg=self.det_cfg)
        self.storage = EventStorage()
        self.writers = [
            ConsoleWriter(cfg.SOLVER.MAX_ITER),
            JSONWriter(os.path.join(self.output_dir, "metrics.json")),
        ]
        # TensorBoard by default like the reference (base.py:266-267);
        # skipped gracefully when no tensorboard backend is installed
        try:
            from ..events import TensorboardWriter

            self.tb_writer = TensorboardWriter(os.path.join(self.output_dir, "tb"))
            self.writers.append(self.tb_writer)
        except ImportError:
            self.tb_writer = None
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.synthetic = synthetic

        self.optimizer = build_optimizer(cfg)
        self.lr_schedule = warmup_multistep_schedule(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.STEPS,
            cfg.SOLVER.GAMMA,
            cfg.SOLVER.FACTOR_LIST if len(cfg.SOLVER.FACTOR_LIST) else None,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_FACTOR,
            cfg.SOLVER.WARMUP_METHOD,
        )
        seed = max(cfg.SEED, 0)
        self.base_rng = jax.random.key(seed)
        self.state = shard_state(self.mesh, self._init_state())
        self._train_step = self._build_train_step()
        self.train_loader = None

    # -- state ---------------------------------------------------------------
    def _init_state(self) -> TrainState:
        variables = self.detector.init(self.base_rng, tuple(self.cfg.TPU.CANVAS))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
        )

    def resume_or_load(self, resume: bool = False):
        self.state = shard_state(
            self.mesh,
            self.checkpointer.resume_or_load(self.cfg.MODEL.WEIGHTS, self.state, resume),
        )
        self.storage.iter = int(self.state.step)

    # -- jitted step ---------------------------------------------------------
    def _build_train_step(self):
        det = self.detector
        optimizer = self.optimizer
        flip = _flip_enabled(self.cfg)
        freeze_at = int(self.cfg.MODEL.BACKBONE.FREEZE_AT)

        def step_fn(state: TrainState, images, sizes, gt: Instances, rng):
            images = images.astype(jnp.float32)  # uint8 arrives over PCIe/tunnel
            rng = jax.random.fold_in(rng, state.step)
            rng_aug, rng_loss = jax.random.split(rng)
            images, gt_aug = apply_weak_aug(rng_aug, images, sizes, gt, flip)
            batch = DetectionBatch(images=images, sizes=sizes, gt=gt_aug)

            def loss_fn(params):
                # frozen stages contribute no backward (d2 requires_grad=False)
                params = stop_frozen_gradients(params, freeze_at)
                variables = {"params": params, "batch_stats": state.batch_stats}
                total, metrics, new_stats = det.supervised_losses(
                    variables, batch, rng_loss
                )
                return total, (metrics, new_stats)

            (total, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            new_params, new_opt = apply_gradients(
                optimizer, grads, state.opt_state, state.params
            )
            metrics["total_loss"] = total
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            )
            return new_state, metrics

        self._step_fn_raw = step_fn
        return jax.jit(step_fn, donate_argnums=(0,))

    # -- loops ---------------------------------------------------------------
    def build_train_loader(self):
        return build_train_loader(self.cfg, synthetic=self.synthetic)

    def _shard(self, tree, axis: int = 0):
        """shard_batch with the trainer's mesh + spatial policy bound once —
        the ONLY batch-placement entry point trainers should use, so a new
        call site can't silently drop TPU.SPATIAL_SHARD."""
        return shard_batch(
            self.mesh, tree, axis=axis, spatial=self.cfg.TPU.SPATIAL_SHARD
        )

    def run_step(self, batch) -> Dict[str, float]:
        images = jnp.asarray(batch["images"])
        sizes = jnp.asarray(batch["sizes"])
        gt = gt_instances(batch)
        images, sizes, gt = self._shard((images, sizes, gt))
        self.state, metrics = self._train_step(self.state, images, sizes, gt, self.base_rng)
        return metrics

    def _dispatch_chunk(self, xs) -> Dict[str, float]:
        """Run one jit-cached lax.scan of the step body over `xs` — a tuple
        of stacked per-step arg trees (leaves [K, ...], already sharded).
        The scan body unpacks each step's slice into `self._step_fn_raw`'s
        positional args, so every trainer signature reuses this one
        scaffold. Exists because each host dispatch pays one tunnel round
        trip on this box (BENCH_NOTES round 2). Returns LAST step metrics."""
        k = jax.tree.leaves(xs)[0].shape[0]
        if getattr(self, "_chunk_step_n", None) != k:
            step_fn = self._step_fn_raw

            def multi(state, xs, rng):
                def body(st, x):
                    return step_fn(st, *x, rng)

                state, metrics = jax.lax.scan(body, state, xs)
                return state, jax.tree.map(lambda m: m[-1], metrics)

            self._chunk_step = jax.jit(multi, donate_argnums=(0,))
            self._chunk_step_n = k
        self.state, metrics = self._chunk_step(self.state, xs, self.base_rng)
        return metrics

    @staticmethod
    def _stack_steps(per_step_args):
        """[per-step arg tuples] -> one tuple of host-stacked [K, ...] trees
        (one transfer per leaf, not per step)."""
        return jax.tree.map(
            lambda *leaves: jnp.asarray(np.stack([np.asarray(l) for l in leaves])),
            *per_step_args,
        )

    def stage_chunk(self, batches):
        """Stack one chunk's batches and start the host->device transfer
        (sharded placement). Split from dispatch so _train_loop's feeder
        thread can overlap chunk j+1's loader pull + stack + upload with
        chunk j's device execution (the measured chunk wall was ~65% host
        work the device idled through — BENCH_NOTES round 3)."""
        xs = self._stack_steps(
            [(b["images"], b["sizes"], gt_instances(b, host=True)) for b in batches]
        )
        return self._shard(xs, axis=1)

    def run_step_chunk(self, batches, xs=None) -> Dict[str, float]:
        """len(batches) consecutive steps in ONE dispatched executable (each
        scan step consumes its own batch; per-step RNG still folds on
        state.step); TPU.STEPS_PER_DISPATCH drives it from the train loop.
        `xs` carries a pre-staged (stacked, device-resident) arg tree from
        the feeder thread; None stages synchronously."""
        return self._dispatch_chunk(self.stage_chunk(batches) if xs is None else xs)

    def _build_val_loss_hook(self):
        """ValLossHook parity (reference engine/hooks/val_loss.py, enabled by
        TEST.VAL_LOSS): periodic detector losses on the first TEST set."""
        from ..hooks import ValLossHook

        if not (self.cfg.TEST.VAL_LOSS and self.cfg.TEST.EVAL_PERIOD > 0 and self.cfg.DATASETS.TEST):
            return None
        name = self.cfg.DATASETS.TEST[0]

        def factory():
            return build_test_loader(self.cfg, name, synthetic=self.synthetic)

        return ValLossHook(self.detector, factory, period=self.cfg.TEST.EVAL_PERIOD)

    def _hook_variables(self):
        params = self.state.params
        if isinstance(params, dict) and "det" in params:
            params = params["det"]
        return {"params": params, "batch_stats": self.state.batch_stats}

    def train(self):
        """Training loop with the reference's crash handling (sfat.py:126-139:
        log + re-raise) plus an emergency checkpoint for resumability, plus
        preemption handling: preemptible TPU fleets deliver SIGTERM before
        eviction — the loop finishes the in-flight chunk, writes a durable
        checkpoint, and returns cleanly so `--resume` continues the run."""
        import signal

        self._preempted = False
        prev_handler = None

        def on_term(signum, frame):
            print("[trainer] SIGTERM: will checkpoint at the chunk boundary", flush=True)
            self._preempted = True

        try:  # signal handlers only install from the main thread
            prev_handler = signal.signal(signal.SIGTERM, on_term)
        except ValueError:
            pass
        try:
            self._train_loop()
        except Exception:
            feeder = getattr(self, "_feeder", None)
            if feeder is not None:
                feeder.stop()  # join staging before the emergency save
            step = int(self.state.step)
            print(f"[trainer] exception at iteration {step}; saving emergency checkpoint", flush=True)
            try:
                self.checkpointer.save(f"model_crash_{step:07d}", self.state)
            except Exception as save_err:  # keep the original traceback primary
                print(f"[trainer] emergency save failed: {save_err}", flush=True)
            raise
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _train_loop(self):
        self.train_loader = self.train_loader or self.build_train_loader()
        it = iter(self.train_loader)
        start = int(self.state.step)
        log_period = 20
        val_hook = self._build_val_loss_hook()
        chunk = max(1, int(self.cfg.TPU.STEPS_PER_DISPATCH))

        def crossed(period: int, lo: int, hi: int) -> bool:
            """Did any multiple of `period` land in (lo, hi]?"""
            return period > 0 and hi // period > lo // period

        i = start
        feeder = None
        if chunk > 1 and int(self.cfg.TPU.CHUNK_STAGE_AHEAD) > 0 and self.max_iter > start:
            feeder = _ChunkFeeder(
                self, it, chunk, self.max_iter - start,
                depth=int(self.cfg.TPU.CHUNK_STAGE_AHEAD),
            )
        self._feeder = feeder  # train() joins it on crash/preempt exit paths
        while i < self.max_iter:
            if feeder is not None:
                k, batches, xs, data_time = feeder.get()
            else:
                k = min(chunk, self.max_iter - i)
                t0 = time.perf_counter()
                batches = [next(it) for _ in range(k)]
                xs = None
                data_time = time.perf_counter() - t0
            if k == chunk and k > 1:
                metrics = self.run_step_chunk(batches, xs=xs)
            else:
                # single-step path; also the short tail of a chunked run —
                # a k-length scan would be a fresh (expensive) XLA compile
                for b in batches:
                    metrics = self.run_step(b)
            last = i + k - 1
            # writers must observe iter == last (single-dispatch parity)
            for _ in range(k - 1):
                self.storage.step()
            self.storage.put_scalar("data_time", data_time / k)
            self.storage.put_scalar("lr", float(self.lr_schedule(last)))
            if crossed(log_period, i, last + 1) or last == self.max_iter - 1:
                for kk, v in metrics.items():
                    self.storage.put_scalar(kk, float(v))
                for w in self.writers:
                    w.write(self.storage)
            if crossed(self.cfg.SOLVER.CHECKPOINT_PERIOD, i, last + 1):
                self.checkpointer.save(f"model_{last:07d}", self.state, block=False)
            if crossed(self.cfg.TEST.EVAL_PERIOD, i, last + 1):
                self.test()
            if val_hook is not None:
                val_hook.after_step(
                    last, self._hook_variables(), self.base_rng, self.storage,
                    prev_step=i - 1,
                )
            self.storage.step()
            i += k
            if getattr(self, "_preempted", False):
                if feeder is not None:
                    feeder.stop()  # no staging competing with the checkpoint
                name = f"model_preempt_{i - 1:07d}"
                print(f"[trainer] preempted: saving {name} and stopping", flush=True)
                self.checkpointer.save(name, self.state)  # durable before exit
                return
        if feeder is not None:
            feeder.stop()
        # d2's EvalHook.after_train always evaluates at max_iter; without
        # this, EVAL_PERIOD=5000 with MAX_ITER=4000 would end training with
        # no eval at all. DELIBERATE DEVIATION: d2 runs the final eval even
        # at period=0, but every perf/smoke flow here (bench configs,
        # hardware CLI smokes) relies on EVAL_PERIOD=0 meaning "no eval",
        # so 0 keeps that contract.
        ep = self.cfg.TEST.EVAL_PERIOD
        if ep > 0 and self.max_iter % ep != 0 and self.cfg.DATASETS.TEST:
            self.test()
        self.checkpointer.save("model_final", self.state)

    # -- evaluation ----------------------------------------------------------
    def _maybe_precise_bn(self):
        """TEST.PRECISE_BN: recompute BN statistics from the train loader
        before eval (d2's PreciseBN hook, registered for EVERY reference
        trainer through DefaultTrainer.build_hooks — subclass test()
        overrides must call this too, or the key is silently inert)."""
        if not self.cfg.TEST.PRECISE_BN.ENABLED:
            return
        from ..hooks import precise_bn

        loader = self.build_train_loader()
        stats = precise_bn(
            self.detector,
            self._hook_variables(),
            iter(loader),
            self.cfg.TEST.PRECISE_BN.NUM_ITER,
        )
        self.state = self.state.replace(batch_stats=stats)

    def test(self, dataset_names=None) -> Dict:
        self._maybe_precise_bn()
        from ...evaluation.build import build_evaluators

        results = {}
        names = list(dataset_names or self.cfg.DATASETS.TEST)
        for name in names:
            ds = get_dataset(name)
            loader = build_test_loader(self.cfg, name, synthetic=self.synthetic)
            evaluators = build_evaluators(self.cfg, name, ds["thing_classes"])
            id_map = ds.get("id_map") or {}
            # multi-dataset eval: per-dataset subdirs (d2 convention), else
            # the flat path the fixed-pseudo-label workflow consumes —
            # otherwise dataset N overwrites dataset N-1's detections
            inf_dir = (
                os.path.join(self.output_dir, "inference")
                if len(names) == 1
                else os.path.join(self.output_dir, "inference", name)
            )
            res = inference_on_dataset(
                self.detector,
                self._hook_variables(),
                loader,
                ds["thing_classes"],
                evaluators,
                dump_json=os.path.join(inf_dir, "coco_instances_results.json"),
                category_ids={v: k for k, v in id_map.items()},
                pipeline_depth=self.cfg.TPU.EVAL_PIPELINE_DEPTH,
                spatial=self.cfg.TPU.SPATIAL_SHARD,
                mesh=self.mesh,
            )
            results[name] = res
            ap_line = {k: res.get(k) for k in ("AP", "AP50", "AP75", "F1")}
            print(f"[eval] {name}: {ap_line}", flush=True)
            print_per_class_table(res)
            self.storage.put_scalar(f"{name}/AP50", res.get("AP50", float("nan")))
        # persist results like the reference's inference/ summary files
        import json

        with open(os.path.join(self.output_dir, "eval_results.json"), "w") as f:
            json.dump(_jsonable(results), f, indent=2)
        return results

    # -- AdaBN (reference base.py:318-337) ------------------------------------
    def reset_bn_stats(self):
        """Zero running means / unit running vars for every BN layer
        (reference reset_bn_stats, base.py:318-328)."""
        self.state = self.state.replace(batch_stats=reset_bn_tree(self.state.batch_stats))

    def test_refinement(self, max_batches: int = 1400, loader=None, chunk: int = 16) -> Dict:
        """BN refinement WITHOUT a statistics reset, then test, then save
        "adabn" — the reference's `train_net.py --eval-only` workload
        (train_net.py:79 -> base.py:270-315): up to 1400 train-mode forward
        passes on the train loader let the BN running statistics drift toward
        the data, starting FROM the loaded checkpoint's statistics. Only the
        backbone carries BN here (RPN/box heads are conv/FC-only), so the
        jitted `bn_update` feature forward is the whole train-mode effect."""
        self.refine_bn_stats(max_batches=max_batches, loader=loader, chunk=chunk)
        results = self.test()
        self.checkpointer.save("adabn", self.state)
        return results

    def refine_bn_stats(self, max_batches: int = 1400, loader=None, chunk: int = 16):
        """The BN-statistics recompute loop of test_refinement (factored so
        multi-process AdaBN can run the refinement without the eval+save
        tail; tests/test_multihost.py drives it on a cross-process mesh)."""
        loader = loader or self.build_train_loader()
        bn_step = jax.jit(
            lambda variables, images: self.detector.bn_update(variables, images)
        )
        # CHUNK batches per dispatched executable (lax.scan over the stacked
        # chunk): each host dispatch pays one tunnel RTT of device idle on
        # this box (BENCH_NOTES round 2), so 1400 per-batch dispatches are
        # dominated by round trips. Statistics are sequentially identical to
        # the per-batch path (tests/test_trainers.py guards equality).
        # Each batch's images additionally shard over the mesh's data axis
        # (no-op on one device): a batch's BN statistics are a full-batch
        # reduction, so GSPMD's cross-device mean leaves the running-stat
        # trajectory identical while the forwards run data-parallel
        # (tests/test_eval_dp.py::test_dp_bn_update_equals_single_device).

        def bn_many(variables, images_stack):
            def body(stats, imgs):
                new = self.detector.bn_update(
                    {**variables, "batch_stats": stats}, imgs
                )
                return new, None

            stats, _ = jax.lax.scan(body, variables["batch_stats"], images_stack)
            return stats

        bn_chunk = jax.jit(bn_many)
        pending = []
        taken = 0
        for batch in loader:
            if taken >= max_batches:
                break
            pending.append(np.asarray(batch["images"]))
            taken += 1
            if len(pending) == chunk:
                stack = self._shard(np.stack(pending), axis=1)
                new_stats = bn_chunk(self.state.variables(), stack)
                self.state = self.state.replace(batch_stats=new_stats)
                pending = []
        for images in pending:  # tail smaller than one chunk
            new_stats = bn_step(self.state.variables(), self._shard(images))
            self.state = self.state.replace(batch_stats=new_stats)

    def adabn_refinement(self, max_batches: int = 1400, loader=None) -> Dict:
        """Reset BN stats, then recompute them on the (target) train set and
        evaluate — the reference's `train_net_mt.py --eval-only` AdaBN
        workload (train_net_mt.py:82 -> base.py:330-337)."""
        self.reset_bn_stats()
        return self.test_refinement(max_batches=max_batches, loader=loader)


def print_per_class_table(res: Dict):
    """Per-class AP / AP50 table (the reference's NewCOCOEvaluator output,
    new_cocoevaluator.py:79-110)."""
    per_class = res.get("per_class")
    if not per_class:
        return
    name_w = max(len(n) for n in per_class) + 2
    print(f"{'class':<{name_w}}{'AP':>8}{'AP50':>8}")
    for name, vals in per_class.items():
        ap = vals.get("AP", float("nan"))
        ap50 = vals.get("AP50", float("nan"))
        print(f"{name:<{name_w}}{ap:8.2f}{ap50:8.2f}")


def _jsonable(obj):
    import math

    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, float) and math.isnan(obj):
        return None
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def reset_bn_tree(batch_stats):
    """flax BatchNorm stats: leaves named 'mean' -> 0, 'var' -> 1."""
    def reset(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(n == "mean" for n in names):
            return jnp.zeros_like(leaf)
        if any(n == "var" for n in names):
            return jnp.ones_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(reset, batch_stats)
