"""Training loop: the TPU-native replacement for mmcv's EpochBasedRunner
(SURVEY §3.1 / L5). Single-controller: host loads + augments batches (numpy),
one pjit'd train_step over the data mesh, metrics logged every `log_interval`
iters (TextLoggerHook parity, configs/...12e.py:227-232), checkpoints every
epoch with rotation, optional eval hook every `eval_interval` epochs.
"""

import json
import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..parallel import (
    make_mesh,
    shard_batch,
    replicate,
    build_train_step,
    cast_for_transfer,
)
from ..parallel.step import init_state
from .checkpoint import CheckpointManager


class MetricLogger:
    """JSONL metrics log (analyze_logs-compatible flat records) with
    optional tensorboard via torch.utils.tensorboard."""

    def __init__(self, work_dir: str, use_tensorboard: bool = True):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "train_log.jsonl")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: dict):
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self.tb.add_scalar(k, v, step)


class PrefetchIterator:
    """Input prefetch: a daemon thread runs the wrapped iterator `depth`
    items ahead. The Trainer stacks two of these — stage 1 the (numpy)
    host batch pipeline, stage 2 cast + shard_batch (the h2d DMA) — so
    JPEG decode + augmentation + transfer all overlap the device step:
    the TPU analog of the reference's workers_per_gpu=4 DataLoader
    processes (SURVEY §3.1) plus pinned-memory async copy. numpy/cv2
    release the GIL in the hot paths (the C++ native loader never takes
    it), and jax.device_put is thread-safe. Transfer-ahead matters most
    on remote-attached TPUs: the tunnel moves ~36 MB/s, so a 12-cam f32
    batch costs ~1 s serial (time_train_phases.py) — staged, iter_time
    = max(host gen, h2d, step)."""

    _DONE = object()

    def __init__(self, it: Iterable[dict], depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._err = None

        def run():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class Trainer:
    def __init__(
        self,
        model,
        cfg: ModelConfig,
        work_dir: str,
        batch_iter: Iterable[dict],
        eval_fn: Optional[Callable] = None,
        seed: int = 0,
        log_interval: int = 50,
        mesh=None,
        profile_steps: int = 0,
        prefetch: int = 2,
    ):
        self.model = model
        self.cfg = cfg
        self.work_dir = work_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        # two-stage prefetch: thread 1 runs the host batch pipeline
        # (decode/aug/collate), thread 2 runs cast + shard_batch (the
        # h2d DMA). Steady-state iter time = max(host gen, h2d, device
        # step) rather than their sum — the TPU analog of the
        # reference's workers_per_gpu=4 loader processes + pinned-memory
        # async copy (SURVEY §3.1).
        if prefetch > 0:
            host_iter = PrefetchIterator(batch_iter, depth=prefetch)
            self.batch_iter = PrefetchIterator(
                (self._to_device(b) for b in host_iter), depth=prefetch
            )
        else:
            self.batch_iter = (self._to_device(b) for b in batch_iter)
        self.eval_fn = eval_fn
        self.log_interval = log_interval
        # jax.profiler trace of `profile_steps` post-compile steps into
        # work_dir/profile (the reference's only profiling story is
        # benchmark.py wall-clock; SURVEY §5 asks for a proper trace hook)
        self.profile_steps = profile_steps
        self._profiling = False
        self._steps_seen = 0
        self._profile_start = 0

        self.state = replicate(
            init_state(model, cfg, jax.random.PRNGKey(seed)), self.mesh
        )
        self.train_step = build_train_step(model, cfg, self.mesh)
        self.rng = jax.device_put(
            jax.random.PRNGKey(seed + 1),
            jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()
            ),
        )
        self.ckpt = CheckpointManager(
            os.path.join(work_dir, "checkpoints"), cfg
        )
        # multi-host: only rank 0 writes checkpoints/logs to the shared
        # work_dir (params are replicated, so rank 0's copy is the state)
        self.is_main = jax.process_index() == 0
        self.logger = MetricLogger(
            work_dir, use_tensorboard=self.is_main
        )

    def _to_device(self, batch):
        """Cast + place one host batch on the mesh. Runs on the prefetch
        thread so the (tunnel-slow) h2d transfer overlaps compute."""
        return shard_batch(
            cast_for_transfer(batch, self.cfg.bf16), self.mesh
        )

    def _stop_profile(self, metrics):
        # force completion through a host value fetch — block_until_ready
        # returns early on the axon runtime (CLAUDE.md timing note)
        float(metrics["loss"])
        jax.profiler.stop_trace()
        self._profiling = False
        self.profile_steps = 0

    def resume(self):
        restored = self.ckpt.restore(jax.tree.map(np.asarray, self.state))
        if restored is not None:
            self.state = replicate(restored, self.mesh)
        return int(self.state.step)

    @staticmethod
    @jax.jit
    def _macc(msum, metrics):
        # one fused dispatch per iter: running metric sums stay ON
        # DEVICE between log intervals. Fetching each window's raw
        # per-step scalars costs log_interval * n_metrics individual
        # d2h round trips (~1000/window), which on the tunnel-attached
        # runtime measured ~300 ms/iter amortized — half the iter time.
        return jax.tree.map(jnp.add, msum, metrics)

    @staticmethod
    @jax.jit
    def _mpack(msum):
        # ONE d2h array per window instead of n_metrics fetches
        return jnp.stack([msum[k] for k in sorted(msum)])

    def fit(self, total_steps: int, ckpt_every: int = 1000):
        t0 = time.time()
        msum, mcount = None, 0
        # one device->host sync up front; after that a host counter
        # tracks state.step exactly (train_step increments by 1), so the
        # loop never blocks on the previous step's output just to read
        # its step number — dispatch overlaps device compute
        step = int(self.state.step)
        for batch in self.batch_iter:
            if step >= total_steps:
                break
            if self.profile_steps > 0 and not self._profiling:
                # start after the first (compile) step of THIS run —
                # works on resumed runs too
                if self._steps_seen >= 1:
                    jax.profiler.start_trace(
                        os.path.join(self.work_dir, "profile")
                    )
                    self._profiling = True
                    self._profile_start = self._steps_seen
            self.state, metrics = self.train_step(
                self.state, batch, self.rng
            )
            self._steps_seen += 1
            step += 1
            if (
                self._profiling
                and self._steps_seen
                >= self._profile_start + self.profile_steps
            ):
                self._stop_profile(metrics)
            msum = metrics if msum is None else self._macc(msum, metrics)
            mcount += 1
            if step % self.log_interval == 0:
                packed = np.asarray(self._mpack(msum), np.float64)
                avg = {
                    k: packed[i] / mcount
                    for i, k in enumerate(sorted(msum))
                }
                avg["iter_time"] = (time.time() - t0) / mcount
                if self.is_main:
                    self.logger.log(step, avg)
                msum, mcount, t0 = None, 0, time.time()
            if step % ckpt_every == 0:
                # orbax saves are COLLECTIVE in multi-process runs — every
                # rank must call save (orbax writes from the primary host)
                self.ckpt.save(
                    step, jax.tree.map(np.asarray, self.state)
                )
                if self.eval_fn is not None:
                    results = self.eval_fn(self.state)
                    if self.is_main:
                        self.logger.log(step, results)
        if self._profiling:
            # loop ended before profile_steps elapsed — still flush
            self._stop_profile(metrics)
        self.ckpt.save(
            int(self.state.step), jax.tree.map(np.asarray, self.state)
        )
