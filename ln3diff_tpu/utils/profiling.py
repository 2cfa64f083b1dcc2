"""Profiling hooks: jax trace capture + simple op timing.

Replaces the reference's profiling surface (``logger.profile_kv``,
``misc.profiled_function`` → ``torch.autograd.profiler.record_function``,
and its dataloader throughput harness): ``jax.profiler`` traces (xplane,
viewable in TensorBoard/XProf) plus host-side timers feeding the KV
logger.
"""

from __future__ import annotations

import contextlib
import time

import jax

from . import logger


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context (shows up in xplane timelines)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(name: str, sync: bool = False):
    """Host wall-time into the KV logger (reference profile_kv)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.logkv_mean(f'time_{name}', time.perf_counter() - t0)


def benchmark_fn(fn, *args, warmup: int = 1, iters: int = 5) -> float:
    """min wall seconds per call; drains the device via a host read."""
    import numpy as np
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def profile_dataloading(data_iter, num_batches: int = 50) -> dict:
    """Dataloader throughput (reference ``scripts/profile_dataloading.py``)."""
    t0 = time.perf_counter()
    n = 0
    for _ in range(num_batches):
        batch = next(data_iter)
        n += 1
    wall = time.perf_counter() - t0
    return {'batches_per_sec': n / wall, 'sec_per_batch': wall / n}
