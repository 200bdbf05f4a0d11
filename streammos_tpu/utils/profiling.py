"""Profiling / timing utilities.

The reference has no tracing at all (SURVEY.md §5 — only
``cudnn.benchmark``); here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory;
* :func:`chained_time` — robust wall-time measurement for this environment,
  where the TPU sits behind an RPC tunnel that makes ``block_until_ready``
  return early and can serve repeated identical executions from cache: run K
  data-dependent chained iterations inside ONE jit, force a scalar
  materialization, and subtract the measured tunnel round-trip.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_rtt(reps: int = 5) -> float:
    """Median host<->device scalar-fetch round trip in seconds."""
    import jax.numpy as jnp

    trivial = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 8))
    float(trivial(z))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(trivial(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chained_time(step: Callable, init, K: int = 4, reps: int = 3,
                 rtt: float | None = None) -> float:
    """Seconds per iteration of ``step`` (carry -> carry), measured as K
    chained calls inside one jit with the carry forcing data dependence.

    The chaining must be real: feed the step's output back as its input (do
    NOT use an `out.mean() * 0` trick — XLA's simplifier can eliminate the
    multiply-by-zero and with it the entire computation)."""
    if rtt is None:
        rtt = measure_rtt()

    @jax.jit
    def chained(c):
        for _ in range(K):
            c = step(c)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum().astype(jax.numpy.float32), c, 0.0)

    jax.tree_util.tree_map(lambda x: x, chained(init))
    float(chained(init))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(init))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - rtt) / K
