"""Profiling & timing harness (SURVEY §5: first-class module the reference
only ever imported and never used — ``tuning/tune_encoders.py:15``).

* :func:`time_fn` — robust steady-state latency of a jitted callable.  On the
  axon-tunneled TPU ``block_until_ready`` does not actually block, so timing
  forces a scalar host fetch per repetition (the only trustworthy sync).
* :func:`solves_per_sec` — the benchmark metric: region x ensemble UDE
  trajectory solves per second.
* :func:`trace` — context manager around ``jax.profiler`` for XLA traces.
* :func:`param_count` — tree-wide parameter count (the reference's only live
  introspection, ``tuning/tune_encoders.py:162-170``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out) -> float:
    """Force full execution with a host fetch; returns a checksum."""
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[0])) if leaves else 0.0


def time_fn(fn: Callable, *args, reps: int = 20, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Steady-state latency stats for ``fn(*args, **kwargs)`` in seconds."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        start = time.perf_counter()
        _sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - start)
    t = np.asarray(times)
    return {"mean": float(t.mean()), "min": float(t.min()),
            "p50": float(np.median(t)), "max": float(t.max())}


def throughput_fn(fn: Callable, *args, reps: int = 20, warmup: int = 2,
                  **kwargs) -> float:
    """Pipelined throughput (calls/sec): dispatch ``reps`` then sync once —
    representative of training loops where dispatch overlaps compute."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    start = time.perf_counter()
    outs = [fn(*args, **kwargs) for _ in range(reps)]
    for o in outs:
        _sync(o)
    return reps / (time.perf_counter() - start)


def solves_per_sec(forward: Callable, *args, n_samples: int, batch: int,
                   n_regions: int, reps: int = 20) -> float:
    """Region x ensemble UDE solves/sec for a full-forward callable."""
    rate = throughput_fn(forward, *args, reps=reps)
    return rate * n_samples * batch * n_regions


def param_count(params) -> int:
    return int(sum(np.prod(np.asarray(l).shape) for l in jax.tree.leaves(params)))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fiude_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
