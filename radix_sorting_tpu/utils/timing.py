"""Tracing / profiling subsystem (SURVEY §5 row 1).

The reference wraps runs in `perf stat` (`Makefile:18-20`), times with
`CLOCK_MONOTONIC_RAW` (`radix_experiment.cpp:200-206`), and derives
KeyRate/bytes-per-second counters (`radix_bench.cpp:72-77`). Device-side
equivalents:

* :func:`steady_state_ms` — robust steady-state op timing on this platform
  (loops inside one jit with a folding-proof data dependence; closes with a
  host readback, since `block_until_ready` does not sync through the axon
  tunnel and each dispatch pays a large round trip).
* :func:`counters` — KeyRate / bytes-per-second derivation.
* :func:`trace` — context manager around `jax.profiler` for device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

__all__ = ["steady_state_ms", "counters", "trace"]


def steady_state_ms(fn: Callable, x, reps: int = 4) -> float:
    """Per-op steady-state milliseconds of ``fn(x) -> array``."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def outer(a):
        def body(i, c):
            r = fn(c)
            return c ^ (jnp.ravel(r)[-1].astype(c.dtype) & c.dtype.type(1))
        return lax.fori_loop(0, reps, body, a)

    g = jax.jit(outer)
    np.asarray(g(x)[-1:])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(g(x)[-1:])
    return (time.perf_counter() - t0) * 1e3 / reps


def counters(n: int, ms: float, itemsize: int = 4) -> dict:
    """KeyRate / bytes-per-second counters (`radix_bench.cpp:72-77`)."""
    s = ms / 1e3
    return {
        "KeyRate": n / s,
        "bytes_per_second": n * itemsize / s,
        "ms": ms,
    }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rst-trace"):
    """Capture a device profile around a block (`jax.profiler` trace)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
