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

__all__ = ["steady_state_ms", "steady_chain_ms", "counters", "trace"]


def steady_state_ms(fn: Callable, x, reps: int = 4) -> float:
    """Per-op steady-state milliseconds of ``fn(x) -> array``.

    Lightweight generic helper (any output shape/dtype). Its xor chain feeds
    nearly identical input every iteration — for engines with data-dependent
    paths (presorted guard, device probe) use :func:`steady_chain_ms`, whose
    scramble keeps each iteration's input fresh.
    """
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


def steady_chain_ms(fn: Callable, x, reps: int = 8, repeats: int = 2,
                    aux=None) -> float:
    """Canonical scramble-chained steady-state harness (u32-plane ops).

    The ONE methodology every measurement in this repo converged on (the
    in-script copies it replaces had already started to diverge — round-3
    review finding):

    * ``reps`` iterations inside ONE jit (`lax.fori_loop`): amortizes the
      per-dispatch tunnel round trip (~5 ms/call at reps=5 on axon).
    * iterations chain through a multiplicative scramble with a REAL data
      dependence on the result (``c * 2654435761 + (r[-1] & 1)``): an odd
      multiplier is a bijection mod 2^32, so every iteration sees fresh
      uniform data — honest even for data-dependent engines — and the
      ``& 1`` term cannot be constant-folded/DCE'd the way ``& 0`` was.
      Callers measuring *structured* inputs (narrow range, masked) must
      restore the structure inside ``fn`` (mask + re-offset), as the chain
      deliberately destroys it.
    * closes with a tiny device-slice readback (``r[-1:]``): the axon
      ``block_until_ready`` does not sync, and a full-array transfer would
      ride the ~15 MB/s tunnel and poison the number.
    * best of ``repeats`` outer runs: the shared slice jitters between
      dispatches; min is the honest steady-state.

    ``aux``: optional extra device operand passed as ``fn(c, aux)``. It
    enters the jit as a RUNTIME argument — a closed-over device array would
    be embedded as an HLO constant, inviting XLA to fold any reduce over it
    (exactly the bug this parameter exists to prevent: a constant u64 hi
    plane folding the range probe's min/max and faking the probe as free).
    """
    import jax
    from jax import lax

    def chain(c, r):
        # dtype-generic: the odd multiplier truncated to the key width stays
        # odd, hence a bijection mod 2^bits
        m = c.dtype.type(2654435761 & np.iinfo(c.dtype).max)
        return c * m + r[-1].astype(c.dtype) % c.dtype.type(2)

    if aux is None:
        def outer(a):
            return lax.fori_loop(0, reps, lambda i, c: chain(c, fn(c)), a)

        g = jax.jit(outer)
        args = (x,)
    else:
        def outer(a, h):
            return lax.fori_loop(0, reps, lambda i, c: chain(c, fn(c, h)), a)

        g = jax.jit(outer)
        args = (x, aux)

    np.asarray(g(*args)[-1:])  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = g(*args)
        np.asarray(r[-1:])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def stream_gbps(n: int = 40_000_000, reps: int = 20, x=None) -> float:
    """Same-process effective HBM stream bandwidth (GB/s), the denominator
    of every speed-of-light fraction in the bench artifacts.

    One u32 multiply-add chain = one read + one write stream of the whole
    array per iteration (the `exp_sol_probe.probe_stream` methodology, kept
    here so bench.py / bench_suite.py normalize against the SAME-PROCESS
    number — the slice's delivered bandwidth drifts with tenancy, so a
    cross-run constant would lie). Pass ``x`` to reuse an on-device u32
    array (avoids a host upload through the tunnel).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if x is None:
        x = jnp.asarray(np.random.default_rng(1).integers(
            0, 1 << 32, size=n, dtype=np.uint32))
    else:
        n = int(x.shape[0])

    @jax.jit
    def g(a):
        return lax.fori_loop(
            0, reps, lambda i, c: c * np.uint32(2654435761) + np.uint32(1), a)

    np.asarray(g(x)[-1:])  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(g(x)[-1:])
        best = min(best, (time.perf_counter() - t0) / reps)
    return 2 * 4 * n / best / 1e9


def counters(n: int, ms: float, itemsize: int = 4) -> dict:
    """KeyRate / bytes-per-second counters (`radix_bench.cpp:72-77`)."""
    s = ms / 1e3
    return {
        "KeyRate": n / s,
        "bytes_per_second": n * itemsize / s,
        "ms": ms,
    }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rst-trace", perfetto: bool = True):
    """Capture a device profile around a block (`jax.profiler` trace).

    ``perfetto=True`` additionally writes ``perfetto_trace.json.gz`` — plain
    gzipped Chrome-trace JSON that :func:`device_op_table` reduces to an
    op-level ms table without any profiler plugin (works through the axon
    tunnel; `scripts/profile_headline.py` is the artifact producer).
    """
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_trace=perfetto)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_op_table(logdir: str) -> list:
    """Aggregate the newest perfetto trace under ``logdir`` into a per-op
    duration table for the device's 'XLA Ops' thread.

    Returns rows ``{"op", "total_us", "calls"}`` sorted by total time, the
    TPU counterpart of the reference's archived perf-stat sections
    (`bench.sh:14-17`).
    """
    import collections
    import glob
    import gzip
    import json as _json

    paths = sorted(glob.glob(
        f"{logdir}/plugins/profile/*/perfetto_trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no perfetto trace under {logdir}")
    evs = _json.loads(gzip.open(paths[-1]).read())["traceEvents"]
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in evs
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    tot = collections.Counter()
    calls = collections.Counter()
    for e in evs:
        if (e.get("ph") == "X"
                and (e.get("pid"), e.get("tid")) in op_tids):
            tot[e["name"]] += e.get("dur", 0.0)
            calls[e["name"]] += 1
    return [{"op": name, "total_us": round(us, 1), "calls": calls[name]}
            for name, us in tot.most_common()]
