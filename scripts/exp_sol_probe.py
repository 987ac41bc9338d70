"""One-command re-probe of the load-bearing device facts (ROADMAP dead ends).

The round-2 speed-of-light refutations (manual-DMA exchange passes, gather
spreads, sorter-beating schemes) are conditioned on THREE measured facts of
this part/toolchain:

  1. Pallas-initiated HBM<->VMEM DMA throughput (~3.4 GB/s on v5e-lite via
     axon — the fact that kills manual-DMA data movement),
  2. random/monotone gather throughput (~70 M elem/s — kills per-element
     permutation formulations),
  3. the hardware sorter's steady 40M-u32 rate (~71 ms — the bar every
     alternative must beat), plus the elementwise stream bandwidth that
     normalizes the other numbers.

Run this ON ANY NEW part, toolchain, or driver stack BEFORE trusting those
refutations (`ROADMAP.md` "measured dead end" entries cite this script).
Prints interim lines and ONE final JSON summary line (exp=sol_probe).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/exp_sol_probe.py
"""

import functools
import json
import time

import numpy as np


def _sync(r):
    """Close the async pipeline with a FOUR-BYTE readback: slice on DEVICE
    first (np.ravel on a jax array would ship the whole 160 MB result
    through the ~15 MB/s tunnel and poison the measurement — found the hard
    way in round 3)."""
    import jax.numpy as jnp
    leaf = r[0] if isinstance(r, tuple) else r
    np.asarray(jnp.ravel(leaf)[-1:])


def _timed(g, x, reps):
    """Best-of-2 steady seconds/rep for jitted g (host-readback closed)."""
    _sync(g(x))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r = g(x)
        _sync(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def probe_stream(jax, jnp, lax):
    n = 40_000_000
    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 1 << 32, size=n, dtype=np.uint32))
    K = 20

    @jax.jit
    def g(a):
        return lax.fori_loop(
            0, K, lambda i, c: c * np.uint32(2654435761) + np.uint32(1), a)

    dt = _timed(g, x, K)
    return 2 * 4 * n / dt / 1e9          # read + write streams


def probe_sorter(jax, jnp, lax):
    n = 40_000_000
    x = jnp.asarray(np.random.default_rng(2).integers(
        0, 1 << 32, size=n, dtype=np.uint32))
    K = 6

    @jax.jit
    def g(a):
        def body(i, c):
            (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
            return c * np.uint32(2654435761) + (s[-1] & np.uint32(1))
        return lax.fori_loop(0, K, body, a)

    return _timed(g, x, K) * 1e3         # ms per 40M sort


def probe_gather(jax, jnp, lax):
    n = 16_000_000
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))
    K = 4

    @jax.jit
    def g(ops):
        val, ix = ops
        def body(i, c):
            cv, cx = c
            out = jnp.take(cv, cx)
            # full-reduce consume: EVERY output element flows into the dep
            # (round-2 lesson: a single-element consume lets XLA slice the
            # gather and report fantasy rates)
            dep = jnp.bitwise_xor.reduce(out) & np.uint32(1)
            return (cv ^ dep, cx)
        return lax.fori_loop(0, K, body, (val, ix))

    dt = _timed(g, (v, idx), K)
    return n / dt / 1e6                  # M elem/s


def probe_dma(jax, jnp, lax):
    """Pallas manual-DMA round trip HBM -> VMEM -> HBM, chunked grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 1 << 17                      # 128K u32 = 512 KB per leg
    n = 1 << 24                          # 64 MB total
    x = jnp.asarray(np.random.default_rng(4).integers(
        0, 1 << 32, size=n, dtype=np.uint32))
    steps = n // CHUNK

    def kernel(x_hbm, o_hbm, scratch, sem_in, sem_out):
        i = pl.program_id(0)
        cp_in = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * CHUNK, CHUNK)], scratch, sem_in)
        cp_in.start()
        cp_in.wait()
        cp_out = pltpu.make_async_copy(
            scratch, o_hbm.at[pl.ds(i * CHUNK, CHUNK)], sem_out)
        cp_out.start()
        cp_out.wait()

    @jax.jit
    def once(a):
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((CHUNK,), jnp.uint32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(a)

    K = 3

    @jax.jit
    def g(a):
        def body(i, c):
            o = once(c)
            # cheap scalar dep chains iterations (one elementwise pass,
            # ~1 ms at stream speed vs ~20 ms/iter at the 3.4 GB/s cap)
            return c ^ (o[0] & np.uint32(1))
        return lax.fori_loop(0, K, body, a)

    dt = _timed(g, x, K)
    return 2 * 4 * n / dt / 1e9          # in + out DMA legs


def probe_canary(jax, jnp, lax):
    """10-second slice-health canary: 4M-u32 sorter steady rate. Healthy
    v5e-lite via axon: ~4-6 ms. An order-of-magnitude miss means the shared
    slice is in a degraded window — discard measurements and retry later."""
    n = 4_000_000
    x = jnp.asarray(np.random.default_rng(9).integers(
        0, 1 << 32, size=n, dtype=np.uint32))
    K = 10

    @jax.jit
    def g(a):
        def body(i, c):
            (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
            return c * np.uint32(2654435761) + (s[-1] & np.uint32(1))
        return lax.fori_loop(0, K, body, a)

    return _timed(g, x, K) * 1e3


def main():
    import sys

    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = str(jax.devices()[0])
    if "--canary" in sys.argv:
        ms = probe_canary(jax, jnp, lax)
        print(json.dumps({"probe": "canary_ms_4M", "value": round(ms, 1),
                          "healthy": ms < 20.0, "device": dev}), flush=True)
        return
    print(json.dumps({"device": dev}), flush=True)
    stream = probe_stream(jax, jnp, lax)
    print(json.dumps({"probe": "stream_GBps", "value": round(stream, 1)}),
          flush=True)
    sorter_ms = probe_sorter(jax, jnp, lax)
    print(json.dumps({"probe": "sorter_ms_40M", "value": round(sorter_ms, 1)}),
          flush=True)
    gather = probe_gather(jax, jnp, lax)
    print(json.dumps({"probe": "gather_Melems", "value": round(gather, 1)}),
          flush=True)
    try:
        dma = round(probe_dma(jax, jnp, lax), 2)
    except Exception as e:  # noqa: BLE001 - report, keep the other probes
        dma = f"failed: {type(e).__name__}"
    print(json.dumps({
        "exp": "sol_probe", "device": dev,
        "stream_GBps": round(stream, 1),
        "sorter_ms_40M": round(sorter_ms, 1),
        "sorter_Mkeys": round(40_000 / sorter_ms, 0),
        "gather_Melems": round(gather, 1),
        "dma_GBps": dma,
    }), flush=True)


if __name__ == "__main__":
    main()
