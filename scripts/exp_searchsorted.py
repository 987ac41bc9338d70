"""On-chip searchsorted method probe: scan vs sort formulations.

Measures what `extras.searchsorted`'s method='auto' should pick on this
part (the CPU default is 'scan'; the TPU default is 'sort' by the gather
RATIO argument — a binary-search scan is log2(n) SERIAL rounds, each
gathering q midpoints, and gather measures ~70-110 M elem/s here vs the
sorter's ~540 M keys/s). This script turns the ratio argument into a
number whenever a healthy TPU window is available.

Run:  PYTHONPATH="/root/.axon_site:/root/repo" python scripts/exp_searchsorted.py

Prints one JSON line per case; paste the table into ROADMAP when the
default changes or a new part appears.
"""

import json
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from radix_sorting_tpu.utils.timing import steady_chain_ms

    n = 40_000_000
    rng = np.random.default_rng(0x5EA7C4)
    s = jnp.asarray(np.sort(rng.integers(0, 1 << 32, size=n, dtype=np.uint32)))
    print(json.dumps({"device": str(jax.devices()[0]), "n_sorted": n}))

    # RAW single-dispatch q=40M is EXCLUDED by default: it kernel-faulted
    # the TPU worker and left the process UNAVAILABLE (2026-08-19; ROADMAP
    # searchsorted crossover). --raw-40m re-enables it for forensics ONLY.
    raw_qs = (100_000, 4_000_000) + (
        (40_000_000,) if "--raw-40m" in sys.argv else ())
    for q in raw_qs:
        queries = jnp.asarray(rng.integers(0, 1 << 32, size=q, dtype=np.uint32))
        # compare_all omitted: O(n*q) compares is infeasible at 40M sorted
        for method in ("scan", "scan_unrolled", "sort"):
            def fn(c, aux, m=method):
                return jnp.searchsorted(aux, c, method=m).astype(jnp.uint32)
            try:
                ms = steady_chain_ms(fn, queries, reps=5, aux=s)
            except Exception as e:  # scan_unrolled can blow compile memory
                print(json.dumps({"q": q, "method": method,
                                  "error": type(e).__name__}))
                continue
            print(json.dumps({"q": q, "method": method, "ms": round(ms, 2),
                              "Mqueries_per_s": round(q / ms / 1e3, 1)}))

    # q=40M BEHIND THE GUARD: the shipped extras.searchsorted chunked path
    # (<= 4M-query lax.map blocks) — the round-4 fix for the worker fault
    from radix_sorting_tpu.extras import searchsorted as ss_public
    q = 40_000_000
    queries = jnp.asarray(rng.integers(0, 1 << 32, size=q, dtype=np.uint32))
    for method in ("scan", "sort"):
        def fn(c, aux, m=method):
            return ss_public(aux, c, method=m).astype(jnp.uint32)
        ms = steady_chain_ms(fn, queries, reps=3, aux=s)
        print(json.dumps({"q": q, "method": f"chunked_{method}",
                          "ms": round(ms, 2),
                          "Mqueries_per_s": round(q / ms / 1e3, 1)}))

    # the 64-bit tagged-union formulation (extras.searchsorted two-word path),
    # words-level so the scramble chain drives the query lo plane
    from radix_sorting_tpu.ops import hw_engine

    s64 = np.sort(rng.integers(0, 1 << 64, size=n // 2, dtype=np.uint64))
    s_hi = jnp.asarray((s64 >> np.uint64(32)).astype(np.uint32))
    s_lo = jnp.asarray(s64.astype(np.uint32))
    for q in (4_000_000, 20_000_000):
        q_hi = jnp.asarray(rng.integers(0, 1 << 32, size=q, dtype=np.uint32))
        q_lo = jnp.asarray(rng.integers(0, 1 << 32, size=q, dtype=np.uint32))
        nn = n // 2

        def union_fn(c, aux):
            # side='left' shipped formulation: tie-break fused into the
            # index plane (3 sort operands, not 4)
            sh, sl, qh = aux
            qn = c.shape[0]
            words = (jnp.concatenate([sh, qh]), jnp.concatenate([sl, c]))
            idx = jnp.concatenate([jnp.arange(qn, qn + nn, dtype=jnp.uint32),
                                   jnp.arange(qn, dtype=jnp.uint32)])
            (_, _, sidx), _ = hw_engine.sort_words(words + (idx,), (),
                                                   stable=False)
            is_s = (sidx >= qn).astype(jnp.int32)
            before = jnp.cumsum(is_s) - is_s
            _, (restored,) = hw_engine.sort_words(
                (sidx,), (before.astype(jnp.uint32),), stable=True)
            return restored[:qn]

        ms = steady_chain_ms(union_fn, q_lo, reps=5, aux=(s_hi, s_lo, q_hi))
        print(json.dumps({"q": q, "method": "union_sort_u64", "n_sorted": nn,
                          "ms": round(ms, 2),
                          "Mqueries_per_s": round(q / ms / 1e3, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
