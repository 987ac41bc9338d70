"""Sub-64k one-shot quadrant: single-kernel VMEM-resident bitonic sort.

Round-4 VERDICT item 1: the flat sorter floors at a fixed ~0.14-0.16 ms
below 64k keys (network depth at tiny occupancy — ROADMAP "Small-n
quadrant"), the one regime where the reference's cache-resident peak
(438 Mk/s at 100k, `report-i5-3570T-2020-04-18.txt:236`) still won
one-shot. Columnsort was built and refuted (2026-08-19); this experiment
measures the remaining untried design: ONE Pallas invocation holding every
key in VMEM and running the whole bitonic network with no HBM round trips
and no per-stage program overhead (`ops/vmem_sort.py`).

Bar (VERDICT): >2x the flat sorter one-shot at 8k-32k, or a dated dead-end
entry with the mechanism named.

Run:  PYTHONPATH="/root/.axon_site:/root/repo" python scripts/exp_vmem_sort.py
CPU:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        python scripts/exp_vmem_sort.py --check-only   (interpret mode)
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true",
                    help="exactness sweep only (CPU interpret mode)")
    ap.add_argument("--sizes", default="8192,16384,32768,65536,100000,"
                    "131072,262144",
                    help="comma-separated n values for the timing sweep")
    ap.add_argument("--deep", action="store_true",
                    help="high-rep device-only timing: subtract an "
                    "identity-chain baseline (the first sweep showed the "
                    "~63 us 'floor' at 8k-32k is the outer dispatch / reps, "
                    "not device time)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.ops.vmem_sort import sort_planes_vmem
    from radix_sorting_tpu.utils.timing import steady_chain_ms

    rng = np.random.default_rng(0x5EED5)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    # exactness sweep: uniform, duplicate-heavy, presorted, reverse, and the
    # stable rank composite — each against the numpy oracle
    for n in (1000, 8192, 20_000, 65536, 100_000):
        x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
        for style, xi in (("uniform", x),
                          ("dup8", (x % 8 * 0x20000001).astype(np.uint32)),
                          ("sorted", np.sort(x)),
                          ("reverse", np.sort(x)[::-1].copy())):
            (s,) = sort_planes_vmem((jnp.asarray(xi),), 1)
            assert np.array_equal(np.asarray(s), np.sort(xi)), (n, style)
        # stable rank: (key, index) composite — unique stable permutation
        xt = (x % 64).astype(np.uint32)
        idx = np.arange(n, dtype=np.uint32)
        sk, si = sort_planes_vmem((jnp.asarray(xt), jnp.asarray(idx)), 2)
        assert np.array_equal(np.asarray(si),
                              np.argsort(xt, kind="stable").astype(np.uint32)), n
        print(json.dumps({"n": n, "status": "bit-exact (4 styles + rank)"}),
              flush=True)
    if args.check_only:
        print(json.dumps({"check": "vmem bitonic bit-exact"}))
        return 0

    if args.deep:
        # Device-only per-sort cost: reps high enough that the ~25-30 ms
        # outer dispatch is <= ~10% of the loop, minus an identity-chain
        # baseline at the SAME reps (loop + scramble + dispatch overhead).
        # This is the honest small-n quadrant number; the first sweep's
        # per-iteration values at 8k-32k were dispatch/reps in disguise.
        for n in [int(v) for v in args.sizes.split(",")]:
            x = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
            reps = int(min(20_000, max(2_000, 400_000_000 // n)))

            def ident(c):
                return c

            def flat(c):
                (o,) = lax.sort((c,), dimension=0, is_stable=False,
                                num_keys=1)
                return o

            def vmem(c):
                return sort_planes_vmem((c,), 1, interpret=False)[0]

            rows = {}
            for name, fn in (("ident", ident), ("flat", flat),
                             ("vmem", vmem)):
                try:
                    ms = steady_chain_ms(fn, x, reps=reps)
                except Exception as e:
                    print(json.dumps({"n": n, "method": name,
                                      "error": repr(e)[:200]}), flush=True)
                    continue
                rows[name] = ms
                print(json.dumps({"n": n, "method": name, "reps": reps,
                                  "ms_per_iter": round(ms, 5)}), flush=True)
            if len(rows) == 3:
                base = rows["ident"]
                df, dv = rows["flat"] - base, rows["vmem"] - base
                print(json.dumps({
                    "n": n, "device_flat_us": round(df * 1e3, 2),
                    "device_vmem_us": round(dv * 1e3, 2),
                    "device_speedup_vmem": round(df / dv, 2) if dv > 0
                    else None,
                    "flat_Mkeys_s": round(n / df / 1e3, 1) if df > 0
                    else None,
                    "vmem_Mkeys_s": round(n / dv / 1e3, 1) if dv > 0
                    else None}), flush=True)
        return 0

    sizes = [int(v) for v in args.sizes.split(",")]
    for n in sizes:
        x = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        reps = max(10, min(400, 40_000_000 // n))

        def flat(c):
            (o,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
            return o

        def vmem(c):
            return sort_planes_vmem((c,), 1, interpret=False)[0]

        rows = {}
        for name, fn in (("flat", flat), ("vmem", vmem)):
            t0 = time.perf_counter()
            try:
                ms = steady_chain_ms(fn, x, reps=reps)
            except Exception as e:  # compile/VMEM failures are data too
                print(json.dumps({"n": n, "method": name,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            wall = time.perf_counter() - t0
            rows[name] = ms
            print(json.dumps({"n": n, "method": name, "ms": round(ms, 4),
                              "Mkeys_s": round(n / ms / 1e3, 1),
                              "first_call_wall_s": round(wall, 1),
                              "reps": reps}), flush=True)
        if "flat" in rows and "vmem" in rows:
            print(json.dumps({"n": n,
                              "speedup_vmem": round(rows["flat"]
                                                    / rows["vmem"], 2)}),
                  flush=True)
        # one-shot exactness on the chip for this size
        (s,) = sort_planes_vmem((x,), 1, interpret=False)
        ok = bool(np.array_equal(np.asarray(s), np.sort(np.asarray(x))))
        print(json.dumps({"n": n, "vmem_bit_exact_on_chip": ok}), flush=True)

    # the rank composite at the quadrant's center: does the win carry to
    # 2-plane sorts (argsort's (key, idx-as-last-key) form)?
    for n in (8192, 32768, 65536):
        x = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        idx = jnp.arange(n, dtype=jnp.uint32)
        reps = max(10, min(400, 40_000_000 // n))

        def flat_rank(c, i):
            o = lax.sort((c, i), dimension=0, is_stable=False, num_keys=2)
            return o[0]

        def vmem_rank(c, i):
            return sort_planes_vmem((c, i), 2, interpret=False)[0]

        for name, fn in (("flat_rank", flat_rank), ("vmem_rank", vmem_rank)):
            try:
                ms = steady_chain_ms(lambda c, a, f=fn: f(c, a), x,
                                     reps=reps, aux=idx)
            except Exception as e:
                print(json.dumps({"n": n, "method": name,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            print(json.dumps({"n": n, "method": name, "ms": round(ms, 4),
                              "Mkeys_s": round(n / ms / 1e3, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
