"""Float dense group-by tier measurement (round-5 VERDICT item 3).

Bar: f32 ``group_reduce(groups=2^10)`` >= 5x the sort-native route at 40M
rows on chip. The tier is the fused count+bf16x2-sum weighted histogram
(`ops/pallas_kernels.weighted_histogram_f32_counts_tpu`); the sort-native
fallback pays the full composite sort + prefix-sum differences.

Also verifies exactness on chip at 1M rows against a float64 numpy oracle
within the documented bound (bf16x2 split ~2^-16/element + f32
accumulation; see `extras._group_reduce_dense_f32`).

Run: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/exp_group_reduce_f32.py
CPU: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= RST_FORCE_TPU_ROUTES=1 \
       python scripts/exp_group_reduce_f32.py 200000
"""

import json
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from radix_sorting_tpu.extras import group_reduce
    from radix_sorting_tpu.utils.timing import steady_chain_ms

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    rng = np.random.default_rng(0xF32)
    print(json.dumps({"device": str(jax.devices()[0]), "n": n,
                      "workload": "group-by-sum, float32 values"}),
          flush=True)

    # exactness on this backend at 1M vs a float64 host oracle
    ne = min(n, 1_000_000)
    G = 1 << 10
    k = rng.integers(0, G, size=ne, dtype=np.uint32)
    v = (rng.standard_normal(ne) * 100).astype(np.float32)
    uk, red, ng = group_reduce(jnp.asarray(k), jnp.asarray(v),
                               reduce="sum", groups=G)
    ref = np.zeros(G, np.float64)
    np.add.at(ref, k, v.astype(np.float64))
    absv = np.zeros(G, np.float64)
    np.add.at(absv, k, np.abs(v).astype(np.float64))
    m = int(ng)
    ids = np.asarray(uk)[:m]
    err = np.abs(np.asarray(red)[:m].astype(np.float64) - ref[ids])
    bound = absv[ids] * 2**-14 + 1e-5
    ok = bool(np.all(err <= bound))
    print(json.dumps({"exactness_1M_vs_f64": ok,
                      "max_err": float(err.max()),
                      "max_bound": float(bound.max())}), flush=True)
    if not ok:
        return 1

    vdev = jnp.asarray(rng.standard_normal(min(n, 4_000_000))
                       .astype(np.float32))
    # tile the values to n on device (cheap; avoids a 160 MB tunnel upload)
    reps_tile = -(-n // int(vdev.shape[0]))
    vfull = jnp.tile(vdev, reps_tile)[:n]

    for gbits in (4, 10):
        Gm = 1 << gbits
        mask = np.uint32(Gm - 1)

        def sort_native(c, aux):
            kk = c & mask
            _, red, _ = group_reduce(kk, aux, reduce="sum", size=Gm)
            return c * np.uint32(2654435761) + (
                red[-1].astype(jnp.int32).astype(jnp.uint32)
                & np.uint32(1))

        def dense_f32(c, aux):
            kk = c & mask
            _, red, _ = group_reduce(kk, aux, reduce="sum", groups=Gm)
            return c * np.uint32(2654435761) + (
                red[-1].astype(jnp.int32).astype(jnp.uint32)
                & np.uint32(1))

        x = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        rows = {}
        for name, fn in (("sort_native", sort_native),
                         ("dense_f32", dense_f32)):
            try:
                ms = steady_chain_ms(fn, x, reps=5, aux=vfull)
            except Exception as e:
                print(json.dumps({"groups": Gm, "method": name,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            rows[name] = ms
            print(json.dumps({"groups": Gm, "method": name,
                              "ms": round(ms, 2),
                              "Mrows_per_s": round(n / ms / 1e3, 1)}),
                  flush=True)
        if len(rows) == 2:
            print(json.dumps({"groups": Gm,
                              "speedup_dense_f32": round(
                                  rows["sort_native"] / rows["dense_f32"],
                                  1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
