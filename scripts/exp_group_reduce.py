"""On-chip group-by formulation probe: sort-native vs scatter-add vs MXU.

`extras.group_reduce` runs ONE unstable (key, value) composite sort plus
boundary algebra — chosen by the ratio argument (scatter-add measures
~80-110 M elem/s here vs the sorter's ~540 M keys/s). This script turns the
argument into numbers when a healthy TPU window is available, across three
formulations of a 40M-row group-by-sum:

1. sort-native   — `group_reduce(k, v, reduce='sum')` (the shipped route)
2. scatter-add   — `jax.ops.segment_sum(v, k)` (the classic formulation)
3. one-hot MXU   — `onehot(k, G).T @ v` via the factored dense histogram
                   trick (bincount's machinery with weights): candidate
                   FAST PATH for narrow key domains — if it wins at G bins,
                   group_reduce's dense tier is the next optimization.

Run:  PYTHONPATH="/root/.axon_site:/root/repo" python scripts/exp_group_reduce.py

Prints one JSON line per case; paste into ROADMAP when numbers land.
"""

import json
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from radix_sorting_tpu.extras import group_reduce
    from radix_sorting_tpu.utils.timing import steady_chain_ms

    m = 1 << 17                      # MXU-probe chunk rows (bounds the
    n = 305 * m                      # materialized one-hot at ~128 MB)
    if len(sys.argv) > 1:            # CPU smoke runs: small n, multiple of m
        m = 1 << 12
        n = max(m, int(sys.argv[1]) // m * m)
    rng = np.random.default_rng(0x960B)
    v = jnp.asarray(rng.integers(0, 1 << 16, size=n, dtype=np.int32))
    print(json.dumps({"device": str(jax.devices()[0]), "n": n,
                      "workload": "group-by-sum, int32 values"}))

    for gbits in (4, 10, 16):
        G = 1 << gbits
        mask = np.uint32(G - 1)

        def sort_native(c, aux):
            k = c & mask  # restore the narrow-domain structure per iter
            _, red, ng = group_reduce(k, aux, reduce="sum", size=G)
            return red.astype(jnp.uint32)

        def scatter_add(c, aux):
            k = (c & mask).astype(jnp.int32)
            return jax.ops.segment_sum(aux, k, num_segments=G) \
                .astype(jnp.uint32)

        def onehot_mxu(c, aux):
            # factored one-hot: the full (n, G) never materializes — two
            # (m, sqrt G) halves per chunk multiply on the MXU (the bincount
            # kernel's math, in plain XLA + lax.scan as a feasibility probe;
            # f32 accumulation — a TIMING probe, big sums round)
            from jax import lax
            half = gbits // 2
            h = 1 << half
            a_dim = G >> half
            k = c & mask
            hi = (k >> np.uint32(half)).astype(jnp.int32).reshape(-1, m)
            lo = (k & np.uint32(h - 1)).astype(jnp.int32).reshape(-1, m)
            w = aux.astype(jnp.float32).reshape(-1, m)
            ia = jnp.arange(a_dim)[None, :]
            ib = jnp.arange(h)[None, :]

            def step(acc, xs):
                hi_c, lo_c, w_c = xs
                oh_hi = (hi_c[:, None] == ia).astype(jnp.float32)
                oh_lo = (lo_c[:, None] == ib).astype(jnp.float32)
                return acc + jnp.einsum("ia,ib,i->ab", oh_hi, oh_lo, w_c), None

            acc, _ = lax.scan(step, jnp.zeros((a_dim, h), jnp.float32),
                              (hi, lo, w))
            return acc.reshape(-1).astype(jnp.uint32)

        def dense_shipped(c, aux):
            # the round-4 SHIPPED dense tier: exact byte-plane weighted
            # histogram (counts + 4 value byte planes on the MXU),
            # end-to-end through group_reduce's dispatch + compaction
            k = c & mask
            _, red, ng = group_reduce(k, aux, reduce="sum", groups=G)
            return red.astype(jnp.uint32)

        for name, fn in (("sort_native", sort_native),
                         ("scatter_add", scatter_add),
                         ("onehot_mxu", onehot_mxu),
                         ("dense_shipped", dense_shipped)):
            try:
                ms = steady_chain_ms(fn, jnp.asarray(
                    rng.integers(0, 1 << 32, size=n, dtype=np.uint32)),
                    reps=5, aux=v)
            except Exception as e:
                print(json.dumps({"groups": G, "method": name,
                                  "error": type(e).__name__}))
                continue
            print(json.dumps({"groups": G, "method": name,
                              "ms": round(ms, 2),
                              "Mrows_per_s": round(n / ms / 1e3, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
