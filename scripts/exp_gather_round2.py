"""Follow-up: honest gather-rate measurements + pairs variants (round 2).

The first round measured take_along_axis at 1077 M elem/s but consumed only
one output element — vulnerable to slice-of-gather rewrites. This re-measures
with a FULL xor-reduce over the gathered output, across layouts:

  * row-wise monotone (sorted indices per row), R = 128 and R = 16
  * row-wise random indices (payload-permutation shape)
  * flat monotone gather (40M sorted indices into a 40M operand) — the shape
    a gather-based MSD spread would use
  * flat random gather (the round-1 "80 M/s" data point, re-validated)

Also re-runs the pairs variants with operands DERIVED IN-JIT (iota), not
closed over — closed-over 160 MB arrays ship as HLO constants through the
axon tunnel and blow the remote-compile request limit (HTTP 413).

And: 1-D vs (1, n) 2-D sort — the kappa sweep's R=1 row measured 460 ms vs
the 71 ms headline, suggesting the dimension=1 lowering of a single-row sort
differs from the 1-D sort.
"""

import json
import time

import numpy as np


def steady_ms(make_fn, x, reps):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def outer(a):
        def body(i, c):
            dep = make_fn(c)  # returns a scalar dependence consuming ALL work
            return c * np.uint32(2654435761) + dep
        return lax.fori_loop(0, reps, body, a)

    g = jax.jit(outer)
    np.asarray(jnp.ravel(g(x))[-1:])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r = g(x)
        np.asarray(jnp.ravel(r)[-1:])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def xor_all(a):
    import jax.numpy as jnp
    return jnp.bitwise_xor.reduce(jnp.ravel(a)) & np.uint32(1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.utils import keyfile

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    keys = keyfile.generate_keys(40_000_000)
    n = keys.size
    rng = np.random.default_rng(0)

    # --- gather rates, full consume --------------------------------------
    cases = []
    for R, S, kind in ((128, 65536, "monotone"), (16, 524288, "monotone"),
                       (128, 65536, "random")):
        m = n // R
        idx_np = rng.integers(0, m, size=(R, S)).astype(np.int32)
        if kind == "monotone":
            idx_np = np.sort(idx_np, axis=1)
        cases.append((f"rows{R}_{kind}", R, m, jnp.asarray(idx_np)))

    for name, R, m, idx in cases:
        x = jnp.asarray(keys[: R * m].reshape(R, m))
        ms = steady_ms(lambda c, _i=idx: xor_all(jnp.take_along_axis(c, _i, axis=1)),
                       x, reps=4)
        tot = int(idx.size)
        print(json.dumps({"exp": f"gather_{name}", "gathered": tot,
                          "ms": round(ms, 2),
                          "Melem_per_s": round(tot / ms / 1e3, 1)}), flush=True)

    # flat gathers: 8.4M indices into the full 40M operand
    S = 1 << 23
    for kind in ("monotone", "random"):
        idx_np = rng.integers(0, n, size=S).astype(np.int32)
        if kind == "monotone":
            idx_np = np.sort(idx_np)
        idx = jnp.asarray(idx_np)
        x = jnp.asarray(keys)
        ms = steady_ms(lambda c, _i=idx: xor_all(jnp.take(c, _i)), x, reps=4)
        print(json.dumps({"exp": f"gather_flat_{kind}", "gathered": S,
                          "ms": round(ms, 2),
                          "Melem_per_s": round(S / ms / 1e3, 1)}), flush=True)

    # full-size flat monotone (the MSD spread shape): 40M indices
    idx_np = np.sort(rng.integers(0, n, size=n).astype(np.int32))
    idx = jnp.asarray(idx_np)
    x = jnp.asarray(keys)
    ms = steady_ms(lambda c, _i=idx: xor_all(jnp.take(c, _i)), x, reps=4)
    print(json.dumps({"exp": "gather_flat_monotone_40M", "gathered": n,
                      "ms": round(ms, 2),
                      "Melem_per_s": round(n / ms / 1e3, 1)}), flush=True)

    # --- 1-D vs (1, n) sort ----------------------------------------------
    def sort1d(c):
        (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
        return s[-1] & np.uint32(1)

    ms = steady_ms(sort1d, x, reps=5)
    print(json.dumps({"exp": "sort_1d_40M", "ms": round(ms, 2),
                      "Mkeys": round(n / ms / 1e3, 0)}), flush=True)

    x2 = jnp.asarray(keys.reshape(1, -1))

    def sort2d(c):
        (s,) = lax.sort((c,), dimension=1, is_stable=False, num_keys=1)
        return s[0, -1] & np.uint32(1)

    ms = steady_ms(sort2d, x2, reps=3)
    print(json.dumps({"exp": "sort_2d_1row_40M", "ms": round(ms, 2),
                      "Mkeys": round(n / ms / 1e3, 0)}), flush=True)

    # --- pairs variants, operands derived in-jit ---------------------------
    def stable2(c):
        p = lax.broadcasted_iota(jnp.uint32, (n,), 0) ^ np.uint32(0xA5A5A5A5)
        k, pv = lax.sort((c, p), dimension=0, is_stable=True, num_keys=1)
        return (k[-1] ^ pv[-1]) & np.uint32(1)

    def unstable3(c):
        i = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        p = i ^ np.uint32(0xA5A5A5A5)
        k, si, pv = lax.sort((c, i, p), dimension=0, is_stable=False,
                             num_keys=2)
        return (k[-1] ^ pv[-1]) & np.uint32(1)

    def rank2(c):
        i = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        k, si = lax.sort((c, i), dimension=0, is_stable=False, num_keys=2)
        return (k[-1] ^ si[-1]) & np.uint32(1)

    def rank_stable_payload(c):
        # stable sort carrying the index as PAYLOAD (1 key operand)
        i = lax.broadcasted_iota(jnp.uint32, (n,), 0)
        k, si = lax.sort((c, i), dimension=0, is_stable=True, num_keys=1)
        return (k[-1] ^ si[-1]) & np.uint32(1)

    for name, f in (("pairs_stable_2op", stable2),
                    ("pairs_unstable_3op", unstable3),
                    ("rank_unstable_2op", rank2),
                    ("rank_stable_payload", rank_stable_payload)):
        ms = steady_ms(f, x, reps=5)
        print(json.dumps({"exp": name, "n": n, "ms": round(ms, 2),
                          "Mkeys": round(n / ms / 1e3, 0)}), flush=True)


if __name__ == "__main__":
    main()
