"""Measure the in-graph range probe (`SortConfig.device_probe`) on chip.

Three numbers at 40M (one process, within-process comparisons):
  1. full-entropy u32 through the probed path vs the plain sorter — the
     probe's overhead when data is NOT narrow (one extra min/max read);
  2. narrow-RANGE unpromised data (values in [3e9, 3e9 + 2^13)) through the
     probed path — the payoff: counting speed with no mask promise, no host
     sync;
  3. the same narrow data through the plain sorter — what AUTO does today
     without the flag.
Prints one JSON line per case.
"""

import json

import numpy as np

from radix_sorting_tpu.utils.timing import steady_chain_ms as steady_ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.ops.counting_engine import sort_word_range_probe

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0x5EED)
    n = 40_000_000

    def sorter(c):
        (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
        return s

    def probed(c):
        return sort_word_range_probe(c)

    # full-entropy: probe overhead
    x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    xj = jnp.asarray(x)
    out = np.asarray(jax.jit(probed)(xj))
    ok = bool(np.array_equal(out, np.sort(x)))
    ms_sort = steady_ms(sorter, xj, reps=6)
    ms_probe = steady_ms(probed, xj, reps=6)
    print(json.dumps({"exp": "probe_full_entropy", "n": n, "bit_exact": ok,
                      "sorter_ms": round(ms_sort, 2),
                      "probed_ms": round(ms_probe, 2),
                      "overhead": round(ms_probe / ms_sort - 1, 3)}),
          flush=True)

    # narrow range, unpromised, offset values: probe payoff
    base = np.uint32(3_000_000_000)
    xn = (rng.integers(0, 1 << 13, size=n, dtype=np.uint32) + base)
    xnj = jnp.asarray(xn)
    out = np.asarray(jax.jit(probed)(xnj))
    ok = bool(np.array_equal(out, np.sort(xn)))
    # keep the narrow range THROUGH the scramble chain: mask then re-offset
    m = np.uint32((1 << 13) - 1)
    ms_nar = steady_ms(lambda c: probed((c & m) + base), xnj, reps=8)
    ms_nar_sorter = steady_ms(lambda c: sorter((c & m) + base), xnj, reps=8)
    print(json.dumps({"exp": "probe_narrow_range", "n": n, "bit_exact": ok,
                      "probed_ms": round(ms_nar, 2),
                      "sorter_ms": round(ms_nar_sorter, 2),
                      "speedup": round(ms_nar_sorter / ms_nar, 2),
                      "Mkeys": round(n / ms_nar / 1e3, 0)}), flush=True)

    # two-word (u64) probe: constant hi plane, full-entropy lo — the
    # one-operand-sorter branch vs the plain two-operand sorter
    from radix_sorting_tpu.ops.counting_engine import sort_words2_range_probe

    # NOTE: the hi plane rides as the harness's `aux` RUNTIME argument — a
    # closed-over constant array would let XLA fold the probe's hi-plane
    # min/max reduce and fake the probe as free.
    hi = jnp.full((n,), jnp.uint32(0x12345678))

    def sorter2(c, h):
        _, l = lax.sort((h, c), dimension=0, is_stable=False, num_keys=2)
        return l

    def probed2(c, h):
        _, l = sort_words2_range_probe(h, c)
        return l

    out = np.asarray(jax.jit(probed2)(xj, hi))
    ok = bool(np.array_equal(out, np.sort(x)))
    ms_2op = steady_ms(sorter2, xj, reps=6, aux=hi)
    ms_p2 = steady_ms(probed2, xj, reps=6, aux=hi)
    print(json.dumps({"exp": "probe_u64_hi_const_wide_lo", "n": n,
                      "bit_exact": ok,
                      "sorter2op_ms": round(ms_2op, 2),
                      "probed_ms": round(ms_p2, 2),
                      "speedup": round(ms_2op / ms_p2, 2),
                      "Mkeys": round(n / ms_p2 / 1e3, 0)}), flush=True)

    # varying hi plane: the probe's overhead when 64-bit data is NOT clustered
    hiv = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))

    ms_2v = steady_ms(sorter2, xj, reps=6, aux=hiv)
    ms_p2v = steady_ms(probed2, xj, reps=6, aux=hiv)
    print(json.dumps({"exp": "probe_u64_varying_hi_overhead", "n": n,
                      "sorter2op_ms": round(ms_2v, 2),
                      "probed_ms": round(ms_p2v, 2),
                      "overhead": round(ms_p2v / ms_2v - 1, 3)}), flush=True)


if __name__ == "__main__":
    main()
