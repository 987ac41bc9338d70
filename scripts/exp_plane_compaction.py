"""Measure plane compaction for masked-u64 payload/rank sorts (round 3).

VERDICT item 3: a 64-bit key with <= 32 live bits previously shipped BOTH
u32 planes through the stable sorter in pairs/argsort (3 operands with the
payload); PEXT-compacting the planes into one key operand cuts that to 2.
The sorter is measured operand-width-bound (round-2 experiment 4: stable
2-op 183.7 ms == unstable 3-op 183.4 ms at 40M), so the expected win is the
2-vs-3-operand gap. Prints one JSON line per case, 40M keys.
"""

import json
import time

import numpy as np


def steady_ms(fn, args, reps=6):
    import jax
    from jax import lax

    def outer(ops):
        def body(i, c):
            outs = fn(*c)
            dep = outs[0][-1] & np.uint32(1)
            return tuple(x * np.uint32(2654435761) + dep for x in c)
        return lax.fori_loop(0, reps, body, ops)

    g = jax.jit(outer)
    r = g(args)
    np.asarray(r[0][-1:])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r = g(args)
        np.asarray(r[0][-1:])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.ops import probes

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0x5EED)
    n = 40_000_000
    # masks: 14 + 10 = 24 live bits across both planes (past the counting
    # budget -> this is the regime only compaction can help)
    mask_hi, mask_lo = 0x00003FFF, 0xFFC00000
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
                     & np.uint32(mask_hi))
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
                     & np.uint32(mask_lo))
    payload = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
    mh, ml = np.uint32(mask_hi), np.uint32(mask_lo)

    def pairs_3op(h, l, p):
        out = lax.sort((h & mh, l & ml, p), dimension=0, is_stable=True,
                       num_keys=2)
        return out

    def pairs_2op(h, l, p):
        merged = probes.compact_word_planes((h & mh, l & ml),
                                            (mask_hi, mask_lo))
        s, sp = lax.sort((merged, p), dimension=0, is_stable=True, num_keys=1)
        sh, sl = probes.expand_word_planes(s, (h & mh, l & ml),
                                           (mask_hi, mask_lo))
        return sh, sl, sp

    # correctness cross-check first
    a3 = jax.jit(pairs_3op)(hi, lo, payload)
    a2 = jax.jit(pairs_2op)(hi, lo, payload)
    ok = all(bool(jnp.array_equal(x, y)) for x, y in zip(a3, a2))

    ms3 = steady_ms(pairs_3op, (hi, lo, payload))
    ms2 = steady_ms(pairs_2op, (hi, lo, payload))
    print(json.dumps({"exp": "masked_u64_pairs", "n": n, "live_bits": 24,
                      "bit_exact_vs_3op": ok,
                      "planes_3op_ms": round(ms3, 2),
                      "compacted_2op_ms": round(ms2, 2),
                      "speedup": round(ms3 / ms2, 2),
                      "Mkeys": round(n / ms2 / 1e3, 0)}), flush=True)

    # rank: (hi, lo, iota) unstable vs (merged, iota) unstable
    def rank_3op(h, l, p):
        return lax.sort((h & mh, l & ml,
                         jnp.arange(n, dtype=jnp.uint32)),
                        dimension=0, is_stable=False, num_keys=3)

    def rank_2op(h, l, p):
        merged = probes.compact_word_planes((h & mh, l & ml),
                                            (mask_hi, mask_lo))
        return lax.sort((merged, jnp.arange(n, dtype=jnp.uint32)),
                        dimension=0, is_stable=False, num_keys=2)

    r3 = jax.jit(rank_3op)(hi, lo, payload)
    r2 = jax.jit(rank_2op)(hi, lo, payload)
    ok = bool(jnp.array_equal(r3[-1], r2[-1]))
    ms3 = steady_ms(rank_3op, (hi, lo, payload))
    ms2 = steady_ms(rank_2op, (hi, lo, payload))
    print(json.dumps({"exp": "masked_u64_rank", "n": n,
                      "perm_identical": ok,
                      "planes_3op_ms": round(ms3, 2),
                      "compacted_2op_ms": round(ms2, 2),
                      "speedup": round(ms3 / ms2, 2),
                      "Mkeys": round(n / ms2 / 1e3, 0)}), flush=True)


if __name__ == "__main__":
    main()
