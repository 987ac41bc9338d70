"""Measure the windowed-regeneration counting tier on the real chip.

Round-2 extension: counting sorts for 2^11..2^16-bin dense domains (plain
regeneration capped at 2^10). Expected: histogram-dominated totals well
under the ~71 ms hardware sorter for 40M keys; the in-graph fallback must
trigger for sparse tiny-n inputs. Prints one JSON line per case.
"""

import json

import numpy as np


from radix_sorting_tpu.utils.timing import steady_chain_ms as steady_ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.ops.counting_engine import counting_sort_compact

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0x5EED)
    n = 40_000_000

    for bits in (11, 12, 13, 14, 16):
        bins = 1 << bits
        x = rng.integers(0, bins, size=n, dtype=np.uint32)
        xj = jnp.asarray(x)
        out = np.asarray(counting_sort_compact(xj, bins))
        ok = bool(np.array_equal(out, np.sort(x)))
        scale = np.uint32(bins - 1)
        ms = steady_ms(
            lambda c, _b=bins: counting_sort_compact(c & scale, _b), xj)
        rec = {"exp": "windowed_counting", "bins": bins, "n": n,
               "bit_exact": ok, "ms": round(ms, 2),
               "Mkeys": round(n / ms / 1e3, 0)}
        print(json.dumps(rec), flush=True)

    # the sorter reference point, same process
    x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)

    def sorter(c):
        (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
        return s

    ms = steady_ms(sorter, jnp.asarray(x), reps=6)
    print(json.dumps({"exp": "sorter_ref", "n": n, "ms": round(ms, 2),
                      "Mkeys": round(n / ms / 1e3, 0)}), flush=True)

    # u16 full-domain end-to-end (dtype-width routing through the KDF +
    # counting engine; correctness via the public API)
    import radix_sorting_tpu as rst
    from radix_sorting_tpu.ops import kdf
    from radix_sorting_tpu.ops.counting_engine import sort_words_counting
    xu16 = x.astype(np.uint16)
    out = np.asarray(rst.sort(jnp.asarray(xu16)))
    ok = bool(np.array_equal(out, np.sort(xu16)))

    def u16_sort(c):
        (w,) = kdf.encode(c)
        (s,) = sort_words_counting((w,), (0xFFFF,))
        return s

    ms = steady_ms(u16_sort, jnp.asarray(xu16), reps=8)
    print(json.dumps({"exp": "u16_full_domain", "n": n, "bit_exact": ok,
                      "ms": round(ms, 2), "Mkeys": round(n / ms / 1e3, 0)}),
          flush=True)

    # fallback correctness on hardware: sparse tiny-n wide domain
    xs = (rng.permutation(1 << 16)[:30_000]).astype(np.uint32)
    out = np.asarray(counting_sort_compact(jnp.asarray(xs), 1 << 16))
    print(json.dumps({"exp": "fallback_sparse", "n": 30_000,
                      "bit_exact": bool(np.array_equal(out, np.sort(xs)))}),
          flush=True)


if __name__ == "__main__":
    main()
