"""Experiment: steady-loop methodology for bench.py (round-2 item 7).

Compares, in ONE process on the real chip:
  A) rotate-by-1 chaining (round-1 bench.py): iterations 2..K sort a
     nearly-sorted array — valid only while the engine is data-oblivious.
  B) multiplicative scramble chaining: r * 2654435761 + dep (odd multiplier,
     a bijection mod 2^32) — every iteration sorts a fresh uniform-looking
     array, so the measurement is honest even for data-dependent engines,
     and the elementwise chain can fuse into the sort's input read.

Prints per-iteration ms for both at K=20, best of 3.
"""
import time
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import radix_sorting_tpu as rst

    from radix_sorting_tpu.utils import keyfile

    n = 40_000_000
    keys = keyfile.generate_keys(n)
    x = jnp.asarray(keys)
    K = 20

    def sort_once(a):
        (w,) = rst.ops.kdf.encode(a)
        (sw,), _ = rst.ops.hw_engine.sort_words((w,), stable=False)
        return rst.ops.kdf.decode((sw,), jnp.uint32)

    def steady_rotate(a):
        def body(i, carry):
            r = sort_once(carry)
            return jnp.roll(r, r[0].astype(jnp.int32) & 1 | 1)
        return lax.fori_loop(0, K, body, a)

    def steady_scramble(a):
        def body(i, carry):
            r = sort_once(carry)
            return r * np.uint32(2654435761) + (r[-1] & np.uint32(1))
        return lax.fori_loop(0, K, body, a)

    for name, fn in (("rotate", steady_rotate), ("scramble", steady_scramble)):
        g = jax.jit(fn)
        r = g(x)
        np.asarray(r[-1:])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = g(x)
            np.asarray(r[-1:])
            best = min(best, (time.perf_counter() - t0) / K)
        print(json.dumps({"variant": name, "ms_per_sort": round(best * 1e3, 2),
                          "Mkeys": round(n / best / 1e6, 1)}))


if __name__ == "__main__":
    main()
