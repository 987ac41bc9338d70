"""Flat-sort cost vs n: the power-of-two padding cliff (ROADMAP experiment 6).

Measured 2026-08-17 on v5e-lite: 2^23: 10.1 ms, 2^25: 46.1 ms (729 Mk/s),
2^25+1: 65.4 ms (+42%), 40M: 74.5 ms, 2^26: 98.9 ms.
"""
import json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax import lax
    from radix_sorting_tpu.utils import keyfile
    keys = keyfile.generate_keys(1 << 26)
    for n in (1 << 23, 1 << 25, (1 << 25) + 1, 40_000_000, 1 << 26):
        x = jnp.asarray(keys[:n])
        def f(c):
            (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
            return c * np.uint32(2654435761) + (s[-1] & np.uint32(1))
        g = jax.jit(lambda a: lax.fori_loop(0, 6, lambda i, c: f(c), a))
        np.asarray(g(x)[-1:])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); r = g(x); np.asarray(r[-1:])
            best = min(best, (time.perf_counter() - t0) / 6)
        print(json.dumps({"n": n, "ms": round(best*1e3, 2),
                          "Mkeys": round(n/best/1e6, 0)}), flush=True)

main()
