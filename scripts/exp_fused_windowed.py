"""Fused windowed counting probes (ROADMAP experiment 7 fused rows).

12/13-bit masked u32, full u16, and cross-plane 13-bit u64 at 40M,
bit-exact checked, steady-state in-jit timing.
"""
import json, time
import numpy as np

def steady(fn, x, reps=8):
    import jax, jax.numpy as jnp
    from jax import lax
    def outer(a):
        def body(i, c):
            r = fn(c)
            return c * np.uint32(2654435761) + (r[-1] & np.uint32(1))
        return lax.fori_loop(0, reps, body, a)
    g = jax.jit(outer)
    np.asarray(g(x)[-1:])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); r = g(x); np.asarray(r[-1:])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3

def main():
    import jax, jax.numpy as jnp
    from radix_sorting_tpu.ops.counting_engine import sort_words_counting
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(1)
    n = 40_000_000
    for mask, label in ((0x1FFF << 7, "13bit_masked"), (0xFFF0, "12bit_masked"),
                        (0xFFFF, "u16_domain")):
        keep = np.uint32(mask)
        x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32) & keep
        xj = jnp.asarray(x)
        (out,) = sort_words_counting((xj,), (mask,))
        ok = bool(np.array_equal(np.asarray(out), np.sort(x)))
        ms = steady(lambda c: sort_words_counting(((c & keep),), (mask,))[0], xj)
        print(json.dumps({"exp": f"fused_windowed_{label}", "bit_exact": ok,
                          "ms": round(ms, 2), "Mkeys": round(n/ms/1e3, 0)}),
              flush=True)
    # 64-bit masked, 13 live bits across planes
    mh, ml = 0x00000F00, 0xFF000001
    hi = rng.integers(0, 1 << 32, size=n, dtype=np.uint32) & np.uint32(mh)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint32) & np.uint32(ml)
    hij, loj = jnp.asarray(hi), jnp.asarray(lo)
    shi, slo = sort_words_counting((hij, loj), (mh, ml))
    comp = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
    order = np.argsort(comp, kind="stable")
    ok = bool(np.array_equal(np.asarray(shi), hi[order]) and
              np.array_equal(np.asarray(slo), lo[order]))
    ms = steady(lambda c: sort_words_counting(
        ((c & np.uint32(mh)), loj), (mh, ml))[0], hij)
    print(json.dumps({"exp": "fused2_windowed_13bit_u64", "bit_exact": ok,
                      "ms": round(ms, 2), "Mkeys": round(n/ms/1e3, 0)}),
          flush=True)

main()
