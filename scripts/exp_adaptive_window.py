"""Measure adaptive windowed regeneration + the wide (>2^16 bin) tier on chip.

Round-3 questions (VERDICT items 1/weak-2):
  a) window/bins crossover: does sizing the window from the (n, bins) span
     bound (pick_window) beat the round-2 fixed 1024 at each bin count?
  b) wide tier: past 2^16 bins the histogram costs `bins` MXU MACs/element —
     at what keys-per-bin density does histogram+regen undercut the sorter?

Prints one JSON line per case; within-process comparisons (shared-slice
tunnel throughput varies ~±30% across runs — see CLAUDE.md).
"""

import json

import numpy as np


from radix_sorting_tpu.utils.timing import steady_chain_ms as steady_ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.ops import counting_engine as ce
    from radix_sorting_tpu.ops import pallas_kernels as pk

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0x5EED)
    n = 40_000_000

    # sorter reference point, same process
    xfull = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)

    def sorter(c):
        (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
        return s

    ms_sorter = steady_ms(sorter, jnp.asarray(xfull), reps=6)
    print(json.dumps({"exp": "sorter_ref", "n": n, "ms": round(ms_sorter, 2),
                      "Mkeys": round(n / ms_sorter / 1e3, 0)}), flush=True)

    # (a) window sweep at fixed bins: the direct kernel stack, explicit window
    def windowed(c, bins, window):
        nn = c.shape[0]
        hist = pk.histogram_tpu(c, 0, radix_bits=bins.bit_length() - 1)
        cum = jnp.cumsum(hist, dtype=jnp.int32)
        return lax.optimization_barrier(lax.cond(
            pk.regen_windows_fit(cum, nn, window),
            lambda: pk.regenerate_windowed_tpu(cum, nn, bins, window),
            lambda: lax.sort((c,), dimension=0, is_stable=False,
                             num_keys=1)[0]))

    for bits in (13, 16):
        bins = 1 << bits
        x = rng.integers(0, bins, size=n, dtype=np.uint32)
        xj = jnp.asarray(x)
        expect = np.sort(x)
        scale = np.uint32(bins - 1)
        for window in (128, 256, 512, 1024):
            span = 65536 * bins // n + 1
            if window < span:           # would always fall back: skip
                continue
            out = np.asarray(jax.jit(
                lambda c, _b=bins, _w=window: windowed(c, _b, _w))(xj))
            ok = bool(np.array_equal(out, expect))
            ms = steady_ms(
                lambda c, _b=bins, _w=window: windowed(c & scale, _b, _w), xj)
            print(json.dumps({
                "exp": "window_sweep", "bins": bins, "window": window,
                "picked": window == pk.pick_window(n, bins), "n": n,
                "bit_exact": ok, "ms": round(ms, 2),
                "Mkeys": round(n / ms / 1e3, 0)}), flush=True)

    # (b) wide tier: bins 2^17..2^19 at 40M (density 305/152/76 keys-per-bin)
    for bits in (17, 18, 19):
        bins = 1 << bits
        window = pk.pick_window(n, bins)
        if window == 0:
            print(json.dumps({"exp": "wide", "bins": bins,
                              "skip": "window cannot cover"}), flush=True)
            continue
        x = rng.integers(0, bins, size=n, dtype=np.uint32)
        xj = jnp.asarray(x)
        expect = np.sort(x)
        out = np.asarray(jax.jit(
            lambda c, _b=bins, _w=window: windowed(c, _b, _w))(xj))
        ok = bool(np.array_equal(out, expect))
        scale = np.uint32(bins - 1)
        # stage split: histogram alone, then the full pipeline
        ms_h = steady_ms(
            lambda c, _b=bins: pk.histogram_tpu(c & np.uint32(_b - 1), 0,
                                                radix_bits=_b.bit_length() - 1),
            xj, reps=6)
        ms = steady_ms(
            lambda c, _b=bins, _w=window: windowed(c & scale, _b, _w), xj,
            reps=6)
        print(json.dumps({
            "exp": "wide", "bins": bins, "window": window, "n": n,
            "keys_per_bin": n // bins, "bit_exact": ok,
            "hist_ms": round(ms_h, 2), "ms": round(ms, 2),
            "Mkeys": round(n / ms / 1e3, 0),
            "vs_sorter": round(ms / ms_sorter, 2)}), flush=True)

    # engine end-to-end: u16 full domain through the public counting path
    # (adaptive window now auto-picked = 256 at this n)
    import radix_sorting_tpu as rst  # noqa: F401
    from radix_sorting_tpu.ops import kdf
    xu16 = xfull.astype(np.uint16)
    out = np.asarray(rst.sort(jnp.asarray(xu16)))
    ok = bool(np.array_equal(out, np.sort(xu16)))

    def u16_sort(c):
        (w,) = kdf.encode(c)
        (s,) = ce.sort_words_counting((w,), (0xFFFF,))
        return s

    ms = steady_ms(u16_sort, jnp.asarray(xu16), reps=8)
    print(json.dumps({"exp": "u16_full_domain_adaptive", "n": n,
                      "window": pk.pick_window(n, 1 << 16), "bit_exact": ok,
                      "ms": round(ms, 2),
                      "Mkeys": round(n / ms / 1e3, 0)}), flush=True)

    # 13-bit masked end-to-end (fused PDEP windowed, adaptive window 128)
    mask = 0x1FFF << 7
    xm = xfull & np.uint32(mask)
    out = np.asarray(rst.sort(jnp.asarray(xm), value_mask=mask))
    ok = bool(np.array_equal(out, np.sort(xm)))

    def masked_sort(c):
        (s,) = ce.sort_words_counting((c,), (mask,))
        return s

    ms = steady_ms(lambda c: masked_sort(c & np.uint32(mask)),
                   jnp.asarray(xm), reps=8)
    print(json.dumps({"exp": "masked13_adaptive", "n": n,
                      "window": pk.pick_window(n, 1 << 13), "bit_exact": ok,
                      "ms": round(ms, 2),
                      "Mkeys": round(n / ms / 1e3, 0)}), flush=True)


if __name__ == "__main__":
    main()
