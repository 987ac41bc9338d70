"""Round-2 speed-of-light experiments (VERDICT items 2 and 3).

Measures, in ONE process on the real chip (tunnel noise ~±30% across runs,
so all comparisons are within-process):

  1. kappa curve     — batched row-sort rate vs row length m. The cost model
                       t = kappa * n * log2(m)^2 bounds EVERY multi-level
                       sort scheme built from the hardware sorter.
  2. monotone gather — take_along_axis with sorted per-row indices: is a
                       monotone gather any faster than the measured ~80 M/s
                       random gather? (If yes, spread-by-gather designs
                       reopen.)
  3. spread kernel   — Pallas per-tile binning on the AUTOMATIC grid
                       pipeline (SURVEY §7 hard part #4): 128-aligned
                       window extraction of top-digit segments from sorted
                       rows into padded bucket rows. Purely dense vector
                       ops + static-offset writes; no manual DMA.
  4. msd pipeline    — the full two-level MSD sample-sort these pieces
                       enable: row sort -> segment spread -> bucket sort ->
                       dense compaction. Bit-exact checked, stage-timed.
  5. pairs @ 40M     — stable (key,payload) 2-operand vs unstable
                       (key,idx,payload) 3-operand at full scale (the
                       round-1 refutation was only measured at 10M).

Each experiment prints one JSON line; results land in ROADMAP.md.
"""

import json
import time

import numpy as np


def steady_ms(fn, x, reps, consume=None):
    """Per-op steady-state ms: loop inside one jit with a data dependence."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    consume = consume or (lambda r: jnp.ravel(r)[-1] & np.uint32(1))

    def outer(a):
        def body(i, c):
            r = fn(c)
            return c * np.uint32(2654435761) + consume(r)
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


def exp_kappa_curve(keys):
    import jax.numpy as jnp
    from jax import lax

    n = keys.size
    rows = []
    for m in (4096, 9766, 39062, 156250, 625000, 2500000, n):
        R = n // m
        x = jnp.asarray(keys[: R * m].reshape(R, m))

        def f(c):
            (s,) = lax.sort((c,), dimension=1, is_stable=False, num_keys=1)
            return s

        ms = steady_ms(f, x, reps=8,
                       consume=lambda r: (jnp.ravel(r)[-1] & np.uint32(1)))
        l2 = float(np.log2(m)) ** 2
        rows.append({"m": m, "R": R, "ms": round(ms, 2),
                     "Mkeys": round(R * m / ms / 1e3, 0),
                     "kappa_ns_per_log2sq": round(ms * 1e6 / (R * m) / l2, 3)})
        print(json.dumps({"exp": "kappa", **rows[-1]}), flush=True)
    return rows


def exp_monotone_gather(keys):
    import jax
    import jax.numpy as jnp

    R, m, S = 128, 312500, 65536  # gather 8.4M of 40M elements, monotone rows
    x = jnp.asarray(keys[: R * m].reshape(R, m))
    idx_np = np.sort(
        np.random.default_rng(0).integers(0, m, size=(R, S)), axis=1
    ).astype(np.int32)
    idx = jnp.asarray(idx_np)

    def f(c):
        g = jnp.take_along_axis(c, idx, axis=1)
        return c * np.uint32(2654435761) + (g[-1, -1] & np.uint32(1))

    ms = steady_ms(lambda c: f(c), x, reps=4, consume=lambda r: np.uint32(0))
    rec = {"exp": "monotone_gather", "gathered": R * S, "ms": round(ms, 2),
           "Melem_per_s": round(R * S / ms / 1e3, 1)}
    print(json.dumps(rec), flush=True)
    return rec


# ---------------------------------------------------------------------------
# experiments 3+4: the two-level MSD pipeline

SENT = np.uint32(0xFFFFFFFF)


def build_msd(n, R, K, capr):
    """Return (jitted pipeline fn, shapes dict). Keys-only u32 ascending."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = n // R
    assert R * m == n
    d = int(np.log2(K))
    assert 1 << d == K
    shift = np.uint32(32 - d)
    m128 = -(-m // 128)
    W = m128 + capr          # padded row in 128-lane sublanes
    win = capr * 128

    def spread_kernel(s_ref, x_ref, o_ref):
        r = pl.program_id(0)
        k = pl.program_id(1)
        s = s_ref[r, k]
        w = x_ref[0, pl.ds(s, capr), :]                     # [capr, 128]
        rowi = lax.broadcasted_iota(jnp.int32, (capr, 128), 0)
        coli = lax.broadcasted_iota(jnp.int32, (capr, 128), 1)
        pos = (s + rowi) * 128 + coli
        bucket = lax.convert_element_type(w >> shift, jnp.int32)
        keep = (bucket == k) & (pos < m)
        o_ref[0, 0] = jnp.where(keep, w, SENT)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, K),
        in_specs=[pl.BlockSpec((1, W, 128), lambda r, k, s: (r, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, capr, 128), lambda r, k, s: (k, r, 0, 0)),
    )
    spread = pl.pallas_call(
        spread_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, R, capr, 128), jnp.uint32),
    )

    def starts_of(xs):
        # per-row segment starts via vectorized binary search on the sorted
        # rows (R*K*log2(m) small gathers)
        b = lax.convert_element_type(xs >> shift, jnp.int32)
        probe = jnp.arange(K, dtype=jnp.int32)
        return jax.vmap(lambda row: jnp.searchsorted(row, probe))(b)

    def pipeline(x):
        xs2 = x.reshape(R, m)
        (xs,) = lax.sort((xs2,), dimension=1, is_stable=False, num_keys=1)
        starts = starts_of(xs)                                # [R, K] int32
        counts = jnp.diff(jnp.concatenate(
            [starts, jnp.full((R, 1), m, jnp.int32)], axis=1), axis=1)
        gcounts = jnp.sum(counts, axis=0)                     # [K]
        offs = jnp.cumsum(gcounts) - gcounts
        pad = jnp.full((R, W * 128 - m), SENT)
        xp = jnp.concatenate([xs, pad], axis=1).reshape(R, W, 128)
        s128 = starts // 128                                  # fits: <= m128
        out = spread(s128, xp)                                # [K,R,capr,128]
        L = R * capr * 128
        rows2 = out.reshape(K, L)
        (rows_sorted,) = lax.sort((rows2,), dimension=1, is_stable=False,
                                  num_keys=1)
        buf = jnp.full((n + L,), SENT)

        def place(k, b_):
            row = lax.dynamic_index_in_dim(rows_sorted, k, 0, keepdims=False)
            return lax.dynamic_update_slice(b_, row, (offs[k],))

        buf = lax.fori_loop(0, K, place, buf)
        # max segment must fit the window minus worst alignment slack;
        # returned for a host-side validity assert (a production engine
        # would lax.cond to the flat sorter instead)
        return buf[:n], jnp.max(counts)

    return pipeline, {"m": m, "W": W, "win": win, "d": d}


def exp_msd(keys, R=128, K=128, capr=24):
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = keys.size
    pipeline, shapes = build_msd(n, R, K, capr)
    x = jnp.asarray(keys)

    out, maxc = jax.jit(pipeline)(x)
    out_np = np.asarray(out)
    ok = bool(np.array_equal(out_np, np.sort(keys)))
    fits = int(maxc) <= capr * 128 - 127
    rec0 = {"exp": "msd_correct", "R": R, "K": K, "capr": capr,
            "bit_exact": ok, "max_cell": int(maxc), "cell_fits": fits}
    print(json.dumps(rec0), flush=True)
    if not ok:
        return rec0

    ms = steady_ms(lambda c: pipeline(c)[0], x, reps=5)
    rec = {"exp": "msd_total", "ms": round(ms, 2),
           "Mkeys": round(n / ms / 1e3, 0), **shapes}
    print(json.dumps(rec), flush=True)

    # stage timing (each its own jit; sums may exceed the fused total)
    m = shapes["m"]

    def stage_sort(c):
        (s,) = lax.sort((c.reshape(R, m),), dimension=1, is_stable=False,
                        num_keys=1)
        return s
    print(json.dumps({"exp": "msd_stage", "stage": "row_sort",
                      "ms": round(steady_ms(stage_sort, x, 8), 2)}), flush=True)

    xs = stage_sort(x)

    pipeline2, _ = build_msd(n, R, K, capr)
    # time spread in isolation: reuse internals by timing pipeline minus sorts
    import jax.numpy as jnp2
    from jax.experimental import pallas as pl  # noqa: F401

    # approximate: time searchsorted+spread by running pipeline on sorted
    # input and subtracting is noisy; instead time the final bucket sort:
    L = R * capr * 128

    def stage_bucket_sort(c):
        (s,) = lax.sort((c,), dimension=1, is_stable=False, num_keys=1)
        return s
    rows = jnp.tile(jnp.asarray(keys[: L]), (K, 1)).reshape(K, L)
    print(json.dumps({"exp": "msd_stage", "stage": "bucket_sort",
                      "ms": round(steady_ms(stage_bucket_sort, rows, 8), 2),
                      "elems": K * L}), flush=True)
    return rec


def exp_pairs(keys):
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = keys.size
    x = jnp.asarray(keys)
    payload = jnp.asarray(np.arange(n, dtype=np.uint32)[::-1].copy())
    idx = jnp.asarray(np.arange(n, dtype=np.uint32))

    # payload/idx enter the jit as RUNTIME ARGUMENTS, never closures: a
    # closed-over device array is embedded as an HLO constant, and at 40M
    # u32 per operand the compile request body exceeds the axon tunnel's
    # HTTP limit (413, observed 2026-08-19 on the 2-extra-operand case) —
    # besides inviting XLA to fold reduces over it (steady_chain_ms aux
    # rationale).
    def stable2(c, p, i):
        k, po = lax.sort((c, p), dimension=0, is_stable=True, num_keys=1)
        return k ^ (po & np.uint32(1))

    def unstable3(c, p, i):
        k, io, po = lax.sort((c, i, p), dimension=0, is_stable=False,
                             num_keys=2)
        return k ^ (po & np.uint32(1))

    def unstable2_rank(c, p, i):
        k, io = lax.sort((c, i), dimension=0, is_stable=False, num_keys=2)
        return k ^ (io & np.uint32(1))

    def steady_aux(fn, reps=5):
        def outer(a, p, i):
            def body(_, c):
                return c * np.uint32(2654435761) + jnp.ravel(fn(c, p, i))[-1]
            return lax.fori_loop(0, reps, body, a)

        g = jax.jit(outer)
        np.asarray(jnp.ravel(g(x, payload, idx))[-1:])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            r = g(x, payload, idx)
            np.asarray(jnp.ravel(r)[-1:])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    for name, f in (("pairs_stable_2op", stable2),
                    ("pairs_unstable_3op", unstable3),
                    ("rank_unstable_2op", unstable2_rank)):
        ms = steady_aux(f)
        print(json.dumps({"exp": name, "n": n, "ms": round(ms, 2),
                          "Mkeys": round(n / ms / 1e3, 0)}), flush=True)


def main():
    import argparse

    import jax
    from radix_sorting_tpu.utils import keyfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["kappa", "gather", "msd", "pairs"],
                    help="run a single experiment (re-runs after a crash)")
    args = ap.parse_args()

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    keys = keyfile.generate_keys(40_000_000)

    todo = {"kappa": exp_kappa_curve, "gather": exp_monotone_gather,
            "msd": exp_msd, "pairs": exp_pairs}
    if args.only:
        todo[args.only](keys)
        return
    exp_kappa_curve(keys)
    exp_monotone_gather(keys)
    exp_msd(keys)
    exp_pairs(keys)


if __name__ == "__main__":
    main()
