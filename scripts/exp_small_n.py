"""Small-n quadrant experiment: can anything beat the flat sorter at 100k-1M?

The reference peaks CACHE-RESIDENT at 438 Mk/s at 100k keys
(`/root/reference/report/report-i5-3570T-2020-04-18.txt:236`); this
framework's flat `lax.sort` measures ~167 Mk/s there (PARITY crossover
note) — the one quadrant of the reference's perf envelope still conceded
(round-3 VERDICT item 8). The flat sorter's small-n cost is the full
O(log^2 n) bitonic network depth at tiny occupancy; candidates here attack
it with the measured fast regime: small-power-of-two ROW sorts run at
3+ Gk/s (ROADMAP round-2 experiment 1).

Candidates (all bit-exact, checked in-script against np.sort):
  flat         — lax.sort 1-D (the shipped route / baseline)
  columnsort   — Leighton's 8-step columnsort over an (r, s) matrix:
                 4 batched row sorts (columns stored as rows) + 2 cheap
                 (s, r) transposes + a sentinel shift. Valid when
                 r >= 2(s-1)^2 and s | r; sorts column-major.
  colsort8     — same with s=8 (shallower condition, more rows/sort)
  colsort32    — s=32 (needs r >= 1922 -> n >= 2^16ish)

Run:  PYTHONPATH="/root/.axon_site:/root/repo" python scripts/exp_small_n.py
CPU:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        python scripts/exp_small_n.py --check-only
"""

import argparse
import json
import sys

import numpy as np

UMAX = np.uint32(0xFFFFFFFF)


def make_columnsort(n: int, s: int):
    """Return a jitted column-major Leighton columnsort for padded length n.

    Matrix is (r, s) with r = n/s, stored TRANSPOSED as T (s, r) so every
    "sort each column" is one batched ROW sort (the measured 3+ Gk/s
    regime; a dimension-0 sort of (r, s) lowers ~6x slower). Column-major
    ravel of the matrix is exactly T.ravel(), so the shift steps are pure
    concatenation. Returns None when the columnsort condition fails.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if n % s:
        return None
    r = n // s
    if r % s or r < 2 * (s - 1) ** 2 or r < 2:
        return None
    h = r // 2

    def rowsort(t):
        (o,) = lax.sort((t,), dimension=1, is_stable=False, num_keys=1)
        return o

    @jax.jit
    def csort(x):
        t = x.reshape(s, r)                      # A^T; any initial layout
        t = rowsort(t)                           # 1. sort columns
        t = t.reshape(r, s).T                    # 2. transpose
        t = rowsort(t)                           # 3. sort columns
        t = t.T.reshape(s, r)                    # 4. untranspose
        t = rowsort(t)                           # 5. sort columns
        v = t.reshape(-1)                        # column-major of A
        v = jnp.concatenate([jnp.zeros((h,), jnp.uint32), v,
                             jnp.full((h,), UMAX, jnp.uint32)])
        t2 = v.reshape(s + 1, r)                 # 6. shift by r/2
        t2 = rowsort(t2)                         # 7. sort columns
        return t2.reshape(-1)[h: h + n]          # 8. unshift -> sorted

    return csort


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true",
                    help="exactness sweep only (CPU-friendly)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.utils.timing import steady_chain_ms

    rng = np.random.default_rng(0x5A11)
    print(json.dumps({"device": str(jax.devices()[0])}))

    # exactness sweep (padding + sentinel ties + duplicate-heavy)
    for n_raw, s in [(4096, 8), (100_000, 8), (1 << 17, 16), (555_555, 16),
                     (1 << 20, 32)]:
        npad = -(-n_raw // (s * s)) * (s * s)  # s | r needs s^2 | n
        cs = make_columnsort(npad, s)
        if cs is None:
            print(json.dumps({"n": n_raw, "s": s, "status": "inapplicable"}))
            continue
        for style in ("uniform", "dup8"):
            x = (rng.integers(0, 1 << 32, size=n_raw, dtype=np.uint32)
                 if style == "uniform" else
                 rng.integers(0, 8, size=n_raw, dtype=np.uint32) * 0x20000001)
            xp = np.concatenate([x, np.full(npad - n_raw, UMAX, np.uint32)])
            got = np.asarray(cs(jnp.asarray(xp)))[:n_raw]
            assert np.array_equal(got, np.sort(x)), (n_raw, s, style)
        print(json.dumps({"n": n_raw, "s": s, "status": "bit-exact"}))
    if args.check_only:
        print(json.dumps({"check": "all columnsort variants bit-exact"}))
        return 0

    # steady-state timing: flat vs columnsort variants (chip).
    # sub-64k sizes complete the crossover curve vs the reference's
    # cache-resident peak (the columnsort condition r >= 2(s-1)^2 rarely
    # holds there — those sizes mostly time flat only)
    for n in (1 << 13, 1 << 14, 1 << 15, 1 << 16, 100_000, 1 << 17,
              1 << 18, 1 << 20, 1 << 22):
        x = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        reps = max(10, min(200, 20_000_000 // n))

        def flat(c):
            (o,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
            return o

        ms = steady_chain_ms(flat, x, reps=reps)
        print(json.dumps({"n": n, "method": "flat", "ms": round(ms, 4),
                          "Mkeys_s": round(n / ms / 1e3, 1)}))
        for s in (8, 16, 32):
            npad = -(-n // (s * s)) * (s * s)
            cs = make_columnsort(npad, s)
            if cs is None:
                continue
            pad = npad - n

            def col(c, _cs=cs, _pad=pad):
                cp = (jnp.concatenate(
                    [c, jnp.full((_pad,), UMAX, jnp.uint32)])
                    if _pad else c)
                return _cs(cp)[: c.shape[0]]

            ms = steady_chain_ms(col, x, reps=reps)
            print(json.dumps({"n": n, "method": f"colsort{s}",
                              "ms": round(ms, 4),
                              "Mkeys_s": round(n / ms / 1e3, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
