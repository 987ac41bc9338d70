"""End-to-end TPU drive: every major surface, verified against host oracles.

Run on a machine with the TPU attached (leave JAX_PLATFORMS alone):

    PYTHONPATH="/root/.axon_site:/root/repo" python scripts/drive_tpu.py [n]

This is the executable form of the verify-skill flows: the headline sort,
masked counting (fused kernels), batched rows, rank/record sorts, 64-bit
keys, dynamic probe, order statistics, uniques, and the distributed entry
points on a 1-chip mesh. Exits nonzero on any mismatch.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    from radix_sorting_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import radix_sorting_tpu as rst
    from radix_sorting_tpu.extras import merge_sorted, top_k
    from radix_sorting_tpu.parallel import (
        distributed_select,
        distributed_sort_balanced_u32,
        distributed_unique_sorted,
        gather_sorted,
        make_sort_mesh,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rng = np.random.default_rng(0xD1CE)
    print(f"device: {jax.devices()[0]}   n={n}")
    ok = True

    def check(name, cond):
        nonlocal ok
        ok &= bool(cond)
        print(f"  {'OK ' if cond else 'FAIL'} {name}")

    x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    xj = jnp.asarray(x)

    t0 = time.perf_counter()
    out = np.asarray(rst.sort(xj))
    check(f"keys-only sort ({(time.perf_counter()-t0)*1e3:.0f} ms wall)",
          np.array_equal(out, np.sort(x)))

    mask = 0xF0F00000
    xm = (x & np.uint32(mask)).astype(np.uint32)
    out = np.asarray(rst.sort(jnp.asarray(xm), value_mask=mask))
    check("masked counting fast path", np.array_equal(out, np.sort(xm)))

    perm = np.asarray(rst.argsort(jnp.asarray(x % 1000)))
    check("stable rank sort",
          np.array_equal(perm, np.argsort(x % 1000, kind="stable")))

    v = rng.standard_normal(n).astype(np.float32)
    sk, sv = rst.sort_pairs(jnp.asarray(x % 64), {"v": jnp.asarray(v)})
    order = np.argsort(x % 64, kind="stable")
    check("record sort (pytree payload)",
          np.array_equal(np.asarray(sv["v"]), v[order]))

    # byte-string payload field (numpy S in -> numpy S out; packed u32
    # planes — verifies the pack/unpack lowering on chip)
    nb = min(n, 200_000)
    names = np.array([f"k{i:06d}".encode() for i in range(nb)], dtype="S7")
    kb = (x[:nb] % 50).astype(np.uint32)
    _, svb = rst.sort_pairs(jnp.asarray(kb), {"name": names})
    check("record sort (byte-string field)",
          np.array_equal(svb["name"], names[np.argsort(kb, kind="stable")]))

    x64 = rng.integers(0, 1 << 64, size=n // 4, dtype=np.uint64)
    out = np.asarray(rst.sort(x64), dtype=np.uint64)
    check("64-bit keys (no x64)", np.array_equal(out, np.sort(x64)))

    rows = jnp.asarray(x[: (n // 4096) * 4096].reshape(-1, 4096))
    out = np.asarray(rst.sort_batched(rows))
    check("batched rows", np.array_equal(out, np.sort(np.asarray(rows), -1)))

    xlow = (rng.integers(0, 256, size=n, dtype=np.uint32) << 9).astype(np.uint32)
    cfg = rst.SortConfig(dynamic_probe=True)
    out = np.asarray(rst.sort(jnp.asarray(xlow), config=cfg))
    check("dynamic probe (unpromised low entropy)",
          np.array_equal(out, np.sort(xlow)))

    tv, ti = top_k(xj, 10)
    check("top_k", np.array_equal(np.asarray(tv), np.sort(x)[::-1][:10]))

    # round-3 surfaces -----------------------------------------------------
    # in-graph range probe: narrow-range data at an offset, no promise
    xnr = (x % np.uint32(5000)) + np.uint32(2_000_000_000)
    out = np.asarray(rst.sort(jnp.asarray(xnr),
                              config=rst.SortConfig(device_probe=True)))
    check("device probe (in-graph range dispatch)",
          np.array_equal(out, np.sort(xnr)))

    # two-word device probe: clustered u64 (constant hi plane, narrow lo)
    xc = (np.uint64(0xABCD_0000_4000_0000)
          + rng.integers(0, 4000, size=n).astype(np.uint64))
    out = np.asarray(rst.sort(xc, config=rst.SortConfig(device_probe=True)),
                     dtype=np.uint64)
    check("device probe u64 (clustered two-word keys)",
          np.array_equal(out, np.sort(xc)))

    # masked-u64 pairs through plane compaction (2 sorter operands)
    cmask = (0xFF << 32) | 0x0000F000
    k64 = (x64 & np.uint64(cmask)) if n >= 4 else x64
    pay = np.arange(k64.size, dtype=np.uint32)
    sk, sv = rst.sort_pairs(k64, jnp.asarray(pay), value_mask=cmask)
    order = np.argsort(k64, kind="stable")
    check("masked-u64 pairs (plane compaction)",
          np.array_equal(np.asarray(sv), pay[order])
          and np.array_equal(np.asarray(sk, dtype=np.uint64), k64[order]))

    # packed lexsort: four u8 columns as one operand
    from radix_sorting_tpu.extras import lexsort, segmented_sort
    cols = [(x >> np.uint32(8 * i)).astype(np.uint8) for i in range(4)]
    perm = np.asarray(lexsort([jnp.asarray(c) for c in cols]))
    check("packed lexsort (4x u8)",
          np.array_equal(perm, np.lexsort(tuple(cols)).astype(np.uint32)))

    # packed segmented sort, keys-descending in place
    seg = (x % np.uint32(37)).astype(np.uint8)
    k16 = (x >> np.uint32(11)).astype(np.uint16)
    sk2, sid = segmented_sort(jnp.asarray(k16), jnp.asarray(seg),
                              config=rst.SortConfig(descending=True))
    order = np.lexsort((np.uint16(0xFFFF) - k16, seg))
    check("packed segmented sort (desc keys)",
          np.array_equal(np.asarray(sid), seg[order])
          and np.array_equal(np.asarray(sk2), k16[order]))

    a = np.sort(x[: n // 2])
    b = np.sort(x[n // 2:])
    out = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    check("merge_sorted", np.array_equal(out, np.sort(x)))

    # searchsorted: binary-search (u32) + tagged-union (u64) formulations
    from radix_sorting_tpu.extras import searchsorted
    q = x[: max(4, n // 8)]
    got = np.asarray(searchsorted(jnp.asarray(a), jnp.asarray(q), side="right"))
    check("searchsorted u32", np.array_equal(got, np.searchsorted(a, q, side="right")))
    a64 = np.sort(x64)
    q64 = x64[: max(4, x64.size // 8)]
    got = np.asarray(searchsorted(a64, q64))
    check("searchsorted u64 (union sort)",
          np.array_equal(got, np.searchsorted(a64, q64)))
    # round-4 chunked query path (the q=40M worker-fault guard): force the
    # lax.map blocks at drive scale by shrinking the block size
    import radix_sorting_tpu.extras as _ex
    _old_qb = _ex._SEARCHSORTED_QBLOCK
    _ex._SEARCHSORTED_QBLOCK = max(1024, n // 8)
    try:
        qc = x[: max(8, n // 2)]
        got = np.asarray(searchsorted(jnp.asarray(a), jnp.asarray(qc)))
        check("searchsorted chunked queries (lax.map blocks)",
              np.array_equal(got, np.searchsorted(a, qc)))
    finally:
        _ex._SEARCHSORTED_QBLOCK = _old_qb
    # round-4 sorter= (numpy parity): unsorted keys + a sorting permutation;
    # the route replaces the a[sorter] gather with one oblivious sort
    au = x[: n // 2]
    srt = np.argsort(au, kind="stable")
    got = np.asarray(searchsorted(jnp.asarray(au), jnp.asarray(q),
                                  side="right", sorter=jnp.asarray(srt)))
    check("searchsorted sorter= (sort replaces gather)",
          np.array_equal(got, np.searchsorted(au, q, side="right",
                                              sorter=srt)))

    # intersect1d return_indices: first-occurrence positions ride the fused
    # sort as the lowest composite key (round 4)
    from radix_sorting_tpu.sets import intersect1d
    ia = (x[: n // 4] & np.uint32(0x3FFF)).astype(np.uint32)
    ib = (x[n // 4: n // 2] & np.uint32(0x3FFF)).astype(np.uint32)
    vals, c1, c2, cnt = intersect1d(jnp.asarray(ia), jnp.asarray(ib),
                                    return_indices=True)
    wv, w1, w2 = np.intersect1d(ia, ib, return_indices=True)
    k = len(wv)
    check("intersect1d return_indices (first occurrences)",
          int(cnt) == k
          and np.array_equal(np.asarray(vals)[:k], wv)
          and np.array_equal(np.asarray(c1)[:k], w1)
          and np.array_equal(np.asarray(c2)[:k], w2))

    # unique axis=0: rows as one composite multi-operand sort (round 4)
    from radix_sorting_tpu.sets import unique as _uniq
    rows = np.stack([(x[: n // 4] & np.uint32(0xFF)),
                     (x[n // 4: n // 2] & np.uint32(0xF))], axis=1)
    ur = _uniq(jnp.asarray(rows), axis=0, return_counts=True)
    wv, wc = np.unique(rows, axis=0, return_counts=True)
    uk = len(wv)
    check("unique axis=0 (rows as composite sort keys)",
          int(ur.num_unique) == uk
          and np.array_equal(np.asarray(ur.values)[:uk], wv)
          and np.array_equal(np.asarray(ur.counts)[:uk], wc))

    # bincount: dense histogram route (np.bincount via the MXU, not scatter).
    # 12-bit values against length=1000 (1024 padded bins) also verify the
    # kernel's drop_ge invalidation on chip: values >= 1024 would alias
    # mod 1024 into live bins without it
    from radix_sorting_tpu.extras import bincount
    xb8 = (x & np.uint32(0xFFF)).astype(np.uint32)
    got = np.asarray(bincount(jnp.asarray(xb8), length=1000))
    check("bincount (dense histogram + out-of-range drop)",
          np.array_equal(got, np.bincount(xb8, minlength=1000)[:1000]))

    # float8 keys: KDF-only extension riding the 256-bin counting tier
    from radix_sorting_tpu.ops import kdf
    f8 = jnp.asarray((x & np.uint32(0xFF)).astype(np.uint8)).view(
        jnp.dtype("float8_e4m3fn"))
    sf8 = rst.sort(f8)
    kx = np.asarray(kdf.encode(f8)[0])
    check("float8 sort (counting tier)",
          np.array_equal(np.asarray(kdf.encode(sf8)[0]), np.sort(kx)))

    # set routines: unique with the full flag surface + one merged-run set op
    # + isin (three distinct sort formulations: rank sort, side-flag merge,
    # searchsorted membership)
    from radix_sorting_tpu.sets import intersect1d, isin, unique
    xs = (x & np.uint32(0x3FFF)).astype(np.uint32)
    r = unique(jnp.asarray(xs), return_index=True, return_inverse=True,
               return_counts=True, size=1 << 14)
    uq, uidx, uinv, ucnt = np.unique(xs, return_index=True,
                                     return_inverse=True, return_counts=True)
    k = len(uq)
    check("unique (index/inverse/counts)",
          int(r.num_unique) == k
          and np.array_equal(np.asarray(r.values)[:k], uq)
          and np.array_equal(np.asarray(r.index)[:k], uidx)
          and np.array_equal(np.asarray(r.inverse), uinv)
          and np.array_equal(np.asarray(r.counts)[:k], ucnt))
    sa, sb = xs[: n // 2], (x[n // 2:] & np.uint32(0x3FFF)).astype(np.uint32) | 0x2000
    vals, cnt = intersect1d(jnp.asarray(sa), jnp.asarray(sb), size=1 << 14)
    want = np.intersect1d(sa, sb)
    check("intersect1d (side-flag merged sort)",
          int(cnt) == len(want)
          and np.array_equal(np.asarray(vals)[: len(want)], want))
    got = np.asarray(isin(jnp.asarray(sa[:100_000]), jnp.asarray(sb[:100_000])))
    gotv = np.asarray(isin(jnp.asarray(sa[:100_000]), jnp.asarray(sb[:100_000]),
                           invert=True))
    check("isin (membership via searchsorted)",
          np.array_equal(got, np.isin(sa[:100_000], sb[:100_000]))
          and np.array_equal(gotv, ~got))

    # group-by reduction: one unstable (key, value) composite sort
    from radix_sorting_tpu.extras import group_reduce
    gk = (x & np.uint32(0x3FF)).astype(np.uint32)
    gv = (x >> np.uint32(10)).astype(np.int32) & 0xFFFF
    uk, tot, ng = group_reduce(jnp.asarray(gk), jnp.asarray(gv), reduce="sum")
    uq, inv = np.unique(gk, return_inverse=True)
    want = np.zeros(len(uq), np.int64)
    np.add.at(want, inv, gv.astype(np.int64))
    check("group_reduce sum (composite sort, cumsum-diff)",
          int(ng) == len(uq)
          and np.array_equal(np.asarray(uk)[: len(uq)], uq)
          and np.array_equal(np.asarray(tot)[: len(uq)].astype(np.int64),
                             want))

    # round-4 DENSE group tier: weighted MXU histogram, no sort at all
    uk, tot, ng = group_reduce(jnp.asarray(gk), jnp.asarray(gv),
                               reduce="sum", groups=1 << 10)
    check("group_reduce dense tier (weighted MXU histogram)",
          int(ng) == len(uq)
          and np.array_equal(np.asarray(uk)[: len(uq)], uq)
          and np.array_equal(np.asarray(tot)[: len(uq)].astype(np.int64),
                             want))
    from radix_sorting_tpu.extras import value_counts
    vcv, vcc, vcn = value_counts(jnp.asarray(gk), groups=1 << 10)
    check("value_counts dense tier (MXU histogram + compaction)",
          int(vcn) == len(uq)
          and np.array_equal(np.asarray(vcv)[: len(uq)], uq)
          and np.array_equal(np.asarray(vcc)[: len(uq)],
                             np.bincount(gk, minlength=1 << 10)[uq]))

    # round-5 FLOAT dense tier: fused count+bf16x2-sum histogram, vs a
    # float64 oracle within the documented bound
    gvf = (rng.standard_normal(n) * 100).astype(np.float32)
    uk, tot, ng = group_reduce(jnp.asarray(gk), jnp.asarray(gvf),
                               reduce="sum", groups=1 << 10)
    reff = np.zeros(1 << 10, np.float64)
    np.add.at(reff, gk, gvf.astype(np.float64))
    absvf = np.zeros(1 << 10, np.float64)
    np.add.at(absvf, gk, np.abs(gvf).astype(np.float64))
    errf = np.abs(np.asarray(tot)[: len(uq)].astype(np.float64) - reff[uq])
    check("group_reduce dense tier f32 (count+bf16x2-sum histogram)",
          int(ng) == len(uq)
          and np.array_equal(np.asarray(uk)[: len(uq)], uq)
          and bool(np.all(errf <= absvf[uq] * 2**-14 + 1e-5)))

    # order statistics / ranking: tie-aware ranks (boundary algebra +
    # inverse-permutation restore), exact quantiles off the dispatched
    # sort, histogram through the dense bincount + group_reduce routes
    from radix_sorting_tpu.stats import digitize, histogram, quantile, rankdata
    rk = (x & np.uint32(0x7F)).astype(np.uint32)  # heavy ties
    got = np.asarray(rankdata(jnp.asarray(rk), method="average"))
    srt = np.argsort(rk, kind="stable")
    rmin = np.empty(n, np.int64); rmax = np.empty(n, np.int64)
    isnew = np.concatenate([[True], rk[srt][1:] != rk[srt][:-1]])
    rid = np.cumsum(isnew) - 1
    starts = np.flatnonzero(isnew)
    lens = np.diff(np.concatenate([starts, [n]]))
    rmin[srt] = starts[rid]; rmax[srt] = starts[rid] + lens[rid] - 1
    want_avg = (rmin + rmax) / 2.0 + 1.0
    check("rankdata average (tie algebra)",
          np.array_equal(got.astype(np.float64), want_avg))
    got = np.asarray(quantile(jnp.asarray(v), [0.01, 0.5, 0.99]))
    want = np.quantile(v.astype(np.float64), [0.01, 0.5, 0.99])
    check("quantile (sorted-take lerp)", np.allclose(got, want, rtol=1e-5))
    # grid-aligned data: stats.py's f32 uniform binning matches numpy's
    # f64 oracle bit-for-bit only away from the ~1-ulp edge band (the
    # documented precision contract; tests/test_stats.py verifies the raw
    # f32 arithmetic itself)
    vh = np.round(v, 2).astype(np.float32)
    hc, he = histogram(jnp.asarray(vh), bins=64, range=(-4.0, 4.0))
    wc, _ = np.histogram(vh, bins=64, range=(-4.0, 4.0))
    check("histogram uniform (dense bincount)",
          np.array_equal(np.asarray(hc), wc))
    hw, _ = histogram(jnp.asarray(vh), bins=16, range=(-2.0, 2.0),
                      weights=jnp.asarray(np.abs(v)))
    ww, _ = np.histogram(vh, bins=16, range=(-2.0, 2.0),
                         weights=np.abs(v).astype(np.float64))
    check("histogram weighted (group_reduce densify)",
          np.allclose(np.asarray(hw), ww, rtol=1e-3, atol=1e-2))
    dedges = np.array([3.0, 1.0, 0.0, -1.0, -3.0], np.float32)
    got = np.asarray(digitize(jnp.asarray(v), jnp.asarray(dedges)))
    check("digitize (decreasing bins)",
          np.array_equal(got, np.digitize(v, dedges)))

    mesh = make_sort_mesh(1)
    sp, counts, ovf = distributed_sort_balanced_u32(xj, mesh)
    check("distributed balanced (1-chip mesh)",
          np.array_equal(gather_sorted(sp, counts, ovf), np.sort(x)))

    ranks = [0, n // 2, n - 1]
    got = np.asarray(distributed_select(xj, ranks, mesh))
    check("distributed_select", np.array_equal(got, np.sort(x)[ranks]))

    xu = rng.integers(0, 5000, size=n, dtype=np.uint32)
    vals, counts, ovf = distributed_unique_sorted(jnp.asarray(xu), mesh)
    check("distributed_unique_sorted",
          np.array_equal(gather_sorted(vals, counts, ovf), np.unique(xu)))

    from radix_sorting_tpu.parallel import distributed_group_reduce
    gk = (xu % 211).astype(np.uint32)
    gvv = (xu >> 4).astype(np.int32)
    uk, red, counts, ovf = distributed_group_reduce(
        jnp.asarray(gk), jnp.asarray(gvv), mesh, reduce="sum")
    uq, inv = np.unique(gk, return_inverse=True)
    want = np.zeros(len(uq), np.int64)
    np.add.at(want, inv, gvv.astype(np.int64))
    check("distributed_group_reduce (1-chip mesh)",
          np.array_equal(gather_sorted(uk, counts, ovf), uq)
          and np.array_equal(
              gather_sorted(red, counts, ovf).astype(np.int64), want))
    # round-4 dense tier: per-shard weighted histograms + one psum
    uk, red, counts, ovf = distributed_group_reduce(
        jnp.asarray(gk), jnp.asarray(gvv), mesh, reduce="sum", groups=211)
    check("distributed_group_reduce dense tier (1-chip mesh)",
          np.array_equal(gather_sorted(uk, counts, ovf), uq)
          and np.array_equal(
              gather_sorted(red, counts, ovf).astype(np.int64), want))

    from radix_sorting_tpu.parallel import (distributed_bincount,
                                            distributed_quantile)
    got = np.asarray(distributed_quantile(xj, [0.25, 0.5, 0.75], mesh,
                                          method="lower"))
    check("distributed_quantile (1-chip mesh)",
          np.array_equal(got, np.quantile(x, [0.25, 0.5, 0.75],
                                          method="lower").astype(np.uint32)))
    got = np.asarray(distributed_bincount(jnp.asarray(xu), mesh, 5000))
    check("distributed_bincount (1-chip mesh)",
          np.array_equal(got, np.bincount(xu, minlength=5000)))

    from radix_sorting_tpu.extras import top_k as local_top_k
    from radix_sorting_tpu.parallel import distributed_top_k
    tv, ti = distributed_top_k(xj, 64, mesh)
    rv, ri = local_top_k(xj, 64)
    check("distributed_top_k (1-chip mesh)",
          np.array_equal(np.asarray(tv), np.asarray(rv))
          and np.array_equal(np.asarray(ti), np.asarray(ri)))

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
