"""The TPU dispatch graph, exercised on CPU via RST_FORCE_TPU_ROUTES=1.

Round-2 verdict: backend-gated dispatch meant CI tested different routes than
production — the `use_tpu_routes()` gates sent CPU down XLA fallbacks, so the
windowed tier's in-graph sparse-input sorter fallback (and every other Pallas
route) only ever ran on-chip. With the env override the REAL dispatch graph
builds on CPU (kernels in Pallas interpret mode), including both `lax.cond`
branches. The reference's analog is its always-on self-verification
(`radix_experiment.cpp:208-212`): the production path is the tested path.

Interpret mode is slow, so sizes here are the minimum that still reaches each
tier; full-scale routes are driven on hardware (scripts/drive_tpu.py, bench).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _force_tpu_routes():
    # The gates read the env var at TRACE time; traces are cached per shape,
    # so clear caches around the suite to keep forced/unforced graphs apart.
    os.environ["RST_FORCE_TPU_ROUTES"] = "1"
    jax.clear_caches()
    yield
    os.environ.pop("RST_FORCE_TPU_ROUTES", None)
    jax.clear_caches()


def test_gate_helper_reads_env():
    from radix_sorting_tpu.ops.pallas_kernels import use_tpu_routes
    assert use_tpu_routes()
    os.environ.pop("RST_FORCE_TPU_ROUTES", None)
    assert use_tpu_routes() == (jax.default_backend() == "tpu")
    os.environ["RST_FORCE_TPU_ROUTES"] = "1"


def test_plain_counting_tier_u8(rng):
    # u8 keys: Pallas histogram + plain regeneration (256 bins)
    import radix_sorting_tpu as rst
    x = rng.integers(0, 256, size=70_003, dtype=np.uint8)
    out = np.asarray(rst.sort(jnp.asarray(x)))
    assert np.array_equal(out, np.sort(x))


def test_masked_u32_plain_pdep(rng):
    # 8 live bits: fused PEXT histogram + PDEP regeneration
    import radix_sorting_tpu as rst
    mask = 0xF0F00000
    x = (rng.integers(0, 1 << 32, size=150_007, dtype=np.uint32)
         & np.uint32(mask))
    out = np.asarray(rst.sort(jnp.asarray(x), value_mask=mask))
    assert np.array_equal(out, np.sort(x))


def test_masked_u32_windowed_fit_branch(rng):
    # 12 live bits, dense data: windowed PDEP regen, fit-check TRUE branch
    import radix_sorting_tpu as rst
    mask = 0x3FFC0  # 12 contiguous live bits
    x = (rng.integers(0, 1 << 32, size=600_011, dtype=np.uint32)
         & np.uint32(mask)) | np.uint32(0x80000004 & ~mask)
    out = np.asarray(rst.sort(jnp.asarray(x), value_mask=mask | 0x80000004))
    assert np.array_equal(out, np.sort(x))


def test_windowed_sorter_fallback_branch(rng):
    # The in-graph lax.cond FALSE branch: data passes the static (n, bins)
    # gate but one output block spans more bins than the window, so the
    # fit check routes to the sorter at runtime. Construction: one element
    # in each of ~1500 of 2048 bins, the rest piled into one high bin —
    # block 0 then spans ~2000 bins > window.
    from radix_sorting_tpu.ops.counting_engine import (_windowed_bins_ok,
                                                       counting_sort_compact)
    from radix_sorting_tpu.ops.pallas_kernels import (pick_window,
                                                      regen_windows_fit)
    bins, n = 1 << 11, 400_009
    singles = np.arange(1500, dtype=np.uint32)
    x = np.concatenate([singles,
                        np.full(n - singles.size, 2000, np.uint32)])
    x = np.random.default_rng(7).permutation(x)
    assert _windowed_bins_ok(n, bins)
    window = pick_window(n, bins)
    hist = np.bincount(x, minlength=bins).astype(np.int32)
    cum = jnp.cumsum(jnp.asarray(hist), dtype=jnp.int32)
    assert not bool(regen_windows_fit(cum, n, window))
    out = np.asarray(counting_sort_compact(jnp.asarray(x), bins))
    assert np.array_equal(out, np.sort(x))


def test_masked_u64_two_plane_windowed(rng):
    # cross-plane mask (5 + 7 = 12 live bits): fused pdep2 windowed route
    import radix_sorting_tpu as rst
    mask_hi, mask_lo = 0x1F, 0xFE000000  # 5 + 7 = 12 live bits
    full_mask = (mask_hi << 32) | mask_lo
    r = rng.integers(0, 1 << 62, size=600_013).astype(np.uint64)
    x = r & np.uint64(full_mask)
    out = np.asarray(rst.sort(x, value_mask=int(full_mask)))
    assert np.array_equal(out, np.sort(x))


def test_u16_static_gate_routes_sorter(rng):
    # u16 full domain at CI scale: the static gate rejects (window cannot
    # cover the span at this n), so the raw-plane sorter runs WITHOUT paying
    # the histogram — result identical either way
    import radix_sorting_tpu as rst
    x = rng.integers(0, 1 << 16, size=90_017, dtype=np.uint16)
    out = np.asarray(rst.sort(jnp.asarray(x)))
    assert np.array_equal(out, np.sort(x))


def test_bitmap_presence_route(rng):
    from radix_sorting_tpu.ops.bitmap import bitmap_unique_sort
    x = rng.integers(0, 500, size=70_001, dtype=np.uint16)
    values, count = bitmap_unique_sort(x)
    expect = np.unique(x)
    assert int(count) == expect.size
    assert np.array_equal(np.asarray(values)[: expect.size], expect)


def test_lsd_engine_forced_route(rng):
    # Strategy.LSD end-to-end under forced TPU routes (per-pass chunked
    # histograms + stable scatter; the fused multi_digit_histogram op is a
    # standalone listing-parity op, NOT on this path — see histogram.py)
    import radix_sorting_tpu as rst
    x = rng.integers(0, 1 << 32, size=70_009, dtype=np.uint32)
    cfg = rst.SortConfig(strategy=rst.Strategy.LSD)
    out = np.asarray(rst.sort(jnp.asarray(x), config=cfg))
    assert np.array_equal(out, np.sort(x))


# ---------------------------------------------------------------------------
# in-graph range probe (round 3): `SortConfig.device_probe` dispatches on the
# measured key range with a lax.cond — no host sync. Forced routes exercise
# both branches (and the inner window-fit fallback) on CPU.


def test_probe_bins_scales_with_n():
    from radix_sorting_tpu.ops.counting_engine import probe_bins
    assert probe_bins(40_000_000) == 1 << 16
    assert probe_bins(500_000) == 1 << 11
    assert probe_bins(10_000) == 1 << 10   # plain-tier floor


def test_device_probe_narrow_offset_range(rng):
    # values in [3e9, 3e9 + 1500): narrow RANGE, huge values — only the
    # offset trick catches this (no static mask could)
    import radix_sorting_tpu as rst
    cfg = rst.SortConfig(device_probe=True)
    n = 500_003
    x = (rng.integers(0, 1500, size=n).astype(np.uint64)
         + np.uint64(3_000_000_000)).astype(np.uint32)
    out = np.asarray(rst.sort(jnp.asarray(x), config=cfg))
    assert np.array_equal(out, np.sort(x))
    # descending through the same probe (complemented word, range unchanged)
    outd = np.asarray(rst.sort(jnp.asarray(x),
                               config=cfg.replace(descending=True)))
    assert np.array_equal(outd, np.sort(x)[::-1])


def test_device_probe_wide_takes_sorter(rng):
    import radix_sorting_tpu as rst
    cfg = rst.SortConfig(device_probe=True)
    x = rng.integers(0, 1 << 32, size=500_005, dtype=np.uint32)
    out = np.asarray(rst.sort(jnp.asarray(x), config=cfg))
    assert np.array_equal(out, np.sort(x))


def test_device_probe_narrow_signed_and_float(rng):
    import radix_sorting_tpu as rst
    cfg = rst.SortConfig(device_probe=True)
    xi = rng.integers(-700, 700, size=500_007, dtype=np.int32)
    out = np.asarray(rst.sort(jnp.asarray(xi), config=cfg))
    assert np.array_equal(out, np.sort(xi))
    # f32 in a tight band: derived-word range is narrow too
    xf = (1.0 + rng.integers(0, 1000, size=500_009).astype(np.float32)
          * np.float32(2**-23))
    out = np.asarray(rst.sort(jnp.asarray(xf), config=cfg))
    assert np.array_equal(out, np.sort(xf))


def test_device_probe_u64_hi_const_narrow_lo(rng):
    # 64-bit keys inside one 2^32 span with a narrow lo range: the hi-plane
    # constancy probe drops to the single-word probe, which routes on to the
    # counting tier — all in-graph
    import radix_sorting_tpu as rst
    cfg = rst.SortConfig(device_probe=True)
    base = np.uint64(0x1234_5678_9000_0000)
    x = base + rng.integers(0, 2000, size=500_011).astype(np.uint64)
    out = np.asarray(rst.sort(x, config=cfg), dtype=np.uint64)
    assert np.array_equal(out, np.sort(x))
    outd = np.asarray(rst.sort(x, config=cfg.replace(descending=True)),
                      dtype=np.uint64)
    assert np.array_equal(outd, np.sort(x)[::-1])


def test_device_probe_u64_hi_const_wide_lo(rng):
    # constant hi plane, full-entropy lo: takes the ONE-operand sorter branch
    import radix_sorting_tpu as rst
    cfg = rst.SortConfig(device_probe=True)
    base = np.uint64(7) << np.uint64(32)
    x = base + rng.integers(0, 1 << 32, size=300_003).astype(np.uint64)
    out = np.asarray(rst.sort(x, config=cfg), dtype=np.uint64)
    assert np.array_equal(out, np.sort(x))


def test_device_probe_defers_to_static_compaction(rng, monkeypatch):
    # A 64-bit value_mask with 18-32 live bits is a STATIC promise of the
    # one-operand compacted sorter route (measured 1.4x); device_probe must
    # not pre-empt it with the runtime range probe. Regression for the
    # round-3 review finding: poison the probe entry points and assert the
    # masked sort still succeeds (i.e. took the compaction route).
    import radix_sorting_tpu as rst
    from radix_sorting_tpu.ops import counting_engine as ce

    def boom(*a, **k):
        raise AssertionError("range probe must not pre-empt static compaction")

    monkeypatch.setattr(ce, "sort_words2_range_probe", boom)
    monkeypatch.setattr(ce, "sort_word_range_probe", boom)
    cfg = rst.SortConfig(device_probe=True)
    mask = (0xFFF << 32) | 0xFFF0_0000          # 24 live bits across planes
    x = rng.integers(0, 1 << 63, size=100_003, dtype=np.uint64) & np.uint64(mask)
    out = np.asarray(rst.sort(x, config=cfg, value_mask=mask), dtype=np.uint64)
    assert np.array_equal(out, np.sort(x))


def test_device_probe_u64_varying_hi_takes_full_sorter(rng):
    import radix_sorting_tpu as rst
    cfg = rst.SortConfig(device_probe=True)
    x = rng.integers(0, 1 << 63, size=300_005, dtype=np.uint64)
    out = np.asarray(rst.sort(x, config=cfg), dtype=np.uint64)
    assert np.array_equal(out, np.sort(x))
    # i64 through the sign-flip KDF: one negative key breaks hi constancy
    xi = x.astype(np.int64)
    out = np.asarray(rst.sort(xi, config=cfg), dtype=np.int64)
    assert np.array_equal(out, np.sort(xi))


def test_device_probe_f64_band(rng):
    # f64 values in a tight positive band: mangled hi plane is constant,
    # lo plane narrow -> counting route end to end
    import radix_sorting_tpu as rst
    cfg = rst.SortConfig(device_probe=True)
    x = 1.0 + rng.integers(0, 1500, size=500_009).astype(np.float64) * 2.0**-52
    out = np.asarray(rst.sort(x, config=cfg), dtype=np.float64)
    assert np.array_equal(out, np.sort(x))


def test_device_probe_skewed_inner_fallback():
    # range fits the probe domain but one output block overruns the window:
    # the INNER lax.cond falls back to the sorter — still exact
    import radix_sorting_tpu as rst
    from radix_sorting_tpu.ops.counting_engine import probe_bins
    cfg = rst.SortConfig(device_probe=True)
    n = 400_011
    bins = probe_bins(n)
    singles = np.arange(0, bins - 64, max(1, (bins - 64) // 1500),
                        dtype=np.uint32)[:1500]
    x = np.concatenate([singles,
                        np.full(n - singles.size, bins - 1, np.uint32)])
    x = np.random.default_rng(13).permutation(x)
    assert int(x.max()) - int(x.min()) < bins
    out = np.asarray(rst.sort(jnp.asarray(x), config=cfg))
    assert np.array_equal(out, np.sort(x))


def test_group_reduce_dense_tier_pallas(rng):
    # the dense group-by tier through the REAL weighted-histogram kernel
    # (interpret mode) — counts + byte-plane sums vs the sort-native route
    from radix_sorting_tpu.extras import group_reduce
    n, G = 40_000, 1 << 10
    k = rng.integers(0, G, size=n, dtype=np.uint32)
    k[::500] = G + 3  # dropped by the kernel's drop_ge, not aliased
    v = rng.integers(-(1 << 30), 1 << 30, size=n, dtype=np.int32)
    uk_d, rv_d, ng_d = group_reduce(k, v, reduce="sum", groups=G)
    ok = k < G
    uk_s, rv_s, ng_s = group_reduce(k[ok], v[ok], reduce="sum",
                                    size=int(ng_d))
    m = int(ng_d)
    assert int(ng_s) == m
    assert np.array_equal(np.asarray(uk_d)[:m], np.asarray(uk_s)[:m])
    assert np.array_equal(np.asarray(rv_d)[:m], np.asarray(rv_s)[:m])


def test_group_reduce_dense_signed_bias_pallas(rng):
    # signed narrow values: the +2^(bits-1) bias / count*bias correction
    from radix_sorting_tpu.extras import group_reduce
    n, G = 20_000, 32
    k = rng.integers(0, G, size=n, dtype=np.int32)
    v = rng.integers(-128, 128, size=n, dtype=np.int8)
    uk, rv, ng = group_reduce(k, v, reduce="sum", groups=G)
    ref = np.zeros(G, np.int64)
    np.add.at(ref, k, v.astype(np.int64))
    ids = np.asarray(uk)[: int(ng)]
    assert np.array_equal(np.asarray(rv)[: int(ng)], ref[ids].astype(np.int32))


def test_group_reduce_dense_f32_pallas(rng):
    # FLOAT dense tier: the fused count+bf16x2-sum kernel
    # (weighted_histogram_f32_counts_tpu) vs a float64 oracle, within the
    # documented error bound (bf16x2 split <= ~2^-16/element relative +
    # f32 accumulation)
    from radix_sorting_tpu.extras import group_reduce
    n, G = 40_000, 1 << 10
    k = rng.integers(0, G, size=n, dtype=np.uint32)
    k[::500] = G + 3  # dropped by drop_ge, not aliased
    v = (rng.standard_normal(n) * 100).astype(np.float32)
    live = k < G
    ref = np.zeros(G, np.float64)
    np.add.at(ref, k[live], v[live].astype(np.float64))
    absv = np.zeros(G, np.float64)
    np.add.at(absv, k[live], np.abs(v[live]).astype(np.float64))
    cnt = np.bincount(k[live], minlength=G)

    uk, rv, ng = group_reduce(k, jnp.asarray(v), reduce="sum", groups=G)
    assert rv.dtype == jnp.float32
    m = int(ng)
    assert m == int((cnt > 0).sum())
    ids = np.asarray(uk)[:m]
    got = np.asarray(rv)[:m].astype(np.float64)
    bound = absv[ids] * 2**-14 + 1e-5
    assert np.all(np.abs(got - ref[ids]) <= bound)
    # ...and the direct per-bin sums beat the sort-native cumsum-difference
    # route's worst case: both within their bounds vs the same f64 oracle
    uk_s, rv_s, ng_s = group_reduce(k[live], v[live], reduce="sum", size=m)
    assert int(ng_s) == m
    assert np.array_equal(np.asarray(uk_s)[:m], ids)
    assert np.all(np.abs(np.asarray(rv_s)[:m].astype(np.float64) - ref[ids])
                  <= absv[ids] * 2**-10 + np.abs(ref).sum() * 2**-20 + 1e-5)

    uk2, rm, ng2 = group_reduce(k, jnp.asarray(v), reduce="mean", groups=G)
    want_mean = ref[ids] / np.maximum(cnt[ids], 1)
    assert np.allclose(np.asarray(rm)[: int(ng2)], want_mean,
                       rtol=1e-3, atol=1e-4)
    # f16 values ride the same tier through one exact cast
    vh = np.round(v[:n]).astype(np.float16)
    uk3, rv3, ng3 = group_reduce(k, jnp.asarray(vh), reduce="sum", groups=G)
    ref16 = np.zeros(G, np.float64)
    np.add.at(ref16, k[live], vh[live].astype(np.float64))
    absv16 = np.zeros(G, np.float64)
    np.add.at(absv16, k[live], np.abs(vh[live]).astype(np.float64))
    got3 = np.asarray(rv3)[: int(ng3)].astype(np.float64)
    assert np.all(np.abs(got3 - ref16[ids]) <= absv16[ids] * 2**-14 + 1e-5)


def test_histogram_weighted_mxu_route(rng):
    # f32-weighted histogram through the bf16x2 weighted MXU kernel
    from radix_sorting_tpu.stats import histogram
    x = rng.standard_normal(60_000).astype(np.float32)
    w = rng.standard_normal(60_000).astype(np.float32)
    c, edges = histogram(jnp.asarray(x), bins=12, range=(-2, 2),
                         weights=jnp.asarray(w))
    ce, _ = np.histogram(x, bins=12, range=(-2, 2),
                         weights=w.astype(np.float64))
    assert np.allclose(np.asarray(c), ce, rtol=2e-4, atol=2e-3)
    # edge-array bins (non-uniform) take the same weighted kernel
    eb = np.array([-2.0, -0.5, 0.0, 0.25, 1.0, 2.0])
    c2, _ = histogram(jnp.asarray(x), bins=eb, weights=jnp.asarray(w))
    ce2, _ = np.histogram(x, bins=eb, weights=w.astype(np.float64))
    assert np.allclose(np.asarray(c2), ce2, rtol=2e-4, atol=2e-3)
