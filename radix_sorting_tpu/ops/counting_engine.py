"""COUNTING engine: histogram + regeneration for small live domains.

The reference's in-place counting sort (`counting_sort_8.c:5-21`) rewrites the
array *from its histogram* — for a keys-only sort the sorted output is fully
determined by the counts, no data movement needed. That observation is worth
far more on TPU than on CPU: regeneration is a dense, scatter-free computation
that runs at vector speed, while any permutation-based path pays the
data-dependent-addressing tax.

Pipeline (keys-only, live domain of B = 2**k distinct bit patterns):

  1. compact the live bits of the derived key (vectorized PEXT; the key
     compaction the reference describes at `README.md:716-758`) so the domain
     is dense in [0, B);
  2. B-bin histogram (dense compare-reduce, :mod:`.histogram`);
  3. inclusive scan -> cumulative counts ``cum``;
  4. regenerate: ``out[j] = #{b : cum[b] <= j}`` — a compare-reduce against the
     (tiny) cum vector; this is exactly "value v appears hist[v] times,
     in order" (`counting_sort_8.c:14-19`) without any scatter;
  5. expand live bits (PDEP) and KDF-decode back to values.

Applicability: uint8/int8 keys always (B = 256, the `counting_sort_8.c`
domain); any dtype whose *live-bit* count fits the configured budget — which
is what makes column skipping (`README.md:671-714`) a throughput feature here:
a 0xF0F00000-masked u32 input (the reference's skip-forcing experiment knob,
`radix_experiment.cpp:188-198`) sorts at histogram speed.

For key+payload counting sorts (the `counting_sort_8s.c` contract) stability
of the permutation matters and regeneration does not apply; the dispatcher
routes those to a stable sort by the (narrow) derived key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import probes
from .histogram import digit_histogram
from .pallas_kernels import use_tpu_routes

__all__ = ["counting_sort_compact", "sort_word_counting",
           "sort_words_counting", "sort_word_range_probe",
           "sort_words2_range_probe", "probe_bins"]


# Plain regeneration is O(bins) compares per output element, so it loses to
# the hardware sorter past ~2^10 bins (measured: 256-bin regen ~5 ms/40M vs
# the 77 ms sorter; 4096-bin would exceed it, and the Pallas kernel's
# (bins, lane-row) compare tile stops fitting VMEM long before 2^16).
_REGEN_MAX_BINS = 1 << 10

# WINDOWED regeneration (round 2) extends the counting fast path to 2^16
# bins on TPU: each output block compares only against the small bin
# window its positions can span (O(window)/element), with an in-graph
# `lax.cond` sorter fallback for distributions whose blocks would overrun
# the window (tiny n over a huge sparse domain). See
# `pallas_kernels.regenerate_windowed_tpu`. Round 3: the window is sized
# per call from the static (n, bins) span bound (`pick_window`) instead of
# a fixed 1024, and the tier extends past 2^16 bins where both the window
# fits and the density makes the histogram pay (see `_windowed_bins_ok`).
_REGEN_WIN_MAX_BINS = 1 << 16
_REGEN_WIDE_MAX_BINS = 1 << 17

# Density floor for the WIDE tier (2^17 bins): the factored one-hot
# histogram costs `bins` MXU MACs per element regardless of n, so the wide
# domain only pays when keys-per-bin is high enough that histogram+regen
# undercuts the sorter. Measured on v5e (scripts/exp_adaptive_window.py,
# round 3): 2^17 is 1.01x the sorter at 305 keys/bin (40M) and 0.80x at
# 1220 keys/bin (160M) — the floor sits between; 512 keeps only clear
# wins. 2^18 loses at every density (its histogram alone, 2.9 ns/elem,
# exceeds the sorter's per-element cost at any feasible n on this part),
# hence the 2^17 cap. Re-probe on new parts: scripts/exp_sol_probe.py +
# exp_adaptive_window.py.
_WIDE_MIN_KEYS_PER_BIN = 512


def _windowed_bins_ok(n: int, bins: int) -> bool:
    """Static gate: is the windowed counting tier applicable at (n, bins)?

    Power-of-two bins in (2^10, 2^17]; the trace-time span bound must fit
    the max window (else even uniform data would always take the in-graph
    sorter fallback — route statically and skip the histogram entirely);
    past 2^16 bins additionally require the measured density floor.
    """
    if not (4 <= bins <= _REGEN_WIDE_MAX_BINS) or bins & (bins - 1):
        return False
    if bins <= _REGEN_MAX_BINS:
        return False          # plain regeneration tier handles these
    from .pallas_kernels import pick_window
    if pick_window(n, bins) == 0:
        return False
    if bins > _REGEN_WIN_MAX_BINS and n < bins * _WIDE_MIN_KEYS_PER_BIN:
        return False
    return True


@partial(jax.jit, static_argnames=("bins", "block"))
def counting_sort_compact(c: jax.Array, bins: int, block: int = 1 << 20) -> jax.Array:
    """Sort a dense-domain uint32 vector (values < bins) by regeneration.

    Returns the sorted vector; O(n * bins) dense ops, zero scatters. On TPU
    both phases run as Pallas kernels (factored-one-hot histogram + MXU
    regeneration, :mod:`.pallas_kernels`). Domains wider than
    ``_REGEN_MAX_BINS`` route to the hardware sorter, which is faster there
    (the counting *semantics* are unchanged — keys-only, values < bins).
    """
    n = int(c.shape[0])
    if bins > _REGEN_MAX_BINS:
        if use_tpu_routes() and _windowed_bins_ok(n, bins):
            from .pallas_kernels import (histogram_tpu, pick_window,
                                         regen_windows_fit,
                                         regenerate_windowed_tpu)
            window = pick_window(n, bins)
            hist = histogram_tpu(c, 0, radix_bits=bins.bit_length() - 1)
            cum = jnp.cumsum(hist, dtype=jnp.int32)
            # optimization_barrier: without it XLA can fuse downstream
            # consumers (e.g. a strided slice) into the cond branch and then
            # stack-allocates the Pallas output in scoped VMEM — a compile
            # OOM at 10M-class sizes (caught by the bench-suite size sweep)
            return lax.optimization_barrier(lax.cond(
                regen_windows_fit(cum, n, window),
                lambda: regenerate_windowed_tpu(cum, n, bins, window),
                lambda: lax.sort((c,), dimension=0, is_stable=False,
                                 num_keys=1)[0],
            ))
        (s,) = lax.sort((c,), dimension=0, is_stable=False, num_keys=1)
        return s
    # bins >= 4: a 2-bin factored one-hot has a single-lane half Mosaic
    # cannot lower; the XLA formulation is trivial at that size anyway
    if use_tpu_routes() and bins & (bins - 1) == 0 and bins >= 4:
        from .pallas_kernels import histogram_tpu, regenerate_tpu
        hist = histogram_tpu(c, 0, radix_bits=bins.bit_length() - 1)
        return regenerate_tpu(hist, n)
    hist = digit_histogram(c, bins)                     # (bins,) int32
    cum = jnp.cumsum(hist, dtype=jnp.int32)             # inclusive
    # out[j] = number of buckets fully emitted at or before position j
    #        = sum_b 1[cum[b] <= j]
    j = jnp.arange(n, dtype=jnp.int32)

    def regen(jblk):
        return jnp.sum(
            (cum[None, :] <= jblk[:, None]).astype(jnp.uint32), axis=1, dtype=jnp.uint32
        )

    if n <= block:
        return regen(j)
    # blocked to bound the transient compare matrix
    nb = -(-n // block)
    jpad = jnp.arange(nb * block, dtype=jnp.int32)
    out = jax.lax.map(regen, jpad.reshape(nb, block)).reshape(-1)
    return out[:n]


def probe_bins(n: int) -> int:
    """Widest counting domain the in-graph range probe can use at size n.

    The probe's dense domain is a STATIC bin count (Pallas shapes), so pick
    the largest power of two whose counting tier is applicable at this n:
    2^17 at wide-tier density (n >= ~67M), 2^16 when the windowed tier's
    span bound admits it (n >= ~8.4M), less for smaller inputs, bottoming
    out at the always-applicable plain tier (2^10). Wider domains catch
    more low-entropy inputs.
    """
    for bits in range(17, 10, -1):
        if _windowed_bins_ok(n, 1 << bits):
            return 1 << bits
    return _REGEN_MAX_BINS


def sort_word_range_probe(w: jax.Array, guard: bool = False) -> jax.Array:
    """Keys-only sort of one derived word with IN-GRAPH low-entropy dispatch.

    The device-side generalization of the reference's always-on histogram
    probe (`radix_sort.hpp:64-70`, whose point is being cheap enough to run
    unconditionally): one fused min/max reduce decides — on device, inside
    the jitted program, with NO host sync — whether the key range fits a
    dense counting domain. If so, the counting tier sorts ``w - min`` and
    adds the offset back (a value-bounded domain needs no PEXT: the offset
    makes it dense); otherwise the hardware sorter runs. Unlike
    ``SortConfig.dynamic_probe`` (host-sync live-bit measurement) this
    keeps async dispatch pipelines intact; the price on data that is NOT
    narrow is one extra bandwidth-bound read (measured on v5e: see
    ROADMAP round 3).

    ``guard``: use the presorted-guarded sorter in the wide branch
    (composes with ``detect_presorted``).
    """
    from .pallas_kernels import (histogram_tpu, pick_window,
                                 regen_windows_fit, regenerate_tpu,
                                 regenerate_windowed_tpu)
    from . import hw_engine

    n = int(w.shape[0])
    bins = probe_bins(n)
    radix_bits = bins.bit_length() - 1
    mn = jnp.min(w)
    mx = jnp.max(w)

    def sorter():
        if guard:
            (s,), _ = hw_engine.sort_words_presort_guard((w,), stable=False)
            return s
        return lax.sort((w,), dimension=0, is_stable=False, num_keys=1)[0]

    def narrow():
        c = w - mn
        hist = histogram_tpu(c, 0, radix_bits=radix_bits)
        if bins <= _REGEN_MAX_BINS:
            return regenerate_tpu(hist, n) + mn
        window = pick_window(n, bins)
        cum = jnp.cumsum(hist, dtype=jnp.int32)
        return lax.cond(
            regen_windows_fit(cum, n, window),
            lambda: regenerate_windowed_tpu(cum, n, bins, window) + mn,
            sorter,
        )

    # optimization_barrier: see counting_sort_compact note
    return lax.optimization_barrier(
        lax.cond(mx - mn < jnp.uint32(bins), narrow, sorter))


def sort_words2_range_probe(hi: jax.Array, lo: jax.Array,
                            guard: bool = False):
    """Keys-only sort of a two-word (64-bit) derived key with in-graph dispatch.

    The 64-bit generalization of :func:`sort_word_range_probe` (the
    reference's always-on probe, `radix_sort.hpp:64-70`, applied to the
    multipass decomposition `radix_sort_u64_multipass.c:117-118`): one fused
    min/max reduce over the HIGH plane decides — on device, no host sync —
    whether the hi word is constant across the array. If so the order is
    determined by the low plane alone, so the program drops to the
    single-word probe (which itself routes narrow lo ranges on to the
    counting tier): a 64-bit key population inside one 2^32 span — clustered
    timestamps, offset-based ids — sorts with ONE sorter operand instead of
    two, and with a narrow lo range at counting speed. Otherwise the
    two-word sorter runs; the cost on full-entropy data is one extra
    bandwidth-bound reduce of the hi plane.

    Returns the sorted ``(hi, lo)`` planes.
    """
    from . import hw_engine

    mn = jnp.min(hi)
    mx = jnp.max(hi)

    def full():
        if guard:
            ws, _ = hw_engine.sort_words_presort_guard((hi, lo), stable=False)
            return tuple(ws)
        return tuple(lax.sort((hi, lo), dimension=0, is_stable=False,
                              num_keys=2))

    def hi_const():
        # a constant plane is its own sorted self; order rides on lo alone
        return (hi, sort_word_range_probe(lo, guard=guard))

    return lax.optimization_barrier(lax.cond(mn == mx, hi_const, full))


def sort_word_counting(w: jax.Array, live_mask: int,
                       descending: bool = False) -> jax.Array:
    """Keys-only sort of a single derived-key word with a *static* live-bit mask.

    ``live_mask`` is the static OR^AND live-bit mask (host int). The number of
    set bits determines the bin count; callers enforce the budget
    (``SortConfig.counting_max_bits``).
    """
    (out,) = sort_words_counting((w,), (int(live_mask),), descending=descending)
    return out


def sort_words_counting(words, masks, descending: bool = False):
    """Keys-only counting sort of multi-word derived keys with static live masks.

    The multi-plane generalization: live bits of every plane are PEXT-compacted
    into ONE dense u32 word (most-significant plane highest — order preserved),
    counting-sorted by regeneration, then PDEP-expanded back per plane. This is
    what makes the column-skip fast path reach 64-bit keys: a u64 with <=
    ``counting_max_bits`` live bits sorts at histogram speed regardless of
    where in the 64 bit positions those bits sit (the reference's mask
    experiment covers all key widths, `radix_experiment.cpp:188-198`).

    ``sum(popcount(m) for m in masks)`` must be <= 32; past the regeneration
    budget the raw-word sorter fallback applies (dead bits are constant under
    the mask promise, so raw order == compacted order).
    """
    words = tuple(words)
    masks = tuple(int(m) for m in masks)
    nbits = sum(bin(m).count("1") for m in masks)
    assert nbits <= 32, "compacted live bits must fit one u32 word"
    bins = 1 << nbits
    n_keys = int(words[0].shape[0])
    # Past the plain-regeneration budget, TPU still has the windowed tier
    # (compact -> counting_sort_compact's windowed regen, with its own
    # in-graph sorter fallback) where the static (n, bins) gate admits it;
    # elsewhere, sort raw planes.
    win_ok = (use_tpu_routes()
              and _windowed_bins_ok(n_keys, bins))
    if bins > _REGEN_MAX_BINS and not win_ok:
        # Sorter fallback: sort the raw planes directly — skips PEXT/PDEP.
        # Keys-only: a descending result is the ascending result reversed.
        out = lax.sort(words, dimension=0, is_stable=False, num_keys=len(words))
        return tuple(o[::-1] for o in out) if descending else tuple(out)

    # TPU fast paths: PEXT fused into the histogram read and PDEP + dead-bit
    # restore fused into the regeneration write — two (three for 64-bit)
    # full-array HBM streams total instead of five+ (see pallas_kernels).
    # Past _REGEN_MAX_BINS the fused WINDOWED variants apply, gated in-graph
    # on the window-fit check with a raw-plane sorter fallback.
    # nbits >= 2: Mosaic cannot lower the degenerate one-hot of a single-lane
    # (L=1) factored histogram; 2-bin domains use the XLA path (trivial there)
    if not descending and nbits >= 2 and use_tpu_routes():
        if len(words) == 1 and masks[0]:
            from .pallas_kernels import (histogram_pext_tpu, pick_window,
                                         regen_windows_fit,
                                         regenerate_pdep_tpu,
                                         regenerate_pdep_windowed_tpu)
            (w,) = words
            n = int(w.shape[0])
            hist = histogram_pext_tpu(w, masks[0])
            if bins <= _REGEN_MAX_BINS:
                return (regenerate_pdep_tpu(hist, n, masks[0], w[0]),)
            window = pick_window(n, bins)
            cum = jnp.cumsum(hist, dtype=jnp.int32)
            # optimization_barrier: see counting_sort_compact note (scoped-
            # VMEM stack OOM when consumers fuse into the cond branch)
            return (lax.optimization_barrier(lax.cond(
                regen_windows_fit(cum, n, window),
                lambda: regenerate_pdep_windowed_tpu(cum, n, bins, masks[0],
                                                     w[0], window),
                lambda: lax.sort((w,), dimension=0, is_stable=False,
                                 num_keys=1)[0],
            )),)
        if len(words) == 2:
            from .pallas_kernels import (histogram_pext2_tpu, pick_window,
                                         regen_windows_fit,
                                         regenerate_pdep2_tpu,
                                         regenerate_pdep2_windowed_tpu)
            hi, lo = words
            n = int(hi.shape[0])
            hist = histogram_pext2_tpu(hi, lo, masks[0], masks[1])
            if bins <= _REGEN_MAX_BINS:
                shi, slo = regenerate_pdep2_tpu(
                    hist, n, masks[0], masks[1], hi[0], lo[0])
                return (shi, slo)
            window = pick_window(n, bins)
            cum = jnp.cumsum(hist, dtype=jnp.int32)
            # optimization_barrier: see counting_sort_compact note
            return tuple(lax.optimization_barrier(lax.cond(
                regen_windows_fit(cum, n, window),
                lambda: regenerate_pdep2_windowed_tpu(
                    cum, n, bins, masks[0], masks[1], hi[0], lo[0], window),
                lambda: tuple(lax.sort((hi, lo), dimension=0, is_stable=False,
                                       num_keys=2)),
            )))

    # merge plane compactions so the MSW plane takes the high bits; the
    # descending complement happens in compacted space (dead bits constant)
    c = probes.compact_word_planes(words, masks)
    if descending:
        c = np.uint32(bins - 1) - c
    s = counting_sort_compact(c, bins)
    if descending:
        s = np.uint32(bins - 1) - s
    return probes.expand_word_planes(s, words, masks)
