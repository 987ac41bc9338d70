"""Pallas TPU kernels for the radix hot phases.

These are the device kernels behind the framework's histogram-shaped ops (the
reference's HOT LOOP 1, `radix_sort.hpp:49-58`). Design notes, TPU-first:

* A scalar ``cnt[digit]++`` cannot exist on a VPU; the dense formulation is a
  one-hot compare, O(bins) VPU ops per element. This kernel cuts that to
  O(sqrt(bins)) with a **factored one-hot**: split the digit into hi/lo
  halves, build the two half-width one-hots (2*sqrt(bins) compares), and let
  the **MXU take the outer-product-accumulate**::

      hist[h, l] = sum_t hi_onehot[h, t] * lo_onehot[l, t]
                 = hi_onehot (H, T) @ lo_onehot^T (T, L)

  For 256 bins that is 32 VPU compares per element instead of 256, with the
  256-way accumulation running on the systolic array for free. Partials are
  exact (bf16 0/1 inputs, f32 accumulation, counts per sub-chunk <= 1024);
  the running accumulator is int32 so totals stay exact past 2^24.
* Layouts avoid every relayout: digits stay a (1, T) lane row, half-one-hots
  are (H, T)/(L, T) sublane x lane tiles, the matmul contracts over lanes,
  and the accumulator is (H, L*passes) so each pass's (H, L) tile adds in
  place.
* The **multi-digit variant histograms every pass in ONE read of the keys**
  (the fused first pass of `radix_sort_u32.c:24-37`): HBM traffic is a single
  key stream; nibble one-hots are shared across adjacent passes' halves only
  through the compare cost, which the factoring already minimized.

On non-TPU backends the kernels run in Pallas interpret mode (tests); the
public wrappers in :mod:`.histogram` remain the XLA fallback.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["use_tpu_routes",
           "histogram_tpu", "multi_digit_histogram_tpu",
           "weighted_histogram_tpu", "weighted_histogram_f32_tpu",
           "weighted_histogram_f32_counts_tpu",
           "regenerate_tpu",
           "regenerate_windowed_tpu", "regen_windows_fit", "pick_window",
           "regenerate_pdep_windowed_tpu", "regenerate_pdep2_windowed_tpu",
           "histogram_pext_tpu", "regenerate_pdep_tpu",
           "histogram_pext2_tpu", "regenerate_pdep2_tpu"]

_SUB = 8192          # elements per sub-chunk (lane-row length); tuned on v5e
_BLOCK_SUBS = 8      # sub-chunks per grid step (64K elements per step)


def _hist_layout(radix_bits: int):
    """(sub, block_subs) for the factored-one-hot histogram kernels.

    The (H, sub)/(L, sub) bf16 one-hot tiles must fit scoped VMEM alongside
    the (H, L) int32 accumulator; past 16-bit digits the half-one-hots at
    sub=8192 alone exceed the ~16 MB budget (H=512 -> 8 MB each), so wide
    digits shrink the lane row and raise the sub count to keep the grid
    block at 64K elements (the `_pad_keys` granularity for every layout).
    """
    if radix_bits <= 16:
        return _SUB, _BLOCK_SUBS            # one-hots <= 4 MB
    if radix_bits <= 18:
        return 4096, 16                     # H,L <= 512: one-hots <= 4 MB
    return 2048, 32                         # H,L <= 1024: one-hots <= 4 MB


def _want_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def use_tpu_routes() -> bool:
    """True when the TPU dispatch graph should be built.

    On the TPU backend always; anywhere else when ``RST_FORCE_TPU_ROUTES=1``
    — the Pallas kernels then run in interpret mode, so CI exercises the
    REAL dispatch graph (including the in-graph `lax.cond` sparse-input
    sorter fallbacks) instead of the XLA substitute paths that only exist
    for non-TPU backends. The env var is read per call (no reimport needed),
    BUT jitted callers cache traces: after flipping it, call
    ``jax.clear_caches()`` or previously-traced shapes silently keep the
    old dispatch graph (the test fixtures do exactly this).
    """
    return (jax.default_backend() == "tpu"
            or os.environ.get("RST_FORCE_TPU_ROUTES", "") == "1")


def _split_bits(radix_bits: int):
    lo = radix_bits // 2
    hi = radix_bits - lo
    return hi, lo


def _hist_kernel(x_ref, o_ref, *, shifts, radix_bits, valid_n, sub, block_subs,
                 drop_ge=None):
    """Accumulate factored digit histograms of one block.

    x_ref: (block_subs, sub) uint32 keys;
    o_ref: (2^hi_bits, 2^lo_bits * num_passes) int32.

    ``drop_ge``: keys >= this u32 value are excluded from every histogram,
    through the same hi-one-hot invalidation as the tail padding — fused,
    zero extra bandwidth. The engines' digit histograms never set it (their
    digits are < bins by construction); `extras.bincount` uses it to give
    out-of-range values numpy's drop semantics instead of aliasing them
    into ``value mod bins`` through the digit masks below.
    """
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    himask = np.uint32(H - 1)
    lomask = np.uint32(L - 1)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    hiv = lax.broadcasted_iota(jnp.uint32, (H, 1), 0)
    lov = lax.broadcasted_iota(jnp.uint32, (L, 1), 0)
    base = step * (block_subs * sub)

    def body(s, _):
        row = x_ref[pl.ds(s, 1), :]                      # (1, sub) uint32
        eidx = base + s * sub + lax.broadcasted_iota(jnp.int32, (1, sub), 1)
        in_range = eidx < valid_n                        # (1, sub)
        if drop_ge is not None:
            in_range = in_range & (row < np.uint32(drop_ge))
        for p, shift in enumerate(shifts):
            d_lo = (row >> np.uint32(shift)) & lomask
            d_hi = (row >> np.uint32(shift + lo_bits)) & himask
            # invalidate padding through the hi half (zero product suffices)
            d_hi = jnp.where(in_range, d_hi, np.uint32(H))
            hi_oh = (hiv == d_hi).astype(jnp.bfloat16)   # (H, sub)
            lo_oh = (lov == d_lo).astype(jnp.bfloat16)   # (L, sub)
            partial = jax.lax.dot_general(
                hi_oh, lo_oh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # (H, L) exact
            o_ref[:, pl.ds(p * L, L)] += partial.astype(jnp.int32)
        return 0

    lax.fori_loop(0, block_subs, body, 0)


@functools.partial(jax.jit, static_argnames=("shifts", "radix_bits", "valid_n",
                                             "drop_ge"))
def _hist_call(x_padded, shifts, radix_bits, valid_n, drop_ge=None):
    sub, block_subs = _hist_layout(radix_bits)
    n = x_padded.shape[0]
    block_elems = block_subs * sub
    assert n % block_elems == 0
    steps = n // block_elems
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    kernel = functools.partial(
        _hist_kernel, shifts=shifts, radix_bits=radix_bits, valid_n=valid_n,
        sub=sub, block_subs=block_subs, drop_ge=drop_ge,
    )
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((block_subs, sub), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, L * len(shifts)), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, L * len(shifts)), jnp.int32),
        interpret=_want_interpret(),
    )(x_padded.reshape(steps * block_subs, sub))
    # (H, L*P) -> (P, H*L): bucket index is hi*L + lo
    P = len(shifts)
    return out.reshape(H, P, L).transpose(1, 0, 2).reshape(P, H * L)


def _pad_keys(w: jax.Array):
    n = w.shape[0]
    block = _BLOCK_SUBS * _SUB
    pad = (-n) % block
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)])
    return w, n


def histogram_tpu(w: jax.Array, pass_index: int, radix_bits: int = 8,
                  drop_ge: int | None = None) -> jax.Array:
    """(bins,) int32 histogram of one digit of a u32 key vector (Pallas).

    ``drop_ge``: if set, keys >= it are excluded (fused into the kernel's
    padding invalidation) — see `_hist_kernel`.
    """
    wp, n = _pad_keys(w)
    shifts = (pass_index * radix_bits,)
    return _hist_call(wp, shifts, radix_bits, n, drop_ge)[0]


def multi_digit_histogram_tpu(w: jax.Array, radix_bits: int = 8) -> jax.Array:
    """(num_passes, bins) histograms of every digit in ONE read of the keys.

    The fused all-histograms pass of `radix_sort_u32.c:24-37`, as a Pallas
    kernel: HBM traffic is a single key stream; per-pass factored one-hot
    reductions ride the MXU.
    """
    num_passes = -(-32 // radix_bits)
    shifts = tuple(p * radix_bits for p in range(num_passes))
    wp, n = _pad_keys(w)
    return _hist_call(wp, shifts, radix_bits, n)


# ---------------------------------------------------------------------------
# counting-sort regeneration


def _regen_kernel(cum_ref, o_ref, *, bins):
    """out[j] = #{b : cum[b] <= j} — the keys-only counting-sort rewrite.

    cum_ref: (bins, 1) int32 inclusive cumulative histogram;
    o_ref: (_BLOCK_SUBS, _SUB) uint32 output block.
    """
    step = pl.program_id(0)
    cum = cum_ref[...]                                     # (bins, 1) int32
    base = step * (_BLOCK_SUBS * _SUB)
    ones_row = jnp.ones((1, bins), jnp.bfloat16)

    def body(r, _):
        j = base + r * _SUB + lax.broadcasted_iota(jnp.int32, (1, _SUB), 1)
        emitted = (cum <= j).astype(jnp.bfloat16)         # (bins, _SUB)
        v = jax.lax.dot_general(
            ones_row, emitted,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (1, _SUB), <= bins
        # Mosaic lacks a direct f32->u32 cast; go through int32 (values are
        # small non-negative integers, both casts exact).
        o_ref[pl.ds(r, 1), :] = v.astype(jnp.int32).astype(jnp.uint32)
        return 0

    lax.fori_loop(0, _BLOCK_SUBS, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "bins"))
def _regen_call(cum, n, bins):
    block_elems = _BLOCK_SUBS * _SUB
    n_pad = -(-n // block_elems) * block_elems
    steps = n_pad // block_elems
    kernel = functools.partial(_regen_kernel, bins=bins)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((bins, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLOCK_SUBS, _SUB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * _BLOCK_SUBS, _SUB), jnp.uint32),
        interpret=_want_interpret(),
    )(cum.reshape(bins, 1))
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# fused PEXT histogram / PDEP regeneration (the masked counting fast path)
#
# The unfused pipeline spends ~half its HBM traffic writing and re-reading the
# compacted key vector (compact -> histogram -> regenerate -> expand = five
# full-array streams). Fusing the static bit networks into the kernels cuts
# that to two streams: one key read (PEXT in-kernel) and one output write
# (PDEP + dead-bit restore in-kernel).


# In-kernel vectorized PEXT/PDEP: the probes helpers are shape-agnostic
# elementwise shift networks over a STATIC mask, valid inside Pallas kernels
# as-is — one implementation, aliased for kernel use (a local copy here had
# started to diverge in name only; round-3 review).
from .probes import compact_live_bits as _pext_rows  # noqa: E402
from .probes import expand_live_bits as _pdep_rows  # noqa: E402


def _onehot_accum(row, in_range, o_ref, H, L, lo_bits):
    """Accumulate the factored one-hot outer product of one digit row into o_ref."""
    hiv = lax.broadcasted_iota(jnp.uint32, (H, 1), 0)
    lov = lax.broadcasted_iota(jnp.uint32, (L, 1), 0)
    d_lo = row & np.uint32(L - 1)
    d_hi = (row >> np.uint32(lo_bits)) & np.uint32(H - 1)
    d_hi = jnp.where(in_range, d_hi, np.uint32(H))  # padding lands nowhere
    hi_oh = (hiv == d_hi).astype(jnp.bfloat16)
    lo_oh = (lov == d_lo).astype(jnp.bfloat16)
    partial = jax.lax.dot_general(
        hi_oh, lo_oh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] += partial.astype(jnp.int32)


def _hist_pext_kernel(x_ref, o_ref, *, mask, radix_bits, valid_n, sub,
                      block_subs):
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    base = step * (block_subs * sub)

    def body(s, _):
        row = _pext_rows(x_ref[pl.ds(s, 1), :], mask)        # (1, sub)
        eidx = base + s * sub + lax.broadcasted_iota(jnp.int32, (1, sub), 1)
        _onehot_accum(row, eidx < valid_n, o_ref, H, L, lo_bits)
        return 0

    lax.fori_loop(0, block_subs, body, 0)


@functools.partial(jax.jit, static_argnames=("mask", "valid_n"))
def _hist_pext_call(x_padded, mask, valid_n):
    nbits = bin(mask).count("1")
    sub, block_subs = _hist_layout(nbits)
    hi_bits, lo_bits = _split_bits(nbits)
    H, L = 1 << hi_bits, 1 << lo_bits
    n = x_padded.shape[0]
    block_elems = block_subs * sub
    steps = n // block_elems
    kernel = functools.partial(_hist_pext_kernel, mask=mask, radix_bits=nbits,
                               valid_n=valid_n, sub=sub, block_subs=block_subs)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((block_subs, sub), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, L), jnp.int32),
        interpret=_want_interpret(),
    )(x_padded.reshape(steps * block_subs, sub))
    return out.reshape(H * L)


def histogram_pext_tpu(w: jax.Array, mask: int) -> jax.Array:
    """Histogram of the PEXT-compacted live bits of ``w`` in ONE key read.

    ``mask`` is the static live-bit mask; returns (2^popcount,) int32 counts
    of the compacted values. Fuses `probes.compact_live_bits` into the
    factored-one-hot histogram kernel (no intermediate compacted array).
    """
    wp, n = _pad_keys(w)
    return _hist_pext_call(wp, int(mask), n)


def _hist_pext2_kernel(hi_ref, lo_ref, o_ref, *, mask_hi, mask_lo, radix_bits,
                       valid_n, sub, block_subs):
    """Two-plane (64-bit key) fused PEXT histogram: one read of both planes."""
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    nb_lo = bin(mask_lo).count("1")
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    base = step * (block_subs * sub)

    def body(s, _):
        row = (_pext_rows(hi_ref[pl.ds(s, 1), :], mask_hi) << np.uint32(nb_lo)) \
            | _pext_rows(lo_ref[pl.ds(s, 1), :], mask_lo)
        eidx = base + s * sub + lax.broadcasted_iota(jnp.int32, (1, sub), 1)
        _onehot_accum(row, eidx < valid_n, o_ref, H, L, lo_bits)
        return 0

    lax.fori_loop(0, block_subs, body, 0)


@functools.partial(jax.jit, static_argnames=("mask_hi", "mask_lo", "valid_n"))
def _hist_pext2_call(hi_p, lo_p, mask_hi, mask_lo, valid_n):
    nbits = bin(mask_hi).count("1") + bin(mask_lo).count("1")
    sub, block_subs = _hist_layout(nbits)
    hb, lb = _split_bits(nbits)
    H, L = 1 << hb, 1 << lb
    n = hi_p.shape[0]
    block_elems = block_subs * sub
    steps = n // block_elems
    kernel = functools.partial(_hist_pext2_kernel, mask_hi=mask_hi,
                               mask_lo=mask_lo, radix_bits=nbits,
                               valid_n=valid_n, sub=sub, block_subs=block_subs)
    spec = pl.BlockSpec((block_subs, sub), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((H, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, L), jnp.int32),
        interpret=_want_interpret(),
    )(hi_p.reshape(steps * block_subs, sub),
      lo_p.reshape(steps * block_subs, sub))
    return out.reshape(H * L)


def histogram_pext2_tpu(hi: jax.Array, lo: jax.Array, mask_hi: int,
                        mask_lo: int) -> jax.Array:
    """Fused cross-plane PEXT histogram for two-word (64-bit) keys."""
    hi_p, n = _pad_keys(hi)
    lo_p, _ = _pad_keys(lo)
    return _hist_pext2_call(hi_p, lo_p, int(mask_hi), int(mask_lo), n)


def _regen_pdep2_kernel(cum_ref, dead_ref, ohi_ref, olo_ref, *, bins,
                        mask_hi, mask_lo):
    step = pl.program_id(0)
    cum = cum_ref[...]
    dead_hi = dead_ref[0]
    dead_lo = dead_ref[1]
    nb_lo = bin(mask_lo).count("1")
    base = step * (_BLOCK_SUBS * _SUB)
    ones_row = jnp.ones((1, bins), jnp.bfloat16)

    def body(r, _):
        j = base + r * _SUB + lax.broadcasted_iota(jnp.int32, (1, _SUB), 1)
        emitted = (cum <= j).astype(jnp.bfloat16)
        v = jax.lax.dot_general(
            ones_row, emitted, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint32)
        olo_ref[pl.ds(r, 1), :] = _pdep_rows(v & np.uint32((1 << nb_lo) - 1),
                                             mask_lo) | dead_lo
        ohi_ref[pl.ds(r, 1), :] = _pdep_rows(v >> np.uint32(nb_lo), mask_hi) | dead_hi
        return 0

    lax.fori_loop(0, _BLOCK_SUBS, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "mask_hi", "mask_lo"))
def _regen_pdep2_call(cum, dead, n, mask_hi, mask_lo):
    bins = cum.shape[0]
    block_elems = _BLOCK_SUBS * _SUB
    n_pad = -(-n // block_elems) * block_elems
    steps = n_pad // block_elems
    kernel = functools.partial(_regen_pdep2_kernel, bins=bins,
                               mask_hi=mask_hi, mask_lo=mask_lo)
    ospec = pl.BlockSpec((_BLOCK_SUBS, _SUB), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((steps * _BLOCK_SUBS, _SUB), jnp.uint32)
    hi, lo = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((bins, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[ospec, ospec],
        out_shape=[oshape, oshape],
        interpret=_want_interpret(),
    )(cum.reshape(bins, 1), dead.reshape(2))
    return hi.reshape(-1)[:n], lo.reshape(-1)[:n]


def regenerate_pdep2_tpu(hist: jax.Array, n: int, mask_hi: int, mask_lo: int,
                         dead_hi_word: jax.Array, dead_lo_word: jax.Array):
    """Fused two-plane regeneration: (hi, lo) sorted masked planes in one write."""
    cum = jnp.cumsum(hist, dtype=jnp.int32)
    dead = jnp.stack([
        dead_hi_word & np.uint32(~int(mask_hi) & 0xFFFFFFFF),
        dead_lo_word & np.uint32(~int(mask_lo) & 0xFFFFFFFF),
    ]).astype(jnp.uint32)
    return _regen_pdep2_call(cum, dead, n, int(mask_hi), int(mask_lo))


def _regen_pdep_kernel(cum_ref, dead_ref, o_ref, *, bins, mask):
    step = pl.program_id(0)
    cum = cum_ref[...]                                     # (bins, 1) int32
    dead = dead_ref[0]                                     # scalar uint32
    base = step * (_BLOCK_SUBS * _SUB)
    ones_row = jnp.ones((1, bins), jnp.bfloat16)

    def body(r, _):
        j = base + r * _SUB + lax.broadcasted_iota(jnp.int32, (1, _SUB), 1)
        emitted = (cum <= j).astype(jnp.bfloat16)          # (bins, _SUB)
        v = jax.lax.dot_general(
            ones_row, emitted, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint32)             # (1, _SUB)
        o_ref[pl.ds(r, 1), :] = _pdep_rows(v, mask) | dead
        return 0

    lax.fori_loop(0, _BLOCK_SUBS, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "mask"))
def _regen_pdep_call(cum, dead, n, mask):
    bins = cum.shape[0]
    block_elems = _BLOCK_SUBS * _SUB
    n_pad = -(-n // block_elems) * block_elems
    steps = n_pad // block_elems
    kernel = functools.partial(_regen_pdep_kernel, bins=bins, mask=mask)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((bins, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_SUBS, _SUB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * _BLOCK_SUBS, _SUB), jnp.uint32),
        interpret=_want_interpret(),
    )(cum.reshape(bins, 1), dead.reshape(1))
    return out.reshape(-1)[:n]


def regenerate_pdep_tpu(hist: jax.Array, n: int, mask: int,
                        dead_word: jax.Array) -> jax.Array:
    """Regenerate the sorted masked keys directly: PDEP + dead-bit restore
    fused into the counting-sort rewrite (one output write, no intermediates).

    ``hist`` counts the compacted values; ``dead_word`` is a scalar u32 whose
    bits outside ``mask`` are the constant dead bits of every key.
    """
    cum = jnp.cumsum(hist, dtype=jnp.int32)
    dead = (dead_word & np.uint32(~int(mask) & 0xFFFFFFFF)).astype(jnp.uint32)
    return _regen_pdep_call(cum, dead, n, int(mask))


def regenerate_tpu(hist: jax.Array, n: int) -> jax.Array:
    """Rebuild the sorted dense-domain vector from its histogram (Pallas).

    The device form of the counting-sort output rewrite
    (`counting_sort_8.c:14-19`): position j holds the number of buckets whose
    cumulative count is <= j (exact: 0/1 bf16 products, f32 accumulation,
    sums bounded by the bin count).
    """
    bins = hist.shape[0]
    cum = jnp.cumsum(hist, dtype=jnp.int32)
    return _regen_call(cum, n, bins)


# ---------------------------------------------------------------------------
# windowed regeneration: counting sort for WIDE dense domains (2^10 < bins
# <= 2^16)
#
# Plain regeneration compares every output position against every bin
# (O(bins)/element), which loses to the hardware sorter past ~2^10 bins. But
# an output block of E elements can only span the few bins whose cumulative
# count crosses its position range — for uniform-ish data E*bins/n + 1 bins
# (e.g. ~14 for 40M keys, 2^16 bins, 64K blocks). So: compute per-block
# window starts with one tiny searchsorted over the cumulative histogram,
# and compare each block only against a fixed-width window of bins. Cost
# becomes O(window)/element regardless of the domain width. Blocks that
# would overrun the window (pathological sparse distributions, tiny n over
# a huge domain) are detected by `regen_windows_fit` and the caller falls
# back to the sorter via `lax.cond` — no host sync.

_REGEN_WINDOW = 1024  # default bins per window: same per-element cost as
                      # the plain-regeneration gate (_REGEN_MAX_BINS)

# Adaptive window bounds (round 3). The regeneration cost is
# O(window)/element, so the window should be as small as the data's block
# span allows: at trace time only the uniform-case span bound
# block_elems*bins/n + 1 is known, and the in-graph `regen_windows_fit`
# check (sorter fallback) covers any distribution that exceeds it. 2x slack
# absorbs moderate skew without paying for it on uniform data (measured:
# uniform spans concentrate within ~2% of the bound at 40M/2^16).
_REGEN_WINDOW_MIN = 128   # (1, window) lane row must fill a 128-lane tile
_REGEN_WINDOW_MAX = 1024  # (window, 4096) bf16 compare tile = 8 MB VMEM


def pick_window(n: int, bins: int) -> int:
    """Trace-time window width for the windowed-regeneration kernels.

    Power of two covering 2x the uniform-case per-block bin span, clamped to
    [128, 1024]. Returns 0 when even the max window cannot cover the bound —
    the windowed tier is then statically inapplicable (callers route to the
    sorter without paying the histogram; the generalization of the
    reference's "skip only when it can pay" probe, `radix_sort.hpp:64-70`).
    """
    block_elems = _BLOCK_SUBS_W * _SUB_W
    span = block_elems * bins // max(n, 1) + 1
    w = _REGEN_WINDOW_MIN
    while w < 2 * span:
        w *= 2
        if w > _REGEN_WINDOW_MAX:
            return 0
    return w

# The windowed kernels keep the 64K-element block of the other kernels but
# split it as 16 x 4096 lanes instead of 8 x 8192: the (window, lane-row)
# bf16 compare intermediate is then 8 MB instead of 16.8 MB, which — with
# the pre-gathered per-block cum windows (see `_gather_windows`) — keeps
# the kernel's scoped-vmem footprint safely under the 16 MB limit at every
# n (a 10M-element case OOMed with the wide rows + whole-cum layout —
# caught by the bench-suite size sweep).
_SUB_W = 4096
_BLOCK_SUBS_W = 16


def _regen_win_kernel(starts_ref, cumw_ref, o_ref, *, window):
    """out[j] = #{b : cum[b] <= j}, windowed.

    cumw_ref: (1, window, 1) int32 block — this output block's slice of the
    cumulative histogram (pre-gathered by `_gather_windows`);
    starts_ref: (steps, 1) int32 — first bin whose cum exceeds the block's
    base position (all earlier bins are counted wholesale);
    o_ref: (_BLOCK_SUBS_W, _SUB_W) uint32 output block.
    """
    step = pl.program_id(0)
    s = starts_ref[step, 0]
    cumw = cumw_ref[0]                                     # (window, 1) int32
    base = step * (_BLOCK_SUBS_W * _SUB_W)
    ones_row = jnp.ones((1, window), jnp.bfloat16)

    def body(r, _):
        j = base + r * _SUB_W + lax.broadcasted_iota(jnp.int32, (1, _SUB_W), 1)
        emitted = (cumw <= j).astype(jnp.bfloat16)         # (window, _SUB_W)
        v = jax.lax.dot_general(
            ones_row, emitted,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (1, _SUB_W) exact
        o_ref[pl.ds(r, 1), :] = (s + v.astype(jnp.int32)).astype(jnp.uint32)
        return 0

    lax.fori_loop(0, _BLOCK_SUBS_W, body, 0)


def _regen_win_starts(cum, n_pad: int):
    """Per-block window starts: #bins with cum <= block base position."""
    block_elems = _BLOCK_SUBS_W * _SUB_W
    steps = n_pad // block_elems
    bases = jnp.arange(steps, dtype=jnp.int32) * block_elems
    return jnp.searchsorted(cum, bases, side="right").astype(jnp.int32)


def _gather_windows(cum_pad, starts, window: int):
    """[steps, window, 1] per-block cum slices.

    Built OUTSIDE the kernel with a scan of dynamic slices (steps = n/64K,
    so this is a few hundred 4 KB copies — ~1 ms at 40M). The kernel then
    sees each window as a (window, 1) VMEM block — the layout the plain
    regeneration kernel already proves out. Passing the whole padded cum as
    a (bins+window, 1) block instead lays out as (8,128) tiles whose
    single-lane minor dim pads x128: at 2^16 bins that is 66560*128*4 B =
    32.5 MB of scoped VMEM, over the 16 MB limit (a compile OOM the
    bench-suite size sweep caught).
    """
    def step_fn(carry, st):
        return carry, lax.dynamic_slice(cum_pad, (st,), (window,))

    _, win = lax.scan(step_fn, 0, starts)
    return win.reshape(starts.shape[0], window, 1)


def regen_windows_fit(cum, n: int, window: int = _REGEN_WINDOW) -> jax.Array:
    """Traced bool: every output block's bin span fits the window.

    The span of block t is (#bins with cum <= block end) - (#bins with
    cum <= block base); callers gate `regenerate_windowed_tpu` on this with
    `lax.cond` (sorter fallback), keeping the whole dispatch on device.
    """
    block_elems = _BLOCK_SUBS_W * _SUB_W
    n_pad = -(-n // block_elems) * block_elems
    starts = _regen_win_starts(cum, n_pad)
    block_ends = (jnp.arange(n_pad // block_elems, dtype=jnp.int32) + 1) \
        * block_elems - 1
    # Clamp to the last REAL output position: past n-1 every trailing empty
    # bin (cum == n) would inflate the final block's span and spuriously
    # fail skewed-but-fitting inputs (padding positions read the sentinel
    # tail, which is harmless — they are sliced off).
    block_ends = jnp.minimum(block_ends, n - 1)
    ends = jnp.searchsorted(cum, block_ends, side="right").astype(jnp.int32)
    return jnp.max(ends - starts) <= window


@functools.partial(jax.jit, static_argnames=("n", "bins", "window"))
def regenerate_windowed_tpu(cum, n, bins, window: int = _REGEN_WINDOW):
    """Keys-only counting-sort regeneration for wide domains (Pallas).

    cum: (bins,) int32 inclusive cumulative histogram. Only valid when
    `regen_windows_fit(cum, n, window)` holds — gate with `lax.cond`.
    """
    block_elems = _BLOCK_SUBS_W * _SUB_W
    n_pad = -(-n // block_elems) * block_elems
    steps = n_pad // block_elems
    starts = _regen_win_starts(cum, n_pad)
    # sentinel tail: never <= any position, and makes every slice in-bounds
    cum_pad = jnp.concatenate(
        [cum.astype(jnp.int32), jnp.full((window,), jnp.iinfo(jnp.int32).max,
                                         jnp.int32)])
    cumw = _gather_windows(cum_pad, starts, window)
    kernel = functools.partial(_regen_win_kernel, window=window)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((steps, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, window, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_SUBS_W, _SUB_W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * _BLOCK_SUBS_W, _SUB_W),
                                       jnp.uint32),
        interpret=_want_interpret(),
    )(starts.reshape(steps, 1), cumw)
    return out.reshape(-1)[:n]


def _regen_pdep_win_kernel(starts_ref, cumw_ref, dead_ref, o_ref, *, window,
                           mask):
    """Windowed regeneration with PDEP + dead-bit restore fused into the
    output write (the wide-domain form of `_regen_pdep_kernel`)."""
    step = pl.program_id(0)
    s = starts_ref[step, 0]
    cumw = cumw_ref[0]
    dead = dead_ref[0]
    base = step * (_BLOCK_SUBS_W * _SUB_W)
    ones_row = jnp.ones((1, window), jnp.bfloat16)

    def body(r, _):
        j = base + r * _SUB_W + lax.broadcasted_iota(jnp.int32, (1, _SUB_W), 1)
        emitted = (cumw <= j).astype(jnp.bfloat16)
        v = (s + jax.lax.dot_general(
            ones_row, emitted, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)).astype(jnp.uint32)
        o_ref[pl.ds(r, 1), :] = _pdep_rows(v, mask) | dead
        return 0

    lax.fori_loop(0, _BLOCK_SUBS_W, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "bins", "mask", "window"))
def regenerate_pdep_windowed_tpu(cum, n, bins, mask, dead_word,
                                 window: int = _REGEN_WINDOW):
    """Fused windowed regeneration of the sorted masked keys (one write).

    Only valid when `regen_windows_fit(cum, n, window)` holds — gate with
    `lax.cond` (raw-plane sorter fallback)."""
    block_elems = _BLOCK_SUBS_W * _SUB_W
    n_pad = -(-n // block_elems) * block_elems
    steps = n_pad // block_elems
    starts = _regen_win_starts(cum, n_pad)
    cum_pad = jnp.concatenate(
        [cum.astype(jnp.int32), jnp.full((window,), jnp.iinfo(jnp.int32).max,
                                         jnp.int32)])
    cumw = _gather_windows(cum_pad, starts, window)
    dead = (dead_word & np.uint32(~int(mask) & 0xFFFFFFFF)).astype(jnp.uint32)
    kernel = functools.partial(_regen_pdep_win_kernel, window=window,
                               mask=int(mask))
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((steps, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, window, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_SUBS_W, _SUB_W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * _BLOCK_SUBS_W, _SUB_W),
                                       jnp.uint32),
        interpret=_want_interpret(),
    )(starts.reshape(steps, 1), cumw, dead.reshape(1))
    return out.reshape(-1)[:n]


def _regen_pdep2_win_kernel(starts_ref, cumw_ref, dead_ref, ohi_ref, olo_ref,
                            *, window, mask_hi, mask_lo):
    """Two-plane windowed regeneration (64-bit masked keys, one write each)."""
    step = pl.program_id(0)
    s = starts_ref[step, 0]
    cumw = cumw_ref[0]
    dead_hi = dead_ref[0]
    dead_lo = dead_ref[1]
    nb_lo = bin(mask_lo).count("1")
    base = step * (_BLOCK_SUBS_W * _SUB_W)
    ones_row = jnp.ones((1, window), jnp.bfloat16)

    def body(r, _):
        j = base + r * _SUB_W + lax.broadcasted_iota(jnp.int32, (1, _SUB_W), 1)
        emitted = (cumw <= j).astype(jnp.bfloat16)
        v = (s + jax.lax.dot_general(
            ones_row, emitted, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)).astype(jnp.uint32)
        olo_ref[pl.ds(r, 1), :] = _pdep_rows(v & np.uint32((1 << nb_lo) - 1),
                                             mask_lo) | dead_lo
        ohi_ref[pl.ds(r, 1), :] = _pdep_rows(v >> np.uint32(nb_lo),
                                             mask_hi) | dead_hi
        return 0

    lax.fori_loop(0, _BLOCK_SUBS_W, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "bins", "mask_hi", "mask_lo",
                                             "window"))
def regenerate_pdep2_windowed_tpu(cum, n, bins, mask_hi, mask_lo,
                                  dead_hi_word, dead_lo_word,
                                  window: int = _REGEN_WINDOW):
    """Fused two-plane windowed regeneration; gate with `regen_windows_fit`."""
    block_elems = _BLOCK_SUBS_W * _SUB_W
    n_pad = -(-n // block_elems) * block_elems
    steps = n_pad // block_elems
    starts = _regen_win_starts(cum, n_pad)
    cum_pad = jnp.concatenate(
        [cum.astype(jnp.int32), jnp.full((window,), jnp.iinfo(jnp.int32).max,
                                         jnp.int32)])
    cumw = _gather_windows(cum_pad, starts, window)
    dead = jnp.stack([
        dead_hi_word & np.uint32(~int(mask_hi) & 0xFFFFFFFF),
        dead_lo_word & np.uint32(~int(mask_lo) & 0xFFFFFFFF),
    ]).astype(jnp.uint32)
    kernel = functools.partial(_regen_pdep2_win_kernel, window=window,
                               mask_hi=int(mask_hi), mask_lo=int(mask_lo))
    ospec = pl.BlockSpec((_BLOCK_SUBS_W, _SUB_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((steps * _BLOCK_SUBS_W, _SUB_W), jnp.uint32)
    hi, lo = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((steps, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, window, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[ospec, ospec],
        out_shape=[oshape, oshape],
        interpret=_want_interpret(),
    )(starts.reshape(steps, 1), cumw, dead.reshape(2))
    return hi.reshape(-1)[:n], lo.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# weighted histogram — the dense group-by MXU tier
#
# group-by-sum for keys promised in [0, G) is a WEIGHTED histogram:
# sum[g] = sum_i (key_i == g) * value_i. The factored one-hot gives it a
# matmul form: weight the lo one-hot row-wise by the value and let the MXU
# take hist[h, l] = hi_onehot (H, T) @ (lo_onehot * w)^T (T, L). Exactness
# (the reference-grade contract: integer sums exact mod 2^32) comes from a
# byte-plane split of the values: per byte plane the dot's f32 partials are
# <= sub * 255 = 2,088,960 < 2^24 (exact), the running accumulator is int32
# (wraps mod 2^32 like the contract), and the planes recombine with shifts
# in u32 where per-plane wrapping is harmless:
#   (S_p mod 2^32) << 8p  ==  (S_p << 8p)  (mod 2^32).
# Plane 0 is the unweighted count histogram (the group sizes / live mask /
# signed-bias correction), fused into the same key+value read.
# Measured on-chip rationale: scripts/exp_group_reduce.py — one f32 plane at
# 40M rows: 14.7 ms at 2^4 groups / 17.8 ms at 2^10 vs 497 ms sort-native.


def _whist_kernel(x_ref, v_ref, o_ref, *, radix_bits, valid_n, value_bytes,
                  sub, block_subs, drop_ge):
    """x_ref/v_ref: (block_subs, sub) uint32 keys/values;
    o_ref: (H, L * (value_bytes + 1)) int32 — tile 0 counts, tile p >= 1 the
    sum of value byte p-1 per bucket."""
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    himask = np.uint32(H - 1)
    lomask = np.uint32(L - 1)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    hiv = lax.broadcasted_iota(jnp.uint32, (H, 1), 0)
    lov = lax.broadcasted_iota(jnp.uint32, (L, 1), 0)
    base = step * (block_subs * sub)

    def body(s, _):
        row = x_ref[pl.ds(s, 1), :]                      # (1, sub) uint32
        val = v_ref[pl.ds(s, 1), :]                      # (1, sub) uint32
        eidx = base + s * sub + lax.broadcasted_iota(jnp.int32, (1, sub), 1)
        in_range = (eidx < valid_n) & (row < np.uint32(drop_ge))
        d_lo = row & lomask
        d_hi = (row >> np.uint32(lo_bits)) & himask
        d_hi = jnp.where(in_range, d_hi, np.uint32(H))   # padding lands nowhere
        hi_oh = (hiv == d_hi).astype(jnp.bfloat16)       # (H, sub)
        lo_oh = (lov == d_lo).astype(jnp.bfloat16)       # (L, sub)
        counts = jax.lax.dot_general(
            hi_oh, lo_oh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, pl.ds(0, L)] += counts.astype(jnp.int32)
        for p in range(value_bytes):
            # byte values 0..255 are exact in bf16 (8 significand bits);
            # Mosaic u32<->f casts go through int32
            wb = ((val >> np.uint32(8 * p)) & np.uint32(0xFF)) \
                .astype(jnp.int32).astype(jnp.bfloat16)  # (1, sub)
            partial = jax.lax.dot_general(
                hi_oh, lo_oh * wb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # <= sub*255 < 2^24
            o_ref[:, pl.ds((p + 1) * L, L)] += partial.astype(jnp.int32)
        return 0

    lax.fori_loop(0, block_subs, body, 0)


@functools.partial(jax.jit, static_argnames=("radix_bits", "valid_n",
                                             "value_bytes", "drop_ge"))
def _whist_call(x_padded, v_padded, radix_bits, valid_n, value_bytes, drop_ge):
    sub, block_subs = _hist_layout(radix_bits)
    n = x_padded.shape[0]
    block_elems = block_subs * sub
    assert n % block_elems == 0
    steps = n // block_elems
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    P = value_bytes + 1
    kernel = functools.partial(
        _whist_kernel, radix_bits=radix_bits, valid_n=valid_n,
        value_bytes=value_bytes, sub=sub, block_subs=block_subs,
        drop_ge=drop_ge)
    ispec = pl.BlockSpec((block_subs, sub), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[ispec, ispec],
        out_specs=pl.BlockSpec((H, L * P), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, L * P), jnp.int32),
        interpret=_want_interpret(),
    )(x_padded.reshape(steps * block_subs, sub),
      v_padded.reshape(steps * block_subs, sub))
    # (H, L*P) -> (P, H*L): bucket index is hi*L + lo
    return out.reshape(H, P, L).transpose(1, 0, 2).reshape(P, H * L)


def weighted_histogram_tpu(keys: jax.Array, values: jax.Array,
                           radix_bits: int, value_bytes: int,
                           drop_ge: int) -> jax.Array:
    """(value_bytes + 1, 2^radix_bits) int32: counts + per-byte value sums.

    ``keys``/``values`` are u32 vectors of equal length; keys >= ``drop_ge``
    are excluded from every plane (the promise-violation drop semantics of
    `extras.bincount`). Row 0 counts keys per bucket; row p >= 1 sums value
    byte p-1 per bucket, exact mod 2^32 after shift-recombination (header
    note above). One fused read of both streams.
    """
    kp, n = _pad_keys(keys)
    vp, _ = _pad_keys(values)
    return _whist_call(kp, vp, radix_bits, n, value_bytes, drop_ge)


def _whist_f32_kernel(*refs, radix_bits, valid_n, sub,
                      block_subs, drop_ge, with_counts):
    """f32-weighted histogram: x_ref (block_subs, sub) u32 keys, v_ref
    (block_subs, sub) f32 weights, o_ref (H, 2L) f32 — [hi-split, lo-split]
    bf16x2 partial sums (recombine: hi + lo). With ``with_counts`` a second
    (H, L) int32 output accumulates the unweighted histogram in the SAME
    key read (the group-size plane of the f32 dense group-by tier)."""
    x_ref, v_ref, o_ref = refs[0], refs[1], refs[2]
    c_ref = refs[3] if with_counts else None
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    himask = np.uint32(H - 1)
    lomask = np.uint32(L - 1)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)
        if with_counts:
            c_ref[...] = jnp.zeros_like(c_ref)

    hiv = lax.broadcasted_iota(jnp.uint32, (H, 1), 0)
    lov = lax.broadcasted_iota(jnp.uint32, (L, 1), 0)
    base = step * (block_subs * sub)

    def body(s, _):
        row = x_ref[pl.ds(s, 1), :]                      # (1, sub) uint32
        w = v_ref[pl.ds(s, 1), :]                        # (1, sub) float32
        eidx = base + s * sub + lax.broadcasted_iota(jnp.int32, (1, sub), 1)
        in_range = (eidx < valid_n) & (row < np.uint32(drop_ge))
        w = jnp.where(in_range, w, 0.0)  # padded/dropped weights -> 0
        d_lo = row & lomask
        d_hi = (row >> np.uint32(lo_bits)) & himask
        d_hi = jnp.where(in_range, d_hi, np.uint32(H))
        hi_oh = (hiv == d_hi).astype(jnp.bfloat16)       # (H, sub)
        lo_oh = (lov == d_lo).astype(jnp.bfloat16)       # (L, sub)
        if with_counts:
            counts = jax.lax.dot_general(
                hi_oh, lo_oh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            c_ref[...] += counts.astype(jnp.int32)
        # bf16x2 split: w == whi + wlo to ~16 mantissa bits; each half rides
        # one bf16 matmul with exact f32 accumulation (one-hot * w is exact)
        whi = w.astype(jnp.bfloat16)
        wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        for j, wpart in enumerate((whi, wlo)):
            partial = jax.lax.dot_general(
                hi_oh, lo_oh * wpart,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[:, pl.ds(j * L, L)] += partial
        return 0

    lax.fori_loop(0, block_subs, body, 0)


@functools.partial(jax.jit, static_argnames=("radix_bits", "valid_n",
                                             "drop_ge", "with_counts"))
def _whist_f32_call(x_padded, v_padded, radix_bits, valid_n, drop_ge,
                    with_counts=False):
    sub, block_subs = _hist_layout(radix_bits)
    n = x_padded.shape[0]
    block_elems = block_subs * sub
    assert n % block_elems == 0
    steps = n // block_elems
    hi_bits, lo_bits = _split_bits(radix_bits)
    H, L = 1 << hi_bits, 1 << lo_bits
    kernel = functools.partial(
        _whist_f32_kernel, radix_bits=radix_bits, valid_n=valid_n,
        drop_ge=drop_ge, sub=sub, block_subs=block_subs,
        with_counts=with_counts)
    kspec = pl.BlockSpec((block_subs, sub), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec((H, 2 * L), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = accspec
    out_shape = jax.ShapeDtypeStruct((H, 2 * L), jnp.float32)
    if with_counts:
        out_specs = (accspec, pl.BlockSpec((H, L), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((H, L), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[kspec, kspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_want_interpret(),
    )(x_padded.reshape(steps * block_subs, sub),
      v_padded.reshape(steps * block_subs, sub))
    if with_counts:
        sums, counts = out
        return counts.reshape(H * L), (sums[:, :L] + sums[:, L:]).reshape(H * L)
    return (out[:, :L] + out[:, L:]).reshape(H * L)


def weighted_histogram_f32_tpu(keys: jax.Array, weights: jax.Array,
                               radix_bits: int, drop_ge: int) -> jax.Array:
    """(2^radix_bits,) float32 weighted histogram of u32 keys.

    Weights split bf16x2 in-kernel (w = bf16(w) + bf16(w - bf16(w)), ~16
    mantissa bits per element) so both halves ride exact bf16-in/f32-out
    MXU matmuls; per-bin totals are direct sums (no 40M-long prefix like
    the sort route's cumsum-difference — tighter f32 error, not looser).
    Keys >= ``drop_ge`` and tail padding contribute nothing (weight zeroed
    AND one-hot invalidated). Non-finite weights poison more than their own
    bin (0*inf = NaN inside the matmul) — mask them out first; the
    sort+cumsum route degrades the same way globally.
    """
    kp, n = _pad_keys(keys)
    vp = weights.astype(jnp.float32)
    pad = kp.shape[0] - vp.shape[0]
    if pad:
        vp = jnp.concatenate([vp, jnp.zeros((pad,), jnp.float32)])
    return _whist_f32_call(kp, vp, radix_bits, n, drop_ge)


def weighted_histogram_f32_counts_tpu(keys: jax.Array, weights: jax.Array,
                                      radix_bits: int, drop_ge: int):
    """((2^radix_bits,) int32 counts, (2^radix_bits,) float32 sums).

    The fused count+sum form of :func:`weighted_histogram_f32_tpu` — the
    float dense group-by tier needs the group sizes (present mask, mean
    denominator) and the bf16x2 f32 sums from ONE read of both streams.
    Counts accumulate exactly in int32 (the same matmul as
    `weighted_histogram_tpu`'s plane 0); the sum plane carries the bf16x2
    error bound documented on the single-output form.
    """
    kp, n = _pad_keys(keys)
    vp = weights.astype(jnp.float32)
    pad = kp.shape[0] - vp.shape[0]
    if pad:
        vp = jnp.concatenate([vp, jnp.zeros((pad,), jnp.float32)])
    return _whist_f32_call(kp, vp, radix_bits, n, drop_ge, with_counts=True)
