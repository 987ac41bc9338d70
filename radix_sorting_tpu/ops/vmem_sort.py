"""Single-kernel VMEM-resident bitonic sort for small key counts.

The flat hardware sorter has a fixed ~0.14-0.16 ms floor below 64k keys on
this part (ROADMAP "Small-n quadrant"): `lax.sort`'s compare-exchange network
runs its O(log^2 n) stages as separate passes whose fixed per-stage cost
dominates at tiny occupancy. But a 64k-key u32 plane is only 256 KB — the
WHOLE problem fits VMEM with room to spare. This kernel runs the entire
bitonic network inside ONE Pallas invocation: keys live in VMEM (registers /
spill) from first stage to last, no HBM traffic between stages, no per-stage
program overhead.

This is the TPU counterpart of the reference's cache-resident regime — its
throughput PEAK is at n=100k where the working set fits L2
(`/root/reference/report/report-i5-3570T-2020-04-18.txt:236`, 438 Mk/s).

Design (TPU-first, no translation):

* Layout: n (power of two, >= 1024) keys as an (R, 128) u32 matrix in VMEM,
  row-major (element i lives at row i // 128, lane i % 128).
* Network: the classic bitonic network over element indices; the
  compare-exchange partner of i at stride s is ``i ^ s``. In the row-major
  layout a stride is either a ROW distance (s >= 128: partner row
  ``r ^ (s/128)``, same lane) or a LANE distance (s < 128: partner lane
  ``c ^ s``, same row). Both halves of a pair fetch their partner with one
  circular roll each way along the corresponding axis (``pltpu.roll``) and a
  half-mask select — everything stays a full-width (R, 128) VPU op; there is
  no per-element control flow anywhere.
* Direction: ascending iff ``(i & size) == 0`` for merge-block size
  ``size`` — a static iota mask per stage.
* Multi-plane: planes move together under one lexicographic compare over the
  first ``num_keys`` planes (most significant first). The 64-bit (hi, lo)
  composite, the stable (key, index) rank composite, and payload planes all
  ride the same kernel.
* Ordered u32 compares are done in int32 space after one sign-bit flip
  (``x ^ 0x80000000`` maps u32 order onto i32 order) — Mosaic's integer
  compare support is deepest for i32.

The network is generated UNROLLED at trace time (log2(n)*(log2(n)+1)/2
stages); every mask is a static iota compare the compiler folds. Padding
keys are all-ones (maximal), so a non-power-of-two n sorts as its padded
size and slices back.

Capability parity: this implements the same contract as
:func:`..hw_engine.sort_words` for small n — stable ordering by unsigned
derived keys (`radix_sort.hpp:31-93` reduces every sort to exactly that).
Stability comes from composing the index plane as the last key, the same
strict-total-order trick the rank engine uses (`radix_sort_rank.hpp:22-92`
needs stability; here (key, index) distinctness makes it free).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _want_interpret, use_tpu_routes

__all__ = ["sort_planes_vmem", "vmem_sort_ok", "VMEM_SORT_MAX_ELEMS",
           "VMEM_SORT_MIN_PAD"]

# Padded-size bounds. The lower bound keeps R >= 8 (one full u32 sublane
# tile). The upper bound is a VMEM-budget + measured-crossover gate: planes
# plus roll/select temporaries must fit ~16 MB, and past a few hundred k
# elements the flat sorter's bandwidth wins anyway (stage cost grows with R
# while lax.sort amortizes its fixed floor). Overridable for experiments.
VMEM_SORT_MIN_PAD = 1024
VMEM_SORT_MAX_ELEMS = int(os.environ.get("RST_VMEM_SORT_MAX", 1 << 17))
# hard VMEM wall (bytes of live planes; temporaries roughly double it)
_VMEM_PLANE_BUDGET = 6 * (1 << 20)

_SIGN = np.int32(-(1 << 31))


def _pad_len(n: int) -> int:
    return max(VMEM_SORT_MIN_PAD, 1 << max(0, (n - 1).bit_length()))


def vmem_sort_ok(n: int, num_planes: int, max_elems: int | None = None) -> bool:
    """True when an n-element num_planes sort fits the VMEM-resident kernel."""
    if n < 1:
        return False
    np2 = _pad_len(n)
    cap = VMEM_SORT_MAX_ELEMS if max_elems is None else max_elems
    return np2 <= cap and np2 * 4 * num_planes <= _VMEM_PLANE_BUDGET


def _bitonic_kernel(*refs, R: int, num_planes: int, num_keys: int):
    n = R * 128
    k = n.bit_length() - 1
    in_refs, out_refs = refs[:num_planes], refs[num_planes:]

    # one sign-flip moves u32 order into i32 space; payload planes only
    # ride selects, so they stay raw bits
    xs = []
    for p in range(num_planes):
        v = lax.bitcast_convert_type(in_refs[p][...], jnp.int32)
        xs.append(v ^ _SIGN if p < num_keys else v)

    row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    for ksz in range(1, k + 1):
        sz = 1 << ksz
        # descending half of each merge block: (i & sz) != 0
        desc = ((row & (sz // 128)) != 0) if sz >= 128 else ((col & sz) != 0)
        for j in range(ksz - 1, -1, -1):
            s = 1 << j
            if s >= 128:
                m = s // 128
                upper = (row & m) != 0
                ys = [jnp.where(upper,
                                pltpu.roll(x, m, axis=0),
                                pltpu.roll(x, R - m, axis=0)) for x in xs]
            else:
                upper = (col & s) != 0
                ys = [jnp.where(upper,
                                pltpu.roll(x, s, axis=1),
                                pltpu.roll(x, 128 - s, axis=1)) for x in xs]
            gt = eq = None
            for p in range(num_keys):
                g = xs[p] > ys[p]
                e = xs[p] == ys[p]
                gt = g if gt is None else gt | (eq & g)
                eq = e if eq is None else eq & e
            # element keeps the pair-max iff it is the upper partner of an
            # ascending block or the lower partner of a descending one
            take_max = upper != desc
            pick_mine = take_max == gt
            xs = [jnp.where(pick_mine, x, y) for x, y in zip(xs, ys)]

    for p in range(num_planes):
        v = xs[p] ^ _SIGN if p < num_keys else xs[p]
        out_refs[p][...] = lax.bitcast_convert_type(v, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("num_keys", "interpret"))
def _sort_call(planes, num_keys, interpret):
    R = planes[0].shape[0]
    kernel = functools.partial(_bitonic_kernel, R=R,
                               num_planes=len(planes), num_keys=num_keys)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((R, 128), jnp.uint32)
                        for _ in planes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(planes),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in planes),
        interpret=interpret,
    )(*planes)


def sort_planes_vmem(planes: Sequence[jax.Array], num_keys: int,
                     interpret: bool | None = None) -> Tuple[jax.Array, ...]:
    """Ascending sort of u32 ``planes`` by the first ``num_keys`` planes.

    All planes are 1-D uint32 of one common length n with
    ``vmem_sort_ok(n, len(planes))`` true; key planes are most significant
    first (the framework's universal word-plane representation — 64-bit keys
    are (hi, lo), stability is an index plane as the LAST key). Payload
    planes (past ``num_keys``) are permuted along. Returns the sorted planes.

    Equal full key tuples are interchangeable (the kernel is an oblivious
    comparison network) — callers needing stability must make key tuples
    distinct, exactly the `argsort_words` contract.
    """
    planes = tuple(planes)
    if not 1 <= num_keys <= len(planes):
        raise ValueError(f"num_keys must be in [1, {len(planes)}]")
    n = int(planes[0].shape[0])
    np2 = _pad_len(n)
    padded = []
    for p, x in enumerate(planes):
        if x.dtype != jnp.uint32 or x.ndim != 1 or int(x.shape[0]) != n:
            raise ValueError("planes must be equal-length 1-D uint32")
        if np2 != n:
            fill = jnp.full((np2 - n,),
                            0xFFFFFFFF if p < num_keys else 0, jnp.uint32)
            x = jnp.concatenate([x, fill])
        padded.append(x.reshape(np2 // 128, 128))
    itp = _want_interpret() if interpret is None else interpret
    out = _sort_call(tuple(padded), num_keys, itp)
    return tuple(o.reshape(np2)[:n] for o in out)
