"""Shared host-side test oracles.

One copy of the KDF total-order key (the formula of
`radix_sort_basic_kdf.hpp:19-46` in numpy), used by the fuzz and soak
suites — four hand-rolled copies had started to drift (round-3 review).
"""

from __future__ import annotations

import numpy as np

__all__ = ["kdf_key", "is_float_dtype"]


def is_float_dtype(dtype) -> bool:
    """ml_dtypes-robust float check (the trap docs/NOTES.md §4 records):
    bfloat16/float8_e4m3fn report numpy kind 'V'; float8_e5m2 reports 'f'
    without being a np.floating subclass."""
    d = np.dtype(dtype)
    return d.kind == "f" or ("float" in d.name and d.kind == "V")


def kdf_key(x: np.ndarray) -> np.ndarray:
    """Total-order sort key matching the KDF order (NaN sorts by sign+payload).

    unsigned: identity; signed: sign-bit flip; float: ``b | highbit`` for
    non-negative, ``~b`` for negative bit patterns — a monotone bijection
    into uint64 for every supported dtype up to 32 bits (64-bit dtypes sort
    as (hi, lo) planes; compose two calls for those).
    """
    b = np.ascontiguousarray(x).view(f"u{x.dtype.itemsize}").astype(np.uint64)
    bits = x.dtype.itemsize * 8
    if is_float_dtype(x.dtype):
        sign = b >> np.uint64(bits - 1)
        return np.where(sign == 1, (~b) & np.uint64((1 << bits) - 1),
                        b | np.uint64(1 << (bits - 1)))
    if np.issubdtype(x.dtype, np.signedinteger):
        return b ^ np.uint64(1 << (bits - 1))
    return b
