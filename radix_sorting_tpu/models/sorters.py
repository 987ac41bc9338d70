"""The sorter "model zoo": one configured sorter per reference listing.

The reference is a family of seven pedagogical C listings plus two generic
C++ engines (SURVEY §2); each row below is a ready-made, jit-friendly sorter
with the same observable contract, built on the shared engine stack. These are
thin configuration objects — the capability lives in :mod:`..api` — but they
keep a 1:1, testable correspondence with the reference inventory.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from .. import api
from ..config import DEFAULT_CONFIG, SortConfig
from ..ops.bitmap import bitmap_unique_sort

__all__ = [
    "CountingSorter8",
    "StableCountingSorter8",
    "RecordCountingSorter",
    "RadixSorterU32",
    "MultipassSorterU64",
    "RankSorter",
    "BitmapSorter16",
    "GenericRadixSorter",
]


@dataclasses.dataclass(frozen=True)
class _ConfiguredSorter:
    config: SortConfig = DEFAULT_CONFIG


class CountingSorter8(_ConfiguredSorter):
    """Keys-only 256-bin counting sort for uint8 (`counting_sort_8.c:5-21`).

    Regeneration path: output rebuilt from the histogram, no data movement.
    """

    def __call__(self, keys):
        if jnp.asarray(keys).dtype != jnp.uint8:
            raise TypeError("CountingSorter8 sorts uint8 keys")
        return api.counting_sort(keys, config=self.config)


class StableCountingSorter8(_ConfiguredSorter):
    """Stable scatter-form counting sort with payload (`counting_sort_8s.c:5-35`)."""

    def __call__(self, keys, values):
        if jnp.asarray(keys).dtype != jnp.uint8:
            raise TypeError("StableCountingSorter8 sorts uint8 keys")
        return api.counting_sort(keys, values, config=self.config)


class RecordCountingSorter(_ConfiguredSorter):
    """Record sort via key extraction (`counting_sort_rec_sk.c:10-41`).

    ``key_of`` plays the reference's ``key_of()`` role; records are a payload
    pytree (structure-of-arrays), permuted stably alongside the keys.
    """

    def __call__(self, records, key_of):
        keys = key_of(records)
        _, sorted_records = api.sort_pairs(keys, records, config=self.config)
        return sorted_records


class RadixSorterU32(_ConfiguredSorter):
    """4-pass-equivalent LSD radix sort of u32 keys (`radix_sort_u32.c:16-90`)."""

    def __call__(self, keys, value_mask: Optional[int] = None):
        return api.sort(keys, config=self.config, value_mask=value_mask)


class MultipassSorterU64(_ConfiguredSorter):
    """u64 sort as two chained stable 32-bit sorts (`radix_sort_u64_multipass.c`)."""

    def __call__(self, keys):
        return api.sort_u64_multipass(keys, config=self.config)


class RankSorter(_ConfiguredSorter):
    """Stable rank/index sort over const input (`radix_sort_u32_ranks.c:38-110`,
    generic `radix_sort_rank.hpp:22-112`)."""

    def __call__(self, keys, index_dtype=jnp.uint32):
        return api.argsort(keys, config=self.config, index_dtype=index_dtype)


class BitmapSorter16(_ConfiguredSorter):
    """Bitmap unique-sort over a 16-bit domain (`bitmap_sort_16.c:6-28`).

    Honors ``config.descending`` by reversing the valid prefix (the bitmap
    scan itself is ascending-only, like the reference's `bits & -bits` walk).
    """

    def __call__(self, keys, size: Optional[int] = None):
        values, count = bitmap_unique_sort(keys, size=size)
        if self.config.descending:
            # reverse only the valid prefix; padding stays at the tail
            n = values.shape[0]
            idx = jnp.where(jnp.arange(n) < count,
                            count - 1 - jnp.arange(n), jnp.arange(n))
            values = jnp.take(values, idx)
        return values, count


class GenericRadixSorter(_ConfiguredSorter):
    """The generic engine over every supported key dtype (`radix_sort.hpp:31-115`).

    Dispatches on dtype like the reference dispatches on its template KDF
    overload set; payload optional (value sort vs record sort).
    """

    def __call__(self, keys, values=None, value_mask: Optional[int] = None):
        if values is None:
            return api.sort(keys, config=self.config, value_mask=value_mask)
        return api.sort_pairs(keys, values, config=self.config)
