"""Configured sorter families mapping 1:1 to the reference listings."""

from .sorters import (  # noqa: F401
    BitmapSorter16,
    CountingSorter8,
    GenericRadixSorter,
    MultipassSorterU64,
    RadixSorterU32,
    RankSorter,
    RecordCountingSorter,
    StableCountingSorter8,
)
