"""Configuration for the TPU sort-execution engine.

The reference configures its engine with compile-time template parameters and
make vars (`radix_sort.hpp:98-115` counter-width dispatch, `Makefile:14-40`);
here a single dataclass covers the same knobs plus the TPU-specific ones
(execution strategy, mesh/sharding, pass width).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["SortConfig", "Strategy", "DEFAULT_CONFIG"]


class Strategy:
    """Execution strategies for the single-chip engine.

    AUTO      pick per-call: probes (presorted / live-digit) choose the cheapest
              applicable path, mirroring the reference's runtime early-exit and
              column-skip behavior (`radix_sort.hpp:47-70`).
    HW_SORT   derived-key sort on the hardware sort unit (XLA's optimized
              compare-exchange sorter) — the general workhorse.
    COUNTING  histogram + regenerate for keys-only sorts over small live domains
              (<= 2**counting_max_bits distinct live bit-patterns); the
              TPU-native generalization of `counting_sort_8.c` and the payoff of
              column skipping (`README.md:671-714`).
    LSD       the faithful chunked LSD radix engine (per-digit histogram →
              exclusive scan → stable scatter with ping-pong), structured like
              `radix_sort.hpp:31-93`; the blueprint for the Pallas exchange
              kernels and the distributed shuffle.
    """

    AUTO = "auto"
    HW_SORT = "hw_sort"
    COUNTING = "counting"
    LSD = "lsd"

    ALL = (AUTO, HW_SORT, COUNTING, LSD)


@dataclasses.dataclass(frozen=True)
class SortConfig:
    """Knobs for the sort engine.

    Attributes:
      strategy: execution strategy, see :class:`Strategy`.
      radix_bits: digit width for the LSD engine and distributed shuffle.
        The reference's tuned default is 8 (`README.md:316-335`), with 11-bit
        digits studied (`README.md:781-811`); both are supported.
      descending: sort order. Implemented via derived-key complement
        (`README.md:566-574`), preserving stability.
      counting_max_bits: ceiling on live-domain width for the COUNTING path.
        Default 17 (round 3): on TPU the windowed-regeneration tier
        (`ops/pallas_kernels.regenerate_windowed_tpu`) makes 2^11..2^16-bin
        domains profitable at every size the adaptive window admits, and
        2^17-bin domains at >= 512 keys-per-bin (both measured,
        scripts/exp_adaptive_window.py); the static (n, bins) gate and an
        in-graph sorter fallback handle everything else, so the wider
        default is always safe — on CPU or when the gate rejects, the
        engine sorts the raw planes internally.
      lsd_chunk: elements per chunk in the LSD engine's tile decomposition
        (the distributed-memory generalization of `cnt[k]++`,
        `counting_sort_8s.c:23-34`).
      detect_presorted: early-exit on already-sorted input
        (`radix_sort.hpp:48-62`, `README.md:652-669`).
      skip_trivial_digits: elide passes whose digit is constant across all keys
        (column skipping, `radix_sort.hpp:64-70`, diagram `data/colskip.dot`).
      dynamic_probe: in AUTO strategy, measure the live-bit mask of the actual
        data (one OR-reduce + one AND-reduce + a host sync) and take the
        COUNTING path when few bits vary — the runtime form of the
        reference's probe-based column skipping, valid with NO value_mask
        promise (dead bits are constant by measurement). Off by default:
        the host sync breaks async dispatch pipelines; turn on for
        low-entropy workloads called from Python.
      device_probe: in AUTO strategy (keys-only on TPU), dispatch IN-GRAPH
        on the measured key range: one fused min/max reduce feeds a
        `lax.cond` that routes range-bounded data to the counting tier
        (sort ``w - min``, add the offset back) and everything else to the
        sorter — NO host sync, so async dispatch pipelines stay intact
        (the fix for what keeps ``dynamic_probe`` off by default).
        Two-word (64-bit) keys probe the hi plane for constancy first:
        when every key shares one 2^32 span (clustered timestamps,
        offset ids) the sort drops to ONE sorter operand on the lo plane
        (~2x the two-operand rate) and then through the same narrow-range
        counting route.
        Measured on v5e at 40M (scripts/exp_device_probe.py): 0.6%
        overhead on full-entropy data; 1.77x (966 Mk/s) on unpromised
        narrow-range data. Off by default only because first execution of
        cond-wrapped Pallas programs compiles at dispatch on some runtimes
        (minutes at 40M via the axon tunnel); flip it on when narrow-range
        inputs are plausible. Valid with no promise: the range is
        measured, in-graph.
    """

    strategy: str = Strategy.AUTO
    radix_bits: int = 8
    descending: bool = False
    counting_max_bits: int = 17
    lsd_chunk: int = 8192
    detect_presorted: bool = True
    skip_trivial_digits: bool = True
    dynamic_probe: bool = False
    device_probe: bool = False

    def __post_init__(self):
        if self.strategy not in Strategy.ALL:
            raise ValueError(f"unknown strategy {self.strategy!r}; one of {Strategy.ALL}")
        if not (1 <= self.radix_bits <= 16):
            raise ValueError("radix_bits must be in [1, 16]")
        if self.lsd_chunk <= 0:
            raise ValueError("lsd_chunk must be positive")

    def replace(self, **kw) -> "SortConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = SortConfig()
