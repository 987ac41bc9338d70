"""Self-verification oracles, mirroring the reference's test/CLI checks.

* sortedness under a KDF order, forward or reverse — the CLI's always-on
  ``-DVERIFY_SORT`` check (`radix_experiment.cpp:137-174,208-212`);
* permutation validity via a presence bitmask + popcount
  (`radix_tests.cpp:82-91`);
* multiset preservation (sort must be a permutation of its input);
* stability witness for rank sorts (equal keys keep ascending indices).

These run on device as dense reductions and are cheap enough to keep on in
benchmarks, like the reference does.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kdf

__all__ = [
    "is_sorted",
    "is_permutation",
    "same_multiset",
    "rank_is_stable_sort",
]


def is_sorted(x, descending: bool = False) -> bool:
    """True iff x is sorted in the KDF order (handles floats incl. NaN/-0)."""
    from ..api import _as_words  # local import to avoid cycle at module load
    from ..ops.probes import is_sorted_words
    words, _ = _as_words(x, descending)
    return bool(is_sorted_words(words))


def is_permutation(perm, n: int | None = None) -> bool:
    """Validity of an index permutation: every index in [0, n) exactly once.

    The vectorized form of the reference's 64-bit presence bitmask +
    ``__builtin_popcountl`` check (`radix_tests.cpp:82-91`), generalized past
    n=64 via a presence vector.
    """
    p = jnp.asarray(perm).astype(jnp.int32)
    if n is None:
        n = p.shape[0]
    if p.shape[0] != n:
        return False
    seen = jnp.zeros((n,), jnp.int32).at[p].add(1, mode="drop")
    in_range = jnp.all((p >= 0) & (p < n))
    return bool(in_range & jnp.all(seen == 1))


def same_multiset(a, b) -> bool:
    """True iff b is a permutation of a (via canonical sorting on host)."""
    an = np.asarray(a)
    bn = np.asarray(b)
    if an.shape != bn.shape:
        return False
    # Compare raw bit patterns so NaNs with identical payloads compare equal.
    av = an.view(np.dtype(f"u{an.dtype.itemsize}"))
    bv = bn.view(np.dtype(f"u{bn.dtype.itemsize}"))
    return bool(np.array_equal(np.sort(av), np.sort(bv)))


def rank_is_stable_sort(keys, perm, descending: bool = False) -> bool:
    """True iff perm is *the* stable KDF-order permutation of keys.

    Stability makes the permutation unique (`README.md:471-473`), so this is a
    complete functional check for rank sorts: gathered keys sorted, and within
    equal keys the indices strictly ascend.
    """
    if not is_permutation(perm, np.asarray(keys).shape[0]):
        return False
    from ..api import _as_words
    from ..ops.probes import word_lt
    words, _ = _as_words(keys, descending)
    p = jnp.asarray(perm).astype(jnp.int32)
    gw = tuple(w[p] for w in words)
    # lexicographic (word0, word1, ..., index) must be strictly increasing
    # (the index tiebreak makes ties impossible)
    ops = gw + (p.astype(jnp.uint32),)
    heads = tuple(o[:-1] for o in ops)
    tails = tuple(o[1:] for o in ops)
    return bool(jnp.all(word_lt(heads, tails)))
