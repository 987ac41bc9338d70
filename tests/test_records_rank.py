"""Record sorting, stability, and rank-sort tests.

Mirrors the reference fixtures: the 8-record duplicate-key table whose labels
make stability observable (`radix_tests.cpp:20-29`), the pointer-array
reverse sort (`:121-146`), and the rank sort with permutation-validity check
(`:71-105`).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import radix_sorting_tpu as rst
from radix_sorting_tpu.models import (
    RankSorter,
    RecordCountingSorter,
    StableCountingSorter8,
)
from radix_sorting_tpu.utils import verify

# the `radix_tests.cpp:20-29` fixture: duplicate key 45 labeled 1st/2nd/3rd
KEYS = np.array([255, 45, 0, 45, 255, 45, 1, 255], dtype=np.uint8)
NAMES = np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype=np.uint32)  # label by input slot
# stable expectation: key order 0,1,45,45,45,255,255,255 with 45s in slots 1,3,5
EXPECT_KEYS = np.array([0, 1, 45, 45, 45, 255, 255, 255], dtype=np.uint8)
EXPECT_SLOTS = np.array([2, 6, 1, 3, 5, 0, 4, 7], dtype=np.uint32)

STRATEGIES = [rst.Strategy.AUTO, rst.Strategy.HW_SORT, rst.Strategy.LSD]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_sortrec_stability(strategy):
    cfg = rst.SortConfig(strategy=strategy)
    sk, sv = rst.sort_pairs(jnp.asarray(KEYS), jnp.asarray(NAMES), config=cfg)
    assert np.array_equal(np.asarray(sk), EXPECT_KEYS)
    assert np.array_equal(np.asarray(sv), EXPECT_SLOTS)


def test_record_counting_sorter_pytree():
    # `counting_sort_rec_sk.c`: records with key extraction; payload is a pytree
    records = {
        "key": jnp.asarray(KEYS),
        "name": jnp.asarray(NAMES),
        "aux": jnp.asarray(NAMES.astype(np.float32) * 1.5),
    }
    out = RecordCountingSorter()(records, key_of=lambda r: r["key"])
    assert np.array_equal(np.asarray(out["name"]), EXPECT_SLOTS)
    assert np.array_equal(np.asarray(out["key"]), EXPECT_KEYS)


def test_stable_counting_sorter8():
    sk, sv = StableCountingSorter8()(jnp.asarray(KEYS), jnp.asarray(NAMES))
    assert np.array_equal(np.asarray(sk), EXPECT_KEYS)
    assert np.array_equal(np.asarray(sv), EXPECT_SLOTS)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_sortrec_descending(strategy):
    # the pointer-array reverse sort (`radix_tests.cpp:121-146`) uses ~key;
    # stable descending keeps equal-key input order
    cfg = rst.SortConfig(strategy=strategy, descending=True)
    sk, sv = rst.sort_pairs(jnp.asarray(KEYS), jnp.asarray(NAMES), config=cfg)
    assert np.array_equal(np.asarray(sk), np.array([255, 255, 255, 45, 45, 45, 1, 0], np.uint8))
    assert np.array_equal(np.asarray(sv), np.array([0, 4, 7, 1, 3, 5, 6, 2], np.uint32))


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("dtype", ["uint32", "int32", "float32", "uint8"])
def test_rank_sort(rng, strategy, dtype):
    d = np.dtype(dtype)
    if d.kind == "f":
        x = rng.standard_normal(10_000).astype(d)
    else:
        info = np.iinfo(d)
        x = rng.integers(info.min, int(info.max) + 1, size=10_000, dtype=d)
    cfg = rst.SortConfig(strategy=strategy)
    perm = np.asarray(rst.rank_sort(jnp.asarray(x), config=cfg))
    assert verify.is_permutation(perm)
    assert verify.rank_is_stable_sort(x, perm)
    assert np.array_equal(perm, np.argsort(x, kind="stable").astype(np.uint32))


def test_rank_sort_input_unmodified():
    x = jnp.asarray(KEYS)
    before = np.asarray(x).copy()
    _ = rst.rank_sort(x)
    assert np.array_equal(np.asarray(x), before)


def test_rank_sorter_fixture():
    perm = np.asarray(RankSorter()(jnp.asarray(KEYS)))
    assert np.array_equal(perm, EXPECT_SLOTS)


def test_rank_permutation_rejects_bad():
    assert not verify.is_permutation(np.array([0, 1, 1, 3], np.uint32))
    assert not verify.is_permutation(np.array([0, 1, 2, 4], np.uint32))
    assert verify.is_permutation(np.array([3, 0, 2, 1], np.uint32))
