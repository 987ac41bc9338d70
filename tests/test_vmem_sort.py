"""VMEM-resident single-kernel bitonic sort (`ops/vmem_sort.py`).

Interpret-mode on CPU (the kernel is the real Mosaic program on TPU; the
on-chip sweep lives in scripts/exp_vmem_sort.py). Sizes stay small — the
unrolled network is O(log^2 n) stages and interpret mode pays per stage.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from radix_sorting_tpu.ops.vmem_sort import (VMEM_SORT_MIN_PAD,
                                             sort_planes_vmem, vmem_sort_ok)


@pytest.mark.parametrize("n", [1, 5, 777, 1024, 2048, 4096])
def test_keys_only_matches_numpy(n, rng):
    x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    (s,) = sort_planes_vmem((jnp.asarray(x),), 1)
    assert np.array_equal(np.asarray(s), np.sort(x))


def test_degenerate_styles(rng):
    base = rng.integers(0, 1 << 32, size=2000, dtype=np.uint32)
    for x in (np.sort(base), np.sort(base)[::-1].copy(),
              (base % 4 * 0x40000001).astype(np.uint32),
              np.zeros(2000, np.uint32),
              np.full(2000, 0xFFFFFFFF, np.uint32)):  # = the padding key
        (s,) = sort_planes_vmem((jnp.asarray(x),), 1)
        assert np.array_equal(np.asarray(s), np.sort(x))


def test_two_key_planes_lexicographic(rng):
    n = 1500
    hi = rng.integers(0, 4, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    sh, sl = sort_planes_vmem((jnp.asarray(hi), jnp.asarray(lo)), 2)
    order = np.lexsort((lo, hi))
    assert np.array_equal(np.asarray(sh), hi[order])
    assert np.array_equal(np.asarray(sl), lo[order])


def test_stable_rank_composite(rng):
    # (key, index) as two key planes -> the unique stable permutation,
    # the argsort_words trick at VMEM scale
    n = 1999
    k = rng.integers(0, 16, size=n, dtype=np.uint32)
    idx = np.arange(n, dtype=np.uint32)
    sk, si = sort_planes_vmem((jnp.asarray(k), jnp.asarray(idx)), 2)
    assert np.array_equal(np.asarray(si),
                          np.argsort(k, kind="stable").astype(np.uint32))
    assert np.array_equal(np.asarray(sk), np.sort(k))


def test_payload_plane_rides(rng):
    n = 1200
    k = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    idx = np.arange(n, dtype=np.uint32)
    pay = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    sk, si, sp = sort_planes_vmem(
        (jnp.asarray(k), jnp.asarray(idx), jnp.asarray(pay)), 2)
    o = np.argsort(k, kind="stable")
    assert np.array_equal(np.asarray(sk), k[o])
    assert np.array_equal(np.asarray(sp), pay[o])


def test_gates_and_errors(rng):
    assert not vmem_sort_ok(0, 1)
    assert vmem_sort_ok(1, 1)
    assert vmem_sort_ok(VMEM_SORT_MIN_PAD, 1)
    assert not vmem_sort_ok((1 << 17) + 1, 1)   # past the default cap
    assert vmem_sort_ok(1 << 17, 1, max_elems=1 << 17)
    assert not vmem_sort_ok(1 << 17, 16)        # plane budget wall
    x = jnp.zeros((64,), jnp.uint32)
    with pytest.raises(ValueError):
        sort_planes_vmem((x,), 0)
    with pytest.raises(ValueError):
        sort_planes_vmem((x,), 2)
    with pytest.raises(ValueError):
        sort_planes_vmem((x.astype(jnp.int32),), 1)
    with pytest.raises(ValueError):
        sort_planes_vmem((x, jnp.zeros((32,), jnp.uint32)), 1)
