"""Randomized soak: every public op against oracles over many seeds.

Gated behind ``RST_SOAK=1`` (slow by design — run it before releases or on
hardware changes): ``RST_SOAK=1 PALLAS_AXON_POOL_IPS= pytest tests/test_soak.py``.
The regular suites cover the same surfaces with fixed seeds; this sweeps the
input space wider.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

import radix_sorting_tpu as rst

pytestmark = pytest.mark.skipif(os.environ.get("RST_SOAK") != "1",
                                reason="set RST_SOAK=1 to run the soak suite")

_DTYPES = [np.uint8, np.uint16, np.uint32, np.uint64, np.int8, np.int16,
           np.int32, np.int64, np.float16, np.float32, np.float64]


def _gen(r, dtype, n):
    if np.issubdtype(dtype, np.floating):
        from jax import lax
        raw = r.integers(0, 1 << (8 * np.dtype(dtype).itemsize), size=n,
                         dtype=np.dtype(f"u{np.dtype(dtype).itemsize}"))
        x = raw.view(dtype)
        if np.dtype(dtype).itemsize == 8:
            return x  # stays numpy: jnp.asarray would downcast without x64
        # canonicalize through one device bitcast: the TPU backend rewrites
        # f16 NaN payloads to qNaN in any f16 compute (see ops/kdf.py note),
        # so the oracle must measure the same representation. Identity on CPU.
        u = jnp.dtype(f"uint{np.dtype(dtype).itemsize * 8}")
        return np.asarray(lax.bitcast_convert_type(
            lax.bitcast_convert_type(jnp.asarray(x), u), jnp.dtype(dtype)))
    info = np.iinfo(dtype)
    return r.integers(info.min, info.max, size=n, dtype=dtype, endpoint=True)


def _key(x):
    b = np.ascontiguousarray(x).view(f"u{x.dtype.itemsize}").astype(np.uint64)
    bits = x.dtype.itemsize * 8
    if np.issubdtype(x.dtype, np.floating):
        sign = b >> np.uint64(bits - 1)
        return np.where(sign == 1, (~b) & np.uint64((1 << bits) - 1),
                        b | np.uint64(1 << (bits - 1)))
    if np.issubdtype(x.dtype, np.signedinteger):
        return b ^ np.uint64(1 << (bits - 1))
    return b


@pytest.mark.parametrize("seed", range(50))
def test_soak_sort_and_rank(seed):
    r = np.random.Generator(np.random.PCG64(seed))
    dtype = _DTYPES[seed % len(_DTYPES)]
    n = int(r.integers(2, 100_000))
    x = _gen(r, dtype, n)
    descending = bool(seed % 2)
    cfg = rst.SortConfig(descending=descending,
                         dynamic_probe=bool(seed % 3 == 0))
    k = _key(x)
    order = np.argsort(np.where(descending, ~k, k), kind="stable")
    oracle = x[order]

    out = np.asarray(rst.sort(x if dtype().itemsize == 8 else jnp.asarray(x),
                              config=cfg), dtype=dtype)
    assert np.array_equal(out.view(f"u{x.dtype.itemsize}"),
                          oracle.view(f"u{x.dtype.itemsize}")), (seed, dtype, n)

    perm = np.asarray(rst.argsort(x if dtype().itemsize == 8 else jnp.asarray(x),
                                  config=cfg))
    assert np.array_equal(perm, order.astype(np.uint32)), (seed, dtype, n)


@pytest.mark.parametrize("seed", range(20))
def test_soak_distributed(seed):
    import jax
    from radix_sorting_tpu.parallel import (distributed_sort_balanced,
                                            gather_sorted, make_sort_mesh)
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    r = np.random.Generator(np.random.PCG64(1000 + seed))
    mesh = make_sort_mesh(int(r.integers(2, 9)))
    n = int(r.integers(10, 50_000))
    style = seed % 4
    if style == 0:
        x = r.integers(0, 1 << 32, size=n, dtype=np.uint32)
    elif style == 1:
        x = r.integers(0, 3, size=n, dtype=np.uint32)          # few values
    elif style == 2:
        x = np.sort(r.integers(0, 1 << 32, size=n, dtype=np.uint32))
    else:
        x = np.full(n, r.integers(0, 1 << 32), np.uint32)      # all equal
    chunk = int(r.integers(1, max(2, n // 4)))
    sp, counts, ovf = distributed_sort_balanced(
        jnp.asarray(x), mesh, chunk=chunk)
    assert int(np.asarray(ovf).sum()) == 0
    out = gather_sorted(jnp.asarray(sp).view(jnp.uint32), counts, ovf)
    assert np.array_equal(out, np.sort(x)), (seed, n, chunk)
