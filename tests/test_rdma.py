"""Pallas RDMA exchange (`parallel/rdma.py`) on the 8-device CPU mesh.

The kernel runs under the Pallas TPU interpret machinery, which simulates
remote DMAs and semaphores across the shard_map devices and — with
``detect_races=True`` — runs a vector-clock race detector over every
shared-memory access. That detector is load-bearing here: the depth-2 send
pipeline plus per-step receive semaphores is exactly the kind of protocol
where an off-by-one slot scheme produces rare, silent corruption on
hardware (see the module docstring's hazard analysis).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from radix_sorting_tpu.parallel import rdma_all_to_all


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return Mesh(np.array(devs[:8]), ("x",))


def _no_races(expect_ran: bool = True):
    """True iff the vector-clock detector found no races.

    With ``expect_ran`` (the default) a detector that never ran FAILS the
    check — `ipc.races is None` would otherwise certify the DMA protocol
    race-free vacuously whenever the detection plumbing breaks.
    """
    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as ipc
    if ipc.races is None:
        return not expect_ran
    return not ipc.races.races_found


def _xla_ref(x, mesh, axis):
    f = lambda s: lax.all_to_all(s, "x", split_axis=axis, concat_axis=axis,
                                 tiled=True)
    spec = P(*(("x",) if axis == 0 else (None,) * axis + ("x",)))
    return np.asarray(jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=spec, out_specs=spec))(x))


def _rdma(x, mesh, axis, detect_races=True):
    f = lambda s: rdma_all_to_all(s, "x", 8, axis=axis,
                                  detect_races=detect_races)
    spec = P(*(("x",) if axis == 0 else (None,) * axis + ("x",)))
    return np.asarray(jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False))(x))


@pytest.mark.parametrize("c,dtype", [(128, np.uint32), (37, np.uint32),
                                     (5, np.int32), (1, np.uint32)])
def test_rdma_matches_xla_all_to_all(c, dtype):
    mesh = _mesh()
    r = np.random.default_rng(c)
    x = jnp.asarray(r.integers(0, 1 << 31, (3, 64, c)).astype(dtype))
    assert np.array_equal(_rdma(x, mesh, 1), _xla_ref(x, mesh, 1))
    assert _no_races()


def test_rdma_leading_axis_and_2d():
    mesh = _mesh()
    r = np.random.default_rng(9)
    x = jnp.asarray(r.integers(0, 1 << 31, (64, 33), dtype=np.uint32))
    assert np.array_equal(_rdma(x, mesh, 0), _xla_ref(x, mesh, 0))
    assert _no_races()


def test_rdma_single_device_identity():
    x = jnp.arange(12, dtype=jnp.uint32).reshape(1, 12)
    assert np.array_equal(np.asarray(rdma_all_to_all(x, "x", 1, axis=0)),
                          np.asarray(x))


def test_rdma_wrong_axis_length_raises():
    x = jnp.zeros((4, 7), jnp.uint32)
    with pytest.raises(ValueError, match="expected the mesh size"):
        rdma_all_to_all(x, "x", 8, axis=0)


def test_rdma_refused_on_multi_axis_mesh():
    # peers are addressed by axis index as a FLAT logical device id — only
    # correct when every other mesh axis is trivial; a (2, 4) mesh must be
    # refused, not silently misroute barrier signals/remote writes
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "x"))
    f = jax.shard_map(
        lambda s: rdma_all_to_all(s, "x", 4, axis=0),
        mesh=mesh, in_specs=P("x"), out_specs=P("x"), check_vma=False)
    with pytest.raises(ValueError, match="1-D mesh"):
        jax.jit(f)(jnp.zeros((16, 8), jnp.uint32))


def test_rdma_refused_in_multiprocess_simulation(monkeypatch):
    # interpret-mode semaphores are per-process: a multi-controller CPU mesh
    # would deadlock in the entry barrier (reproduced via bench_scaling
    # --processes --methods shuffle-rdma) — must refuse, not hang
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    x = jnp.zeros((8, 7), jnp.uint32)
    with pytest.raises(ValueError, match="multi-process"):
        rdma_all_to_all(x, "x", 8, axis=0)


def test_rdma_detect_races_refused_on_tpu(monkeypatch):
    # detect_races forces interpret mode, which would silently SIMULATE the
    # kernel on a real TPU backend — must refuse, not hand back a
    # fake-hardware result (round-3 review finding)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x = jnp.zeros((8, 7), jnp.uint32)
    with pytest.raises(ValueError, match="off-TPU"):
        rdma_all_to_all(x, "x", 8, axis=0, detect_races=True)


@pytest.fixture
def _race_detect_env(monkeypatch):
    # the balanced path reaches rdma_all_to_all without the detect_races
    # parameter; the env knob turns the detector on for those traces
    monkeypatch.setenv("RST_RDMA_DETECT_RACES", "1")
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_balanced_sort_rdma_exchange_end_to_end(_race_detect_env):
    # the flagship integration: the balanced distributed sort with the RDMA
    # backend must be bit-identical to the XLA-collective backend and the
    # host oracle, including under skew and for both overlap modes
    from radix_sorting_tpu.parallel import (distributed_sort_balanced_u32,
                                            gather_sorted, make_sort_mesh)
    _mesh()
    mesh = make_sort_mesh(8)
    r = np.random.default_rng(0xDDA)
    n = 40_013
    skewed = np.concatenate([
        np.full(n // 2, 7, np.uint32),
        r.integers(0, 1 << 32, n - n // 2, dtype=np.uint32)])
    for x in (r.integers(0, 1 << 32, n, dtype=np.uint32), skewed):
        expect = np.sort(x)
        for overlap in (False, True):
            sp, counts, ovf = distributed_sort_balanced_u32(
                jnp.asarray(x), mesh, chunk=977, overlap=overlap,
                exchange="rdma")
            assert np.array_equal(gather_sorted(sp, counts, ovf), expect)
    assert _no_races()


def test_rdma_route_actually_taken(_race_detect_env, monkeypatch):
    # Regression: an inner ``def exchange`` in _balanced_body once shadowed
    # the ``exchange=`` parameter, so exchange="rdma" silently compiled the
    # XLA collective instead (result-identical, hence invisible to the
    # end-to-end tests above). Assert the RDMA kernel is really in the trace.
    from radix_sorting_tpu.parallel import (distributed_sort_balanced_u32,
                                            gather_sorted, make_sort_mesh)
    from radix_sorting_tpu.parallel import rdma as rdma_mod
    _mesh()
    mesh = make_sort_mesh(8)
    calls = []
    real = rdma_mod.rdma_all_to_all

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(rdma_mod, "rdma_all_to_all", counting)
    r = np.random.default_rng(3)
    x = r.integers(0, 1 << 32, 20_011, dtype=np.uint32)
    sp, counts, ovf = distributed_sort_balanced_u32(
        jnp.asarray(x), mesh, chunk=501, exchange="rdma")
    assert np.array_equal(gather_sorted(sp, counts, ovf), np.sort(x))
    assert calls, "exchange='rdma' compiled without invoking rdma_all_to_all"


def test_shuffle_rdma_exchange(_race_detect_env, monkeypatch):
    # the single-collective shuffle backend with the RDMA bulk exchange:
    # result-identical to the XLA collective and really on the RDMA route
    from radix_sorting_tpu.parallel import (distributed_sort_u32,
                                            gather_sorted, make_sort_mesh)
    from radix_sorting_tpu.parallel import rdma as rdma_mod
    _mesh()
    mesh = make_sort_mesh(8)
    calls = []
    real = rdma_mod.rdma_all_to_all

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(rdma_mod, "rdma_all_to_all", counting)
    r = np.random.default_rng(0xDDC)
    x = r.integers(0, 1 << 32, 30_029, dtype=np.uint32)
    sp, counts, ovf = distributed_sort_u32(jnp.asarray(x), mesh,
                                           exchange="rdma")
    assert np.array_equal(gather_sorted(sp, counts, ovf), np.sort(x))
    assert calls, "exchange='rdma' compiled without invoking rdma_all_to_all"
    assert _no_races()


def test_balanced_pairs_rdma_exchange(_race_detect_env):
    from radix_sorting_tpu.parallel import (distributed_sort_pairs_balanced,
                                            gather_sorted, make_sort_mesh)
    _mesh()
    mesh = make_sort_mesh(8)
    r = np.random.default_rng(0xDDB)
    n = 20_011
    x = r.integers(0, 50, n, dtype=np.uint32)  # heavy ties: stability visible
    payload = r.integers(0, 1 << 32, n, dtype=np.uint32)
    sk, pv, counts, ovf = distributed_sort_pairs_balanced(
        jnp.asarray(x), payload, mesh, chunk=501, exchange="rdma")
    order = np.argsort(x, kind="stable")
    assert np.array_equal(gather_sorted(jnp.asarray(pv), counts, ovf),
                          payload[order])
    assert _no_races()
