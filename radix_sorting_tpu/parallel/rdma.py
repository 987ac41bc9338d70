"""Pallas RDMA exchange: the all-to-all over explicit inter-chip DMA.

The SURVEY-prescribed variant of the distributed exchange backend
(`SURVEY.md` §2 "Distributed exchange backend": "Pallas
`make_async_remote_copy` RDMA for the overlapped version"): instead of
XLA's `lax.all_to_all`, each device pushes its per-destination chunks
directly into the destination device's output buffer over the
interconnect, double-buffered so the next send is in flight while the
previous one completes. On a real pod this is the candidate for beating
the XLA collective by overlapping per-chunk placement with transfer; the
round-2/3 measurement holdout (whether remote DMA shares the local-DMA
bandwidth cap on this part) is recorded in ROADMAP and must be probed on
multi-chip hardware before this backend is preferred by default.

Semantics match ``lax.all_to_all(x, axis_name, split_axis=axis,
concat_axis=axis, tiled=True)`` for an axis of length D = mesh size:
slice s of the input is delivered to device s, and the output's slice s
holds the chunk received from device s.

Correctness-by-construction notes (validated by the interpret-mode
vector-clock race detector in ``tests/test_rdma.py``):

* every (src, dst) pair writes a DISTINCT output row (row = sender id),
  so remote writes never overlap;
* receive semaphores are indexed BY STEP (one slot per ring step, no
  reuse): with a depth-2 send pipeline a sender can run up to two steps
  ahead of a receiver, so a 2-slot receive scheme could see step k+2's
  bytes land in step k's slot before step k was consumed — per-step
  slots make every wait match exactly its transfer;
* send semaphores alternate between 2 slots: slot ``k % 2`` is re-armed
  only after ``wait(k - 2)``, which this device itself ordered;
* a barrier semaphore round precedes any remote write so no transfer
  can land on a device that has not yet entered the kernel (the
  documented `get_barrier_semaphore` contract for collective kernels).

Off-TPU the kernel runs under the Pallas TPU interpret machinery
(`pltpu.InterpretParams`), which simulates remote DMAs and semaphores
faithfully enough to double as the race-detection harness — the TPU
analog of the reference's opt-in valgrind wrapper (`Makefile:14-16`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rdma_all_to_all"]

# Distinct from any other collective Pallas kernel in the package (there
# are none today); collective kernels invoked in the same program must not
# share a barrier-semaphore id.
_COLLECTIVE_ID = 11

_LOGICAL = pltpu.DeviceIdType.LOGICAL


def _interpret_kind() -> str:
    """Resolve the execution mode OUTSIDE the jit cache.

    Returns one of ``"tpu"`` (real kernel), ``"interp"`` (simulated), or
    ``"races"`` (simulated + vector-clock race detector). Resolved per CALL
    and passed as a static argument, so flipping ``RST_RDMA_DETECT_RACES``
    between calls re-traces instead of silently reusing a detector-off
    executable (the env var is the MEMCHECK-style switch for call sites
    that don't expose the ``detect_races`` parameter, e.g. the balanced-sort
    integration).
    """
    import os
    detect = os.environ.get("RST_RDMA_DETECT_RACES") == "1"
    if jax.default_backend() == "tpu":
        if detect:
            # refuse-rather-than-silently-differ, like detect_races=True on
            # TPU: the operator asked for the race detector; on the real
            # backend it cannot run, and pretending otherwise is the
            # "looks verified but is not" failure mode.
            raise ValueError(
                "RST_RDMA_DETECT_RACES=1 has no effect on the TPU backend "
                "(the interpret-mode race detector is off-TPU only); unset "
                "it for on-chip runs")
        return "tpu"
    return "races" if detect else "interp"


def _exchange_kernel(axis_name: str, D: int, x_ref, out_ref,
                     local_sem, send_sem, recv_sem):
    my = lax.axis_index(axis_name)

    # Barrier: signal every peer, wait for every peer. No remote write may
    # land before its target entered the kernel.
    bsem = pltpu.get_barrier_semaphore()

    def _signal(p, _):
        peer = lax.rem(my + p, jnp.int32(D))
        pltpu.semaphore_signal(bsem, inc=1, device_id=peer,
                               device_id_type=_LOGICAL)
        return _

    lax.fori_loop(1, D, _signal, 0)
    pltpu.semaphore_wait(bsem, D - 1)

    # Own chunk: local DMA, overlapped with the ring below.
    local = pltpu.make_async_copy(x_ref.at[my], out_ref.at[my], local_sem)
    local.start()

    def _descr(k):
        """Step-k transfer as seen by THIS device as the sender.

        Sender d ships input row (d + k) % D to device (d + k) % D, into
        that device's output row d (= the sender's id, so rows never
        collide). The same descriptor, evaluated on the receiving side,
        matches the incoming transfer's recv semaphore and byte count —
        the symmetric-SPMD pattern every device runs in lockstep.
        """
        dst = lax.rem(my + k, jnp.int32(D))
        return pltpu.make_async_remote_copy(
            src_ref=x_ref.at[dst],
            dst_ref=out_ref.at[my],
            send_sem=send_sem.at[lax.rem(k, 2)],
            recv_sem=recv_sem.at[k],
            device_id=dst,
            device_id_type=_LOGICAL,
        )

    if D > 1:
        _descr(jnp.int32(1)).start()

        def _body(k, _):
            _descr(k).start()          # depth-2 pipeline: k in flight ...
            _descr(k - 1).wait()       # ... while k-1 completes
            return _

        lax.fori_loop(2, D, _body, 0)
        _descr(jnp.int32(D - 1)).wait()

    local.wait()


@functools.partial(jax.jit, static_argnames=("axis_name", "axis_size",
                                             "interpret_kind"))
def _exchange(xf, axis_name: str, axis_size: int, interpret_kind: str):
    D = axis_size
    interpret = (False if interpret_kind == "tpu"
                 else pltpu.InterpretParams(
                     detect_races=interpret_kind == "races"))
    return pl.pallas_call(
        functools.partial(_exchange_kernel, axis_name, D),
        out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),       # local copy
            pltpu.SemaphoreType.DMA((2,)),     # send: depth-2 reuse
            pltpu.SemaphoreType.DMA((D,)),     # recv: one slot PER STEP
        ],
        compiler_params=pltpu.CompilerParams(collective_id=_COLLECTIVE_ID),
        interpret=interpret,
    )(xf)


def rdma_all_to_all(x: jax.Array, axis_name: str, axis_size: int,
                    axis: int = 0, *, detect_races: bool = False) -> jax.Array:
    """All-to-all exchange of ``x`` along mesh axis ``axis_name`` via RDMA.

    Drop-in for ``lax.all_to_all(x, axis_name, split_axis=axis,
    concat_axis=axis, tiled=True)`` inside ``shard_map``; ``x.shape[axis]``
    must equal ``axis_size`` (one chunk per destination device).

    ``detect_races=True`` runs the interpret-mode vector-clock race
    detector (off-TPU only; the test-suite hook).
    """
    D = axis_size
    if x.shape[axis] != D:
        raise ValueError(
            f"rdma_all_to_all: axis {axis} has length {x.shape[axis]}, "
            f"expected the mesh size {D}")
    if detect_races and jax.default_backend() == "tpu":
        # InterpretParams would silently *simulate* the kernel on a real TPU
        # backend instead of exercising inter-chip DMA — refuse rather than
        # hand back a result that looks hardware-verified but is not.
        raise ValueError(
            "detect_races=True runs the interpret-mode race detector and is "
            "only meaningful off-TPU; on the TPU backend run the real kernel "
            "(races are re-checked in CI via tests/test_rdma.py)")
    if jax.default_backend() != "tpu" and jax.process_count() > 1:
        # The interpret machinery simulates semaphores per-process; a
        # multi-controller mesh would deadlock in semaphore_wait forever
        # (reproduced: bench_scaling --processes ... --methods shuffle-rdma
        # hung with both workers spinning in the simulated barrier). Refuse
        # with the fix in hand instead of hanging.
        raise ValueError(
            "exchange='rdma' cannot run under multi-process CPU simulation: "
            "the interpret-mode semaphores do not cross process boundaries "
            "(the kernel would deadlock in the entry barrier). Use "
            "exchange='xla' for multi-controller simulation; RDMA runs for "
            "real on a TPU pod and single-process virtual meshes simulate "
            "it faithfully.")
    am = jax.sharding.get_abstract_mesh()
    if am is not None and any(
            s > 1 for name, s in zip(am.axis_names, am.axis_sizes)
            if name != axis_name):
        # The kernel addresses peers by the axis index as a flat LOGICAL
        # device id, which only matches mesh positions on a mesh where every
        # OTHER axis is trivial; on a genuinely multi-axis mesh the barrier
        # signals/remote writes would target the wrong devices (or hang).
        raise ValueError(
            f"rdma_all_to_all addresses peers by their '{axis_name}' index "
            "as a flat logical device id, which is only correct on a 1-D "
            f"mesh; the surrounding mesh {dict(zip(am.axis_names, am.axis_sizes))} "
            "has other non-trivial axes. Use exchange='xla' there.")
    if D == 1:
        return x
    xm = jnp.moveaxis(x, axis, 0)
    rest = xm.shape[1:]
    m = math.prod(rest) if rest else 1
    xf = xm.reshape(D, m)
    pad = (-m) % 128            # lane-friendly minor dim for the DMA rows
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
    out = _exchange(xf, axis_name, D,
                    "races" if detect_races else _interpret_kind())
    if pad:
        out = out[:, :m]
    return jnp.moveaxis(out.reshape((D,) + rest), 0, axis)
