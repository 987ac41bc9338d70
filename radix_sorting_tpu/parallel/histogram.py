"""Distributed histogram reduction: local counts + psum over the mesh.

The distributed form of the reference's fused histogram pass
(`radix_sort.hpp:47-58`): every device histograms its shard, one `psum`
collective produces the exact global per-digit distribution on every device —
over ICI within a slice, DCN across hosts, placed by XLA. Feeds the shuffle's
splitter computation and the distributed column-skip probe.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.histogram import digit_histogram, extract_digit
from ..ops.probes import live_bit_mask

__all__ = ["global_digit_histogram", "global_live_bit_mask"]


@partial(jax.jit, static_argnames=("mesh", "axis_name", "radix_bits", "pass_index"))
def global_digit_histogram(x: jax.Array, mesh: Mesh, pass_index: int = 0,
                           radix_bits: int = 8, axis_name: str = "shards") -> jax.Array:
    """Exact global histogram of one digit of a mesh-sharded u32 array."""
    num_passes = -(-32 // radix_bits)
    if not 0 <= pass_index < num_passes:
        # extract_digit's word indexing would silently wrap a negative list
        # index back to pass 0 — a wrong global distribution, not an error
        raise ValueError(
            f"pass_index {pass_index} out of range for {radix_bits}-bit "
            f"digits of a u32 plane (valid: 0..{num_passes - 1})")
    bins = 1 << radix_bits

    def body(shard):
        d = extract_digit((shard,), pass_index, radix_bits)
        return lax.psum(digit_histogram(d, bins), axis_name)

    return jax.shard_map(
        body, mesh=mesh, in_specs=P(axis_name), out_specs=P(), check_vma=False
    )(x)


@partial(jax.jit, static_argnames=("mesh", "axis_name"))
def global_live_bit_mask(x: jax.Array, mesh: Mesh, axis_name: str = "shards") -> jax.Array:
    """Global live-bit mask (OR ^ AND) of a mesh-sharded u32 array.

    The distributed column-skip probe: one element per device, ONE tiny
    collective (the per-device OR and AND scalars gather as a stacked pair).
    """

    def body(shard):
        # OR/AND reductions across the mesh via one all_gather of the
        # per-device (or, and) pair (a (D, 2) gather), then a local fold —
        # one latency-bound collective instead of two.
        local = jnp.stack([jnp.bitwise_or.reduce(shard),
                           jnp.bitwise_and.reduce(shard)])
        g = lax.all_gather(local, axis_name)              # (D, 2)
        return (jnp.bitwise_or.reduce(g[:, 0])
                ^ jnp.bitwise_and.reduce(g[:, 1]))[None]

    return jax.shard_map(
        body, mesh=mesh, in_specs=P(axis_name), out_specs=P(), check_vma=False
    )(x)[0]
