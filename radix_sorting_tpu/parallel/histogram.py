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

    The distributed column-skip probe: one element per device, two tiny
    collectives.
    """

    def body(shard):
        # OR/AND reductions across the mesh via all_gather of the per-device
        # bitwise-reduced scalars (D tiny values), then a local fold.
        local_or = jnp.bitwise_or.reduce(shard)
        local_and = jnp.bitwise_and.reduce(shard)
        go = lax.all_gather(local_or, axis_name)
        ga = lax.all_gather(local_and, axis_name)
        return (jnp.bitwise_or.reduce(go) ^ jnp.bitwise_and.reduce(ga))[None]

    return jax.shard_map(
        body, mesh=mesh, in_specs=P(axis_name), out_specs=P(), check_vma=False
    )(x)[0]
