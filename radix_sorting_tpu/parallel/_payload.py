"""Value-preserving u32-plane codecs for distributed payload pytrees.

Payload planes carry no order semantics — unlike key planes (KDF-encoded,
`ops/kdf.py`) they only have to survive the exchange bit-exactly, so the
encoding is a plain bitcast / zero-extension with an exact inverse. Shared by
both exchange backends (:mod:`.balanced` and :mod:`.shuffle`), the
distributed generalization of the record sort's payload-follows-key contract
(`counting_sort_rec_sk.c:14-41`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["payload_to_words", "payload_from_words", "encode_payload_tree",
           "decode_payload_tree"]


def payload_to_words(a) -> Tuple[Tuple[jax.Array, ...], Tuple]:
    """Encode one payload leaf into u32 planes with an exact inverse."""
    if isinstance(a, np.ndarray) and a.dtype.kind in ("S", "V") and a.ndim == 1:
        # fixed-width byte-string field (matches api.sort_pairs): 4 bytes
        # per packed u32 plane; numpy in -> numpy out
        from ..api import _pack_bytes_field
        W = a.dtype.itemsize
        if not 0 < W <= 256:
            raise ValueError(
                f"byte-field payload width must be in 1..256, got {W}")
        u8 = np.ascontiguousarray(a).view(np.uint8).reshape(a.shape[0], W)
        return _pack_bytes_field(jnp.asarray(u8)), (("bytes", W,
                                                     np.dtype(a.dtype)), False)
    if isinstance(a, np.ndarray) and a.dtype.itemsize == 8 and not jax.config.jax_enable_x64:
        from ..ops.kdf import split64_np
        return split64_np(a), (np.dtype(a.dtype), True)
    a = jnp.asarray(a)
    if a.ndim == 2 and a.dtype in (jnp.uint8, jnp.int8):
        if not 0 < a.shape[1] <= 256:
            raise ValueError(
                f"byte-field payload width must be in 1..256, got {a.shape[1]}")
        from ..api import _pack_bytes_field
        u8 = (a if a.dtype == jnp.uint8
              else lax.bitcast_convert_type(a, jnp.uint8))
        return _pack_bytes_field(u8), (("bytes", int(a.shape[1]),
                                        "u8" if a.dtype == jnp.uint8
                                        else "i8"), False)
    d = jnp.dtype(a.dtype)
    if d.itemsize == 8:
        from ..ops.kdf import _split64
        return _split64(a), (d, True)
    if d.itemsize == 4:
        return (lax.bitcast_convert_type(a, jnp.uint32),), (d, False)
    # 1- and 2-byte leaves (incl. bool and half floats): zero-extend via the
    # same-width unsigned view
    if d == jnp.bool_:
        return (a.astype(jnp.uint32),), (d, False)
    u = lax.bitcast_convert_type(a, jnp.dtype(f"uint{d.itemsize * 8}"))
    return (u.astype(jnp.uint32),), (d, False)


def payload_from_words(words, meta):
    d, is64 = meta
    if isinstance(d, tuple):  # ("bytes", W, dt) byte-string field
        from ..api import _unpack_bytes_field
        _, W, dt = d
        u8 = _unpack_bytes_field(words, W)
        if isinstance(dt, np.dtype):
            return np.ascontiguousarray(np.asarray(u8)).view(dt).reshape(-1)
        return (u8 if dt == "u8"
                else lax.bitcast_convert_type(u8, jnp.int8))
    if is64:
        hi, lo = words
        if isinstance(d, np.dtype) and not jax.config.jax_enable_x64:
            from ..ops.kdf import join64_np
            return join64_np(hi, lo, d)
        from ..ops.kdf import _join64
        return _join64(hi, lo, d)
    (w,) = words
    if d == jnp.bool_:
        return w.astype(jnp.bool_)
    if d.itemsize == 4:
        return lax.bitcast_convert_type(w, d)
    return lax.bitcast_convert_type(w.astype(jnp.dtype(f"uint{d.itemsize * 8}")), d)


def encode_payload_tree(values, n: int):
    """Flatten a payload pytree into u32 planes. Returns (planes, decode_ctx)."""
    leaves, treedef = jax.tree.flatten(values)
    enc = [payload_to_words(leaf) for leaf in leaves]
    planes = tuple(p for ps, _ in enc for p in ps)
    for p in planes:
        if p.shape[0] != n:
            raise ValueError("payload leaves must share the key length")
    return planes, (treedef, [meta for _, meta in enc],
                    [len(ps) for ps, _ in enc])


def decode_payload_tree(planes, ctx):
    treedef, metas, widths = ctx
    rest = list(planes)
    dec = []
    for meta, k in zip(metas, widths):
        dec.append(payload_from_words(tuple(rest[:k]), meta))
        rest = rest[k:]
    return jax.tree.unflatten(treedef, dec)
