"""Pallas kernel: batched match-length extension.

Given the window bytes and a batch of (pos, prev) candidate pairs,
compute lcp(pos, prev) clamped to MAX_MATCH_SIZE — the inner primitive of
LZ77 match verification. Each candidate compares a 256-lane tile of bytes
from both positions in VMEM and reduces to the first-mismatch index; a
second tile covers the 258-byte cap.

This is the building block for a future device-side matchfinder
(SURVEY §7.4: per-position top-k nearest-preceding-suffix matches
evaluated directly from SA order); today it is used by tests and the
sharded statistics path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..constants import MAX_MATCH_SIZE

TILE_PAIRS = 256   # candidate pairs per grid step
SPAN = 512         # bytes compared per candidate (covers the 258 cap)


def _matchlen_kernel(data_ref, pos_ref, prev_ref, out_ref):
    pos = pos_ref[:]       # (TILE_PAIRS,)
    prev = prev_ref[:]
    n = data_ref.shape[0]

    span = jax.lax.broadcasted_iota(jnp.int32, (TILE_PAIRS, SPAN), 1)
    ia = jnp.minimum(pos[:, None] + span, n - 1)
    ib = jnp.minimum(prev[:, None] + span, n - 1)
    a = data_ref[ia]
    b = data_ref[ib]
    valid = (pos[:, None] + span < n) & (prev[:, None] + span < n)
    eq = (a == b) & valid
    # Length = index of first mismatch (SPAN if all equal).
    first_neq = jnp.where(eq.all(axis=1), SPAN, jnp.argmin(eq, axis=1))
    out_ref[:] = jnp.minimum(first_neq.astype(jnp.int32), MAX_MATCH_SIZE)


def match_lengths_pallas(data, positions, prev_positions, interpret: bool = False):
    """Match lengths for (positions[i], prev_positions[i]) pairs, clamped
    to MAX_MATCH_SIZE. Arrays are int32; positions must be < len(data)."""
    arr = jnp.asarray(np.asarray(data, dtype=np.uint8))
    pos = np.asarray(positions, dtype=np.int32)
    prev = np.asarray(prev_positions, dtype=np.int32)
    n_pairs = pos.shape[0]
    padded = -(-max(n_pairs, 1) // TILE_PAIRS) * TILE_PAIRS
    pos_p = np.zeros(padded, dtype=np.int32)
    prev_p = np.zeros(padded, dtype=np.int32)
    pos_p[:n_pairs] = pos
    prev_p[:n_pairs] = prev

    out = pl.pallas_call(
        _matchlen_kernel,
        out_shape=jax.ShapeDtypeStruct((padded,), jnp.int32),
        grid=(padded // TILE_PAIRS,),
        in_specs=[
            pl.BlockSpec(arr.shape, lambda i: (0,)),
            pl.BlockSpec((TILE_PAIRS,), lambda i: (i,)),
            pl.BlockSpec((TILE_PAIRS,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((TILE_PAIRS,), lambda i: (i,)),
        interpret=interpret,
    )(arr, jnp.asarray(pos_p), jnp.asarray(prev_p))
    return np.asarray(out)[:n_pairs]
