"""Pallas kernel: batched match-length extension.

Given the window bytes and a batch of (pos, prev) candidate pairs,
compute lcp(pos, prev) clamped to MAX_MATCH_SIZE — the inner primitive of
LZ77 match verification. TPU-lowering friendly: the window lives in VMEM
as a (1, n) row; each candidate reads two dynamic 512-byte slices
(`pl.ds`), compares them on the VPU and reduces to the first-mismatch
index; candidate indices sit in SMEM.

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

try:
    from jax.experimental.pallas import tpu as pltpu

    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    _SMEM = None

from ..constants import MAX_MATCH_SIZE

TILE_PAIRS = 256   # candidate pairs per grid step
SPAN = 512         # bytes compared per candidate (covers the 258 cap)


def _matchlen_kernel(pos_ref, prev_ref, cap_ref, data_ref, out_ref):
    span = jax.lax.broadcasted_iota(jnp.int32, (1, SPAN), 1)

    def body(k, _):
        p = pos_ref[k]
        q = prev_ref[k]
        cap = cap_ref[k]
        a = data_ref[0, pl.ds(p, SPAN)]
        b = data_ref[0, pl.ds(q, SPAN)]
        # First mismatch (positions at/past the cap count as mismatches;
        # cap < SPAN guarantees at least one, so argmax finds the first).
        not_eq = (a[None, :] != b[None, :]) | (span >= cap)
        length = jnp.argmax(not_eq, axis=1).astype(jnp.int32)
        out_ref[0, pl.ds(k, 1)] = length
        return 0

    jax.lax.fori_loop(0, TILE_PAIRS, body, 0)


def match_lengths_pallas(data, positions, prev_positions, interpret: bool = False):
    """Match lengths for (positions[i], prev_positions[i]) pairs, clamped
    to MAX_MATCH_SIZE. Arrays are int32; positions must be < len(data)."""
    arr = np.asarray(data, dtype=np.uint8)
    n = arr.shape[0]
    pos = np.asarray(positions, dtype=np.int32)
    prev = np.asarray(prev_positions, dtype=np.int32)
    n_pairs = pos.shape[0]
    padded_pairs = -(-max(n_pairs, 1) // TILE_PAIRS) * TILE_PAIRS

    # Pad the window by SPAN so dynamic slices never run off the end; the
    # per-pair cap encodes the true comparable span (≤ MAX_MATCH + 1 so a
    # masked mismatch always exists inside SPAN).
    data_padded = np.zeros(n + SPAN, dtype=np.uint8)
    data_padded[:n] = arr

    pos_p = np.zeros(padded_pairs, dtype=np.int32)
    prev_p = np.zeros(padded_pairs, dtype=np.int32)
    cap_p = np.zeros(padded_pairs, dtype=np.int32)
    pos_p[:n_pairs] = pos
    prev_p[:n_pairs] = prev
    cap_p[:n_pairs] = np.minimum(
        np.minimum(n - pos, n - prev), MAX_MATCH_SIZE + 1
    ).clip(min=0)

    if _SMEM is not None and not interpret:
        idx_space = dict(memory_space=_SMEM)
    else:
        idx_space = {}

    out = pl.pallas_call(
        _matchlen_kernel,
        out_shape=jax.ShapeDtypeStruct((1, padded_pairs), jnp.int32),
        grid=(padded_pairs // TILE_PAIRS,),
        in_specs=[
            pl.BlockSpec((TILE_PAIRS,), lambda i: (i,), **idx_space),
            pl.BlockSpec((TILE_PAIRS,), lambda i: (i,), **idx_space),
            pl.BlockSpec((TILE_PAIRS,), lambda i: (i,), **idx_space),
            pl.BlockSpec((1, n + SPAN), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_PAIRS), lambda i: (0, i)),
        interpret=interpret,
    )(
        jnp.asarray(pos_p),
        jnp.asarray(prev_p),
        jnp.asarray(cap_p),
        jnp.asarray(data_padded.reshape(1, -1)),
    )
    lengths = np.asarray(out)[0, :n_pairs]
    return np.minimum(lengths, MAX_MATCH_SIZE)
