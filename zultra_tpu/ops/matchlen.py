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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from jax.experimental.pallas import tpu as pltpu

_SMEM = pltpu.SMEM

from ..constants import MAX_MATCH_SIZE

TILE_PAIRS = 256   # candidate pairs per grid step
SPAN = 512         # bytes compared per candidate (covers the 258 cap)
WIDE = SPAN + 128  # aligned load width (slice start rounded down to 128)


def _matchlen_kernel(pos_ref, prev_ref, cap_ref, data_ref, out_ref):
    # Lane-dimension dynamic slices must be 128-aligned on TPU: load from
    # the aligned-down offset and rotate the residue away. The rotated
    # tail wraps garbage into lanes >= WIDE-128, but the cap (<= 259)
    # masks everything past lane 383.
    span = jax.lax.broadcasted_iota(jnp.int32, (1, WIDE), 1)

    def load_rotated(start):
        aligned = (start // 128) * 128
        shift = start - aligned
        # Mosaic's dynamic rotate needs 32-bit lanes and 2D shapes:
        # widen before rolling, roll along the lane axis.
        wide = data_ref[:, pl.ds(aligned, WIDE)].astype(jnp.int32)  # (1, WIDE)
        return pltpu.roll(wide, WIDE - shift, 1), shift

    def body(k, _):
        p = pos_ref[0, k]
        q = prev_ref[0, k]
        cap = cap_ref[0, k]
        a, _sa = load_rotated(p)
        b, _sb = load_rotated(q)
        # First mismatch (positions at/past the cap count as mismatches;
        # cap < WIDE-128 guarantees one inside the valid region). Mosaic
        # lowers integer argmax poorly: min over masked indices instead.
        not_eq = (a != b) | (span >= cap)
        length = jnp.min(jnp.where(not_eq, span, WIDE)).astype(jnp.int32)
        out_ref[0, k] = length
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

    # Pad the window by WIDE so dynamic slices never run off the end; the
    # per-pair cap encodes the true comparable span (≤ MAX_MATCH + 1 so a
    # masked mismatch always exists inside SPAN).
    data_padded = np.zeros(n + WIDE, dtype=np.uint8)
    data_padded[:n] = arr

    pos_p = np.zeros(padded_pairs, dtype=np.int32)
    prev_p = np.zeros(padded_pairs, dtype=np.int32)
    cap_p = np.zeros(padded_pairs, dtype=np.int32)
    pos_p[:n_pairs] = pos
    prev_p[:n_pairs] = prev
    cap_p[:n_pairs] = np.minimum(
        np.minimum(n - pos, n - prev), MAX_MATCH_SIZE + 1
    ).clip(min=0)

    idx_space = dict(memory_space=_SMEM) if _SMEM is not None else {}

    out = pl.pallas_call(
        _matchlen_kernel,
        out_shape=jax.ShapeDtypeStruct((1, padded_pairs), jnp.int32),
        grid=(padded_pairs // TILE_PAIRS,),
        in_specs=[
            pl.BlockSpec((1, TILE_PAIRS), lambda i: (0, i), **idx_space),
            pl.BlockSpec((1, TILE_PAIRS), lambda i: (0, i), **idx_space),
            pl.BlockSpec((1, TILE_PAIRS), lambda i: (0, i), **idx_space),
            pl.BlockSpec((1, n + WIDE), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_PAIRS), lambda i: (0, i), **idx_space),
        interpret=interpret,
    )(
        jnp.asarray(pos_p.reshape(1, -1)),
        jnp.asarray(prev_p.reshape(1, -1)),
        jnp.asarray(cap_p.reshape(1, -1)),
        jnp.asarray(data_padded.reshape(1, -1)),
    )
    lengths = np.asarray(out)[0, :n_pairs]
    return np.minimum(lengths, MAX_MATCH_SIZE)
