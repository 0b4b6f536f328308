"""Suffix array + PLCP on TPU via prefix doubling.

The reference builds its SA with libdivsufsort's recursive induced sort —
branchy, pointer-heavy, and hostile to accelerators. The TPU-shaped
construction is Manber–Myers prefix doubling: ceil(log2 n) rounds of
(sort by (rank_i, rank_{i+k}), re-rank), where each round is a flat
device-wide sort + compare + cumsum — exactly the primitives XLA tiles
well. The output permutation is identical (the SA is unique), which the
tests assert against the native SA-IS and the O(n² log n) oracle.

PLCP uses the intermediate rank tables from the doubling rounds: the LCP
of two suffixes is recovered in O(log n) vectorized gathers by descending
the levels (standard rank-table LCP), evaluated for all Φ pairs at once —
no sequential Φ walk.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _num_levels(n: int) -> int:
    return max(1, int(math.ceil(math.log2(max(n, 2)))))


def _doubling_rounds(data: jnp.ndarray, n: int, levels: int):
    """Run prefix doubling; returns (final rank, rank table per level).

    rank_levels[l] = ranks after sorting by 2^l-grams  (l = 0 .. levels).
    """
    idx = jnp.arange(n, dtype=jnp.int32)

    # Level 0: rank by single byte.
    rank = data.astype(jnp.int32)
    sa = jnp.argsort(rank, stable=True).astype(jnp.int32)
    sorted_r = rank[sa]
    diff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (sorted_r[1:] != sorted_r[:-1]).astype(jnp.int32)]
    )
    rank = jnp.zeros(n, jnp.int32).at[sa].set(jnp.cumsum(diff))

    ranks = [rank]
    for level in range(levels):
        k = 1 << level
        # rank of suffix i+k, or -1 past the end.
        rank2 = jnp.where(idx + k < n, jnp.roll(rank, -k), -1)
        # Lexicographic (rank, rank2) sort as two stable passes — int32-safe
        # for any window size (a composite int key would overflow without
        # x64 once n exceeds ~46K).
        order2 = jnp.argsort(rank2, stable=True).astype(jnp.int32)
        sa = order2[jnp.argsort(rank[order2], stable=True)].astype(jnp.int32)
        k1 = rank[sa]
        k2 = rank2[sa]
        diff = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                ((k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])).astype(jnp.int32),
            ]
        )
        rank = jnp.zeros(n, jnp.int32).at[sa].set(jnp.cumsum(diff))
        ranks.append(rank)
    return sa, jnp.stack(ranks)


def _suffix_array_impl(data: jnp.ndarray, levels: int):
    n = data.shape[0]
    sa, _ = _doubling_rounds(data, n, levels)
    return sa


@jax.jit
def _sa_jit_1(data):
    return _suffix_array_impl(data, _num_levels(data.shape[0]))


def suffix_array_jax(data) -> np.ndarray:
    """Suffix array of a byte array on the default JAX device."""
    n = int(np.shape(data)[0])
    if n == 0:
        return np.empty(0, dtype=np.int32)
    if n == 1:
        return np.zeros(1, dtype=np.int32)
    arr = jnp.asarray(np.asarray(data, dtype=np.uint8))
    return np.asarray(_sa_jit_1(arr))


def _plcp_impl(data: jnp.ndarray, levels: int):
    """PLCP for all positions via rank-table LCP over the Φ pairs."""
    n = data.shape[0]
    sa, ranks = _doubling_rounds(data, n, levels)

    # Φ: predecessor of each suffix in SA order (root -> itself, masked out).
    phi = jnp.zeros(n, dtype=jnp.int32).at[sa[1:]].set(sa[:-1])
    root = sa[0]
    phi = phi.at[root].set(root)

    i_pos = jnp.arange(n, dtype=jnp.int32)
    j_pos = phi

    # Descend levels: if the 2^l-grams at (i+l_acc, j+l_acc) agree, extend.
    # ranks[l][p] compares 2^l-grams (level 0 = single byte).
    lcp = jnp.zeros(n, dtype=jnp.int32)

    def level_body(carry, level_rank_and_width):
        lcp = carry
        level_rank, width = level_rank_and_width
        ia = i_pos + lcp
        ja = j_pos + lcp
        # Valid only if both windows fit; compare ranks.
        ok = (ia + width <= n) & (ja + width <= n)
        ra = level_rank[jnp.clip(ia, 0, n - 1)]
        rb = level_rank[jnp.clip(ja, 0, n - 1)]
        lcp = jnp.where(ok & (ra == rb), lcp + width, lcp)
        return lcp, None

    widths = jnp.array([1 << l for l in range(levels, -1, -1)], dtype=jnp.int32)
    # ranks stacked as [levels+1, n]; iterate from coarsest to finest.
    stacked = ranks[::-1]
    lcp, _ = lax.scan(level_body, lcp, (stacked, widths))

    lcp = jnp.where(i_pos == root, 0, lcp)
    return lcp


@jax.jit
def _plcp_jit(data):
    return _plcp_impl(data, _num_levels(data.shape[0]))


def plcp_jax(data) -> np.ndarray:
    """Permuted LCP array (lcp of each suffix with its SA predecessor)."""
    n = int(np.shape(data)[0])
    if n < 2:
        return np.zeros(n, dtype=np.int32)
    arr = jnp.asarray(np.asarray(data, dtype=np.uint8))
    return np.asarray(_plcp_jit(arr))
