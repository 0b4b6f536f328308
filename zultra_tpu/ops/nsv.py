"""All-nearest-smaller-values (PSV/NSV) and pairwise LCP on device.

These are the parallel building blocks of the planned device-side
matchfinder (docs/STATUS.md): the lazy interval walk's match list equals
the nearest-occurrence lcp staircase, and staircases decompose into
PSV/NSV-style queries over suffix-array order plus range-minimum lookups.

* ``psv_nsv_jax`` — for every index, the nearest smaller value to the
  left/right, via a sparse table of windowed minima and a vectorized
  binary descent: O(n log n) build, O(log n) gathers per element, no
  sequential stack.
* ``lcp_pairs_jax`` — lcp of arbitrary (i, j) suffix pairs from the
  prefix-doubling rank tables in O(log n) vectorized steps.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .suffix_jax import _doubling_rounds, _num_levels


def _build_sparse_min(a: jnp.ndarray, levels: int):
    """st[l][i] = min(a[i .. i+2^l-1]) (windows clipped at the end)."""
    n = a.shape[0]
    tables = [a]
    cur = a
    for l in range(1, levels + 1):
        k = 1 << (l - 1)
        shifted = jnp.concatenate([cur[k:], jnp.full((k,), cur.dtype.type(2**30), cur.dtype)])
        cur = jnp.minimum(cur, shifted)
        tables.append(cur)
    return jnp.stack(tables)  # (levels+1, n)


def _range_min(st: jnp.ndarray, log_table: jnp.ndarray, lo, hi):
    """min over [lo, hi) for vectors lo < hi (standard two-window RMQ)."""
    length = hi - lo
    l = log_table[length]
    left = st[l, lo]
    right = st[l, hi - (1 << l).astype(lo.dtype)]
    return jnp.minimum(left, right)


@functools.partial(jax.jit, static_argnames=("n",))
def _psv_nsv_impl(a: jnp.ndarray, n: int):
    levels = max(1, int(math.ceil(math.log2(max(n, 2)))))
    st = _build_sparse_min(a, levels)
    logs = np.zeros(n + 1, dtype=np.int32)
    for i in range(2, n + 1):
        logs[i] = logs[i // 2] + 1
    log_table = jnp.asarray(logs)

    idx = jnp.arange(n, dtype=jnp.int32)
    v = a

    def safe_range_min(lo, hi):
        """min over [lo, hi) where hi > lo is guaranteed by the caller's
        mask; degenerate ranges are clamped to length 1."""
        lo_c = jnp.clip(lo, 0, n - 1)
        hi_c = jnp.clip(hi, lo_c + 1, n)
        return _range_min(st, log_table, lo_c, hi_c)

    # Binary descent keeping the invariant: [lo, hi) contains the answer
    # whenever one exists (min over the window < v).
    def descend(lo0, hi0, exists, pick_right):
        def step(_, state):
            lo, hi = state
            active = (hi - lo) > 1
            mid = (lo + hi) // 2
            if pick_right:
                half_min = safe_range_min(mid, hi)   # right half [mid, hi)
                go = half_min < v
                new_lo = jnp.where(go, mid, lo)
                new_hi = jnp.where(go, hi, mid)
            else:
                half_min = safe_range_min(lo, mid)   # left half [lo, mid)
                go = half_min < v
                new_lo = jnp.where(go, lo, mid)
                new_hi = jnp.where(go, mid, hi)
            return (
                jnp.where(active & exists, new_lo, lo),
                jnp.where(active & exists, new_hi, hi),
            )

        lo, hi = lax.fori_loop(0, levels + 2, step, (lo0, hi0))
        return lo

    # PSV: search [0, r), keep the rightmost qualifying half.
    psv_exists = (idx > 0) & (safe_range_min(jnp.zeros(n, jnp.int32), idx) < v)
    psv_lo = descend(jnp.zeros(n, jnp.int32), idx, psv_exists, pick_right=True)
    psv = jnp.where(psv_exists, psv_lo, -1)

    # NSV: search [r+1, n), keep the leftmost qualifying half.
    nsv_exists = (idx + 1 < n) & (safe_range_min(idx + 1, jnp.full(n, n, jnp.int32)) < v)
    nsv_lo = descend(idx + 1, jnp.full(n, n, jnp.int32), nsv_exists, pick_right=False)
    nsv = jnp.where(nsv_exists, nsv_lo, n)

    return psv, nsv


def psv_nsv_jax(values) -> tuple[np.ndarray, np.ndarray]:
    """psv[i] = nearest j < i with values[j] < values[i] (else -1);
    nsv[i] = nearest j > i with values[j] < values[i] (else n)."""
    arr = jnp.asarray(np.asarray(values, dtype=np.int32))
    n = int(arr.shape[0])
    if n == 0:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    psv, nsv = _psv_nsv_impl(arr, n)
    return np.asarray(psv), np.asarray(nsv)


@functools.partial(jax.jit, static_argnames=("levels",))
def _lcp_pairs_impl(data, i_pos, j_pos, levels):
    n = data.shape[0]
    _, ranks = _doubling_rounds(data, n, levels)

    lcp = jnp.zeros(i_pos.shape[0], dtype=jnp.int32)

    def level_body(carry, level_rank_and_width):
        lcp = carry
        level_rank, width = level_rank_and_width
        ia = i_pos + lcp
        ja = j_pos + lcp
        ok = (ia + width <= n) & (ja + width <= n)
        ra = level_rank[jnp.clip(ia, 0, n - 1)]
        rb = level_rank[jnp.clip(ja, 0, n - 1)]
        lcp = jnp.where(ok & (ra == rb), lcp + width, lcp)
        return lcp, None

    widths = jnp.array([1 << l for l in range(levels, -1, -1)], dtype=jnp.int32)
    lcp, _ = lax.scan(level_body, lcp, (ranks[::-1], widths))
    return jnp.where(i_pos == j_pos, n - i_pos, lcp)


def lcp_pairs_jax(data, i_positions, j_positions) -> np.ndarray:
    """lcp(suffix i, suffix j) for arbitrary position pairs."""
    arr = jnp.asarray(np.asarray(data, dtype=np.uint8))
    n = int(arr.shape[0])
    i_pos = jnp.asarray(np.asarray(i_positions, dtype=np.int32))
    j_pos = jnp.asarray(np.asarray(j_positions, dtype=np.int32))
    return np.asarray(_lcp_pairs_impl(arr, i_pos, j_pos, _num_levels(n)))


# ---------------------------------------------------------------------------
# Range max-below-threshold: the staircase matchfinder's remaining query.
# For interval members in suffix-array order, "nearest previous occurrence"
# is max(pos) among pos < i within the interval's rank range.
# ---------------------------------------------------------------------------


def _build_merge_sort_tree(a: jnp.ndarray, levels: int):
    """tree[l] = the array with every aligned 2^l block sorted ascending."""
    n = a.shape[0]
    out = [a]
    cur = a
    for l in range(1, levels + 1):
        width = 1 << l
        cur = jnp.sort(cur.reshape(n // width, width), axis=1).reshape(n)
        out.append(cur)
    return jnp.stack(out)  # (levels+1, n)


@functools.partial(jax.jit, static_argnames=("n", "levels"))
def _range_max_below_impl(a, lo, hi, thresh, n, levels):
    tree = _build_merge_sort_tree(a, levels)
    neg = jnp.int32(-(2**30))

    def seg_max_below(level, seg_start, width, t, active):
        """Largest value < t inside the sorted run
        tree[level][seg_start : seg_start+width] (width = 2^level).
        Branchless power-of-two lower bound: for step = W, W/2, …, 1,
        advance when the run's (pos+step-1)-th element is < t; the final
        pos is the count of qualifying elements."""
        count = jnp.zeros_like(seg_start)
        for shift in range(level, -1, -1):
            step = 1 << shift
            probe = jnp.clip(seg_start + count + step - 1, 0, n - 1)
            val = tree[level, probe]
            take = ((count + step) <= width) & (val < t)
            count = jnp.where(take, count + step, count)
        has = active & (count > 0)
        best = tree[level, jnp.clip(seg_start + count - 1, 0, n - 1)]
        return jnp.where(has, best, neg)

    result = jnp.full(lo.shape, neg, jnp.int32)
    a_cur = lo
    b_cur = hi
    for l in range(levels + 1):
        width = 1 << l
        # Peel a right-misaligned prefix segment at this level.
        take_a = (a_cur < b_cur) & ((a_cur & width) != 0)
        seg = seg_max_below(l, a_cur, jnp.full_like(a_cur, width), thresh, take_a)
        result = jnp.maximum(result, jnp.where(take_a, seg, neg))
        a_cur = jnp.where(take_a, a_cur + width, a_cur)
        # Peel a left-misaligned suffix segment.
        take_b = (a_cur < b_cur) & ((b_cur & width) != 0)
        b_new = jnp.where(take_b, b_cur - width, b_cur)
        seg = seg_max_below(l, b_new, jnp.full_like(b_cur, width), thresh, take_b)
        result = jnp.maximum(result, jnp.where(take_b, seg, neg))
        b_cur = b_new
    return result


def range_max_below_jax(values, los, his, thresholds) -> np.ndarray:
    """For each query q: max(values[los[q]:his[q]]) restricted to entries
    < thresholds[q], or -2^30 if none. values length is padded to a power
    of two internally (with -2^30, which never qualifies)."""
    arr = np.asarray(values, dtype=np.int32)
    n0 = arr.shape[0]
    levels = max(1, int(math.ceil(math.log2(max(n0, 2)))))
    n = 1 << levels
    padded = np.full(n, -(2**30), dtype=np.int32)
    padded[:n0] = arr
    lo = jnp.asarray(np.asarray(los, dtype=np.int32))
    hi = jnp.asarray(np.asarray(his, dtype=np.int32))
    th = jnp.asarray(np.asarray(thresholds, dtype=np.int32))
    return np.asarray(_range_max_below_impl(jnp.asarray(padded), lo, hi, th, n, levels))
