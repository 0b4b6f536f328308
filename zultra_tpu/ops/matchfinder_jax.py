"""Device match finder: the nearest-occurrence LCP staircase computed with
device-wide sorts and scans — no sequential interval walk.

Replaces the semantics of the reference's lazy LCP-interval walk
(reference src/matchfinder.c:171-234) with the construction validated in
round 1 (tests/test_suffix.py::test_interval_centric_construction_equals_walk):
for each position p, the match list equals the *staircase* of previous
occurrences — scanning j = p-1 down, report every j whose clamped
lcp(p, j) strictly exceeds all nearer lcps (longest first, ≤8 reported,
offsets ≤ 32768). Equivalently, per ancestor LCP-interval I of p's suffix,
the within-interval predecessor pred_I(p) = max{j ∈ members(I), j < p};
rows are the breakpoints where pred strictly increases.

Device algorithm (one jit, static shapes, NO sequential loop anywhere):
  1. suffix array + rank tables        — prefix doubling (ops.suffix_jax)
  2. adjacent LCP array L[r], clamped  — rank-table descent, vectorized
  3. interval nodes                    — every boundary t with L[t] ≥ 3
     names the interval at value v=L[t] spanning it; its rank range
     [a, b) comes from two threshold PSV/NSV binary descents over a
     sparse-min table of L (one batch, no stack); duplicate (a, v) keys
     (equal-L runs inside one interval) are deduped by a sort
  4. memberships (interval, position)  — each node expands to its whole
     rank range in parallel: exclusive cumsum of sizes → flat offsets,
     scatter node ids at starts, forward-fill with a running max
  5. within-interval predecessors      — ONE lexicographic device sort by
     (interval, position): each entry's predecessor is its sorted neighbor
  6. staircase dedupe                  — second sort by (position, value
     descending) + segmented exclusive running-max scan; emit where pred
     strictly increases; cap 8 appended rows, offsets ≤ MAX_OFFSET

Degenerate inputs (long single-byte runs: interval chains up to 256 deep)
overflow the membership budget; the kernel detects this and the wrapper
falls back to the host walk FOR THAT SEGMENT ONLY — output parity is
unconditional, the device path covers realistic data (measured membership
density: text ≈ 5-9 per position, LZ-heavy fuzz data ≈ 34-49, all-zeros
254 — see docs/ARCHITECTURE.md).

Windows are cut into segments with a 32 KB history halo and a 258-byte
tail. This is exact, not approximate: a reported row (l, o) with o ≤ 32768
depends only on candidates within (p-32768, p) — farther candidates never
shadow nearer ones in the staircase — and clamped lcps only need 258 bytes
of lookahead. Segmenting bounds every device sort to ~100K elements and
makes windows batchable (vmap over segments).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import (
    MAX_MATCH_SIZE,
    MAX_OFFSET,
    MIN_MATCH_SIZE,
    NMATCHES_PER_OFFSET,
)
from .suffix_jax import _doubling_rounds, _num_levels

HALO = MAX_OFFSET  # 32768 history bytes make segment staircases exact
TAIL = MAX_MATCH_SIZE  # 258 lookahead bytes make clamped lcps exact
SEG_CORE = 65536  # positions resolved per segment

# Membership budget per position: the kernel is retried up the ladder on
# overflow (measured density: text ≈ 5-9, LZ-heavy fuzz data ≈ 34-49,
# all-zeros 254 → host fallback). Override: ZULTRA_JAX_MF_BUDGET="16,64".
BUDGET_LADDER = tuple(
    int(x) for x in os.environ.get("ZULTRA_JAX_MF_BUDGET", "16,64").split(",")
)


def _adjacent_lcp(sa: jnp.ndarray, ranks: jnp.ndarray, n: int) -> jnp.ndarray:
    """lcp(SA[r-1], SA[r]) for r in 1..n-1 via the doubling rank tables."""
    i_pos = sa[1:]
    j_pos = sa[:-1]
    lcp = jnp.zeros(n - 1, dtype=jnp.int32)
    levels = ranks.shape[0] - 1

    def body(carry, level_rank_and_width):
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
    lcp, _ = lax.scan(body, lcp, (ranks[::-1], widths))
    return lcp


def _build_sparse_min(a: jnp.ndarray, levels: int) -> jnp.ndarray:
    """st[l][i] = min(a[i .. i+2^l-1]), windows clipped at the end."""
    big = a.dtype.type(2**30)
    tables = [a]
    cur = a
    for l in range(1, levels + 1):
        k = 1 << (l - 1)
        shifted = jnp.concatenate([cur[k:], jnp.full((k,), big, cur.dtype)])
        cur = jnp.minimum(cur, shifted)
        tables.append(cur)
    return jnp.stack(tables)


def _make_range_min(st: jnp.ndarray, m: int):
    logs = np.zeros(m + 1, dtype=np.int32)
    for i in range(2, m + 1):
        logs[i] = logs[i // 2] + 1
    log_table = jnp.asarray(logs)

    def range_min(lo, hi):
        """min over [lo, hi); callers guarantee hi > lo (masked otherwise)."""
        lo_c = jnp.clip(lo, 0, m - 1)
        hi_c = jnp.clip(hi, lo_c + 1, m)
        l = log_table[hi_c - lo_c]
        left = st[l, lo_c]
        right = st[l, hi_c - (jnp.int32(1) << l)]
        return jnp.minimum(left, right)

    return range_min


def _find_left(range_min, steps: int, x, t):
    """Largest a ≤ x with L[a] < t (exists: L[0] = 0 < t)."""
    lo = jnp.zeros_like(x)
    hi = x + 1

    def step(_, state):
        lo, hi = state
        active = (hi - lo) > 1
        mid = (lo + hi) >> 1
        right_min = range_min(mid, hi)
        go_right = right_min < t
        new_lo = jnp.where(go_right, mid, lo)
        new_hi = jnp.where(go_right, hi, mid)
        return (jnp.where(active, new_lo, lo), jnp.where(active, new_hi, hi))

    lo, hi = lax.fori_loop(0, steps, step, (lo, hi))
    return lo


def _find_right(range_min, steps: int, m: int, x, t):
    """Smallest b ≥ x with L[b] < t (exists: sentinel L[m-1] = 0)."""
    lo = x
    hi = jnp.full_like(x, m)

    def step(_, state):
        lo, hi = state
        active = (hi - lo) > 1
        mid = (lo + hi) >> 1
        left_min = range_min(lo, mid)
        go_left = left_min < t
        new_hi = jnp.where(go_left, mid, hi)
        new_lo = jnp.where(go_left, lo, mid)
        return (jnp.where(active, new_lo, lo), jnp.where(active, new_hi, hi))

    lo, hi = lax.fori_loop(0, steps, step, (lo, hi))
    return lo


def _prev_in_segment(values: jnp.ndarray, seg_id: jnp.ndarray) -> jnp.ndarray:
    """The previous entry's value within the same segment (-1 at segment
    starts). Sufficient for the staircase dedupe because within-interval
    predecessors are monotone non-decreasing along each chain (member sets
    nest), so the previous value IS the running maximum."""
    neg = jnp.int32(-1)
    shifted_vals = jnp.concatenate([jnp.full((1,), neg), values[:-1]])
    shifted_seg = jnp.concatenate([jnp.full((1,), jnp.int32(-1)), seg_id[:-1]])
    return jnp.where(shifted_seg == seg_id, shifted_vals, neg)


@functools.partial(jax.jit, static_argnames=("n", "budget_factor"))
def _staircase_kernel(data: jnp.ndarray, n: int, budget_factor: int):
    """data: (n,) int32 — bytes 0..255 plus unique sentinel values ≥ 256
    for padding (each sentinel occurs once, so padded suffixes share no
    prefix with anything). Returns (lens (n,8), offs (n,8), overflow)."""
    levels = _num_levels(n)
    # Store only the rank tables for widths 1..256: lcps are clamped at
    # MAX_MATCH_SIZE (258 ≤ 256+128+...+1), so the descent in
    # _adjacent_lcp never needs a wider gram table, and halving the rows
    # halves its gather count (the dominant primitive cost — see
    # docs/ARCHITECTURE.md §5). Rounds past the stored ones early-exit
    # once ranks are distinct.
    sa, ranks = _doubling_rounds(data, n, levels, store_levels=8)
    pos = sa  # pos[r] = position of rank r

    # L_arr[r] = clamped lcp between ranks r-1, r; L_arr[0] = L_arr[n] = 0.
    raw = _adjacent_lcp(sa, ranks, n)
    clamped = jnp.where(raw < MIN_MATCH_SIZE, 0, jnp.minimum(raw, MAX_MATCH_SIZE))
    L_arr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), clamped.astype(jnp.int32), jnp.zeros(1, jnp.int32)]
    )  # length n+1, sentinel at n
    m = n + 1
    lev_L = max(1, int(math.ceil(math.log2(m))))
    st = _build_sparse_min(L_arr, lev_L)
    range_min = _make_range_min(st, m)
    steps = lev_L + 1

    # --- interval nodes: one candidate per boundary t with L[t] ≥ 3 ------
    t_idx = jnp.arange(n, dtype=jnp.int32)  # boundaries 0..n-1 (0 invalid)
    v_t = L_arr[t_idx]
    valid_t = v_t > 0
    thresh = jnp.maximum(v_t, 1)
    a_t = _find_left(range_min, steps, jnp.maximum(t_idx - 1, 0), thresh)
    b_t = _find_right(range_min, steps, m, t_idx + 1, thresh)

    # Dedupe boundaries naming the same interval (equal-L runs): sort by
    # (a*512+v) and keep first occurrences, then restore boundary order so
    # cumsum offsets stay monotone in node id.
    key_t = jnp.where(valid_t, a_t * 512 + v_t, jnp.int32(2**30))
    key_sorted, t_sorted = lax.sort((key_t, t_idx), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
    ) & (key_sorted < 2**30)
    is_node = jnp.zeros(n, jnp.bool_).at[t_sorted].set(first)

    sizes = jnp.where(is_node, b_t - a_t, 0)
    cum = jnp.cumsum(sizes) - sizes  # exclusive: node t's entries start here
    total = cum[-1] + sizes[-1]
    cap = budget_factor * n
    overflow = total > cap

    # --- expand memberships: scatter node ids at starts, forward-fill ----
    starts = jnp.where(is_node & (sizes > 0) & ~overflow, cum, cap)
    node_at = jnp.full(cap, jnp.int32(-1)).at[starts].max(t_idx, mode="drop")
    mem_node = lax.cummax(node_at)  # node ids ascend with their offsets
    in_use = (jnp.arange(cap, dtype=jnp.int32) < total) & (mem_node >= 0) & ~overflow
    safe_node = jnp.maximum(mem_node, 0)
    rank_e = a_t[safe_node] + (jnp.arange(cap, dtype=jnp.int32) - cum[safe_node])
    pos_e = pos[jnp.clip(rank_e, 0, n - 1)]
    val_e = v_t[safe_node]

    # Sort 1: (interval, position) → within-interval predecessor.
    key1 = jnp.where(in_use, mem_node, jnp.int32(2**30))
    pv = jnp.where(in_use, pos_e * 512 + (511 - val_e), jnp.int32(2**30))
    k_sorted, pv_sorted = lax.sort((key1, pv), num_keys=2)
    prev_same = jnp.concatenate(
        [jnp.zeros(1, jnp.bool_), k_sorted[1:] == k_sorted[:-1]]
    )
    prev_pos = jnp.concatenate([jnp.full((1,), jnp.int32(-1)), pv_sorted[:-1] >> 9])
    pred = jnp.where(prev_same & (k_sorted < 2**30), prev_pos, jnp.int32(-1))

    # Sort 2: (position, value descending) = chain order, deepest first.
    pv2, pred2 = lax.sort((pv_sorted, pred), num_keys=1)
    p2 = pv2 >> 9
    val2 = 511 - (pv2 & 511)

    # Staircase dedupe: emit where pred strictly exceeds every earlier
    # (deeper) pred in the chain; append (≤8 rows) only when offset fits.
    last = _prev_in_segment(pred2, p2)
    emit = (pred2 > last) & (pred2 >= 0) & (pv2 < 2**30)
    offs = p2 - pred2
    append = emit & (offs <= MAX_OFFSET)

    # Segmented cumulative count of appended rows: global cumsum minus the
    # value at each segment's first entry.
    idx = jnp.arange(cap, dtype=jnp.int32)
    seg_first = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), p2[1:] != p2[:-1]]
    )
    start_idx = lax.cummax(jnp.where(seg_first, idx, jnp.int32(0)))
    csum = jnp.cumsum(append.astype(jnp.int32))
    inc_count = csum - csum[start_idx] + append[start_idx].astype(jnp.int32)
    row = inc_count - 1  # 0-based slot among appended rows
    write = append & (row < NMATCHES_PER_OFFSET)
    flat = jnp.where(write, p2 * NMATCHES_PER_OFFSET + row, n * NMATCHES_PER_OFFSET)

    lens = jnp.zeros(n * NMATCHES_PER_OFFSET, jnp.int32).at[flat].set(val2, mode="drop")
    offs_out = jnp.zeros(n * NMATCHES_PER_OFFSET, jnp.int32).at[flat].set(offs, mode="drop")
    return (
        lens.reshape(n, NMATCHES_PER_OFFSET),
        offs_out.reshape(n, NMATCHES_PER_OFFSET),
        overflow,
    )


def _bucket(n: int) -> int:
    """Static kernel sizes: few distinct shapes → few compiles."""
    size = 4096
    while size < n:
        size *= 2
    return size


# ---------------------------------------------------------------------------
# Batched / mesh-sharded segment processing: uniform buffer layout
# [ HALO history | core | TAIL ], core always at offset ``halo`` — missing
# history or tail (window edges) is filled with unique sentinels, which is
# exactly the no-candidates semantics of the window edge.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n", "budget_factor", "core_off", "core_len"))
def _core_kernel(data, n, budget_factor, core_off: int, core_len: int):
    lens, offs, overflow = _staircase_kernel(data, n, budget_factor)
    sl = slice(core_off, core_off + core_len)
    return lens[sl], offs[sl], overflow


def build_segments(data: np.ndarray, spans, seg_core: int):
    """Cut the corpus into per-window segments with the uniform layout.

    ``spans``: the stream's window byte ranges [(lo, hi), ...] — matches
    may reach 32 KB back INTO the previous window (the history slide) but
    never beyond the current window's start-of-buffer, and lcps clamp at
    the window end, exactly like the streaming core.

    Returns (segbufs (S, L) int32, metas) with L = HALO + seg_core + TAIL
    and metas[s] = (window_index, core_lo_abs, core_len).
    """
    L = HALO + seg_core + TAIL
    bufs = []
    metas = []
    n_total = data.shape[0]
    for w, (w_lo, w_hi) in enumerate(spans):
        prev = min(HALO, w_lo)
        buf_start_abs = w_lo - prev  # window buffer start in corpus coords
        core = w_lo
        while core < w_hi:
            core_hi = min(core + seg_core, w_hi)
            lo = max(core - HALO, buf_start_abs)
            hi = min(core_hi + TAIL, w_hi)  # lcps clamp at the window end
            buf = np.empty(L, dtype=np.int32)
            # Unique sentinels everywhere, real bytes in the middle.
            buf[:] = 256 + np.arange(L, dtype=np.int32)
            dst = HALO - (core - lo)
            buf[dst : dst + (hi - lo)] = data[lo:hi]
            bufs.append(buf)
            metas.append((w, core, core_hi - core))
            core = core_hi
    return np.stack(bufs), metas


def match_tables_for_spans(
    data: np.ndarray,
    spans,
    seg_core: int = SEG_CORE,
    budget_factor: int = 16,
    mesh=None,
) -> list[np.ndarray]:
    """Per-window match tables for the stream's window spans, computed as
    one batch of segment kernels — locally vmapped, or sharded over a
    1-axis device mesh ('dp') with shard_map when ``mesh`` is given.
    Overflowing segments (degenerate runs) fall back to the host walk.
    Returns one (prev+in_size, 8, 2) int32 table per window."""
    import jax
    import jax.numpy as jnp

    data = np.asarray(data, dtype=np.uint8)
    segbufs, metas = build_segments(data, spans, seg_core)
    S, L = segbufs.shape

    def one(buf):
        return _core_kernel(buf, L, budget_factor, HALO, seg_core)

    if mesh is None:
        lens, offs, over = jax.vmap(one)(jnp.asarray(segbufs))
    else:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dp = mesh.shape["dp"]
        S_pad = -(-S // n_dp) * n_dp
        if S_pad > S:
            pad = np.broadcast_to(segbufs[-1], (S_pad - S, L))
            segbufs = np.concatenate([segbufs, pad])
        step = shard_map(
            jax.vmap(one), mesh=mesh, in_specs=P("dp"),
            out_specs=P("dp"), check_vma=False,
        )
        arr = jax.device_put(
            jnp.asarray(segbufs), NamedSharding(mesh, P("dp"))
        )
        lens, offs, over = jax.jit(step)(arr)
    lens = np.asarray(lens[:S])
    offs = np.asarray(offs[:S])
    over = np.asarray(over[:S])

    tables = []
    for w, (w_lo, w_hi) in enumerate(spans):
        prev = min(HALO, w_lo)
        tables.append(
            np.zeros((prev + (w_hi - w_lo), NMATCHES_PER_OFFSET, 2), dtype=np.int32)
        )
    for s, (w, core_abs, core_len) in enumerate(metas):
        w_lo, w_hi = spans[w]
        prev = min(HALO, w_lo)
        rel = core_abs - w_lo + prev  # row index inside the window buffer
        if over[s]:
            # Degenerate segment: host walk over the same clipped range.
            from ..matchfinder import find_all_matches

            lo = max(core_abs - HALO, w_lo - prev)
            hi = min(core_abs + core_len + TAIL, w_hi)
            sub = find_all_matches(
                data[lo:hi], core_abs - lo, hi - lo
            )
            tables[w][rel : rel + core_len] = sub[core_abs - lo : core_abs - lo + core_len]
        else:
            tables[w][rel : rel + core_len, :, 0] = lens[s, :core_len]
            tables[w][rel : rel + core_len, :, 1] = offs[s, :core_len]
    return tables


def _match_rows_for_range(
    window: np.ndarray, lo: int, core_lo: int, core_hi: int, hi: int,
    ladder,
):
    """Device staircase for window positions [core_lo, core_hi), using
    context [lo, hi). Retries up the membership-budget ladder; returns
    (lens, offs) arrays of shape (core, 8), or None when even the largest
    budget overflows (caller falls back to the host walk over the same
    byte range — exact by the halo argument)."""
    seg = np.asarray(window[lo:hi], dtype=np.int32)
    n_real = hi - lo
    n_pad = _bucket(n_real)
    if n_pad > n_real:
        pad = np.arange(256, 256 + (n_pad - n_real), dtype=np.int32)
        seg = np.concatenate([seg, pad])
    seg_dev = jnp.asarray(seg)
    for budget_factor in ladder:
        lens, offs, overflow = _staircase_kernel(seg_dev, n_pad, budget_factor)
        if not bool(overflow):
            lens = np.asarray(lens[core_lo - lo : core_hi - lo])
            offs = np.asarray(offs[core_lo - lo : core_hi - lo])
            return lens, offs
    return None


def match_table_jax(
    window: np.ndarray, start: int, end: int, budget_factor: int | None = None
) -> np.ndarray:
    """Full per-window match table, shape (end, 8, 2) int32 of
    (length, offset) — bit-identical to matchfinder.find_all_matches.

    ``start``: history bytes (no rows reported, usable as predecessors);
    ``end``: total window size. Long windows are cut into 64 KB cores with
    32 KB halo + 258-byte tail segments (exact — see module docstring).
    """
    ladder = (budget_factor,) if budget_factor is not None else BUDGET_LADDER
    window = np.asarray(window, dtype=np.uint8)
    table = np.zeros((end, NMATCHES_PER_OFFSET, 2), dtype=np.int32)

    core_lo = start
    while core_lo < end:
        core_hi = min(core_lo + SEG_CORE, end)
        lo = max(0, core_lo - HALO)
        hi = min(end, core_hi + TAIL)
        out = _match_rows_for_range(window, lo, core_lo, core_hi, hi, ladder)
        if out is None:
            # Degenerate segment (membership budget exceeded): host walk
            # over the same clipped range — identical rows by the halo
            # equivalence.
            from ..matchfinder import find_all_matches

            sub = find_all_matches(window[lo:hi], core_lo - lo, hi - lo)
            table[core_lo:core_hi] = sub[core_lo - lo : core_hi - lo]
        else:
            lens, offs = out
            table[core_lo:core_hi, :, 0] = lens
            table[core_lo:core_hi, :, 1] = offs
        core_lo = core_hi
    return table
