"""Pallas TPU kernel for the LAZY LCP-INTERVAL WALK — the match-stage
counter-experiment VERDICT r4 item 1 demanded be run, not asserted.

The reference match finder (src/matchfinder.c:98-155 tree build,
:171-234 lazy interval-ascent walk) is amortized O(1)/position but
pointer-chasing and stateful — the canonical host-sequential stage. The
XLA staircase (ops/matchfinder_jax.py) replaces it with sorts + ~70-100n
random HBM gathers at the chip's ~94 Melem/s gather floor (~2 µs/core
byte). This kernel instead runs the REFERENCE ALGORITHM on-core, with
both lazy tables resident in SMEM where a dependent scalar access costs
~17-42 ns (scripts/probe_walk_primitives*.py):

  * the TPU scalar core addresses SMEM at word granularity with
    data-dependent indices — the only memory on the chip that supports
    the walk's pointer chase natively (VMEM needs vector-shaped access;
    a dynamic-row-load + roll + extract costs ~160 ns and scalar VMEM
    stores do not lower at all);
  * SMEM scratch allocates up to ~896 KB on this v5e, enough for the
    packed ``intervals`` + ``pos_data`` tables of a ~100 K-position
    segment (2n+2 int32 words);
  * measured walk traffic on text is ~8.3 reads + 5.5 writes per
    position (scripts/count_walk_ops.py), so the per-position budget is
    a few hundred ns — vs ~2 µs/byte for the staircase's gathers.

Layout: one kernel instance processes ONE segment buffer (the uniform
[HALO history | core | TAIL] layout of matchfinder_jax.build_segments,
sentinels ≥ 256 padding missing bytes). Phase 0 sweeps SA+LCP into the
interval tree (the reference's stack sweep); phase 1 visits every
position in order and runs the lazy walk, emitting up to 8
(length<<16|offset) rows per core position. Both phases stream their
input/output through SMEM grid blocks; the tables persist in SMEM
scratch across grid steps. Unlike the staircase there is NO degenerate-
input fallback: run-heavy data is exactly what the lazy walk handles in
O(1)/position, so the kernel covers every input.

Bit-exactness: the kernel is the reference walk, so parity with
matchfinder.find_all_matches is structural; tests/test_walk_pallas.py
proves it on fuzz + runs data (interpret mode; scripts/measure_walk_tpu.py
re-proves on chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    LCP_MASK,
    LCP_SHIFT,
    MAX_MATCH_SIZE,
    MAX_OFFSET,
    MIN_MATCH_SIZE,
    NMATCHES_PER_OFFSET,
    POS_MASK,
)
from .suffix_jax import _doubling_rounds, _num_levels
from .matchfinder_jax import _adjacent_lcp

I32 = jnp.int32
VIS = -0x80000000  # VISITED_FLAG: the int32 sign bit (python int constant)
EXCL_VIS = 0x7FFFFFFF
LCP_M = LCP_MASK
POS_M = POS_MASK

CHUNK = 1024  # positions (and ranks) per grid step
# Largest segment whose 2n+2-word tables fit the 1 MB SMEM alongside the
# double-buffered in/out blocks and register spills (n = 117*CHUNK OOMs
# by a hair; 114*CHUNK leaves ~27 KB of headroom on the v5e).
PROD_N = 114 * CHUNK


def _walk_kernel(salcp_ref, rows_ref, T, stack, regs, *, halo: int, limit: int):
    """Grid (2, n_chunks). Phase 0: interval-tree stack sweep over ranks.
    Phase 1: the lazy walk over positions. T: intervals[0..n) ++
    pos_data[n..2n+1). salcp block: (CHUNK,) SMEM; rows block:
    (CHUNK*9,) SMEM — 8 packed rows + count per position (flat: 2-D SMEM
    windows pad each row to T(512) and blow the 1 MB SMEM budget)."""
    ph = pl.program_id(0)
    c = pl.program_id(1)
    n = CHUNK * pl.num_programs(1)
    NP = n  # pos_data base offset inside T
    base = c * CHUNK

    # ---------------------------------------------------------- phase 0
    @pl.when((ph == 0) & (c == 0))
    def _():
        stack[0] = I32(0)
        T[0] = I32(0)  # intervals[0] = root
        regs[0] = I32(0)  # sp
        regs[1] = salcp_ref[0] & POS_M  # prev_pos (rank 0)
        regs[2] = I32(1)  # next interval index

    @pl.when(ph == 0)
    def _sweep():
        def step(i, carry):
            sp, prev_pos, nidx = carry
            packed = salcp_ref[i]
            next_pos = packed & POS_M
            next_lcp = packed & LCP_M
            top = stack[sp]
            top_lcp = top & LCP_M

            def do_eq(sp, nidx):
                T[NP + prev_pos] = top
                return sp, nidx

            def do_gt(sp, nidx):
                ref = next_lcp | nidx
                stack[sp + 1] = ref
                T[NP + prev_pos] = ref
                return sp + 1, nidx + 1

            def do_lt(sp, nidx):
                T[NP + prev_pos] = top

                def pop_cond(s):
                    return s[2] == 0

                def pop_body(s):
                    sp, nidx, _ = s
                    closed = stack[sp] & POS_M
                    sp1 = sp - 1
                    s_lcp = stack[sp1] & LCP_M
                    eq = next_lcp == s_lcp
                    gt = next_lcp > s_lcp

                    @pl.when(gt)
                    def _():
                        stack[sp1 + 1] = next_lcp | nidx

                    new_sp = jnp.where(gt, sp1 + 1, sp1)
                    new_nidx = jnp.where(gt, nidx + 1, nidx)
                    T[closed] = stack[new_sp]
                    return (new_sp, new_nidx, jnp.where(eq | gt, I32(1), I32(0)))

                sp, nidx, _ = lax.while_loop(
                    pop_cond, pop_body, (sp, nidx, I32(0))
                )
                return sp, nidx

            sp, nidx = lax.cond(
                next_lcp == top_lcp,
                do_eq,
                lambda sp, nidx: lax.cond(next_lcp > top_lcp, do_gt, do_lt, sp, nidx),
                sp,
                nidx,
            )
            return (sp, next_pos, nidx)

        start = jnp.maximum(base, 1) - base  # skip rank 0 in chunk 0
        carry = (regs[0], regs[1], regs[2])
        sp, prev_pos, nidx = lax.fori_loop(
            start, CHUNK, lambda i, s: step(i, s), carry
        )

        @pl.when(c == pl.num_programs(1) - 1)
        def _finalize():
            T[NP + prev_pos] = stack[sp]

            def drain_cond(s):
                return s > 0

            def drain_body(s):
                top = stack[s] & POS_M
                T[top] = stack[s - 1]
                return s - 1

            lax.while_loop(drain_cond, drain_body, sp)

        regs[0] = sp
        regs[1] = prev_pos
        regs[2] = nidx

    # ---------------------------------------------------------- phase 1
    @pl.when(ph == 1)
    def _walk():
        def visit(i, _):
            p = base + i

            @pl.when(p < limit)
            def _():
                mm = jnp.where(p >= halo, I32(NMATCHES_PER_OFFSET), I32(0))
                ref0 = T[NP + p]
                T[NP + p] = I32(0)

                # Ascend to the closest visited ancestor (or root),
                # marking everything on the way.
                def asc_cond(s):
                    return (s[1] & LCP_M) != 0

                def asc_body(s):
                    ref, sref = s
                    T[ref & POS_M] = p | VIS
                    return (sref, T[sref & POS_M])

                ref, sref = lax.while_loop(
                    asc_cond, asc_body, (ref0, T[ref0 & POS_M])
                )

                def no_prior():
                    @pl.when(ref != 0)
                    def _():
                        T[ref & POS_M] = p | VIS

                    return I32(0)

                def chase():
                    def outer_cond(s):
                        return s[3] != 0

                    def outer_body(s):
                        ref, match_pos, count, _ = s

                        # Chase pos_data links to the nearest prior
                        # position parked no deeper than ref.
                        def in_cond(t):
                            return t[1] > ref

                        def in_body(t):
                            mp = T[t[1] & POS_M] & EXCL_VIS
                            return (mp, T[NP + mp])

                        match_pos, sref2 = lax.while_loop(
                            in_cond, in_body, (match_pos, T[NP + match_pos])
                        )

                        T[ref & POS_M] = p | VIS
                        T[NP + match_pos] = ref
                        off = p - match_pos
                        emit = (count < mm) & (off <= MAX_OFFSET)

                        @pl.when(emit)
                        def _():
                            rows_ref[i * 9 + count] = (
                                (ref >> LCP_SHIFT) << 16
                            ) | off

                        count = count + jnp.where(emit, I32(1), I32(0))
                        alive = sref2 != 0
                        nref = jnp.where(alive, sref2, ref)
                        nmp = jnp.where(
                            alive, T[nref & POS_M] & EXCL_VIS, match_pos
                        )
                        return (nref, nmp, count, jnp.where(alive, I32(1), I32(0)))

                    _, _, count, _ = lax.while_loop(
                        outer_cond,
                        outer_body,
                        (ref, sref & EXCL_VIS, I32(0), I32(1)),
                    )
                    return count

                count = lax.cond(sref == 0, no_prior, chase)
                rows_ref[i * 9 + 8] = count

            return 0

        lax.fori_loop(0, CHUNK, visit, 0)


@functools.partial(jax.jit, static_argnames=("n", "halo", "limit", "interpret"))
def _walk_pallas_call(salcp, n: int, halo: int, limit: int, interpret: bool):
    """salcp: (n,) int32 (SA | clamped-LCP << LCP_SHIFT, rank order).
    Returns (n, 9) int32: 8 packed (len<<16|off) rows + count."""
    assert n % CHUNK == 0
    n_chunks = n // CHUNK

    kernel = functools.partial(_walk_kernel, halo=halo, limit=limit)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n * 9,), jnp.int32),
        grid=(2, n_chunks),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda ph, c: (c,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK * 9,), lambda ph, c: (c,), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((2 * n + 2,), jnp.int32),
            pltpu.SMEM((264,), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
        ],
        interpret=interpret,
    )(salcp)


def _salcp(data, n: int):
    """SA | clamped-adjacent-LCP << LCP_SHIFT in rank order (the walk
    kernel's input) — the vectorizable XLA half of the match stage."""
    levels = _num_levels(n)
    sa, ranks = _doubling_rounds(data, n, levels, store_levels=8)
    raw = _adjacent_lcp(sa, ranks, n)
    clamped = jnp.where(
        raw < MIN_MATCH_SIZE, 0, jnp.minimum(raw, MAX_MATCH_SIZE)
    ).astype(jnp.int32)
    lcp_at_rank = jnp.concatenate([jnp.zeros(1, jnp.int32), clamped])
    return sa | (lcp_at_rank << LCP_SHIFT)


@functools.partial(jax.jit, static_argnames=("n", "halo", "core_len", "interpret"))
def walk_core_kernel(data, n: int, halo: int, core_len: int, interpret: bool):
    """Drop-in twin of matchfinder_jax._core_kernel: data (n,) int32
    bytes+sentinels in the uniform segment layout; returns (lens, offs)
    (core_len, 8) uint16 + overflow (always False — the walk has no
    degenerate-input budget)."""
    salcp = _salcp(data, n)
    rows = _walk_pallas_call(salcp, n, halo, halo + core_len, interpret)
    rows = rows.reshape(n, 9)
    cnt = rows[:, 8:9]
    m = jnp.arange(NMATCHES_PER_OFFSET, dtype=jnp.int32)[None, :]
    packed = jnp.where(m < cnt, rows[:, :NMATCHES_PER_OFFSET], 0)
    sl = slice(halo, halo + core_len)
    lens = (packed[sl] >> 16).astype(jnp.uint16)
    offs = (packed[sl] & 0xFFFF).astype(jnp.uint16)
    return lens, offs, jnp.zeros((), jnp.bool_)


@functools.partial(jax.jit, static_argnames=("n",))
def _salcp_batch(bufs, n: int):
    return jax.vmap(lambda b: _salcp(b, n))(bufs)


@functools.partial(jax.jit, static_argnames=("n", "halo", "core_len"))
def _extract_batch(rows, n: int, halo: int, core_len: int):
    rows = rows.reshape(-1, n, 9)
    cnt = rows[:, :, 8:9]
    m = jnp.arange(NMATCHES_PER_OFFSET, dtype=jnp.int32)[None, None, :]
    packed = jnp.where(m < cnt, rows[:, :, :NMATCHES_PER_OFFSET], 0)
    sl = packed[:, halo : halo + core_len]
    return (sl >> 16).astype(jnp.uint16), (sl & 0xFFFF).astype(jnp.uint16)


def walk_chunk_kernel(bufs, n: int, halo: int, core_len: int,
                      interpret: bool | None = None):
    """Batched drop-in for matchfinder_jax._chunk_kernel on the walk
    path: bufs (B, n) int32 segment buffers → (lens, offs) (B, core_len,
    8) uint16 + overflow (B,) all-False. The SA+LCP half vmaps (sorts
    batch well); the walk kernel dispatches per segment (its scalar-core
    loop gains nothing from batching, and pallas vmap would reshuffle
    the grid under the kernel's program_id phases)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = bufs.shape[0]
    salcp = _salcp_batch(bufs, n)
    rows = jnp.stack([
        _walk_pallas_call(salcp[i], n, halo, halo + core_len, interpret)
        for i in range(B)
    ])
    lens, offs = _extract_batch(rows, n, halo, core_len)
    return lens, offs, jnp.zeros((B,), jnp.bool_)


def match_table_walk(window: np.ndarray, start: int, end: int,
                     interpret: bool | None = None) -> np.ndarray:
    """Whole-table convenience wrapper (tests): one segment per call,
    same contract as matchfinder.find_all_matches. The window must fit a
    single kernel segment (end ≤ MAX_N − padding)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = -(-end // CHUNK) * CHUNK
    buf = np.empty(n, dtype=np.int32)
    buf[:] = 256 + np.arange(n, dtype=np.int32)
    buf[:end] = np.asarray(window[:end], dtype=np.int32)
    lens, offs, _ = walk_core_kernel(
        jnp.asarray(buf), n, 0, end, interpret
    )
    lens = np.asarray(lens)[start:]  # rows below `start` are history
    offs = np.asarray(offs)[start:]
    table = np.zeros((end, NMATCHES_PER_OFFSET, 2), dtype=np.int32)
    table[start:, :, 0] = lens
    table[start:, :, 1] = offs
    table[:start] = 0
    return table
