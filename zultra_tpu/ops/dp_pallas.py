"""Pallas TPU kernel for the optimal-parse cost DP — the VMEM-resident
counter-experiment to the XLA scan (ops/parse_wavefront._dp_scan_cost).

Semantics replicate reference src/blockdeflate.c:254-323 exactly (literal
vs match with truncated lengths below LEAVE_ALONE_MATCH_SIZE, offset bit
costs under current code lengths, strict-improvement tie-breaking), and
the selection scan src/blockdeflate.c:269-322's order (literal first,
matches in slot order, larger truncation wins in-match ties).

Why a kernel: the XLA scan pays per-step dispatch latency ~n times per
block (docs/ARCHITECTURE.md §6 measured 4.29 s per 128 KiB block on the
v5e); here the whole 259-deep dependency ring lives in a VMEM scratch and
the sequential loop runs on-core at ~150-250 ns/position for 128 block
lanes at once.

Formulation per backward step (position p, all math per 128-lane register):
  * shorts (truncations k = 3..39): the per-k cheapest-offset prefix-min
    collapses to  min_m ( osize[m] + W[sc[m]] )  where
    W[j] = min_{3<=k<=j} (varlen_k + cost[p+k]) — ONE packed
    (value<<6 | 63-k) prefix-min over 40 ring rows per step, so the
    in-match tie-break (largest k) rides the pack for free.
  * longs (full length >= 40): cost[p+clamped] via tpu.dynamic_gather —
    the in-(8,128)-tile gather — over a static group sweep of the ring
    rows [p+40, p+266). Long matches clamped below 40 by the block end
    always land exactly ON the block end (clamped = remaining there), so
    their future cost is the boundary 0 and they skip the gather.
  * literal: lit_cost + cost[p+1] (static row).
  * winner: one packed (cost*16 | candidate-index) min — index order
    literal, m=0..7 — reproduces the reference's strict-improvement scan.

The kernel emits (chosen_len | slot<<9) per position; offsets rematerialize
outside as an 8-way select over the match table (no gather). Cost buffer
rows beyond the block stay 0, which is the DP boundary condition, so
per-lane lengths need no in-kernel masking (padding lanes carry
lit=0 / INF statics and produce all-zero plans).

Bit-exactness: tests/test_dp_pallas.py proves byte parity against the
scan DP + _select_pass and the host oracle on fuzz corpora (interpret
mode on CPU; scripts/measure_dp_pallas.py re-proves on the real chip).
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
    LEAVE_ALONE_MATCH_SIZE,
    MIN_MATCH_SIZE,
    NMATCHES_PER_OFFSET,
)
from .parse_wavefront import _varlen_tables

INF = 1 << 26
INF16 = 0x7FFF
BIG = 1 << 30
CLAMPX = (1 << 24) - 1
LANES = 128
RING_ROWS = 272  # 34 sublane tiles: max tap is row 7 + 258 = 265
CHUNK = 512  # positions per grid step (multiple of 8)


def _dp_kernel(p0_ref, p1_ref, p2_ref, varlen_ref, out_ref, buf):
    """One lane-group × one backward chunk of the DP.

    p0: (C, 128) literal bit costs; p1: (C, 8, 128) sc<<16|osize (shorts,
    osize=INF16 if the slot is not a short match); p2: (C, 8, 128)
    clamped<<16|lcs (longs, lcs=INF16 if not long); varlen: (40, 128)
    varlen_k for k=3..39 (rows 37..39 = BIG). buf: (272, 128) VMEM cost
    ring; row r holds cost[p_cur + r] in the current octave frame.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        buf[:] = jnp.zeros((RING_ROWS, LANES), jnp.int32)

    n_oct = p0_ref.shape[0] // 8
    varlen40 = varlen_ref[:]
    miota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (40, LANES), 0)
    kpack = 63 - (kiota + MIN_MATCH_SIZE)

    def octave(oo, carry):
        o = n_oct - 1 - oo
        base = o * 8
        lit8 = p0_ref[pl.ds(base, 8), :]
        P1 = p1_ref[pl.ds(base, 8), :, :]
        P2 = p2_ref[pl.ds(base, 8), :, :]

        for w in range(7, -1, -1):
            p1 = P1[w]
            p2 = P2[w]
            osz = p1 & 0xFFFF
            sc = p1 >> 16
            lcs = p2 & 0xFFFF
            cl = p2 >> 16

            # --- shorts: packed prefix-min of varlen_k + ring[k] ---
            ring40 = buf[w + MIN_MATCH_SIZE : w + MIN_MATCH_SIZE + 40, :]
            x = jnp.minimum(varlen40 + ring40, CLAMPX)
            pm = x * 64 + kpack
            for s in (1, 2, 4, 8, 16, 32):
                shifted = jnp.concatenate(
                    [jnp.full((s, LANES), BIG, jnp.int32), pm[: 40 - s]], axis=0
                )
                pm = jnp.minimum(pm, shifted)
            t2 = jnp.maximum(sc - MIN_MATCH_SIZE, 0)
            q2 = t2 >> 3
            r2 = t2 & 7
            wg = jnp.full((8, LANES), BIG, jnp.int32)
            for g in range(5):
                dg = jnp.take_along_axis(pm[g * 8 : g * 8 + 8, :], r2, axis=0)
                wg = jnp.where(q2 == g, dg, wg)
            kpick = 63 - (wg & 63)
            cand_s = jnp.where(sc >= MIN_MATCH_SIZE, (wg >> 6) + osz, INF)

            # --- longs: dynamic_gather group sweep over ring rows ---
            tgt = cl + w
            q = tgt >> 3
            r = tgt & 7
            gl = jnp.zeros((8, LANES), jnp.int32)
            for g in range(5, 34):
                dg = jnp.take_along_axis(buf[g * 8 : g * 8 + 8, :], r, axis=0)
                gl = jnp.where(q == g, dg, gl)
            valid_l = lcs != INF16
            fut_l = jnp.where(cl < LEAVE_ALONE_MATCH_SIZE, 0, gl)
            cand_l = jnp.where(valid_l, lcs + fut_l, INF)

            # --- merge per slot (a slot is short xor long), fold winner ---
            cand = jnp.minimum(cand_s, cand_l)
            lenc = jnp.where(valid_l, cl, kpick)
            litc = lit8[w : w + 1] + buf[w + 1 : w + 2, :]
            key = jnp.minimum(
                jnp.min(cand * 16 + (miota + 1), axis=0, keepdims=True),
                litc * 16,
            )
            mcode = key & 15
            mrow = jnp.maximum(mcode - 1, 0)
            lsel = jnp.take_along_axis(lenc, jnp.broadcast_to(mrow, (8, LANES)), axis=0)[0:1]
            buf[w : w + 1, :] = key >> 4
            out_ref[pl.ds(base + w, 1), :] = (
                jnp.where(mcode > 0, lsel, 0) | (mcode << 9)
            )

        # Re-frame the ring for the next (lower) octave.
        tmp = buf[0 : RING_ROWS - 8, :]
        buf[8:RING_ROWS, :] = tmp
        return carry

    jax.lax.fori_loop(0, n_oct, octave, 0)


@functools.partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _dp_pallas_call(p0, p1, p2, varlen40, n_pad: int, interpret: bool):
    """p0 (n, L), p1/p2 (n, 8, L), varlen40 (40, L) with L a multiple of
    128. Returns packed choices (n, L) int32: chosen_len | slot<<9
    (slot 0 = literal)."""
    L = p0.shape[1]
    G = L // LANES
    chunk = min(CHUNK, n_pad)
    n_chunks = n_pad // chunk

    grid = (G, n_chunks)
    return pl.pallas_call(
        _dp_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, L), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, LANES), lambda g, c: (n_chunks - 1 - c, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8, LANES), lambda g, c: (n_chunks - 1 - c, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8, LANES), lambda g, c: (n_chunks - 1 - c, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((40, LANES), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, LANES), lambda g, c: (n_chunks - 1 - c, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((RING_ROWS, LANES), jnp.int32)],
        interpret=interpret,
    )(p0, p1, p2, varlen40)


def _prep_lane(ll, ol, window, mlens, moffs, length, n_pad: int):
    """Per-lane packed statics for the kernel (all fused elementwise —
    the same decision flow as parse_wavefront._prep)."""
    from .symbol_map import (
        matchlen_sym_extra_base,
        offset_sym_extra_base,
        select_by_symbol,
    )

    _, _, varlen_by_e = _varlen_tables(ll)

    idx = jnp.arange(n_pad, dtype=jnp.int32)
    in_block = idx < length
    remaining = jnp.maximum(length - idx, 0)
    lit = jnp.where(in_block, ll[window.astype(jnp.int32)], 0)

    valid = mlens >= MIN_MATCH_SIZE
    clamped = jnp.minimum(mlens, remaining[:, None])
    oidx_raw = moffs - 1
    oidx = jnp.where(oidx_raw < 256, oidx_raw, 256 + ((oidx_raw - 256) >> 7))
    oidx = jnp.clip(oidx, 0, 511)
    osym, oextra, _ = offset_sym_extra_base(oidx)
    osize = select_by_symbol(ol, osym, 0, 30, 0) + oextra

    long_mask = valid & (mlens >= LEAVE_ALONE_MATCH_SIZE)
    short_mask = valid & (mlens < LEAVE_ALONE_MATCH_SIZE)

    sc = jnp.where(short_mask, clamped, 0)
    osz16 = jnp.where(short_mask, osize, INF16)
    p1 = (sc << 16) | osz16

    e_raw = clamped - MIN_MATCH_SIZE
    e = jnp.where((e_raw < 0) | (e_raw > 255), 255, e_raw)
    lsym, lextra, _ = matchlen_sym_extra_base(e)
    varlen_e = select_by_symbol(ll, lsym, 257, 286, 0) + lextra
    lcs16 = jnp.where(long_mask, varlen_e + osize, INF16)
    cl = jnp.where(long_mask, clamped, 0)
    p2 = (cl << 16) | lcs16

    varlen40 = jnp.concatenate(
        [varlen_by_e[: LEAVE_ALONE_MATCH_SIZE - MIN_MATCH_SIZE],
         jnp.full((3,), BIG, jnp.int32)]
    )
    return lit, p1, p2, varlen40


def run_dp_pallas(lit_lens, off_lens, window, mlens, moffs, length, n_pad: int,
                  interpret: bool | None = None):
    """Batched DP with the same contract as block_jax._run_dp: inputs
    (B, ...) arrays, returns (best_len, best_off) each (B, n_pad) int32.
    Lanes pad to a multiple of 128 inside; padding lanes plan to zeros.
    ``interpret`` defaults to True off-TPU (Pallas interpreter) so the
    kernel is testable on the CPU suite."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = window.shape[0]
    L = -(-B // LANES) * LANES

    lit, p1, p2, varlen40 = jax.vmap(
        lambda a, b, c, d, e, f: _prep_lane(a, b, c, d, e, f, n_pad),
        out_axes=(-1, -1, -1, -1),
    )(lit_lens, off_lens, window, mlens, moffs, length)

    if L != B:
        pad = L - B
        lit = jnp.pad(lit, ((0, 0), (0, pad)))
        p1 = jnp.pad(p1, ((0, 0), (0, 0), (0, pad)), constant_values=INF16)
        p2 = jnp.pad(p2, ((0, 0), (0, 0), (0, pad)), constant_values=INF16)
        varlen40 = jnp.pad(varlen40, ((0, 0), (0, pad)), constant_values=BIG)

    out = _dp_pallas_call(lit, p1, p2, varlen40, n_pad, interpret)

    v = out[:, :B].T  # (B, n_pad)
    best_len = v & 511
    mcode = v >> 9
    best_off = jnp.zeros_like(best_len)
    for m in range(NMATCHES_PER_OFFSET):
        best_off = jnp.where(mcode == m + 1, moffs[:, :, m], best_off)
    return best_len, best_off
