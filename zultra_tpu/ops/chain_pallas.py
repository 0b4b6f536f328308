"""Pallas TPU kernel for the greedy token chain walk.

The token walk next(i) = i + step[i] (step = match length, or 1 for a
literal — reference src/blockdeflate.c:333-361's token boundaries) is a
strictly forward, monotone pointer chase with hops ≤ 258. The XLA
formulation (split_jax._token_structure / block_jax._chain_mask) resolves
it with ~18 pointer-doubling rounds, each a full-size HBM gather+scatter
— the begin-phase's single most expensive recurring computation on the
v5e (the ~94 Melem/s random-gather floor × 18 rounds × every convergence
pass; docs/ARCHITECTURE.md §6).

Here the walk runs as a sequential on-core loop: step values stream
through VMEM in chunks, each of up to 128 independent lanes (windows or
blocks) carries its cursor in scratch, and every loop trip advances every
lane one hop — the hop's step value is read with an in-(8,128)-tile
tpu.dynamic_gather group sweep, and the visited mark is set by a one-hot
OR into the output block during the same sweep. Lanes whose cursor has
left the current chunk idle until the grid catches up (the while-loop
exits when no lane remains inside the chunk), and lanes past their block
length park on a sentinel so padding never grinds the loop.

Bit-equivalence with the doubling form is exact: both produce the set of
chain positions from ``start``; tests/test_chain_pallas.py fuzzes them
against each other (interpret mode; the chip re-proof is the jaxdev
parity suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 256


def _chain_kernel(start_ref, length_ref, step_ref, out_ref, cur):
    """One lane-group × one forward chunk of the walk. start/length:
    (8, 128) int32 (row 0 live); step: (C, 128); out: (C, 128) marks."""
    c = pl.program_id(1)
    C = step_ref.shape[0]
    n_total = C * pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        s = start_ref[0:1, :]
        ln = length_ref[0:1, :]
        cur[0:1, :] = jnp.where(s < ln, s, n_total)

    base = c * C
    chunk_end = base + C
    length = length_ref[0:1, :]
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

    out_ref[:] = jnp.zeros((C, LANES), jnp.int32)

    def cond(cu):
        return jnp.any(cu < chunk_end)

    def body(cu):
        local = cu - base
        q = local >> 3
        r = jnp.broadcast_to(local & 7, (8, LANES))
        active = (cu >= base) & (cu < chunk_end)
        val = jnp.ones((1, LANES), jnp.int32)
        for g in range(C // 8):
            tile = step_ref[g * 8 : g * 8 + 8, :]
            sel = active & (q == g)
            dg = jnp.take_along_axis(tile, r, axis=0)[0:1]
            val = jnp.where(sel, dg, val)
            oh = jnp.where(sel & (iota8 == r), 1, 0)
            out_ref[g * 8 : g * 8 + 8, :] = out_ref[g * 8 : g * 8 + 8, :] | oh
        nxt = cu + jnp.maximum(val, 1)
        nxt = jnp.where(active, nxt, cu)
        return jnp.where(nxt >= length, n_total, nxt)

    cur[0:1, :] = jax.lax.while_loop(cond, body, cur[0:1, :])


@functools.partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _chain_pallas_call(start, length, step, n_pad: int, interpret: bool):
    """start/length (8, L), step (n, L), L a multiple of 128. Returns
    marks (n, L) int32 (1 at chain positions in [start, length))."""
    L = step.shape[1]
    G = L // LANES
    chunk = min(CHUNK, n_pad)
    n_chunks = n_pad // chunk

    return pl.pallas_call(
        _chain_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, L), jnp.int32),
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda g, c: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda g, c: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, LANES), lambda g, c: (c, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, LANES), lambda g, c: (c, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.int32)],
        interpret=interpret,
    )(start, length, step)


def chain_marks_pallas(step, start, length, n_pad: int,
                       interpret: bool | None = None):
    """Batched chain marks: ``step`` (B, n_pad) int32 hop sizes (≥1),
    ``start``/``length`` (B,) int32. Returns (B, n_pad) bool — True at
    every chain position p (start ≤ p < length) of the walk
    p₀ = start, pₖ₊₁ = pₖ + step[pₖ]. Same contract as the
    pointer-doubling mask (walk positions only; callers apply their own
    range masks)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = step.shape[0]
    L = -(-B // LANES) * LANES

    stepT = jnp.transpose(step)
    s8 = jnp.broadcast_to(start[None, :], (8, B))
    l8 = jnp.broadcast_to(length[None, :], (8, B))
    if L != B:
        pad = L - B
        stepT = jnp.pad(stepT, ((0, 0), (0, pad)), constant_values=1)
        s8 = jnp.pad(s8, ((0, 0), (0, pad)))
        l8 = jnp.pad(l8, ((0, 0), (0, pad)))  # length 0 → lane parks

    marks = _chain_pallas_call(s8, l8, stepT, n_pad, interpret)
    return jnp.transpose(marks[:, :B]) == 1
