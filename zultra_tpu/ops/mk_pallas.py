"""Pallas TPU kernels for the sequential halves of the batched Huffman
length construction (ops/entropy_jax): Moffat–Katajainen phases 1-2 and
the Kraft-sum length limiting.

Reference semantics: src/huffman/huffencoder.c:157-270 (MK in-place
two-queue merge + parent-chain depths) and :279-346 (Kraft repair).
The XLA scans in entropy_jax are exact but latency-bound — each of the
~287 steps pays per-op dispatch for a handful of O(B) gathers/scatters
(~70 µs/step on the v5e regardless of batch width), and the splitter
runs them under a vmapped lax.cond that executes BOTH its branches.
Here the whole ≤288-symbol working array lives in VMEM per 128-lane
group; queue-head reads and the consumed-node write resolve with
in-(8,128)-tile tpu.dynamic_gather sweeps, so a step costs ~0.2-0.8 µs
for 128 lanes.

The surrounding O(B·S)-parallel work stays in XLA where it is already
cheap: the (weight, symbol) and (length, symbol) sorts, MK phase 3's
closed form, and the scatter back to symbol order.

Bit-exactness: tests/test_mk_pallas.py fuzzes both kernels against the
XLA scans (interpret mode); the chip proof is the jaxdev parity suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _sweep_gather(aref, S, ptr, lanes=LANES):
    """a[ptr[lane], lane] for a VMEM-resident (S, L) ref and (1, L)
    pointers in [0, S): static sweep of S//8 tiles, one in-tile
    dynamic_gather + select each."""
    q = ptr >> 3
    r = jnp.broadcast_to(ptr & 7, (8, lanes))
    out = jnp.zeros((1, lanes), jnp.int32)
    for g in range(S // 8):
        tile = aref[g * 8 : g * 8 + 8, :]
        dg = jnp.take_along_axis(tile, r, axis=0)[0:1]
        out = jnp.where(q == g, dg, out)
    return out


def _sweep_scatter(aref, S, ptr, value, mask, lanes=LANES):
    """a[ptr[lane], lane] = value[lane] where mask — one-hot OR sweep."""
    q = ptr >> 3
    r = ptr & 7
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)
    for g in range(S // 8):
        m = mask & (q == g) & True
        sel = m & (iota8 == r)
        tile = aref[g * 8 : g * 8 + 8, :]
        aref[g * 8 : g * 8 + 8, :] = jnp.where(sel, value, tile)


def _mk12_kernel(n_used_ref, a_in_ref, a_ref):
    """MK phases 1+2 over a_ref (S, 128), seeded from the sorted weights
    in a_in_ref (row-major ascending; unused slots never read). The
    explicit copy-in matters: an output block's VMEM buffer holds
    GARBAGE until written (aliasing the HBM buffers does NOT seed it —
    it happens to with a single-step grid, which is why a G=1 test
    passes and G>1 corrupts)."""
    a_ref[:] = a_in_ref[:]
    S = a_ref.shape[0]
    n_used = n_used_ref[0:1, :]

    def pick(t, leaf, internal, w_acc, active):
        av_leaf = _sweep_gather(a_ref, S, jnp.clip(leaf, 0, S - 1))
        av_int = _sweep_gather(a_ref, S, jnp.clip(internal, 0, S - 1))
        take_int = ((leaf >= n_used) | ((internal < t) & (av_int < av_leaf))) & active
        w_acc = w_acc + jnp.where(take_int, av_int, av_leaf)
        _sweep_scatter(a_ref, S, jnp.clip(internal, 0, S - 1),
                       jnp.broadcast_to(t + 1, (8, LANES)), take_int)
        internal = internal + take_int.astype(jnp.int32)
        leaf = leaf + (active & ~take_int).astype(jnp.int32)
        return leaf, internal, w_acc

    def p1_body(t, carry):
        leaf, internal = carry
        active = t < n_used - 1
        w = jnp.zeros((1, LANES), jnp.int32)
        leaf, internal, w = pick(t, leaf, internal, w, active)
        leaf, internal, w = pick(t, leaf, internal, w, active)
        old = a_ref[pl.ds(t, 1), :]
        a_ref[pl.ds(t, 1), :] = jnp.where(active, w, old)
        return leaf, internal

    z = jnp.zeros((1, LANES), jnp.int32)
    jax.lax.fori_loop(0, S - 1, p1_body, (z, z))

    # phase 2: a[n_used-2] = 0 (root), then a[t] = a[a[t]-1] + 1 backward.
    root = jnp.clip(n_used - 2, 0, S - 1)
    _sweep_scatter(a_ref, S, root, jnp.zeros((8, LANES), jnp.int32),
                   jnp.ones((1, LANES), jnp.bool_))

    def p2_body(i, carry):
        t = S - 3 - i
        active = t <= n_used - 3
        parent = a_ref[pl.ds(t, 1), :] - 1
        pdepth = _sweep_gather(a_ref, S, jnp.clip(parent, 0, S - 1))
        old = a_ref[pl.ds(t, 1), :]
        a_ref[pl.ds(t, 1), :] = jnp.where(active, pdepth + 1, old)
        return carry

    jax.lax.fori_loop(0, S - 2, p2_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mk12_call(a0, n_used8, interpret: bool):
    """a0 (S, L) sorted weights, n_used8 (8, L). Returns the phase-2
    a-array (internal depths at t < n_used-1)."""
    S, L = a0.shape
    G = L // LANES
    return pl.pallas_call(
        _mk12_kernel,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, LANES), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(n_used8, a0)


def mk_phase12_pallas(a0, n_used, interpret: bool | None = None):
    """Batched MK phases 1+2: ``a0`` (B, S) weights sorted ascending
    (unused slots = anything larger than every real weight), ``n_used``
    (B,). Returns (B, S) — the in-place array after the parent-chain
    depth pass, identical to entropy_jax's phase-1/2 scans. S must be a
    multiple of 8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, S = a0.shape
    L = -(-B // LANES) * LANES
    aT = jnp.transpose(a0)
    n8 = jnp.broadcast_to(n_used[None, :], (8, B))
    if L != B:
        aT = jnp.pad(aT, ((0, 0), (0, L - B)))
        n8 = jnp.pad(n8, ((0, 0), (0, L - B)))  # n_used 0 → inactive lanes
    out = _mk12_call(aT, n8, interpret)
    return jnp.transpose(out[:, :B])


def _kraft_kernel(n_used_ref, kraft_ref, maxlen_ref, lens_in_ref, lens_ref):
    """Kraft repair over lens_ref (S, 128), seeded from lens_in_ref =
    lengths clamped to max_len, sorted by (length, symbol) ascending;
    kraft_ref row 0 holds the initial Kraft sum. Explicit copy-in — see
    _mk12_kernel."""
    lens_ref[:] = lens_in_ref[:]
    S = lens_ref.shape[0]
    n_used = n_used_ref[0:1, :]
    max_len = maxlen_ref[0:1, :]
    full = jnp.int32(1) << max_len

    def flog2(x):
        # floor(log2(x)) for 1 ≤ x < 2^24 via the f32 exponent.
        f = x.astype(jnp.float32)
        bits = jax.lax.bitcast_convert_type(f, jnp.int32)
        return (bits >> 23) - 127

    # Phase A: lengthen rarest (descending position) while kraft > full.
    def lengthen(i, kraft):
        p = S - 1 - i
        l = lens_ref[pl.ds(p, 1), :]
        active = (p < n_used) & (kraft > full) & (l < max_len)
        r = (full >> l) - (kraft - full)
        l_new = jnp.where(
            r <= 0, max_len, jnp.maximum(l, max_len - flog2(jnp.maximum(r, 1)))
        )
        l_new = jnp.where(active, jnp.minimum(l_new, max_len), l)
        kraft = kraft - (full >> l) + (full >> l_new)
        lens_ref[pl.ds(p, 1), :] = l_new
        return kraft

    kraft = jax.lax.fori_loop(0, S, lengthen, kraft_ref[0:1, :])

    # Phase B: re-shorten most frequent (ascending) while room remains.
    def shorten(p, kraft):
        l = lens_ref[pl.ds(p, 1), :]
        active = p < n_used
        u = full >> l
        m = jnp.maximum(full - kraft, 0) // jnp.maximum(u, 1)
        d = jnp.where(active, flog2(m + 1), 0)
        d = jnp.minimum(d, jnp.maximum(l - 1, 0))
        kraft = kraft + u * ((jnp.int32(1) << d) - 1)
        lens_ref[pl.ds(p, 1), :] = l - d
        return kraft

    jax.lax.fori_loop(0, S, shorten, kraft)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kraft_call(clamped, n_used8, kraft8, maxlen8, interpret: bool):
    S, L = clamped.shape
    G = L // LANES
    return pl.pallas_call(
        _kraft_kernel,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, LANES), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(n_used8, kraft8, maxlen8, clamped)


def kraft_limit_pallas(clamped_sorted, n_used, kraft0, max_len: int,
                       interpret: bool | None = None):
    """Batched Kraft repair: ``clamped_sorted`` (B, S) lengths (already
    min(·, max_len), sorted by (length, symbol) ascending, unused slots
    arbitrary), ``n_used`` (B,), ``kraft0`` (B,) the initial Kraft sum of
    the clamped lengths. Returns (B, S) repaired sorted lengths —
    identical to entropy_jax.limited_lengths' lengthen/shorten scans."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, S = clamped_sorted.shape
    L = -(-B // LANES) * LANES
    cT = jnp.transpose(clamped_sorted)
    n8 = jnp.broadcast_to(n_used[None, :], (8, B))
    k8 = jnp.broadcast_to(kraft0[None, :], (8, B))
    m8 = jnp.full((8, B), max_len, jnp.int32)
    if L != B:
        pad = ((0, 0), (0, L - B))
        cT = jnp.pad(cT, pad, constant_values=1)
        n8 = jnp.pad(n8, pad)
        k8 = jnp.pad(k8, pad)
        m8 = jnp.pad(m8, pad, constant_values=max_len)
    out = _kraft_call(cT, n8, k8, m8, interpret)
    return jnp.transpose(out[:, :B])
