"""Isolate where DP kernel time goes: XLA prep vs pallas kernel vs post,
and within the kernel: shorts vs longs vs framework."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from zultra_tpu.ops import dp_pallas as D
from zultra_tpu.constants import NLITERALSYMS, NOFFSETSYMS

rng = np.random.default_rng(1)
N, B = 131072, 16

def make_case(n_pad, B, match_density=0.5):
    win = rng.integers(0, 256, (B, n_pad), dtype=np.uint8)
    mlens = np.zeros((B, n_pad, 8), np.int32)
    moffs = np.ones((B, n_pad, 8), np.int32)
    has = rng.random((B, n_pad, 8)) < match_density
    mlens[has] = rng.integers(3, 259, has.sum())
    moffs[has] = rng.integers(1, 32769, has.sum())
    order = np.argsort(-mlens, axis=2, kind="stable")
    mlens = np.take_along_axis(mlens, order, axis=2)
    moffs = np.take_along_axis(moffs, order, axis=2)
    ll = rng.integers(1, 15, (B, NLITERALSYMS)).astype(np.int32)
    ol = rng.integers(1, 15, (B, NOFFSETSYMS)).astype(np.int32)
    lengths = np.full(B, n_pad, np.int32)
    return (jnp.asarray(ll), jnp.asarray(ol), jnp.asarray(win),
            jnp.asarray(mlens), jnp.asarray(moffs), jnp.asarray(lengths))

args = make_case(N, B)

@functools.partial(jax.jit, static_argnames=("n_pad",))
def prep_only(lit_lens, off_lens, window, mlens, moffs, length, n_pad):
    return jax.vmap(
        lambda a, b, c, d, e, f: D._prep_lane(a, b, c, d, e, f, n_pad),
        out_axes=(-1, -1, -1, -1),
    )(lit_lens, off_lens, window, mlens, moffs, length)

def t(fn, *a, iters=3, tag=""):
    out = fn(*a); jax.block_until_ready(out)
    r = jax.tree_util.tree_leaves(out)[0]; np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter()-t0)/iters
    print(f"{tag}: {dt*1e3:.1f} ms")
    return out, dt

prep, _ = t(prep_only, *args, N, tag="prep (B=16)")
lit, p1, p2, v40 = prep
lit = jnp.pad(lit, ((0,0),(0,112))); p1 = jnp.pad(p1, ((0,0),(0,0),(0,112)), constant_values=0x7FFF)
p2 = jnp.pad(p2, ((0,0),(0,0),(0,112)), constant_values=0x7FFF); v40 = jnp.pad(v40, ((0,0),(0,112)), constant_values=D.BIG)
lit, p1, p2, v40 = map(jax.block_until_ready, (lit, p1, p2, v40))

_, dt = t(lambda: D._dp_pallas_call(lit, p1, p2, v40, N, False), tag="pallas kernel only")
print(f"  -> {dt/N*1e9:.0f} ns/step")

# kernel variants: strip parts
def variant(name, no_shorts=False, no_longs=False, chunk=512):
    def k(p0_ref, p1_ref, p2_ref, varlen_ref, out_ref, buf):
        c = pl.program_id(1)
        @pl.when(c == 0)
        def _():
            buf[:] = jnp.zeros((D.RING_ROWS, D.LANES), jnp.int32)
        n_oct = p0_ref.shape[0] // 8
        varlen40 = varlen_ref[:]
        miota = jax.lax.broadcasted_iota(jnp.int32, (8, D.LANES), 0)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (40, D.LANES), 0)
        kpack = 63 - (kiota + 3)
        def octave(oo, carry):
            o = n_oct - 1 - oo
            base = o * 8
            lit8 = p0_ref[pl.ds(base, 8), :]
            P1 = p1_ref[pl.ds(base, 8), :, :]
            P2 = p2_ref[pl.ds(base, 8), :, :]
            for w in range(7, -1, -1):
                p1v = P1[w]; p2v = P2[w]
                osz = p1v & 0xFFFF; sc = p1v >> 16
                lcs = p2v & 0xFFFF; cl = p2v >> 16
                if not no_shorts:
                    ring40 = buf[w+3:w+43, :]
                    x = jnp.minimum(varlen40 + ring40, D.CLAMPX)
                    pm = x * 64 + kpack
                    for s in (1,2,4,8,16,32):
                        pm = jnp.minimum(pm, jnp.concatenate([jnp.full((s, D.LANES), D.BIG, jnp.int32), pm[:40-s]], axis=0))
                    t2 = jnp.maximum(sc-3, 0); q2 = t2>>3; r2 = t2&7
                    wg = jnp.full((8, D.LANES), D.BIG, jnp.int32)
                    for g in range(5):
                        dg = jnp.take_along_axis(pm[g*8:g*8+8, :], r2, axis=0)
                        wg = jnp.where(q2 == g, dg, wg)
                    kpick = 63 - (wg & 63)
                    cand_s = jnp.where(sc >= 3, (wg >> 6) + osz, D.INF)
                else:
                    kpick = jnp.zeros((8, D.LANES), jnp.int32)
                    cand_s = jnp.full((8, D.LANES), D.INF, jnp.int32)
                if not no_longs:
                    tgt = cl + w; q = tgt>>3; r = tgt&7
                    gl = jnp.zeros((8, D.LANES), jnp.int32)
                    for g in range(5, 34):
                        dg = jnp.take_along_axis(buf[g*8:g*8+8, :], r, axis=0)
                        gl = jnp.where(q == g, dg, gl)
                    fut_l = jnp.where(cl < 40, 0, gl)
                    cand_l = jnp.where(lcs != 0x7FFF, lcs + fut_l, D.INF)
                else:
                    cand_l = jnp.full((8, D.LANES), D.INF, jnp.int32)
                cand = jnp.minimum(cand_s, cand_l)
                lenc = jnp.where(lcs != 0x7FFF, cl, kpick)
                litc = lit8[w:w+1] + buf[w+1:w+2, :]
                key = jnp.minimum(jnp.min(cand*16 + (miota+1), axis=0, keepdims=True), litc*16)
                mcode = key & 15
                mrow = jnp.maximum(mcode-1, 0)
                lsel = jnp.take_along_axis(lenc, jnp.broadcast_to(mrow, (8, D.LANES)), axis=0)[0:1]
                buf[w:w+1, :] = key >> 4
                out_ref[pl.ds(base+w, 1), :] = jnp.where(mcode > 0, lsel, 0) | (mcode << 9)
            tmp = buf[0:D.RING_ROWS-8, :]
            buf[8:D.RING_ROWS, :] = tmp
            return carry
        jax.lax.fori_loop(0, n_oct, octave, 0)

    n_chunks = N // chunk
    f = jax.jit(lambda a,b,c,d: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        grid=(1, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk,128), lambda g,c: (n_chunks-1-c, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,8,128), lambda g,c: (n_chunks-1-c,0,g), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,8,128), lambda g,c: (n_chunks-1-c,0,g), memory_space=pltpu.VMEM),
            pl.BlockSpec((40,128), lambda g,c: (0,g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk,128), lambda g,c: (n_chunks-1-c, g), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((D.RING_ROWS,128), jnp.int32)],
    )(a,b,c,d))
    _, dt = t(f, lit, p1, p2, v40, tag=name)
    print(f"  -> {dt/N*1e9:.0f} ns/step")

variant("no shorts", no_shorts=True)
variant("no longs", no_longs=True)
variant("neither", no_shorts=True, no_longs=True)
variant("full chunk=4096", chunk=4096)
