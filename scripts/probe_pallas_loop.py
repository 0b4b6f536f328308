"""Probe 2: per-iteration cost of a long sequential fori_loop in a Pallas
kernel with a VMEM scratch ring -- the floor for the DP kernel design.
Also: cost of dynamic sublane slice + dynamic_gather inside the loop."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_STEPS = 131072
L = 128


def bench(name, kernel, n_iter=3, **kw):
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((272, L), jnp.int32)],
        **kw,
    )(x))
    x = jnp.asarray(np.random.randint(0, 100, (8, L)), jnp.int32)
    r = f(x); np.asarray(r)  # warm
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = f(x)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{name}: {dt*1e3:.2f} ms total, {dt/N_STEPS*1e9:.1f} ns/step")


# 1. Minimal loop: one add per step
def k_min(x_ref, o_ref, buf):
    def body(i, acc):
        return acc + x_ref[:]
    o_ref[:] = jax.lax.fori_loop(0, N_STEPS, body, jnp.zeros((8, L), jnp.int32))

# 2. Loop with ~10 VPU ops on (40,128)-ish data held in carry
def k_vpu(x_ref, o_ref, buf):
    def body(i, acc):
        a = acc + x_ref[:]
        b = jnp.minimum(a, acc * 3)
        c = b ^ a
        d = jnp.maximum(c, b - 7)
        return jnp.minimum(d, a + b)
    o_ref[:] = jax.lax.fori_loop(0, N_STEPS, body, jnp.zeros((8, L), jnp.int32))

# 3. Loop with dynamic sublane slice read+write on scratch (the sliding buffer)
def k_dyn(x_ref, o_ref, buf):
    buf[:] = jnp.zeros((272, L), jnp.int32)
    def body(i, acc):
        t = 263 - (i % 264)
        w = buf[pl.ds(t + 1, 8), :]           # dynamic unaligned read
        v = jnp.min(w, axis=0, keepdims=True) + acc[0:1]
        buf[pl.ds(t, 1), :] = v               # dynamic row write
        return acc + 1
    acc = jax.lax.fori_loop(0, N_STEPS, body, jnp.zeros((8, L), jnp.int32))
    o_ref[:] = acc + buf[0:8, :]

# 4. Loop with one in-tile dynamic_gather per step
def k_gather(x_ref, o_ref, buf):
    def body(i, acc):
        idx = jnp.clip(acc & 7, 0, 7)
        g = jnp.take_along_axis(x_ref[:], idx, axis=0)
        return acc + g
    o_ref[:] = jax.lax.fori_loop(0, N_STEPS, body, jnp.zeros((8, L), jnp.int32))

# 5. Loop emulating full DP step cost: 29 gathers+selects + 37-row static work
def k_dpish(x_ref, o_ref, buf):
    buf[:] = jnp.ones((272, L), jnp.int32)
    def body(i, acc):
        t = 200 - (i % 200)
        # shorts: unaligned 40-row dynamic read + min-reduce
        w = buf[pl.ds(t + 3, 40), :]
        short = jnp.min(w + acc[0:1], axis=0, keepdims=True)
        # longs: 29-group loop, static tiles + gather + select
        idx = (acc & 7)
        best = jnp.full((8, L), 1 << 27, jnp.int32)
        for g in range(5, 34):
            tile = buf[g*8:(g+1)*8, :]
            dg = jnp.take_along_axis(tile, idx, axis=0)
            sel = (acc & 31) == (g & 31)
            best = jnp.where(sel, jnp.minimum(best, dg), best)
        long_ = jnp.min(best, axis=0, keepdims=True)
        v = jnp.minimum(short, long_)
        buf[pl.ds(t, 1), :] = v
        return acc + v[0:1]
    acc = jax.lax.fori_loop(0, N_STEPS, body, jnp.zeros((8, L), jnp.int32))
    o_ref[:] = acc

for name, k in [("minimal", k_min), ("vpu10", k_vpu), ("dynslice", k_dyn),
                ("gather1", k_gather), ("dp-ish", k_dpish)]:
    try:
        bench(name, k)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
