"""VERDICT r4 item 8: measure a Pallas alternative to the XLA sort that
the SA doubling rounds are built on, at window scale — so the
"lax.sort is the right tool" design choice is a number, not a
presumption.

The alternative: a full bitonic sort network over a VMEM-resident
(1024, 128) int32 array (n = 2^17, one window). XOR-pattern exchanges
use two pltpu.rolls + a parity select per stage (lane-dim rolls for
distances < 128, sublane-dim rolls above); 153 stages total."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("platform:", jax.devices()[0].platform, flush=True)

R, C = 1024, 128
N = R * C


def _bitonic_kernel(x_ref, o_ref):
    v = x_ref[:]
    riota = lax.broadcasted_iota(jnp.int32, (R, C), 0)
    liota = lax.broadcasted_iota(jnp.int32, (R, C), 1)
    idx = riota * C + liota

    k = 2
    while k <= N:
        dirm = (idx & k) == 0
        j = k >> 1
        while j >= 1:
            if j < C:
                pv_clear = pltpu.roll(v, C - j, axis=1)
                pv_set = pltpu.roll(v, j, axis=1)
                pv = jnp.where((liota & j) == 0, pv_clear, pv_set)
                up = (liota & j) == 0
            else:
                jr = j // C
                pv_clear = pltpu.roll(v, R - jr, axis=0)
                pv_set = pltpu.roll(v, jr, axis=0)
                pv = jnp.where((riota & jr) == 0, pv_clear, pv_set)
                up = (riota & jr) == 0
            lo = jnp.minimum(v, pv)
            hi = jnp.maximum(v, pv)
            v = jnp.where(up == dirm, lo, hi)
            j >>= 1
        k <<= 1
    o_ref[:] = v


@jax.jit
def bitonic_sort(x):
    return pl.pallas_call(
        _bitonic_kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


@jax.jit
def xla_sort(x):
    return lax.sort(x.reshape(-1)).reshape(R, C)


def timeit(f, x, iters=20):
    r = f(x); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(x)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
data = rng.integers(0, 1 << 22, (R, C), dtype=np.int32)
x = jnp.asarray(data)

out = np.asarray(bitonic_sort(x)).reshape(-1)
ok = np.array_equal(out, np.sort(data.reshape(-1)))
print("bitonic correct:", ok, flush=True)

t_b = timeit(bitonic_sort, x)
t_x = timeit(xla_sort, x)
print(f"bitonic pallas: {t_b*1e3:.3f} ms  ({N/t_b/1e6:.0f} Melem/s)")
print(f"lax.sort:       {t_x*1e3:.3f} ms  ({N/t_x/1e6:.0f} Melem/s)")
print(f"ratio: {t_x/t_b:.2f}x (pallas vs xla)")

# The doubling round's real shape: a 2-key sort carrying a payload.
@jax.jit
def xla_sort2(a, b, c):
    return lax.sort((a, b, c), num_keys=2)


a = jnp.asarray(rng.integers(0, 1 << 22, N, dtype=np.int32))
b = jnp.asarray(rng.integers(0, 1 << 22, N, dtype=np.int32))
c = jnp.asarray(np.arange(N, dtype=np.int32))


def t2(x):
    return xla_sort2(a, b, c)


t_x2 = timeit(t2, None)
print(f"lax.sort 2-key+payload (the doubling round): {t_x2*1e3:.3f} ms")
