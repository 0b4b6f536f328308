import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(f, *a, iters=5):
    r = f(*a); jax.block_until_ready(r); np.asarray(r).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    np.asarray(r).ravel()[0]
    return (time.perf_counter()-t0)/iters

# XLA elementwise on 67MB
x = jnp.ones((131072,128), jnp.int32)
f = jax.jit(lambda x: x + 1)
dt = timeit(f, x)
print(f"XLA add 67MB: {dt*1e3:.2f} ms -> {2*x.size*4/dt/1e9:.1f} GB/s")

# pallas copy, various block shapes
def pallas_copy(shape, block, grid):
    def k(i_ref, o_ref):
        o_ref[:] = i_ref[:] + 1
    x = jnp.ones(shape, jnp.int32)
    nb = [s//b for s,b in zip(shape, block)]
    f = jax.jit(lambda x: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(block, lambda c: (c,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, lambda c: (c,0), memory_space=pltpu.VMEM),
    )(x))
    dt = timeit(f, x)
    tot = np.prod(shape)*4*2
    print(f"pallas {shape} block {block}: {dt*1e3:.2f} ms -> {tot/dt/1e9:.2f} GB/s")

pallas_copy((131072,128), (512,128), (256,))
pallas_copy((32768,512), (128,512), (256,))
pallas_copy((8192,2048), (32,2048), (256,))
pallas_copy((8192,2048), (256,2048), (32,))
pallas_copy((1024,16384), (256,16384), (4,))
