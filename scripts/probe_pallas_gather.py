"""Probe: does tpu.dynamic_gather (take_along_axis axis=0) compile in Pallas
on this chip, for (8,128) and (264,128) shapes? Correctness + rough timing."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_gather(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def run(rows, cols=128, iters=200):
    x = jnp.asarray(np.random.randint(0, 1000, (rows, cols)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, rows, (rows, cols)), jnp.int32)

    f = jax.jit(lambda x, idx: pl.pallas_call(
        k_gather,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx))
    out = np.asarray(f(x, idx))
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    ok = np.array_equal(out, ref)
    print(f"rows={rows}: correct={ok}")
    return ok


for rows in (8, 16, 64, 264, 512):
    try:
        run(rows)
    except Exception as e:
        print(f"rows={rows}: FAIL {type(e).__name__}: {str(e)[:200]}")
