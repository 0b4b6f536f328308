"""Per-grid-step overhead of a streamed pallas pipeline on this chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 131072

def run(chunk, reverse, heavy_inputs, inner_loop, tag):
    n_chunks = N // chunk
    idx = (lambda g,c: (n_chunks-1-c, g)) if reverse else (lambda g,c: (c, g))
    idx3 = (lambda g,c: (n_chunks-1-c, 0, g)) if reverse else (lambda g,c: (c, 0, g))
    ins = [pl.BlockSpec((chunk,128), idx, memory_space=pltpu.VMEM)]
    arrs = [jnp.ones((N,128), jnp.int32)]
    if heavy_inputs:
        ins += [pl.BlockSpec((chunk,8,128), idx3, memory_space=pltpu.VMEM)]*2
        arrs += [jnp.ones((N,8,128), jnp.int32)]*2
    def k(*refs):
        out_ref = refs[-2]; buf = refs[-1]
        p0 = refs[0]
        if inner_loop:
            n_oct = chunk // 8
            def octave(oo, carry):
                o = n_oct-1-oo
                base = o*8
                lit8 = p0[pl.ds(base,8),:]
                for w in range(7,-1,-1):
                    buf[w:w+1,:] = lit8[w:w+1] + buf[w+1:w+2,:]
                    out_ref[pl.ds(base+w,1),:] = buf[w:w+1,:]
                tmp = buf[0:264,:]
                buf[8:272,:] = tmp
                return carry
            jax.lax.fori_loop(0, n_oct, octave, 0)
        else:
            out_ref[:] = p0[:]
    f = jax.jit(lambda *a: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((N,128), jnp.int32),
        grid=(1, n_chunks),
        in_specs=ins,
        out_specs=pl.BlockSpec((chunk,128), idx, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((272,128), jnp.int32)],
    )(*a))
    r = f(*arrs); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*arrs)
    np.asarray(r)
    dt = (time.perf_counter()-t0)/3
    print(f"{tag}: {dt*1e3:.1f} ms total, {dt/n_chunks*1e6:.0f} us/gridstep, {dt/N*1e9:.0f} ns/pos")

run(512, False, False, False, "copy fwd c512 light")
run(512, True,  False, False, "copy rev c512 light")
run(512, True,  True,  False, "copy rev c512 heavy-in")
run(512, True,  False, True,  "loop rev c512 light")
run(512, True,  True,  True,  "loop rev c512 heavy-in")
run(2048, True, False, True,  "loop rev c2048 light")
