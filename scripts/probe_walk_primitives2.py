"""Probe 2 for the walk kernel: exact SMEM cap, scalar VMEM stores,
SMEM-resident inputs/outputs, and a two-table chase (the walk's real
access pattern: alternating reads/writes over two SMEM tables)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(7)


def timeit(f, *args, iters=5):
    r = f(*args); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


# ------------------------------------------------------- 1. finer SMEM cap
for n_words in (147456, 163840, 180224, 196608, 229376):
    def k_smem(x_ref, o_ref, tbl):
        tbl[0] = x_ref[0, 0]
        o_ref[:] = x_ref[:] + tbl[0]
    try:
        f = jax.jit(lambda x: pl.pallas_call(
            k_smem,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((n_words,), jnp.int32)],
        )(x))
        np.asarray(f(jnp.zeros((8, 128), jnp.int32)))
        print(f"SMEM {n_words*4//1024} KB: OK", flush=True)
    except Exception as e:
        print(f"SMEM {n_words*4//1024} KB: FAIL {str(e)[:80]}", flush=True)

# ------------------------------------------- 2. scalar STORE to VMEM ref?
def k_store(t_ref, o_ref):
    def body(i, v):
        t_ref[v >> 7, v & 127] = v
        return v + 997
    jax.lax.fori_loop(0, 64, body, 0)
    o_ref[:] = t_ref[0:8, :]

try:
    f = jax.jit(lambda t: pl.pallas_call(
        k_store,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={},
    )(t))
    np.asarray(f(jnp.zeros((128, 128), jnp.int32)))
    print("VMEM scalar store: OK", flush=True)
except Exception as e:
    print(f"VMEM scalar store: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)

# --------------------------------- 3. SMEM input & output block specs (1-D)
def k_io(in_ref, o_ref):
    def body(i, s):
        return s + in_ref[i]
    s = jax.lax.fori_loop(0, 4096, body, 0)
    o_ref[0] = s

try:
    x = jnp.asarray(rng.integers(0, 100, 4096), jnp.int32)
    f = jax.jit(lambda t: pl.pallas_call(
        k_io,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(t))
    out = int(np.asarray(f(x))[0])
    dt = timeit(f, x)
    print(f"SMEM in/out specs: correct={out == int(np.asarray(x).sum())} "
          f"{dt*1e9/4096:.1f} ns/seq-read", flush=True)
except Exception as e:
    print(f"SMEM in/out specs: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)

# ---------------------- 4. DMA VMEM->SMEM scratch (bulk table load) works?
def k_dma(t_ref, o_ref, tbl, sem):
    cp = pltpu.make_async_copy(t_ref, tbl, sem)
    cp.start()
    cp.wait()
    def body(i, v):
        return tbl[v]
    v = jax.lax.fori_loop(0, 4096, body, 0)
    o_ref[0] = v

try:
    perm = rng.permutation(16384).astype(np.int32)
    f = jax.jit(lambda t: pl.pallas_call(
        k_dma,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((16384,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(t))
    out = int(np.asarray(f(jnp.asarray(perm)))[0])
    v = 0
    for _ in range(4096):
        v = perm[v]
    print(f"DMA VMEM->SMEM + chase: correct={out == v}", flush=True)
except Exception as e:
    print(f"DMA VMEM->SMEM: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)

# ------------------- 5. two-table SMEM walk-shaped loop: read+write mix
# Per trip: read A[i], read B[j], write A[j], write B[i], ALU — the walk's
# steady-state mix, all dependent.
N_T = 32768
K = 131072
permA = rng.permutation(N_T).astype(np.int32)
permB = rng.permutation(N_T).astype(np.int32)


def k_two(a_ref, b_ref, o_ref, A, B, sem):
    for r, dst in ((a_ref, A), (b_ref, B)):
        cp = pltpu.make_async_copy(r, dst, sem)
        cp.start()
        cp.wait()

    def body(i, vv):
        v, w = vv
        nv = A[v]
        nw = B[w]
        A[w & (N_T - 1)] = v
        B[v & (N_T - 1)] = w
        return (nv ^ (i & 1), nw)
    v, w = jax.lax.fori_loop(0, K, body, (0, 1))
    o_ref[0] = v + w

try:
    f = jax.jit(lambda a, b: pl.pallas_call(
        k_two,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((N_T,), jnp.int32),
                        pltpu.SMEM((N_T,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(a, b))
    a = jnp.asarray(permA)
    b = jnp.asarray(permB)
    np.asarray(f(a, b))
    dt = timeit(f, a, b, iters=3)
    print(f"two-table walk mix (2R+2W+ALU): {dt*1e9/K:.1f} ns/trip", flush=True)
except Exception as e:
    print(f"two-table walk mix: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
