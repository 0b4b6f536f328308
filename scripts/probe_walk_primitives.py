"""Probe: primitives for an on-core LAZY INTERVAL WALK kernel (VERDICT r4
item 1) — per-lane pointer chasing into a ~1 MB VMEM/SMEM-resident table.

The walk (reference src/matchfinder.c:171-234) needs, per micro-trip and
per lane: ONE random read T[x] and ONE random write T[y] = v where x, y
are data-dependent (pointer chase), T is ~2n+2 entries (n = segment
length, 2^16..2^17). The questions this probe answers on the real chip:

  1. How big can an SMEM scratch be? (scalar-core-resident table)
  2. ns/step of a scalar pointer chase in SMEM.
  3. Does a direct scalar load  v = vmem_ref[q, r]  (traced q, r) lower?
  4. Does roll+extract  (dynamic row slice -> pltpu.roll -> arr[0,0])
     lower, and what does it cost?
  5. ns/trip of a realistic 8-lane walk body (read+RMW-write per lane).
"""
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


# ---------------------------------------------------------------- 1. SMEM size
for n_words in (2048, 16384, 65536, 131072, 262144):
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
        print(f"SMEM {n_words*4//1024} KB: FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)

# ------------------------------------------------- 2. SMEM pointer chase speed
N_T = 16384      # 64 KB table (safe size per probe 1; adjust after)
K_STEPS = 131072

perm = rng.permutation(N_T).astype(np.int32)


def k_chase_smem(t_ref, o_ref, tbl):
    # copy table VMEM->SMEM via scalar loop? too slow; instead chase the
    # VMEM-held (N/128,128) copy... no: this probe loads table into SMEM
    # by scalar copy once (cost measured separately by slope at two K).
    def cp(i, _):
        row = t_ref[pl.ds(i, 1), :]
        for j in range(128):
            tbl[i * 128 + j] = row[0, j]
        return 0
    jax.lax.fori_loop(0, N_T // 128, cp, 0)

    def body(i, v):
        return tbl[v]
    v = jax.lax.fori_loop(0, K_STEPS, body, 0)
    o_ref[0, 0] = v


try:
    f = jax.jit(lambda t: pl.pallas_call(
        k_chase_smem,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((N_T,), jnp.int32)],
    )(t))
    tv = jnp.asarray(perm.reshape(N_T // 128, 128))
    out = int(np.asarray(f(tv))[0, 0])
    # numpy oracle
    v = 0
    for _ in range(K_STEPS):
        v = perm[v]
    dt = timeit(f, tv)
    print(f"SMEM chase: correct={out == v} {dt*1e9/K_STEPS:.1f} ns/step "
          f"({dt*1e3:.1f} ms total)", flush=True)
except Exception as e:
    print(f"SMEM chase: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

# ----------------------------------------- 3. direct scalar load from VMEM ref
def k_direct(t_ref, o_ref):
    def body(i, v):
        return t_ref[v >> 7, v & 127]
    v = jax.lax.fori_loop(0, K_STEPS, body, 0)
    o_ref[0, 0] = v


try:
    f = jax.jit(lambda t: pl.pallas_call(
        k_direct,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(t))
    tv = jnp.asarray(perm.reshape(N_T // 128, 128))
    out = int(np.asarray(f(tv))[0, 0])
    v = 0
    for _ in range(K_STEPS):
        v = perm[v]
    dt = timeit(f, tv)
    print(f"VMEM direct scalar chase: correct={out == v} "
          f"{dt*1e9/K_STEPS:.1f} ns/step", flush=True)
except Exception as e:
    print(f"VMEM direct scalar chase: FAIL {type(e).__name__}: {str(e)[:200]}",
          flush=True)

# ------------------------------------------------- 4. roll+extract from VMEM
def k_roll(t_ref, o_ref):
    def body(i, v):
        row = t_ref[pl.ds(v >> 7, 1), :]
        rot = pltpu.roll(row, 128 - (v & 127), axis=1)
        return rot[0, 0]
    v = jax.lax.fori_loop(0, K_STEPS, body, 0)
    o_ref[0, 0] = v


try:
    f = jax.jit(lambda t: pl.pallas_call(
        k_roll,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(t))
    tv = jnp.asarray(perm.reshape(N_T // 128, 128))
    out = int(np.asarray(f(tv))[0, 0])
    v = 0
    for _ in range(K_STEPS):
        v = perm[v]
    dt = timeit(f, tv)
    print(f"VMEM roll-extract chase: correct={out == v} "
          f"{dt*1e9/K_STEPS:.1f} ns/step", flush=True)
except Exception as e:
    print(f"VMEM roll-extract chase: FAIL {type(e).__name__}: {str(e)[:200]}",
          flush=True)

# ------------------------------------- 5. realistic 8-lane walk body, VMEM RMW
# Per trip x 8 lanes: scalar read T[v] (whichever mechanism), RMW write
# T[w] = val (dynamic row load, one-hot blend, dynamic row store).
N_BIG = 262144   # 1 MB table, the real per-segment size at L = 2^17
K_TRIPS = 65536

permb = rng.permutation(N_BIG).astype(np.int32)


def make_walk8(read_mode):
    def k_walk8(t_ref, o_ref):
        liota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, vs):
            acc = []
            for l in range(8):
                v = vs[l]
                q, r = v >> 7, v & 127
                if read_mode == "direct":
                    nv = t_ref[q, r]
                else:
                    row = t_ref[pl.ds(q, 1), :]
                    rot = pltpu.roll(row, 128 - r, axis=1)
                    nv = rot[0, 0]
                # RMW write back at the old slot (self-inverse permutation
                # chase would cycle; writing v keeps the table a permutation)
                row2 = t_ref[pl.ds(q, 1), :]
                t_ref[pl.ds(q, 1), :] = jnp.where(liota == r, nv, row2)
                acc.append(nv)
            return tuple(acc)

        vs = jax.lax.fori_loop(0, K_TRIPS, body,
                               tuple(jnp.int32(l * 997) for l in range(8)))
        for l in range(8):
            o_ref[0, l] = vs[l]
    return k_walk8


for mode in ("direct", "roll"):
    try:
        f = jax.jit(lambda t: pl.pallas_call(
            make_walk8(mode),
            out_shape=jax.ShapeDtypeStruct((1, 8), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            input_output_aliases={},
        )(t))
        tv = jnp.asarray(permb.reshape(N_BIG // 128, 128))
        np.asarray(f(tv))
        dt = timeit(f, tv, iters=3)
        print(f"walk8[{mode}] 1MB table: {dt*1e9/K_TRIPS:.1f} ns/trip "
              f"({dt*1e3:.1f} ms total, 8 lanes)", flush=True)
    except Exception as e:
        print(f"walk8[{mode}]: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
