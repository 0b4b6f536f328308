import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax

N = 1 << 21
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32)
idx_rand = jnp.asarray(rng.integers(0, N, N), jnp.int32)
idx_sort = jnp.sort(idx_rand)

def g(table, idx, sorted_flag):
    dn = lax.GatherDimensionNumbers(offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
    return lax.gather(table, idx[:, None], dn, (1,),
                      indices_are_sorted=sorted_flag, mode="clip")

@functools.partial(jax.jit, static_argnames=("sorted_flag", "k"))
def many(table, idx, sorted_flag, k):
    acc = jnp.int32(0)
    t = table
    for i in range(k):
        v = g(t, idx, sorted_flag)
        acc = acc + v[0]
        t = t + 1
    return acc

for name, idx, fl in (("random flag=F", idx_rand, False),
                      ("sorted flag=F", idx_sort, False),
                      ("sorted flag=T", idx_sort, True)):
    ts = []
    for k in (1, 4):
        r = many(table, idx, fl, k); float(r)
        t0 = time.perf_counter()
        for _ in range(3): r = many(table, idx, fl, k)
        float(r)
        ts.append((time.perf_counter()-t0)/3)
    per = (ts[1]-ts[0])/3
    print(f"{name}: {per*1e3:.2f} ms/gather -> {N/per/1e6:.0f} Melem/s")
