"""Sub-profile the splitter's components on chip (scalar-reduced timing)."""
import sys, time, os, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from jax import lax
from zultra_tpu.ops.entropy_jax import dynamic_cost, mk_lengths, limited_lengths, build_lengths
from zultra_tpu.ops import split_jax as S

rng = np.random.default_rng(3)

def t_scalar(f, *a, iters=3, tag=""):
    r = f(*a); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    np.asarray(r).ravel()[:1]
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")

# 1. dynamic_cost at splitter batch size
lit = jnp.asarray(rng.integers(0, 500, (480, 288)), jnp.int32)
off = jnp.asarray(rng.integers(0, 100, (480, 32)), jnp.int32)
f1 = jax.jit(lambda a,b: jnp.sum(dynamic_cost(a,b)))
t_scalar(f1, lit, off, tag="dynamic_cost (480 lanes)")

# 2. mk_lengths alone (288 alphabet)
f2 = jax.jit(lambda a: jnp.sum(mk_lengths(a)))
t_scalar(f2, lit, tag="mk_lengths (480x288)")

# 3. build_lengths (mk + limit)
f3 = jax.jit(lambda a: jnp.sum(build_lengths(a, 15)))
t_scalar(f3, lit, tag="build_lengths (480x288)")

# 4. token structure (pointer doubling) at (16, 131073)
n = 262144
W = 16
rl = jnp.asarray(rng.integers(0, 50, (W, n)), jnp.int32)
step = jnp.where(rl >= 3, rl, 1)
@jax.jit
def chain(step):
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    nxt = jnp.minimum(idx + step, n)
    jmp = jnp.concatenate([nxt, jnp.full((W,1), n, jnp.int32)], axis=1)
    mark = jnp.zeros((W, n+1), jnp.int32).at[:, 0].set(1)
    lane = jnp.arange(W)[:, None]
    for _ in range(18):
        mark = jnp.maximum(mark, jnp.zeros((W, n+1), jnp.int32).at[lane, jmp].max(mark, mode="drop"))
        jmp = jnp.take_along_axis(jmp, jmp, axis=1)
    return jnp.sum(mark)
t_scalar(chain, step, tag="pointer-doubling chain (16x256K, 18 rounds)")

# 5. P18 cumsum
bt = jnp.asarray(rng.integers(0, 18, (W, n)), jnp.int32)
@jax.jit
def p18(bucket_t):
    onehot = (bucket_t[:, :, None] == jnp.arange(18, dtype=jnp.int32)[None, None, :]).astype(jnp.int32)
    P = jnp.cumsum(onehot, axis=1)
    return jnp.sum(P[:, -1])
t_scalar(p18, bt, tag="P18 cumsum (16x256Kx18)")

# 6. full split kernel (known): once
corpus = None
