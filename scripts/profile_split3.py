"""Time dynamic_cost at true batched width + level_body components."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from zultra_tpu.ops.entropy_jax import dynamic_cost, mk_lengths, limited_lengths

rng = np.random.default_rng(3)

def t_scalar(f, *a, iters=3, tag=""):
    r = f(*a); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    np.asarray(r).ravel()[:1]
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")

for B in (480, 7680):
    lit = jnp.asarray(rng.integers(0, 500, (B, 288)), jnp.int32)
    off = jnp.asarray(rng.integers(0, 100, (B, 32)), jnp.int32)
    f1 = jax.jit(lambda a,b: jnp.sum(dynamic_cost(a,b)))
    t_scalar(f1, lit, off, tag=f"dynamic_cost (B={B})")
    f2 = jax.jit(lambda a: jnp.sum(mk_lengths(a)))
    t_scalar(f2, lit, tag=f"mk_lengths (B={B})")
    f3 = jax.jit(lambda a: jnp.sum(limited_lengths(jnp.minimum(a, 20), 15)))
    t_scalar(f3, lit, tag=f"limited_lengths (B={B})")

# vmapped form as the splitter calls it: vmap over 16 windows of (480, .)
lit = jnp.asarray(rng.integers(0, 500, (16, 480, 288)), jnp.int32)
off = jnp.asarray(rng.integers(0, 100, (16, 480, 32)), jnp.int32)
fv = jax.jit(lambda a,b: jnp.sum(jax.vmap(dynamic_cost)(a,b)))
t_scalar(fv, lit, off, tag="vmap(dynamic_cost) (16x480)")
