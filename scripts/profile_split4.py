import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from zultra_tpu.ops.entropy_jax import dynamic_cost

rng = np.random.default_rng(3)

def t_scalar(f, *a, iters=3, tag=""):
    r = f(*a); jax.block_until_ready(r); np.asarray(r).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    np.asarray(r).ravel()[:1]
    print(f"{tag}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")

# in-situ width: vmap over 16 windows of (1216, 288)/(1216, 32)
lit = jnp.asarray(rng.integers(0, 500, (16, 1216, 288)), jnp.int32)
off = jnp.asarray(rng.integers(0, 100, (16, 1216, 32)), jnp.int32)
fv = jax.jit(lambda a, b: jnp.sum(jax.vmap(dynamic_cost)(a, b)))
t_scalar(fv, lit, off, tag="vmap(dynamic_cost) 16x1216 [pallas MK]")
