import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
import numpy as np, jax.numpy as jnp
import zultra_tpu.ops.entropy_jax as E

rng = np.random.default_rng(11)
W, B, S = 4, 24, 288
hist = rng.integers(0, 1000, (W, B, S)).astype(np.int32)
hist[0, 1, 5:] = 0
hist[1, 2] = 0
h = jnp.asarray(hist)

def run(impl, fn):
    os.environ["ZULTRA_MK_IMPL"] = impl
    try:
        f = jax.jit(fn)
        return np.asarray(f(h))
    finally:
        del os.environ["ZULTRA_MK_IMPL"]

# vmapped build_lengths (the splitter pattern)
vm = lambda x: jax.vmap(lambda a: E.build_lengths(a, 15))(x)
ref = run("scan", vm); got = run("pallas", vm)
print("vmap build_lengths:", np.array_equal(ref, got))
if not np.array_equal(ref, got):
    bad = np.argwhere(ref != got); print(" bad idx:", bad[:5], ref[tuple(bad[0])], got[tuple(bad[0])])

# fori_loop-wrapped (the planner pattern)
def fori_fn(x):
    def body(i, acc):
        return acc + E.build_lengths(x[0] + i, 15)
    return jax.lax.fori_loop(0, 2, body, jnp.zeros((B, S), jnp.int32))
ref = run("scan", fori_fn); got = run("pallas", fori_fn)
print("fori build_lengths:", np.array_equal(ref, got))
if not np.array_equal(ref, got):
    bad = np.argwhere(ref != got); print(" bad idx:", bad[:5], ref[tuple(bad[0])], got[tuple(bad[0])])
