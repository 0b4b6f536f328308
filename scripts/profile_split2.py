"""Bisect _split_kernel cost: levels=0/1/6."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from bench import build_corpus
from zultra_tpu.constants import HISTORY_SIZE
import zultra_tpu.ops.split_jax as S
from zultra_tpu.ops.matchfinder_jax import HALO, match_tables_device_stacked

MB = 1 << 20
corpus = np.frombuffer(build_corpus(100_000_000)[:2*MB], np.uint8)
mbs = 131072
spans = [(i*mbs, min((i+1)*mbs, len(corpus))) for i in range(len(corpus)//mbs)]
W = len(spans)
n_lane = HALO + mbs
lens_st, offs_st = match_tables_device_stacked(corpus, spans, mbs)
win_stack = np.zeros((W, n_lane), np.uint8)
for w, (lo, hi) in enumerate(spans):
    prev = min(HISTORY_SIZE, lo)
    win_stack[w, HALO-prev:HALO+(hi-lo)] = corpus[lo-prev:hi]
win_dev = jnp.asarray(win_stack)
n_pad_w = S._bucket(n_lane)
win_p = jnp.concatenate([win_dev, jnp.zeros((W, n_pad_w-n_lane), jnp.uint8)], axis=1)
ztail = jnp.zeros((W, n_pad_w-n_lane), jnp.int32)
rl = jnp.concatenate([lens_st[:,:,0].astype(jnp.int32), ztail], axis=1)
ro = jnp.concatenate([offs_st[:,:,0].astype(jnp.int32), ztail], axis=1)
n_reals = jnp.asarray([HALO+(hi-lo) for lo,hi in spans], dtype=jnp.int32)

for levels in (0, 1, 6):
    S.N_LEVELS = levels
    S._split_kernel.clear_cache()
    S._split_kernel_batch.clear_cache()
    f = lambda: S._split_kernel_batch(win_p, rl, ro, jnp.int32(HALO), n_reals, n_pad_w, S._input_cap(mbs))
    r = f(); jax.block_until_ready(r); np.asarray(r[1])
    t0 = time.perf_counter()
    r = f(); np.asarray(r[1])
    print(f"levels={levels}: {time.perf_counter()-t0:.2f}s")
