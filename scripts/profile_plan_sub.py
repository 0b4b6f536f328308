"""Sub-phase wall profile of the device block planner's big bucket on
the 2 MiB slice: which of DP / hists / MK / RLE / masks / emit owns the
~1.07 s plans stage."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
from bench import build_corpus
from zultra_tpu.constants import HISTORY_SIZE
from zultra_tpu.ops.matchfinder_jax import HALO, match_tables_device_stacked
from zultra_tpu.ops import block_jax as B
from zultra_tpu.ops.entropy_jax import (
    build_lengths, dynamic_cost, optimize_for_rle_jax,
)

MB = 1 << 20
corpus = np.frombuffer(build_corpus(100_000_000)[:2 * MB], np.uint8)
mbs = 131072
spans = [(i * mbs, min((i + 1) * mbs, len(corpus)))
         for i in range(len(corpus) // mbs)]
W = len(spans)
n_lane = HALO + mbs
lens_st, offs_st = match_tables_device_stacked(corpus, spans, mbs)
win_stack = np.zeros((W, n_lane), np.uint8)
for w, (lo, hi) in enumerate(spans):
    prev = min(HISTORY_SIZE, lo)
    win_stack[w, HALO - prev : HALO + (hi - lo)] = corpus[lo - prev : hi]
win_dev = jnp.asarray(win_stack)

# One synthetic full-window block per window -> the big 131072 bucket.
n_pad = 131072
Bn = 16
widx = jnp.arange(W, dtype=jnp.int32)
starts = jnp.full(W, HALO, jnp.int32)
lengths = jnp.asarray([hi - lo for lo, hi in spans], jnp.int32)
tok_ext = jnp.zeros((W, n_lane + n_pad), jnp.bool_)
win_ext = jnp.concatenate([win_dev, jnp.zeros((W, n_pad), jnp.uint8)], axis=1)
z = jnp.zeros((W, n_pad, 8), lens_st.dtype)
lens_ext = jnp.concatenate([lens_st, z], axis=1)
offs_ext = jnp.concatenate([offs_st, z], axis=1)
win, ml, mo, tok = B._slice_blocks_multi(
    win_ext, lens_ext, offs_ext, tok_ext, widx, starts, n_pad
)


def timeit(tag, f, *args, iters=4):
    r = jax.block_until_ready(f(*args))
    # force with a scalar fetch
    def scal(x):
        if isinstance(x, dict):
            return sum(jnp.sum(v) for v in x.values() if v.dtype != jnp.bool_)
        if isinstance(x, tuple):
            return sum(jnp.sum(v.astype(jnp.int32)) for v in x)
        return jnp.sum(x)
    sf = jax.jit(lambda *a: scal(f(*a)))
    np.asarray(sf(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = sf(*args)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.1f} ms", flush=True)


ll = jnp.full((W, 288), 9, jnp.int32)
ol = jnp.full((W, 32), 6, jnp.int32)

timeit("token_hist (1 pass)", lambda: B._token_hist(
    win, jnp.zeros((W, n_pad), jnp.int32), jnp.ones((W, n_pad), jnp.int32),
    lengths, n_pad))
timeit("run_dp (1 pass)", lambda: B._run_dp(
    ll, ol, win, ml.astype(jnp.int32), mo.astype(jnp.int32), lengths, n_pad))
hist_l = jnp.ones((W, 288), jnp.int32) * 7
hist_o = jnp.ones((W, 32), jnp.int32) * 3
timeit("build_lengths x2", lambda: (build_lengths(hist_l, 15),
                                    build_lengths(hist_o, 15)))
timeit("optimize_for_rle x2", lambda: (optimize_for_rle_jax(hist_l),
                                       optimize_for_rle_jax(hist_o)))
timeit("dynamic_cost", lambda: dynamic_cost(hist_l, hist_o))
timeit("mask_search", lambda: B.mask_search(ll, ol))
timeit("emit_tokens", lambda: B._emit_tokens(
    win, jnp.zeros((W, n_pad), jnp.int32), jnp.ones((W, n_pad), jnp.int32),
    jnp.zeros((W, 288), jnp.int32), ll, jnp.zeros((W, 32), jnp.int32), ol,
    lengths, n_pad, jnp.ones((W, n_pad), jnp.bool_)))
timeit("post_optimize_full", lambda: B._post_optimize_full(
    jnp.zeros((W, n_pad), jnp.int32), jnp.ones((W, n_pad), jnp.int32), win,
    ll, ol, lengths, n_pad, jnp.ones((W, n_pad), jnp.bool_)))
timeit("FULL plan kernel", lambda: B._plan_block_kernel(
    win, ml.astype(jnp.int32), mo.astype(jnp.int32), lengths, n_pad))
