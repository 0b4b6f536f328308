"""Wall-clock stage profile of the composed jaxdev begin-phase on the
2 MiB slice: match tables / splitter / block plans, plus sub-phases of
the planner."""
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
from zultra_tpu.ops.split_jax import _bucket as _split_bucket, _input_cap, _split_kernel_batch
from zultra_tpu.ops.block_jax import plan_blocks_device_multi

MB = 1 << 20
corpus = np.frombuffer(build_corpus(100_000_000)[:2*MB], np.uint8)
mbs = 131072
spans = [(i*mbs, min((i+1)*mbs, len(corpus))) for i in range(len(corpus)//mbs)]
W = len(spans)
n_lane = HALO + mbs

def phase(tag, fn, warm=True):
    if warm:
        r = fn()
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.2f}s")
    return r

lens_st, offs_st = phase("match tables (16 windows)", lambda: match_tables_device_stacked(corpus, spans, mbs))

win_stack = np.zeros((W, n_lane), np.uint8)
for w, (lo, hi) in enumerate(spans):
    prev = min(HISTORY_SIZE, lo)
    win_stack[w, HALO-prev:HALO+(hi-lo)] = corpus[lo-prev:hi]
win_dev = jnp.asarray(win_stack)

n_pad_w = _split_bucket(n_lane)
win_p = jnp.concatenate([win_dev, jnp.zeros((W, n_pad_w-n_lane), jnp.uint8)], axis=1)
ztail = jnp.zeros((W, n_pad_w-n_lane), jnp.int32)
rl = jnp.concatenate([lens_st[:,:,0].astype(jnp.int32), ztail], axis=1)
ro = jnp.concatenate([offs_st[:,:,0].astype(jnp.int32), ztail], axis=1)
n_reals = jnp.asarray([HALO+(hi-lo) for lo,hi in spans], dtype=jnp.int32)

from zultra_tpu.ops.split_jax import _trig_cap

def split_fn():
    s, ns, tok, ovf = _split_kernel_batch(win_p, rl, ro, jnp.int32(HALO), n_reals, n_pad_w, _input_cap(mbs), trig_cap=_trig_cap(_input_cap(mbs)))
    return np.asarray(s), np.asarray(ns), tok

splits_arr, n_splits, tok_marks = phase("splitter (16 lanes)", split_fn)
tok_stack = tok_marks[:, :n_lane]

lanes = []
for w, (lo, hi) in enumerate(spans):
    ends = [int(x) for x in splits_arr[w, :int(n_splits[w])]]
    ends.append(HALO + (hi-lo))
    s = HALO
    for e in ends:
        lanes.append((w, s, e-s)); s = e
print(f"n blocks: {len(lanes)}, sizes: {sorted(set(l[2] for l in lanes))[:8]}")

plans = phase("block plans", lambda: plan_blocks_device_multi(win_dev, lens_st, offs_st, lanes, tok_stack=tok_stack))
