import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp

# 1. large-B fuzz (multi lane-group grids)
import zultra_tpu.ops.entropy_jax as E
rng = np.random.default_rng(23)
for B, S, maxlen in ((512, 288, 15), (640, 32, 15)):
    hist = rng.integers(0, 3000, (B, S)).astype(np.int32)
    hist[rng.random((B, S)) < 0.5] = 0
    hist[0] = 0
    hist[1] = 0; hist[1, 3] = 7
    h = jnp.asarray(hist)
    os.environ["ZULTRA_MK_IMPL"] = "scan"
    ref = np.asarray(E.build_lengths(h, maxlen))
    os.environ["ZULTRA_MK_IMPL"] = "pallas"
    got = np.asarray(E.build_lengths(h, maxlen))
    del os.environ["ZULTRA_MK_IMPL"]
    eq = np.array_equal(ref, got)
    print(f"fuzz B={B} S={S}: match={eq}")
    if not eq:
        bad = np.argwhere((ref != got).any(axis=1)).ravel()
        print("  bad lanes:", bad[:10], "of", len(bad))
        np.save("/tmp/mk_bad_hist.npy", hist[bad[:64]])

# 2. one-window in-situ
from bench import build_corpus
from zultra_tpu.device_pipeline import begin_window_device
from zultra_tpu.ops.block_jax import _plan_block_kernel
from zultra_tpu.ops import split_jax

corpus = np.frombuffer(build_corpus(100_000_000)[:131072], np.uint8)

def run(impl):
    os.environ["ZULTRA_MK_IMPL"] = impl
    _plan_block_kernel.clear_cache()
    split_jax._split_kernel.clear_cache()
    h = begin_window_device(corpus, 0, len(corpus))
    del os.environ["ZULTRA_MK_IMPL"]
    return h

hs = run("scan")
hp = run("pallas")
print("spans scan:", hs.block_spans)
print("spans plls:", hp.block_spans)
for i, (a, b) in enumerate(zip(hs.plans, hp.plans)):
    print(f"block {i}: dyn {a['is_dynamic']}/{b['is_dynamic']} bits {a['total_bits']}/{b['total_bits']} "
          f"words_eq={np.array_equal(a['words'], b['words'])} "
          f"litlen_eq={np.array_equal(a['lit_len'], b['lit_len'])} "
          f"offlen_eq={np.array_equal(a['off_len'], b['off_len'])} mask {a['best_mask']}/{b['best_mask']}")
