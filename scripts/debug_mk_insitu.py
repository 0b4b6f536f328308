import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
import numpy as np
from bench import build_corpus
from zultra_tpu.device_pipeline import begin_window_device
from zultra_tpu.ops.block_jax import _plan_block_kernel
from zultra_tpu.ops import split_jax

corpus = np.frombuffer(build_corpus(100_000_000)[:131072], np.uint8)

def run(impl):
    os.environ["ZULTRA_MK_IMPL"] = impl
    _plan_block_kernel.clear_cache()
    split_jax._split_kernel.clear_cache()
    split_jax._split_kernel_batch.clear_cache()
    h = begin_window_device(corpus, 0, len(corpus))
    del os.environ["ZULTRA_MK_IMPL"]
    return h

hs = run("scan")
hp = run("pallas")
print("spans scan:", hs.block_spans)
print("spans plls:", hp.block_spans)
for i, (a, b) in enumerate(zip(hs.plans, hp.plans)):
    same_words = np.array_equal(a["words"], b["words"])
    print(f"block {i}: dyn {a['is_dynamic']}/{b['is_dynamic']} bits {a['total_bits']}/{b['total_bits']} "
          f"words_eq={same_words} litlen_eq={np.array_equal(a['lit_len'], b['lit_len'])} "
          f"offlen_eq={np.array_equal(a['off_len'], b['off_len'])} mask {a['best_mask']}/{b['best_mask']}")
