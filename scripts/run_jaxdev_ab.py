import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import zultra_tpu as zt
from zultra_tpu import engine as engine_mod
from bench import build_corpus

MB = 1 << 20
corpus = build_corpus(100_000_000)
jslice = corpus[: 2 * MB]
jbs = 131072
expect = zt.compress(jslice, zt.FLAG_GZIP_FRAMING, jbs)
engine_mod.set_engine("jaxdev")
for impl in ("scan", "pallas"):
    os.environ["ZULTRA_MK_IMPL"] = impl
    from zultra_tpu.ops.block_jax import _plan_block_kernel
    from zultra_tpu.ops import split_jax
    _plan_block_kernel.clear_cache()
    split_jax._split_kernel.clear_cache()
    split_jax._split_kernel_batch.clear_cache()
    blob = zt.compress(jslice, zt.FLAG_GZIP_FRAMING, jbs)
    t0 = time.perf_counter()
    blob = zt.compress(jslice, zt.FLAG_GZIP_FRAMING, jbs)
    dt = time.perf_counter()-t0
    print(f"mk={impl}: {dt:.2f}s parity={blob==expect}")
    if blob != expect:
        # find first divergent byte
        n = min(len(blob), len(expect))
        i = next((k for k in range(n) if blob[k] != expect[k]), n)
        print(f"  lens {len(blob)} vs {len(expect)}, first diff at {i}")
