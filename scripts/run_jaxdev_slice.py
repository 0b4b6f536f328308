"""jaxdev end-to-end slice on the real chip: parity + throughput,
now with the Pallas DP. Stage timing via env ZULTRA_PROFILE hooks absent;
coarse per-phase timers added here."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import zultra_tpu as zt
from zultra_tpu import engine as engine_mod

sys.path.insert(0, "/root/repo")
from bench import build_corpus

MB = 1 << 20
corpus = build_corpus(100_000_000)
jslice = corpus[: 2 * MB]
jbs = 131072

expect = zt.compress(jslice, zt.FLAG_GZIP_FRAMING, jbs)
engine_mod.set_engine("jaxdev")
t0 = time.perf_counter()
blob = zt.compress(jslice, zt.FLAG_GZIP_FRAMING, jbs)
print(f"warm+compile run: {time.perf_counter()-t0:.1f}s, parity={blob==expect}")
for _ in range(2):
    t0 = time.perf_counter()
    blob = zt.compress(jslice, zt.FLAG_GZIP_FRAMING, jbs)
    dt = time.perf_counter()-t0
    print(f"jaxdev 2MiB slice: {dt:.2f}s -> {len(jslice)/1e6/dt:.3f} MB/s, parity={blob==expect}")
