"""Measure the TPU primitives the device pipeline is built from.

Run ON THE REAL CHIP (default axon platform — do not set JAX_PLATFORMS):
    python scripts/measure_tpu.py [quick]

Prints one JSON line per measurement so partial output is still useful
when compiles are slow over the remote-compile tunnel. Results feed the
round-2 design decisions recorded in docs/ARCHITECTURE.md:
  - host<->device bandwidth + dispatch latency (the tunnel tax)
  - jnp.sort / lax.sort throughput at the sizes the SA and the
    interval-centric matchfinder need (1M..16M, key-only and key+payload)
  - batched prefix-doubling SA cost per input MB at several batch shapes
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, reps=3):
    import jax

    # Warmup/compile.
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s, out


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    emit(measure="platform", platform=dev.platform, kind=getattr(dev, "device_kind", "?"))

    rng = np.random.RandomState(0)

    # --- transfers ---------------------------------------------------------
    for mb in ([1, 16] if not quick else [1]):
        host = rng.randint(0, 255, mb << 20).astype(np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(host, dev)
        jax.block_until_ready(d)
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(d)
        down = time.perf_counter() - t0
        emit(measure="transfer", mbytes=mb, h2d_s=round(up, 4), d2h_s=round(down, 4),
             h2d_MBps=round(mb / up, 1), d2h_MBps=round(mb / down, 1))

    # dispatch latency: tiny jitted op round-trip
    f = jax.jit(lambda x: x + 1)
    tiny = jnp.zeros(8, jnp.int32)
    best, comp, _ = timeit(f, tiny, reps=10)
    emit(measure="dispatch_latency", best_s=round(best, 5), compile_s=round(comp, 2))

    # --- sorts -------------------------------------------------------------
    sort1 = jax.jit(jnp.sort)

    def kv_sort(k, v):
        return jax.lax.sort((k, v), num_keys=1)

    kv = jax.jit(kv_sort)

    def kkv_sort(k1, k2, v):
        return jax.lax.sort((k1, k2, v), num_keys=2)

    kkv = jax.jit(kkv_sort)

    sizes = [1 << 20, 4 << 20] + ([16 << 20] if not quick else [])
    for n in sizes:
        keys = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
        vals = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
        best, comp, _ = timeit(sort1, keys)
        emit(measure="sort_i32", n=n, best_s=round(best, 4), compile_s=round(comp, 2),
             Melem_per_s=round(n / 1e6 / best, 1))
        best, comp, _ = timeit(kv, keys, vals)
        emit(measure="sort_kv_i32", n=n, best_s=round(best, 4), compile_s=round(comp, 2),
             Melem_per_s=round(n / 1e6 / best, 1))
        best, comp, _ = timeit(kkv, keys, vals, vals)
        emit(measure="sort_2key_i32", n=n, best_s=round(best, 4), compile_s=round(comp, 2),
             Melem_per_s=round(n / 1e6 / best, 1))

    # batched segment sorts: 128 x 128K (the 96K-segment matchfinder shape)
    if not quick:
        b, seg = 128, 1 << 17
        keys = jnp.asarray(rng.randint(0, 1 << 30, (b, seg)).astype(np.int32))
        bsort = jax.jit(lambda x: jnp.sort(x, axis=1))
        best, comp, _ = timeit(bsort, keys)
        emit(measure="sort_batched", batch=b, seg=seg, best_s=round(best, 4),
             compile_s=round(comp, 2), Melem_per_s=round(b * seg / 1e6 / best, 1))

    # --- argsort (what prefix doubling actually uses) -----------------------
    n = 1 << 20
    keys = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
    asort = jax.jit(lambda x: jnp.argsort(x, stable=True))
    best, comp, _ = timeit(asort, keys)
    emit(measure="argsort_i32", n=n, best_s=round(best, 4), compile_s=round(comp, 2),
         Melem_per_s=round(n / 1e6 / best, 1))

    # --- gathers ------------------------------------------------------------
    n = 1 << 22
    vals = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
    idx = jnp.asarray(rng.randint(0, n, n).astype(np.int32))
    g = jax.jit(lambda v, i: v[i])
    best, comp, _ = timeit(g, vals, idx)
    emit(measure="gather_i32", n=n, best_s=round(best, 4), compile_s=round(comp, 2),
         Melem_per_s=round(n / 1e6 / best, 1))

    # --- batched prefix-doubling SA -----------------------------------------
    from zultra_tpu.ops.suffix_jax import _doubling_rounds, _num_levels

    text = Path("/tmp/zultra_bench_corpus.bin")
    if text.exists():
        data = np.frombuffer(text.read_bytes(), dtype=np.uint8)
    else:
        data = np.frombuffer((Path("/root/reference/src/blockdeflate.c").read_bytes() * 400), dtype=np.uint8)

    shapes = [(8, 1 << 20)] if not quick else [(2, 1 << 18)]
    shapes += [(16, 96 * 1024), (64, 96 * 1024)] if not quick else []
    for batch, wbytes in shapes:
        need = batch * wbytes
        reps_needed = -(-need // len(data))
        buf = np.tile(data, reps_needed)[:need].reshape(batch, wbytes)
        levels = _num_levels(wbytes)

        def sa_batch(wins):
            return jax.vmap(lambda w: _doubling_rounds(w, wbytes, levels)[0])(wins)

        sab = jax.jit(sa_batch)
        wins = jnp.asarray(buf)
        best, comp, _ = timeit(sab, wins)
        emit(measure="sa_prefix_doubling", batch=batch, window_bytes=wbytes,
             best_s=round(best, 4), compile_s=round(comp, 2),
             MB_per_s=round(need / 1e6 / best, 2))

    emit(measure="done")


if __name__ == "__main__":
    main()
