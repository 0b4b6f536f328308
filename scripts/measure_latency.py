"""SUPERSEDED — kept as the negative result: every number this script
prints is ~0.1 ms because jax.block_until_ready does NOT block on the
axon backend. Use scripts/measure_latency2.py (forced fetches + chain
slopes) for true timings.

Isolate the per-dispatch vs per-op latency of the attached TPU backend.

    python scripts/measure_latency.py

(a) trivial op (x+1) — pure dispatch+transfer floor
(b) one jit chaining K dependent sorts — per-op cost inside one executable
(c) batched sort (B, n) along axis -1 — whether batch dims amortize
(d) one jit chaining K dependent cheap fused ops — XLA fusion sanity
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


def timeit(fn, *args, reps=5):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    emit(measure="platform", platform=jax.devices()[0].platform)
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.randint(0, 2**30, 1 << 20).astype(np.int32))

    c, b = timeit(jax.jit(lambda v: v + 1), x)
    emit(measure="add1_1M", compile_s=round(c, 2), best_ms=round(b * 1e3, 2))

    c, b = timeit(jax.jit(lambda v: ((v + 1) * 3) ^ (v >> 2)), x)
    emit(measure="fused3_1M", compile_s=round(c, 2), best_ms=round(b * 1e3, 2))

    def chain_sorts(v, k):
        for _ in range(k):
            v = lax.sort(v ^ 1)  # dependency between rounds
        return v

    for k in (1, 4, 16):
        c, b = timeit(jax.jit(lambda v, k=k: chain_sorts(v, k)), x)
        emit(measure=f"chain_{k}_sorts_1M", compile_s=round(c, 1),
             best_ms=round(b * 1e3, 1), ms_per_sort=round(b * 1e3 / k, 1))

    # Batched sort: does a leading batch dim amortize the pass latency?
    for B, n in ((16, 1 << 17), (64, 1 << 17), (16, 1 << 20)):
        xb = jnp.asarray(rng.randint(0, 2**30, (B, n)).astype(np.int32))
        c, b = timeit(jax.jit(lambda v: lax.sort(v, dimension=-1)), xb)
        emit(measure="batched_sort", B=B, n=n, compile_s=round(c, 1),
             best_ms=round(b * 1e3, 1),
             Melem_per_s=round(B * n / 1e6 / b, 1))

    # Chained batched sorts — the SA doubling shape.
    B, n = 16, 1 << 17
    xb = jnp.asarray(rng.randint(0, 2**30, (B, n)).astype(np.int32))

    def chain_batched(v, k):
        for _ in range(k):
            v = lax.sort(v ^ 1, dimension=-1)
        return v

    c, b = timeit(jax.jit(lambda v: chain_batched(v, 17)), xb)
    emit(measure="chain_17_batched_sorts", B=B, n=n, compile_s=round(c, 1),
         best_ms=round(b * 1e3, 1), ms_per_sort=round(b * 1e3 / 17, 1))

    # Variadic batched sort (key + payload) — the real doubling round op.
    pb = jnp.asarray(np.tile(np.arange(n, dtype=np.int32), (B, 1)))
    c, b = timeit(jax.jit(lambda k_, p_: lax.sort((k_, p_), dimension=-1, num_keys=1)), xb, pb)
    emit(measure="batched_sort_payload", B=B, n=n, compile_s=round(c, 1),
         best_ms=round(b * 1e3, 1), Melem_per_s=round(B * n / 1e6 / b, 1))

    # Batched gather along axis -1 (doubling re-rank shape).
    idx = jnp.asarray(rng.randint(0, n, (B, n)).astype(np.int32))
    c, b = timeit(jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=-1)), xb, idx)
    emit(measure="batched_gather", B=B, n=n, compile_s=round(c, 1),
         best_ms=round(b * 1e3, 1), Melem_per_s=round(B * n / 1e6 / b, 1))

    emit(measure="done")


if __name__ == "__main__":
    main()
