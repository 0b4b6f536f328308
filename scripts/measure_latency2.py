"""True device timings on the axon backend: block_until_ready does not
reliably block (measured 0.1 ms for 16 chained 1M sorts), so every timing
here forces a real device->host fetch of a tiny reduction of the result.
Per-op cost is extracted from the slope over chain length, which cancels
the fixed dispatch+fetch round trip.

    python scripts/measure_latency2.py
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


def fetch_time(fn, *args, reps=3):
    """Time fn(*args) + fetch of its (tiny) result to host."""
    _ = np.asarray(fn(*args))  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    emit(measure="platform", platform=jax.devices()[0].platform)
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.randint(0, 2**30, 1 << 20).astype(np.int32))
    jax.block_until_ready(x)

    # Pure round trip: tiny computation + scalar fetch.
    b = fetch_time(jax.jit(lambda v: v[0] + 1), x)
    emit(measure="roundtrip_floor_ms", best_ms=round(b * 1e3, 2))

    def chain(v, k):
        for i in range(k):
            v = lax.sort(v ^ (i + 1))
        return v.sum()

    times = {}
    for k in (1, 4, 16):
        b = fetch_time(jax.jit(lambda v, k=k: chain(v, k)), x)
        times[k] = b
        emit(measure=f"chain_{k}_sorts_1M_fetch", best_ms=round(b * 1e3, 1))
    per_sort = (times[16] - times[4]) / 12
    emit(measure="per_sort_1M_ms", ms=round(per_sort * 1e3, 2),
         Melem_per_s=round(1.048576 / max(per_sort, 1e-9), 1))

    # Batched: (16, 128K) along -1, chained, slope again.
    xb = jnp.asarray(rng.randint(0, 2**30, (16, 1 << 17)).astype(np.int32))
    jax.block_until_ready(xb)

    def chainb(v, k):
        for i in range(k):
            v = lax.sort(v ^ (i + 1), dimension=-1)
        return v.sum()

    tb = {}
    for k in (1, 4, 16):
        b = fetch_time(jax.jit(lambda v, k=k: chainb(v, k)), xb)
        tb[k] = b
        emit(measure=f"chain_{k}_batched16x128K_fetch", best_ms=round(b * 1e3, 1))
    per_sort_b = (tb[16] - tb[4]) / 12
    emit(measure="per_batched_sort_2M_ms", ms=round(per_sort_b * 1e3, 2),
         Melem_per_s=round(2.097152 / max(per_sort_b, 1e-9), 1))

    # Variadic (key, payload) batched sort per-op cost.
    pb = jnp.asarray(np.tile(np.arange(1 << 17, dtype=np.int32), (16, 1)))
    jax.block_until_ready(pb)

    def chainkp(kk, pp, k):
        for i in range(k):
            kk, pp = lax.sort((kk ^ (i + 1), pp), dimension=-1, num_keys=1)
        return kk.sum() + pp.sum()

    tkp = {}
    for k in (1, 8):
        b = fetch_time(jax.jit(lambda a, b_, k=k: chainkp(a, b_, k)), xb, pb)
        tkp[k] = b
        emit(measure=f"chain_{k}_kp_sorts_fetch", best_ms=round(b * 1e3, 1))
    per = (tkp[8] - tkp[1]) / 7
    emit(measure="per_kp_batched_sort_2M_ms", ms=round(per * 1e3, 2),
         Melem_per_s=round(2.097152 / max(per, 1e-9), 1))

    # Gather per-op cost (doubling re-rank shape).
    idx = jnp.asarray(rng.randint(0, 1 << 17, (16, 1 << 17)).astype(np.int32))
    jax.block_until_ready(idx)

    def chaing(v, k):
        for i in range(k):
            v = jnp.take_along_axis(v ^ (i + 1), idx, axis=-1)
        return v.sum()

    tg = {}
    for k in (1, 8):
        b = fetch_time(jax.jit(lambda v, k=k: chaing(v, k)), xb)
        tg[k] = b
    per = (tg[8] - tg[1]) / 7
    emit(measure="per_batched_gather_2M_ms", ms=round(per * 1e3, 2),
         Melem_per_s=round(2.097152 / max(per, 1e-9), 1))

    # Scatter per-op cost (1-D .at[].set, 2M).
    n2 = 1 << 21
    sidx = jnp.asarray(rng.permutation(n2).astype(np.int32))
    sval = jnp.asarray(rng.randint(0, 2**30, n2).astype(np.int32))
    jax.block_until_ready((sidx, sval))

    def chains(v, k):
        for i in range(k):
            v = jnp.zeros(n2, jnp.int32).at[sidx].set(v ^ (i + 1))
        return v.sum()

    ts = {}
    for k in (1, 8):
        b = fetch_time(jax.jit(lambda v, k=k: chains(v, k)), sval)
        ts[k] = b
    per = (ts[8] - ts[1]) / 7
    emit(measure="per_scatter_2M_ms", ms=round(per * 1e3, 2),
         Melem_per_s=round(2.097152 / max(per, 1e-9), 1))

    # The staircase kernel itself, honestly fetched, single and batched.
    from zultra_tpu.ops.matchfinder_jax import _staircase_kernel

    n = 1 << 17
    data = np.frombuffer(
        Path("/tmp/zultra_bench_corpus.bin").read_bytes()[:n], dtype=np.uint8
    ).astype(np.int32)
    d = jnp.asarray(data)
    jax.block_until_ready(d)

    f = jax.jit(lambda v: [t.sum() for t in _staircase_kernel(v, n, 16)[:2]])
    b = fetch_time(f, d)
    emit(measure="staircase_128K_true_ms", best_ms=round(b * 1e3, 1),
         core_MB_per_s=round(0.065536 / b, 2))

    buf = jnp.asarray(np.tile(data, (16, 1)))
    jax.block_until_ready(buf)
    g = jax.jit(
        jax.vmap(lambda v: _staircase_kernel(v, n, 16)[0].sum())
    )
    b = fetch_time(lambda v: g(v).sum(), buf)
    emit(measure="staircase_batch16_true_ms", best_ms=round(b * 1e3, 1),
         core_MB_per_s=round(16 * 0.065536 / b, 2))

    emit(measure="done")


if __name__ == "__main__":
    main()
