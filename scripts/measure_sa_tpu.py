"""Batched-window device SA vs host SA-IS on the real chip, plus the
staircase matchfinder after the gather-free doubling rewrite. All timings
force a device->host fetch of a tiny reduction (block_until_ready does not
reliably block on the axon backend); the batch SA number also reports the
with-download variant since the SA consumer may live on the host.

    python scripts/measure_sa_tpu.py
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
    _ = np.asarray(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from zultra_tpu.ops.suffix_jax import _doubling_rounds, _num_levels

    emit(measure="platform", platform=jax.devices()[0].platform)

    corpus = Path("/tmp/zultra_bench_corpus.bin").read_bytes()

    # --- host SA-IS baseline (native), per MB -------------------------------
    from zultra_tpu import native

    host_data = np.frombuffer(corpus[: 1 << 20], dtype=np.uint8)
    native.suffix_array(host_data)  # warm/load
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sa_host = native.suffix_array(host_data)
        best = min(best, time.perf_counter() - t0)
    emit(measure="host_sais_1MB_ms", best_ms=round(best * 1e3, 1),
         MB_per_s=round(1.048576 / best, 2))

    # --- batched device SA: 8 x 128 KiB windows = 1 MiB per dispatch --------
    B, n = 8, 1 << 17
    levels = _num_levels(n)
    wins = np.frombuffer(corpus[: B * n], dtype=np.uint8).reshape(B, n)
    dwins = jnp.asarray(wins.astype(np.int32))
    jax.block_until_ready(dwins)

    sa_fn = jax.jit(jax.vmap(lambda w: _doubling_rounds(w, n, levels, 8)[0]))

    # correctness vs host SA-IS per window
    sa_dev = np.asarray(sa_fn(dwins))
    ok = all(
        np.array_equal(sa_dev[i], native.suffix_array(wins[i])) for i in range(B)
    )
    emit(measure="batched_sa_bitexact_vs_sais", ok=bool(ok))

    b = fetch_time(lambda w: sa_fn(w).sum(), dwins)
    emit(measure="device_sa_batch8x128K_compute_ms", best_ms=round(b * 1e3, 1),
         MB_per_s=round(B * n / 1e6 / b, 2))

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(sa_fn(dwins))
        best = min(best, time.perf_counter() - t0)
    emit(measure="device_sa_batch8x128K_with_download_ms",
         best_ms=round(best * 1e3, 1), MB_per_s=round(B * n / 1e6 / best, 2))

    # upload included too (the honest end-to-end device SA cost)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(sa_fn(jnp.asarray(wins.astype(np.int32))))
        best = min(best, time.perf_counter() - t0)
    emit(measure="device_sa_batch8x128K_e2e_ms",
         best_ms=round(best * 1e3, 1), MB_per_s=round(B * n / 1e6 / best, 2))

    # --- batch 16 ------------------------------------------------------------
    B2 = 16
    wins2 = np.frombuffer(corpus[: B2 * n], dtype=np.uint8).reshape(B2, n)
    dwins2 = jnp.asarray(wins2.astype(np.int32))
    jax.block_until_ready(dwins2)
    b = fetch_time(lambda w: sa_fn(w).sum(), dwins2)
    emit(measure="device_sa_batch16x128K_compute_ms", best_ms=round(b * 1e3, 1),
         MB_per_s=round(B2 * n / 1e6 / b, 2))

    # --- staircase matchfinder after the rewrite ----------------------------
    from zultra_tpu.ops.matchfinder_jax import _staircase_kernel

    data = np.frombuffer(corpus[:n], dtype=np.uint8).astype(np.int32)
    d = jnp.asarray(data)
    jax.block_until_ready(d)
    f = jax.jit(lambda v: [t.sum() for t in _staircase_kernel(v, n, 16)[:2]])
    b = fetch_time(f, d)
    emit(measure="staircase_128K_true_ms", best_ms=round(b * 1e3, 1),
         core_MB_per_s=round(0.065536 / b, 2))

    buf = jnp.asarray(np.tile(data, (8, 1)))
    jax.block_until_ready(buf)
    g = jax.jit(jax.vmap(lambda v: _staircase_kernel(v, n, 16)[0].sum()))
    b = fetch_time(lambda v: g(v).sum(), buf)
    emit(measure="staircase_batch8_true_ms", best_ms=round(b * 1e3, 1),
         core_MB_per_s=round(8 * 0.065536 / b, 2))

    emit(measure="done")


if __name__ == "__main__":
    main()
