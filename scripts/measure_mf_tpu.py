"""Verify + time the device staircase matchfinder on the real TPU chip.

    python scripts/measure_mf_tpu.py

Checks bit-exactness of _staircase_kernel against the host walk on a real
131072-byte text segment, then times single and vmap-batched executions
(device-resident inputs, so the number isolates on-chip compute from the
axon tunnel's ~27 MB/s transfer cap — both are reported for the honest
account in docs/ARCHITECTURE.md).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from zultra_tpu.ops.matchfinder_jax import _staircase_kernel

    dev = jax.devices()[0]
    emit(measure="platform", platform=dev.platform)

    n = 131072
    budget = 16
    corpus = Path("/tmp/zultra_bench_corpus.bin").read_bytes()[: n]
    data = np.frombuffer(corpus, dtype=np.uint8).astype(np.int32)

    t0 = time.perf_counter()
    lens, offs, overflow = jax.block_until_ready(
        _staircase_kernel(jnp.asarray(data), n, budget)
    )
    emit(measure="mf_compile", seconds=round(time.perf_counter() - t0, 1),
         overflow=bool(overflow))

    # Bit-exactness vs the host walk.
    from zultra_tpu.native import build_match_table

    ref = build_match_table(data.astype(np.uint8), 0).astype(np.int32)
    got = np.stack([np.asarray(lens), np.asarray(offs)], axis=-1)
    emit(measure="mf_tpu_bitexact", ok=bool(np.array_equal(ref, got)))

    # Single-segment steady state (device-resident input).
    d = jnp.asarray(data)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(_staircase_kernel(d, n, budget))
        best = min(best, time.perf_counter() - t0)
    emit(measure="mf_tpu_single", n=n, best_s=round(best, 4),
         core_MB_per_s=round(65536 / 1e6 / best, 2))

    # Batched: vmap over 16 segments = one ~1 MB window worth of cores.
    batch = 16
    buf = np.tile(data, batch).reshape(batch, n)
    bk = jax.jit(jax.vmap(lambda x: _staircase_kernel(x, n, budget)))
    t0 = time.perf_counter()
    jax.block_until_ready(bk(jnp.asarray(buf)))
    emit(measure="mf_batch_compile", seconds=round(time.perf_counter() - t0, 1))
    dbuf = jnp.asarray(buf)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(bk(dbuf))
        best = min(best, time.perf_counter() - t0)
    emit(measure="mf_tpu_batch16", best_s=round(best, 4),
         core_MB_per_s=round(batch * 65536 / 1e6 / best, 2),
         note="host walk reference: ~7.7 core MB/s single-thread (130ms/MB)")
    emit(measure="done")


if __name__ == "__main__":
    main()
