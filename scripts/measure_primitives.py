"""Measure the device primitives that bound any sort-based deflate
pipeline on the attached TPU: lax.sort, XLA 1-D scatter/gather, one-hot
histogram matmuls, and the host<->device tunnel. One JSON line each, so
partial output is still useful.

    python scripts/measure_primitives.py
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

    dev = jax.devices()[0]
    emit(measure="platform", platform=dev.platform)
    rng = np.random.RandomState(0)

    # --- tunnel / transfer bandwidth ---------------------------------------
    for mb in (1, 8, 32):
        x = rng.randint(0, 255, mb << 20).astype(np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(x)
        jax.block_until_ready(d)
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(d)
        down = time.perf_counter() - t0
        emit(measure="transfer", mb=mb, up_MBps=round(mb / up, 1),
             down_MBps=round(mb / down, 1))

    # --- lax.sort: key-only and key+payload at SA-relevant sizes ----------
    for n in (1 << 17, 1 << 20, 1 << 21):
        keys = jnp.asarray(rng.randint(0, 2**30, n).astype(np.int32))
        pay = jnp.asarray(np.arange(n, dtype=np.int32))

        f1 = jax.jit(lambda k: lax.sort(k))
        c, b = timeit(f1, keys)
        emit(measure="sort_key_only", n=n, compile_s=round(c, 1),
             best_s=round(b, 4), Melem_per_s=round(n / 1e6 / b, 2))

        f2 = jax.jit(lambda k, p: lax.sort((k, p), num_keys=1))
        c, b = timeit(f2, keys, pay)
        emit(measure="sort_key_payload", n=n, compile_s=round(c, 1),
             best_s=round(b, 4), Melem_per_s=round(n / 1e6 / b, 2))

        f3 = jax.jit(lambda k, p: lax.sort((k, p), num_keys=2))
        c, b = timeit(f3, keys, pay)
        emit(measure="sort_two_keys", n=n, compile_s=round(c, 1),
             best_s=round(b, 4), Melem_per_s=round(n / 1e6 / b, 2))

    # --- 1-D scatter (.at[].set) and gather (take) -------------------------
    for n in (1 << 20, 1 << 21):
        idx = jnp.asarray(rng.permutation(n).astype(np.int32))
        vals = jnp.asarray(rng.randint(0, 2**30, n).astype(np.int32))

        f = jax.jit(lambda i, v: jnp.zeros(n, jnp.int32).at[i].set(v))
        c, b = timeit(f, idx, vals)
        emit(measure="scatter_1d", n=n, compile_s=round(c, 1),
             best_s=round(b, 4), Melem_per_s=round(n / 1e6 / b, 2))

        g = jax.jit(lambda i, v: v[i])
        c, b = timeit(g, idx, vals)
        emit(measure="gather_1d", n=n, compile_s=round(c, 1),
             best_s=round(b, 4), Melem_per_s=round(n / 1e6 / b, 2))

    # --- radix-pass building blocks: blocked one-hot histogram matmul ------
    # per-block digit counts: (nblk, B) bytes -> one-hot (B, 256) matmul
    n = 1 << 21
    B = 512
    x = jnp.asarray(rng.randint(0, 256, n).astype(np.int32))

    def digit_hist(x):
        blocks = x.reshape(n // B, B)
        onehot = jax.nn.one_hot(blocks, 256, dtype=jnp.float32)  # (nblk,B,256)
        return onehot.sum(axis=1)

    c, b = timeit(jax.jit(digit_hist), x)
    emit(measure="blocked_digit_hist", n=n, compile_s=round(c, 1),
         best_s=round(b, 4), Melem_per_s=round(n / 1e6 / b, 2))

    # --- full radix-sort pass estimate: rank + scatter ----------------------
    def radix_pass(keys, pay, shift):
        digits = (keys >> shift) & 255
        blocks = digits.reshape(n // B, B)
        onehot = jax.nn.one_hot(blocks, 256, dtype=jnp.int32)
        blk_counts = onehot.sum(axis=1)                      # (nblk, 256)
        blk_offsets = jnp.cumsum(blk_counts, axis=0) - blk_counts
        tot = blk_counts.sum(axis=0)
        digit_base = jnp.cumsum(tot) - tot                   # (256,)
        within = jnp.cumsum(onehot, axis=1) - onehot          # (nblk,B,256)
        rank = (
            digit_base[digits]
            + jnp.take_along_axis(
                blk_offsets[:, None, :].repeat(1, 1), blocks[..., None], axis=2
            ).reshape(-1)
            + jnp.take_along_axis(within, blocks[..., None], axis=2).reshape(-1)
        )
        out_k = jnp.zeros_like(keys).at[rank].set(keys)
        out_p = jnp.zeros_like(pay).at[rank].set(pay)
        return out_k, out_p

    keys = jnp.asarray(rng.randint(0, 2**30, n).astype(np.int32))
    pay = jnp.asarray(np.arange(n, dtype=np.int32))
    try:
        c, b = timeit(jax.jit(lambda k, p: radix_pass(k, p, 0)), keys, pay)
        # full 32-bit sort = 4 passes
        emit(measure="radix_pass_estimate", n=n, compile_s=round(c, 1),
             best_s=round(b, 4), full_sort_Melem_per_s=round(n / 1e6 / (4 * b), 2))
    except Exception as e:  # pragma: no cover
        emit(measure="radix_pass_estimate", error=str(e)[:200])

    emit(measure="done")


if __name__ == "__main__":
    main()
