"""Per-stage cost breakdown of the staircase kernel on the real chip:
run truncated variants of the kernel and difference the timings.

    python scripts/measure_stages.py
"""

from __future__ import annotations

import functools
import json
import math
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
    from jax import lax

    from zultra_tpu.constants import (
        MAX_MATCH_SIZE, MAX_OFFSET, MIN_MATCH_SIZE, NMATCHES_PER_OFFSET,
    )
    from zultra_tpu.ops.matchfinder_jax import (
        _adjacent_lcp, _build_sparse_min, _find_left, _find_right,
        _prev_in_segment,
    )
    from zultra_tpu.ops.suffix_jax import _doubling_rounds, _num_levels

    emit(measure="platform", platform=jax.devices()[0].platform)
    n = 1 << 17
    budget_factor = 16
    corpus = Path("/tmp/zultra_bench_corpus.bin").read_bytes()
    data = jnp.asarray(np.frombuffer(corpus[:n], dtype=np.uint8).astype(np.int32))
    jax.block_until_ready(data)

    def upto(stage):
        @functools.partial(jax.jit, static_argnames=())
        def k(data):
            levels = _num_levels(n)
            sa, ranks = _doubling_rounds(data, n, levels, store_levels=8)
            if stage == "sa":
                return sa.sum() + ranks.sum()
            raw = _adjacent_lcp(sa, ranks, n)
            clamped = jnp.where(raw < MIN_MATCH_SIZE, 0, jnp.minimum(raw, MAX_MATCH_SIZE))
            if stage == "lcp":
                return clamped.sum() + sa.sum()
            L_arr = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), clamped.astype(jnp.int32), jnp.zeros(1, jnp.int32)]
            )
            m = n + 1
            lev_L = max(1, int(math.ceil(math.log2(m))))
            pad = 1 << lev_L
            padded = jnp.concatenate(
                [jnp.zeros(pad, jnp.int32), L_arr, jnp.zeros(pad, jnp.int32)]
            )
            st = _build_sparse_min(padded, lev_L)
            if stage == "sparse":
                return st.sum() + sa.sum()
            t_idx = jnp.arange(n, dtype=jnp.int32)
            v_t = L_arr[:n]
            thresh = jnp.maximum(v_t, 1)
            a_t = _find_left(st, lev_L, pad, jnp.maximum(t_idx - 1, 0), thresh)
            b_t = _find_right(st, lev_L, pad, t_idx + 1, thresh)
            if stage == "bounds":
                return a_t.sum() + b_t.sum() + sa.sum()
            valid_t = v_t > 0
            key_t = jnp.where(valid_t, a_t * 512 + v_t, jnp.int32(2**30))
            key_sorted, t_sorted = lax.sort((key_t, t_idx), num_keys=2)
            first = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
            ) & (key_sorted < 2**30)
            is_node = jnp.zeros(n, jnp.bool_).at[t_sorted].set(first)
            sizes = jnp.where(is_node, b_t - a_t, 0)
            cum = jnp.cumsum(sizes) - sizes
            total = cum[-1] + sizes[-1]
            cap = budget_factor * n
            overflow = total > cap
            if stage == "nodes":
                return cum.sum() + overflow.astype(jnp.int32) + sa.sum()
            arange_cap = jnp.arange(cap, dtype=jnp.int32)
            starts = jnp.where(is_node & (sizes > 0) & ~overflow, cum, cap)
            node_at = jnp.full(cap, jnp.int32(-1)).at[starts].max(t_idx, mode="drop")
            mem_node = lax.cummax(node_at)
            in_use = (arange_cap < total) & (mem_node >= 0) & ~overflow
            safe_node = jnp.maximum(mem_node, 0)
            run_start = lax.cummax(jnp.where(node_at >= 0, arange_cap, 0))
            pav = a_t * 512 + v_t
            pav_e = pav[safe_node]
            rank_e = (pav_e >> 9) + (arange_cap - run_start)
            pos_e = sa[jnp.clip(rank_e, 0, n - 1)]
            val_e = pav_e & 511
            if stage == "members":
                return pos_e.sum() + val_e.sum()
            key1 = jnp.where(in_use, mem_node, jnp.int32(2**30))
            pv = jnp.where(in_use, pos_e * 512 + (511 - val_e), jnp.int32(2**30))
            k_sorted, pv_sorted = lax.sort((key1, pv), num_keys=2)
            prev_same = jnp.concatenate(
                [jnp.zeros(1, jnp.bool_), k_sorted[1:] == k_sorted[:-1]]
            )
            prev_pos = jnp.concatenate([jnp.full((1,), jnp.int32(-1)), pv_sorted[:-1] >> 9])
            pred = jnp.where(prev_same & (k_sorted < 2**30), prev_pos, jnp.int32(-1))
            pv2, pred2 = lax.sort((pv_sorted, pred), num_keys=1)
            if stage == "sorts":
                return pv2.sum() + pred2.sum()
            p2 = pv2 >> 9
            val2 = 511 - (pv2 & 511)
            last = _prev_in_segment(pred2, p2)
            emit_m = (pred2 > last) & (pred2 >= 0) & (pv2 < 2**30)
            offs = p2 - pred2
            append = emit_m & (offs <= MAX_OFFSET)
            seg_first = jnp.concatenate([jnp.ones(1, jnp.bool_), p2[1:] != p2[:-1]])
            app_i = append.astype(jnp.int32)
            csum = jnp.cumsum(app_i)
            base = lax.cummax(jnp.where(seg_first, csum - app_i, 0))
            inc_count = csum - base
            row = inc_count - 1
            write = append & (row < NMATCHES_PER_OFFSET)
            flat = jnp.where(write, p2 * NMATCHES_PER_OFFSET + row, n * NMATCHES_PER_OFFSET)
            lens = jnp.zeros(n * NMATCHES_PER_OFFSET, jnp.int32).at[flat].set(val2, mode="drop")
            offs_out = jnp.zeros(n * NMATCHES_PER_OFFSET, jnp.int32).at[flat].set(offs, mode="drop")
            return lens.sum() + offs_out.sum()

        return k

    prev = 0.0
    for stage in ("sa", "lcp", "sparse", "bounds", "nodes", "members", "sorts", "full"):
        b = fetch_time(upto(stage), data)
        emit(measure=f"upto_{stage}", best_ms=round(b * 1e3, 1),
             delta_ms=round((b - prev) * 1e3, 1))
        prev = b

    emit(measure="done")


if __name__ == "__main__":
    main()
