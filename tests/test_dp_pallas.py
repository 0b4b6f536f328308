"""Pallas DP kernel (ops/dp_pallas): bit-exactness vs the XLA scan DP and
through the full block planner. Runs the kernel in interpreter mode on
CPU; scripts/measure_dp_pallas2.py re-proves parity + speed on the chip."""

import numpy as np
import jax.numpy as jnp
import pytest

from zultra_tpu.constants import NLITERALSYMS, NOFFSETSYMS
from zultra_tpu.ops.dp_pallas import run_dp_pallas
from zultra_tpu.ops.parse_wavefront import TILE


def _case(rng, n_pad, B, match_density, short_lane=True):
    win = rng.integers(0, 256, (B, n_pad), dtype=np.uint8)
    mlens = np.zeros((B, n_pad, 8), np.int32)
    moffs = np.ones((B, n_pad, 8), np.int32)
    has = rng.random((B, n_pad, 8)) < match_density
    mlens[has] = rng.integers(3, 259, has.sum())
    moffs[has] = rng.integers(1, 32769, has.sum())
    order = np.argsort(-mlens, axis=2, kind="stable")
    mlens = np.take_along_axis(mlens, order, axis=2)
    moffs = np.take_along_axis(moffs, order, axis=2)
    ll = rng.integers(1, 15, (B, NLITERALSYMS)).astype(np.int32)
    ol = rng.integers(1, 15, (B, NOFFSETSYMS)).astype(np.int32)
    lengths = np.full(B, n_pad, np.int32)
    if short_lane:
        lengths[0] = max(1, n_pad // 3)
    return (jnp.asarray(ll), jnp.asarray(ol), jnp.asarray(win),
            jnp.asarray(mlens), jnp.asarray(moffs), jnp.asarray(lengths))


@pytest.mark.parametrize("density", [0.15, 0.85])
def test_dp_pallas_matches_scan(density):
    from zultra_tpu.ops.block_jax import _run_dp
    import os

    os.environ["ZULTRA_DP_IMPL"] = "scan"
    try:
        rng = np.random.default_rng(7)
        n_pad = TILE
        args = _case(rng, n_pad, 2, density)
        ref_len, ref_off = _run_dp(*args, n_pad)
        got_len, got_off = run_dp_pallas(*args, n_pad, interpret=True)
        assert np.array_equal(np.asarray(ref_len), np.asarray(got_len))
        assert np.array_equal(np.asarray(ref_off), np.asarray(got_off))
    finally:
        del os.environ["ZULTRA_DP_IMPL"]


def test_dp_pallas_planner_end_to_end():
    """Full planner with ZULTRA_DP_IMPL=pallas produces the identical
    block plan (token words, tables, flags) as with the scan DP."""
    import os
    import zlib

    from zultra_tpu.matchfinder import find_all_matches
    from zultra_tpu.ops.block_jax import _plan_block_kernel, plan_blocks

    rng = np.random.default_rng(11)
    # LZ-ish compressible data so matches actually fire.
    chunks = []
    words = [rng.integers(0, 256, rng.integers(3, 12)) for _ in range(12)]
    while sum(len(c) for c in chunks) < 6000:
        chunks.append(words[rng.integers(0, len(words))])
    data = np.concatenate(chunks)[:6000].astype(np.uint8)
    table = find_all_matches(data, 0, len(data))
    spans = [(0, len(data))]

    from zultra_tpu.ops.block_jax import _plan_block_core

    def run(impl):
        os.environ["ZULTRA_DP_IMPL"] = impl
        _plan_block_core.clear_cache()
        try:
            return plan_blocks(data, table, spans)
        finally:
            del os.environ["ZULTRA_DP_IMPL"]
            _plan_block_core.clear_cache()

    ref = run("scan")
    got = run("pallas")
    for a, b in zip(ref, got):
        assert a["is_dynamic"] == b["is_dynamic"]
        assert a["total_bits"] == b["total_bits"]
        assert np.array_equal(a["words"], b["words"])
        assert np.array_equal(a["lit_len"], b["lit_len"])
        assert np.array_equal(a["off_len"], b["off_len"])
        assert a["best_mask"] == b["best_mask"]


def test_dp_pallas_multi_lane_group():
    """B > 128 spans several lane-group grid steps (grid dim 0); the ring
    scratch must reset per group and output blocks must be fully
    written. Lane-group independence: the batched result equals the two
    halves planned separately (each a single-group call)."""
    rng = np.random.default_rng(13)
    n_pad = 512
    args = _case(rng, n_pad, 150, 0.5, short_lane=False)
    got_len, got_off = run_dp_pallas(*args, n_pad, interpret=True)
    for lo, hi in ((0, 75), (75, 150)):
        half = tuple(a[lo:hi] for a in args)
        h_len, h_off = run_dp_pallas(*half, n_pad, interpret=True)
        assert np.array_equal(np.asarray(h_len), np.asarray(got_len)[lo:hi])
        assert np.array_equal(np.asarray(h_off), np.asarray(got_off)[lo:hi])


def test_dp_pallas_cap_pins_impl_at_reference_max_block(monkeypatch):
    """The reference's maximum block size (2 MiB, src/libzultra.c:87-92)
    exceeds the Pallas DP's HBM budget (DP_PALLAS_MAX_N): such blocks
    must fall back to the bit-identical scan DP, and blocks at or under
    the cap must keep the kernel (pinned so the cap cannot silently
    move)."""
    from zultra_tpu.ops import block_jax

    monkeypatch.setenv("ZULTRA_DP_IMPL", "pallas")
    assert block_jax.dp_impl_for(1 << 20) == "pallas"
    assert block_jax.dp_impl_for(2 << 20) == "scan"
    monkeypatch.setenv("ZULTRA_DP_IMPL", "scan")
    assert block_jax.dp_impl_for(4096) == "scan"
