"""MK/Kraft Pallas kernels (ops/mk_pallas) vs the XLA scans — identical
lengths through build_lengths on fuzzed histograms (interpret mode)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import zultra_tpu.ops.entropy_jax as E


def _run_both(hist, max_len):
    os.environ["ZULTRA_MK_IMPL"] = "scan"
    try:
        ref = np.asarray(E.build_lengths(hist, max_len))
    finally:
        os.environ["ZULTRA_MK_IMPL"] = "pallas"
    try:
        got = np.asarray(E.build_lengths(hist, max_len))
    finally:
        del os.environ["ZULTRA_MK_IMPL"]
    return ref, got


@pytest.mark.parametrize("seed", [0, 1])
def test_mk_pallas_offsets_alphabet(seed):
    rng = np.random.default_rng(seed)
    hist = rng.integers(0, 200, (16, 32)).astype(np.int32)
    # degenerate lanes: empty, single symbol, two symbols, skewed
    hist[1] = 0
    hist[2] = 0
    hist[2, 7] = 5
    hist[3] = 0
    hist[3, 0] = 1
    hist[3, 31] = 1000
    hist[4, :] = rng.integers(0, 2, 32)
    ref, got = _run_both(jnp.asarray(hist), 7)
    assert np.array_equal(ref, got)


def test_mk_pallas_literal_alphabet():
    rng = np.random.default_rng(2)
    hist = rng.integers(0, 1000, (3, 288)).astype(np.int32)
    hist[1, 50:] = 0  # few symbols
    hist[2] = (rng.random(288) < 0.1) * rng.integers(1, 1 << 20, 288)  # skewed
    ref, got = _run_both(jnp.asarray(hist), 15)
    assert np.array_equal(ref, got)


def test_mk_pallas_multi_lane_group():
    """B > 128 spans several lane-group grid steps — regression for the
    uninitialized-output-block bug (outputs are NOT seeded by HBM
    aliasing; the kernel must copy in explicitly)."""
    rng = np.random.default_rng(9)
    hist = rng.integers(0, 500, (300, 32)).astype(np.int32)
    hist[rng.random((300, 32)) < 0.4] = 0
    ref, got = _run_both(jnp.asarray(hist), 7)
    assert np.array_equal(ref, got)
