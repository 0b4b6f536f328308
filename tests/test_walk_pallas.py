"""Pallas lazy-interval-walk kernel (ops/walk_pallas) vs the spec walk:
identical match tables on fuzzed LZ data, history prefixes, and
degenerate runs (interpret mode; the on-chip re-proof is
scripts/measure_walk_tpu.py + the jaxdev parity suite)."""

import numpy as np
import pytest

from zultra_tpu.matchfinder import find_all_matches
from zultra_tpu.ops.walk_pallas import match_table_walk, walk_core_kernel


def _lz_data(rng, n, alpha, p_match=0.3):
    out = []
    while len(out) < n:
        if rng.random() < p_match and len(out) > 10:
            off = int(rng.integers(1, min(len(out), 2000)))
            ln = int(rng.integers(3, 60))
            s = len(out) - off
            for i in range(ln):
                out.append(out[s + i])
        else:
            out.append(int(rng.integers(0, alpha)))
    return np.array(out[:n], np.uint8)


@pytest.mark.parametrize("seed,alpha,start", [(0, 256, 0), (1, 40, 0),
                                              (2, 256, 512), (3, 8, 100)])
def test_walk_kernel_equals_spec_walk(seed, alpha, start):
    rng = np.random.default_rng(seed)
    data = _lz_data(rng, 3000, alpha)
    end = len(data)
    ref = find_all_matches(data.copy(), start, end)
    got = match_table_walk(data, start, end, interpret=True)
    assert np.array_equal(ref, got)


def test_walk_kernel_degenerate_runs():
    # All-zeros and short-period runs: the staircase kernel's overflow
    # fallback case — the walk handles them natively.
    z = np.zeros(3000, np.uint8)
    assert np.array_equal(
        find_all_matches(z.copy(), 0, 3000), match_table_walk(z, 0, 3000, interpret=True)
    )
    p = np.tile(np.array([7, 7, 9], np.uint8), 1000)[:2500]
    assert np.array_equal(
        find_all_matches(p.copy(), 0, 2500), match_table_walk(p, 0, 2500, interpret=True)
    )


def test_walk_core_kernel_segment_layout():
    # The uniform [halo | core | tail] sentinel layout: core rows equal
    # the spec walk over the same buffer region (halo rows suppressed).
    rng = np.random.default_rng(7)
    data = _lz_data(rng, 4096, 64)
    n = 4096
    halo, core = 1024, 2048
    buf = np.empty(n, np.int32)
    buf[:] = 256 + np.arange(n, dtype=np.int32)
    buf[: halo + core + 258] = data[: halo + core + 258]

    import jax.numpy as jnp

    lens, offs, ovf = walk_core_kernel(jnp.asarray(buf), n, halo, core, True)
    # Oracle: spec walk over the REAL byte region with `halo` history rows.
    ref = find_all_matches(data[: halo + core + 258].copy(), halo, halo + core + 258)
    ref_core = ref[halo : halo + core]
    assert not bool(ovf)
    assert np.array_equal(np.asarray(lens, np.int32), ref_core[:, :, 0])
    assert np.array_equal(np.asarray(offs, np.int32), ref_core[:, :, 1])
