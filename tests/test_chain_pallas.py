"""Pallas chain-walk kernel (ops/chain_pallas) vs the pointer-doubling
mask: identical marks on fuzzed hop structures (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from zultra_tpu.ops.chain_pallas import chain_marks_pallas


def _doubling_marks(step, start, length, n):
    """The XLA reference construction (block_jax._chain_mask semantics,
    generalized to a per-lane start)."""
    import math

    B = step.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    nxt = jnp.minimum(idx + step, n)
    jmp = jnp.concatenate([nxt, jnp.full((B, 1), n, jnp.int32)], axis=1)
    lane = jnp.arange(B)[:, None]
    mark = jnp.zeros((B, n + 1), jnp.int32).at[lane[:, 0], start].set(1)
    rounds = max(1, int(math.ceil(math.log2(n + 1))) + 1)
    for _ in range(rounds):
        mark = jnp.maximum(
            mark, jnp.zeros((B, n + 1), jnp.int32).at[lane, jmp].max(mark, mode="drop")
        )
        jmp = jnp.take_along_axis(jmp, jmp, axis=1)
    return (mark[:, :n] == 1) & (idx >= start[:, None]) & (idx < length[:, None])


def test_chain_pallas_matches_doubling():
    rng = np.random.default_rng(5)
    n = 2048
    B = 3
    lens = np.where(
        rng.random((B, n)) < 0.4, rng.integers(3, 259, (B, n)), 0
    ).astype(np.int32)
    step = np.where(lens >= 3, lens, 1).astype(np.int32)
    start = np.array([0, 100, 37], np.int32)
    length = np.array([n, n - 300, 1], np.int32)

    ref = np.asarray(_doubling_marks(jnp.asarray(step), jnp.asarray(start),
                                     jnp.asarray(length), n))
    got = np.asarray(chain_marks_pallas(jnp.asarray(step), jnp.asarray(start),
                                        jnp.asarray(length), n, interpret=True))
    assert np.array_equal(ref, got)


def test_chain_pallas_all_literals_and_empty():
    n = 512
    step = np.ones((2, n), np.int32)
    start = np.array([0, 0], np.int32)
    length = np.array([n, 0], np.int32)
    got = np.asarray(chain_marks_pallas(jnp.asarray(step), jnp.asarray(start),
                                        jnp.asarray(length), n, interpret=True))
    assert got[0].all()
    assert not got[1].any()


def test_chain_pallas_multi_lane_group():
    """Lanes > 128 span several lane-group grid steps."""
    rng = np.random.default_rng(17)
    n, B = 512, 150
    lens = np.where(rng.random((B, n)) < 0.3, rng.integers(3, 259, (B, n)), 0).astype(np.int32)
    step = np.where(lens >= 3, lens, 1).astype(np.int32)
    start = np.zeros(B, np.int32)
    length = np.full(B, n, np.int32)
    ref = np.asarray(_doubling_marks(jnp.asarray(step), jnp.asarray(start),
                                     jnp.asarray(length), n))
    got = np.asarray(chain_marks_pallas(jnp.asarray(step), jnp.asarray(start),
                                        jnp.asarray(length), n, interpret=True))
    assert np.array_equal(ref, got)
