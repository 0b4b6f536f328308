"""Bit-exactness check: run_dp_pallas vs block_jax._run_dp (scan+select)
on fuzz corpora. CPU interpret mode."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from zultra_tpu.ops.block_jax import _run_dp
from zultra_tpu.ops.dp_pallas import run_dp_pallas
from zultra_tpu.constants import NLITERALSYMS, NOFFSETSYMS

rng = np.random.default_rng(0)

def make_case(n_pad, B, length_frac=1.0, match_density=0.5):
    win = rng.integers(0, 256, (B, n_pad), dtype=np.uint8)
    mlens = np.zeros((B, n_pad, 8), np.int32)
    moffs = np.ones((B, n_pad, 8), np.int32)
    has = rng.random((B, n_pad, 8)) < match_density
    mlens[has] = rng.integers(3, 259, has.sum())
    moffs[has] = rng.integers(1, 32769, has.sum())
    # sort matches descending length per slot order like the finder does
    order = np.argsort(-mlens, axis=2, kind="stable")
    mlens = np.take_along_axis(mlens, order, axis=2)
    moffs = np.take_along_axis(moffs, order, axis=2)
    ll = rng.integers(1, 15, (B, NLITERALSYMS)).astype(np.int32)
    ol = rng.integers(1, 15, (B, NOFFSETSYMS)).astype(np.int32)
    lengths = np.full(B, int(n_pad * length_frac), np.int32)
    lengths[0] = max(1, n_pad // 3)  # one short lane
    return (jnp.asarray(ll), jnp.asarray(ol), jnp.asarray(win),
            jnp.asarray(mlens), jnp.asarray(moffs), jnp.asarray(lengths))

for n_pad, B, dens in [(4096, 2, 0.4), (4096, 3, 0.9), (8192, 2, 0.1)]:
    args = make_case(n_pad, B, match_density=dens)
    ref_len, ref_off = _run_dp(*args, n_pad)
    got_len, got_off = run_dp_pallas(*args, n_pad, interpret=True)
    rl, ro = np.asarray(ref_len), np.asarray(ref_off)
    gl, go = np.asarray(got_len), np.asarray(got_off)
    ok = np.array_equal(rl, gl) and np.array_equal(ro, go)
    print(f"n={n_pad} B={B} dens={dens}: match={ok}")
    if not ok:
        bad = np.argwhere((rl != gl) | (ro != go))
        print(" first mismatches:", bad[:5])
        for b, i in bad[:5]:
            print(f"  lane {b} pos {i}: ref=({rl[b,i]},{ro[b,i]}) got=({gl[b,i]},{go[b,i]})"
                  f" mlens={np.asarray(args[3])[b,i]}, moffs={np.asarray(args[4])[b,i]}")
        break
