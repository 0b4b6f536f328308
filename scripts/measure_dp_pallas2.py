"""Honest DP kernel timing: on-device reduction, vary call count, use slope."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from zultra_tpu.ops import dp_pallas as D
from zultra_tpu.constants import NLITERALSYMS, NOFFSETSYMS

rng = np.random.default_rng(1)
N = 131072

def make_case(n_pad, B, match_density=0.5):
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
    return (jnp.asarray(ll), jnp.asarray(ol), jnp.asarray(win),
            jnp.asarray(mlens), jnp.asarray(moffs), jnp.asarray(lengths))

@functools.partial(jax.jit, static_argnames=("n_pad", "k"))
def dp_k(ll, ol, win, ml, mo, ln, n_pad, k):
    acc = jnp.int32(0)
    for i in range(k):
        bl, bo = D.run_dp_pallas(ll, ol + i, win, ml, mo, ln, n_pad)
        acc = acc + jnp.sum(bl) + jnp.sum(bo)
    return acc

def slope(B, ks=(1, 3)):
    args = make_case(N, B)
    ts = []
    for k in ks:
        r = dp_k(*args, N, k); r.block_until_ready(); float(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = dp_k(*args, N, k)
        float(r)
        ts.append((time.perf_counter()-t0)/3)
    per_call = (ts[1]-ts[0])/(ks[1]-ks[0])
    mb = B*N/1e6
    print(f"B={B}: k1={ts[0]*1e3:.0f}ms k3={ts[1]*1e3:.0f}ms -> {per_call*1e3:.1f} ms/DP-pass "
          f"({per_call/N*1e9:.0f} ns/step, {mb/per_call:.1f} MB/s/pass)")

slope(16)
slope(128)

# XLA scan comparison, same methodology
from zultra_tpu.ops.block_jax import _run_dp
@functools.partial(jax.jit, static_argnames=("n_pad", "k"))
def scan_k(ll, ol, win, ml, mo, ln, n_pad, k):
    acc = jnp.int32(0)
    for i in range(k):
        bl, bo = _run_dp(ll, ol + i, win, ml, mo, ln, n_pad)
        acc = acc + jnp.sum(bl) + jnp.sum(bo)
    return acc

args = make_case(N, 16)
for k in (1, 2):
    r = scan_k(*args, N, k); float(r)
    t0 = time.perf_counter(); r = scan_k(*args, N, k); float(r)
    print(f"scan B=16 k={k}: {(time.perf_counter()-t0)*1e3:.0f} ms")
