"""Real-chip measurement: Pallas DP kernel vs the XLA scan DP.
Bit-exactness + throughput at various lane counts."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from zultra_tpu.ops.block_jax import _run_dp
from zultra_tpu.ops.dp_pallas import run_dp_pallas
from zultra_tpu.constants import NLITERALSYMS, NOFFSETSYMS

rng = np.random.default_rng(1)

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

print("platform:", jax.devices()[0].platform)

# correctness on chip, small case
args = make_case(8192, 4)
ref = _run_dp(*args, 8192)
got = run_dp_pallas(*args, 8192)
ok = all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(ref, got))
print("chip bit-exact (8192x4):", ok)

def bench(fn, args, n_pad, tag, iters=3):
    t0 = time.perf_counter()
    out = fn(*args, n_pad)
    jax.block_until_ready(out)
    np.asarray(out[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, n_pad)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / iters
    B = args[2].shape[0]
    mb = B * n_pad / 1e6
    print(f"{tag}: n={n_pad} B={B}: {dt*1e3:.1f} ms -> {mb/dt:.2f} MB/s/pass (compile {compile_s:.1f}s)")
    return dt

# pallas at n=131072 with increasing lanes
for B in (16, 128):
    args = make_case(131072, B)
    bench(run_dp_pallas, args, 131072, "pallas")

# scan DP comparison at a modest size (it is slow)
args = make_case(131072, 16)
bench(_run_dp, args, 131072, "xla-scan", iters=1)
