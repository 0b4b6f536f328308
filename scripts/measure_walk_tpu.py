"""Real-chip measurement: the Pallas lazy-walk match kernel vs the XLA
staircase (VERDICT r4 item 1 — the counter-experiment, measured).

Honest method: outputs reduce to scalars on device before timing
(block_until_ready returns early through the axon tunnel; a full-table
fetch rides a ~40 MB/s link — docs/ARCHITECTURE.md §6)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_corpus
from zultra_tpu.ops import matchfinder_jax as mj
from zultra_tpu.ops import walk_pallas as wp

print("platform:", jax.devices()[0].platform, flush=True)

N_WALK = getattr(wp, "PROD_N", 117 * wp.CHUNK)
CORE_WALK = N_WALK - mj.HALO - mj.TAIL
N_STAIR = 1 << 17
CORE_STAIR = mj.SEG_CORE

corpus = np.frombuffer(build_corpus(4 << 20), np.uint8)


def segbuf(n, off):
    buf = np.empty(n, dtype=np.int32)
    buf[:] = 256 + np.arange(n, dtype=np.int32)
    buf[:] = corpus[off : off + n]
    return jnp.asarray(buf)


# ---- correctness on chip: walk kernel vs staircase kernel, same bytes ----
# Both consume the uniform [halo|core|tail] layout; compare core rows over
# the region both cover.
common_core = min(CORE_WALK, CORE_STAIR)
off = 1 << 20
buf_w = segbuf(N_WALK, off)
buf_s = segbuf(N_STAIR, off)
lw, ow, _ = wp.walk_core_kernel(buf_w, N_WALK, mj.HALO, CORE_WALK, False)
ls, os_, ovf = mj._core_kernel(buf_s, N_STAIR, 16, mj.HALO, CORE_STAIR)
lw_n = np.asarray(lw)[:common_core]
ow_n = np.asarray(ow)[:common_core]
ls_n = np.asarray(ls)[:common_core]
os_n = np.asarray(os_)[:common_core]
ok = np.array_equal(lw_n, ls_n) and np.array_equal(ow_n, os_n)
print(f"chip bit-exact walk vs staircase ({common_core} core rows): {ok}",
      flush=True)
if not ok:
    bad = np.argwhere((lw_n != ls_n) | (ow_n != os_n))[:5]
    for b, m in bad:
        print(" row", b, m, "walk", lw_n[b, m], ow_n[b, m],
              "stair", ls_n[b, m], os_n[b, m])

# ---- stage timing, on-device reductions ---------------------------------


@jax.jit
def walk_full_scalar(buf):
    l, o, _ = wp.walk_core_kernel(buf, N_WALK, mj.HALO, CORE_WALK, False)
    return jnp.sum(l.astype(jnp.int32)) + jnp.sum(o.astype(jnp.int32))


@jax.jit
def stair_full_scalar(buf):
    l, o, _ = mj._core_kernel(buf, N_STAIR, 16, mj.HALO, CORE_STAIR)
    return jnp.sum(l.astype(jnp.int32)) + jnp.sum(o.astype(jnp.int32))


@jax.jit
def salcp_scalar(buf):
    return jnp.sum(wp._salcp(buf, N_WALK))


@jax.jit
def walk_only_scalar(salcp):
    rows = wp._walk_pallas_call(salcp, N_WALK, mj.HALO, mj.HALO + CORE_WALK, False)
    return jnp.sum(rows)


def bench(name, fn, arg, per_bytes, iters=5):
    r = fn(arg); np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(arg)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms  ({per_bytes/dt/1e6:.3f} MB/s core)",
          flush=True)
    return dt


bufs_w = [segbuf(N_WALK, (1 << 20) + i * CORE_WALK) for i in range(4)]
bufs_s = [segbuf(N_STAIR, (1 << 20) + i * CORE_STAIR) for i in range(4)]

t_w = bench("walk  end-to-end/segment", walk_full_scalar, bufs_w[0], CORE_WALK)
t_s = bench("stair end-to-end/segment", stair_full_scalar, bufs_s[0], CORE_STAIR)
t_sa = bench("walk  SA+LCP only", salcp_scalar, bufs_w[0], CORE_WALK)
sal = jax.jit(lambda b: wp._salcp(b, N_WALK))(bufs_w[0])
sal.block_until_ready()
t_wo = bench("walk  pallas only", walk_only_scalar, sal, CORE_WALK)
print(f"speedup per core byte: {(t_s/CORE_STAIR)/(t_w/CORE_WALK):.2f}x",
      flush=True)
print(f"walk ns/position: {t_wo/N_WALK*1e9:.0f}", flush=True)
