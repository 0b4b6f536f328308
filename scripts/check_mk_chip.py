import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
import numpy as np, jax.numpy as jnp
import zultra_tpu.ops.entropy_jax as E
from zultra_tpu.ops.mk_pallas import mk_phase12_pallas, kraft_limit_pallas

rng = np.random.default_rng(7)
for S, maxlen in ((32, 7), (288, 15)):
    hist = rng.integers(0, 1000, (8, S)).astype(np.int32)
    hist[1, 5:] = 0
    hist[2] = (rng.random(S) < 0.1) * rng.integers(1, 1 << 20, S)
    hist[3] = 0
    h = jnp.asarray(hist)
    os.environ["ZULTRA_MK_IMPL"] = "scan"
    mk_ref = np.asarray(E.mk_lengths(h))
    bl_ref = np.asarray(E.build_lengths(h, maxlen))
    os.environ["ZULTRA_MK_IMPL"] = "pallas"
    mk_got = np.asarray(E.mk_lengths(h))
    bl_got = np.asarray(E.build_lengths(h, maxlen))
    del os.environ["ZULTRA_MK_IMPL"]
    print(f"S={S}: mk match={np.array_equal(mk_ref, mk_got)} build match={np.array_equal(bl_ref, bl_got)}")
    if not np.array_equal(mk_ref, mk_got):
        bad = np.argwhere(mk_ref != mk_got)
        print("  first bad:", bad[:5], mk_ref[tuple(bad[0])], mk_got[tuple(bad[0])])
    elif not np.array_equal(bl_ref, bl_got):
        bad = np.argwhere(bl_ref != bl_got)
        print("  first bad:", bad[:5], bl_ref[tuple(bad[0])], bl_got[tuple(bad[0])])
