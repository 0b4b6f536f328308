import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zultra_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/zultra_jax_cache")
import numpy as np, jax.numpy as jnp
import zultra_tpu.ops.entropy_jax as E

rng = np.random.default_rng(23)
for B, S, maxlen in ((512, 288, 15), (7680, 32, 15), (640, 288, 15)):
    hist = rng.integers(0, 3000, (B, S)).astype(np.int32)
    kill = rng.random((B, S)) < 0.5
    hist[kill] = 0
    hist[0] = 0
    hist[1] = 0; hist[1, 3] = 7
    h = jnp.asarray(hist)
    os.environ["ZULTRA_MK_IMPL"] = "scan"
    ref = np.asarray(E.build_lengths(h, maxlen))
    os.environ["ZULTRA_MK_IMPL"] = "pallas"
    got = np.asarray(E.build_lengths(h, maxlen))
    del os.environ["ZULTRA_MK_IMPL"]
    eq = np.array_equal(ref, got)
    print(f"B={B} S={S}: match={eq}")
    if not eq:
        bad = np.argwhere((ref != got).any(axis=1)).ravel()
        print("  bad lanes:", bad[:10], "of", len(bad))
        b = int(bad[0])
        print("  lane", b, "hist nonzero:", np.count_nonzero(hist[b]))
        np.save("/tmp/mk_bad_hist.npy", hist[bad[:64]])
