"""Mesh sharding: the dp×sp window step, psum'd corpus statistics, and the
driver entry points, on an 8-virtual-device CPU mesh."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_sharded_corpus_stats_8dev():
    import jax

    from zultra_tpu.parallel import make_mesh, sharded_corpus_stats

    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh(n_dp=4, n_sp=2)
    rng = np.random.RandomState(0)
    data = rng.bytes(3 * 4096 + 123)
    stats = sharded_corpus_stats(data, mesh, window_bytes=4096)
    arr = np.frombuffer(data, np.uint8)
    expect = np.bincount(arr, minlength=256)
    got = stats["corpus_histogram"].copy()
    # Padding bytes are zeros; subtract them from bucket 0.
    got[0] -= stats["n_windows"] * 4096 - len(arr)
    assert np.array_equal(got, expect)

    # Per-window suffix arrays match the host construction.
    from zultra_tpu.suffix import suffix_array_numpy

    windows = np.zeros(stats["n_windows"] * 4096, dtype=np.uint8)
    windows[: len(arr)] = arr
    windows = windows.reshape(stats["n_windows"], 4096)
    for w in range(stats["n_windows"]):
        assert np.array_equal(
            np.asarray(stats["suffix_arrays"][w]), suffix_array_numpy(windows[w])
        ), f"window {w}"


def test_sharded_adler_combine_matches_zlib():
    import zlib

    from zultra_tpu.ops.checksum import adler32_combine
    from zultra_tpu.parallel import make_mesh, sharded_corpus_stats

    mesh = make_mesh(n_dp=8, n_sp=1)
    rng = np.random.RandomState(1)
    data = rng.bytes(8 * 2048)
    stats = sharded_corpus_stats(data, mesh, window_bytes=2048)
    # Fold the per-window partial sums into the stream checksum.
    adler = 1
    base = 65521
    for w in range(stats["n_windows"]):
        s1 = int(stats["adler_s1"][w]) % base
        s2 = int(stats["adler_s2"][w]) % base
        shard = (((s2 + 2048) % base) << 16) | ((s1 + 1) % base)
        adler = adler32_combine(adler, shard, 2048)
    assert adler == zlib.adler32(data)


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_compress_corpus_threads(lz_corpus):
    import zlib

    import zultra_tpu as zt
    from zultra_tpu.parallel import compress_corpus

    blobs = [lz_corpus["lz_4096_3_0.9"], lz_corpus["lz_4096_256_0.2"]] * 3
    outs = compress_corpus(blobs, zt.FLAG_ZLIB_FRAMING)
    for blob, out in zip(blobs, outs):
        assert zlib.decompress(out) == blob


def test_profiling_stage_timers():
    from zultra_tpu.profiling import stage_report, stage_timer

    with stage_timer("unit"):
        pass
    report = stage_report(reset=True)
    assert report["unit"]["calls"] == 1


def test_stream_stats(lz_corpus):
    import zultra_tpu as zt
    from zultra_tpu.profiling import stream_stats

    s = zt.Stream(zt.FLAG_GZIP_FRAMING)
    s.compress(lz_corpus["lz_4096_3_0.9"], zt.FINALIZE)
    stats = stream_stats(s)
    assert stats["total_in"] == 4096
    assert 0 < stats["ratio_pct"] < 100


def test_engine_env_selection(monkeypatch):
    import zultra_tpu.engine as eng

    monkeypatch.setattr(eng, "_active_engine", None)
    monkeypatch.setenv("ZULTRA_ENGINE", "spec")
    assert eng.get_engine().name == "spec"
    monkeypatch.setattr(eng, "_active_engine", None)
    monkeypatch.delenv("ZULTRA_ENGINE", raising=False)
    assert eng.get_engine().name in ("native", "spec")


def test_multihost_shard_and_members(lz_corpus):
    import zlib

    import zultra_tpu as zt
    from zultra_tpu.parallel.multihost import (
        compress_shard_members,
        process_info,
        shard_blobs,
    )

    idx, count = process_info()
    assert idx == 0 and count >= 1
    blobs = [lz_corpus["lz_4096_3_0.9"], lz_corpus["lz_4096_256_0.2"],
             lz_corpus["lz_16384_32_0.6"]]
    mine = shard_blobs(blobs, 0, 2)
    assert mine == [blobs[0], blobs[2]]
    members = compress_shard_members(mine, zt.FLAG_GZIP_FRAMING)
    # Concatenated gzip members form a valid multi-member gzip stream.
    import gzip

    assert gzip.decompress(b"".join(members)) == b"".join(mine)
    for blob, member in zip(mine, members):
        assert zlib.decompress(member, 31) == blob


def test_multihost_bench_scaling_smoke(lz_corpus):
    from zultra_tpu.parallel.multihost import bench_scaling

    data = lz_corpus["lz_16384_256_0.2"] * 4
    res = bench_scaling(data, worker_counts=(1,))
    assert res[1]["MBps"] > 0
    assert res[1]["efficiency"] == 1.0


def test_allreduce_sum_over_devices():
    """Named-axis psum over the full (virtual 8-CPU) device set: the
    collective core of the multi-host histogram reduction."""
    import jax

    from zultra_tpu.parallel.multihost import allreduce_sum_over_devices

    devices = jax.devices()
    rng = np.random.RandomState(7)
    per_dev = rng.randint(0, 1000, (len(devices), 288)).astype(np.int64)
    total = allreduce_sum_over_devices(per_dev, devices)
    assert np.array_equal(total, per_dev.sum(axis=0))
