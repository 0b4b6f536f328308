"""Multi-host corpus compression and scaling measurement.

The decomposition is embarrassingly parallel across hosts: the corpus
(file list or one large file cut at window boundaries) shards by
process index over DCN; each host compresses its shard-stream
independently; the only cross-host traffic is the psum of corpus
statistics and the associative checksum combine — both O(KB).

Two output modes:
* ``members``  — each shard becomes its own gzip/zlib member
  (concatenated gzip members are themselves a valid gzip stream).
* ``windows``  — shards cut at max-block-size boundaries with 32 KB
  halos produce one *single* deflate stream: every shard's windows are
  planned independently; the final bit-phase stitching runs on host 0
  (cheap, ordered — the same begin/emit split the thread pipeline uses).

This module is written for jax.distributed but degrades to a
single-process simulation for environments without multiple hosts; the
scaling bench (bench_scaling) uses OS processes to measure real scaling
efficiency of the shard-parallel path.
"""

from __future__ import annotations

import os
import time

import numpy as np


def process_info():
    """(process_index, process_count) — jax.distributed if initialized,
    else single process."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_blobs(blobs, process_index: int, process_count: int):
    """Round-robin shard a corpus file list across hosts."""
    return [b for i, b in enumerate(blobs) if i % process_count == process_index]


def compress_shard_members(blobs, flags=0, max_block_size: int = 0):
    """Compress this host's shard of a corpus; returns the list of
    compressed members (order preserved within the shard)."""
    from ..stream import compress

    return [compress(b, flags, max_block_size) for b in blobs]


def corpus_histogram_psum(local_hist: np.ndarray):
    """psum a per-host histogram across hosts (replicated result). Uses a
    trivial jit+psum over the global device set when distributed;
    passthrough for one host."""
    _, count = process_info()
    if count == 1:
        return local_hist
    import jax
    import jax.numpy as jnp

    @jax.jit
    def allred(x):
        return jax.lax.psum(x, axis_name=None)  # pragma: no cover (multi-host)

    return np.asarray(allred(jnp.asarray(local_hist)))


# ---------------------------------------------------------------------------
# Scaling-efficiency measurement (process-parallel shards on one machine;
# on a pod this is one process per host instead)
# ---------------------------------------------------------------------------


def bench_scaling(data: bytes, worker_counts=(1, 2), flags=0, max_block_size: int = 0):
    """Measure shard-parallel throughput at several worker counts and the
    resulting scaling efficiency. Returns a dict keyed by worker count."""
    import subprocess
    import sys
    import tempfile

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        blob_path = os.path.join(tmp, "corpus.bin")
        with open(blob_path, "wb") as f:
            f.write(data)

        for workers in worker_counts:
            # Cut into per-worker shards of whole 1 MiB-ish pieces.
            shard_size = -(-len(data) // workers)
            spans = [
                (w * shard_size, min((w + 1) * shard_size, len(data)))
                for w in range(workers)
            ]
            script = (
                "import sys, time, pickle\n"
                "sys.path.insert(0, %r)\n"
                "import zultra_tpu as zt\n"
                "lo, hi = int(sys.argv[1]), int(sys.argv[2])\n"
                "data = open(%r, 'rb').read()[lo:hi]\n"
                "t0 = time.perf_counter()\n"
                "out = zt.compress(data, %d, %d)\n"
                "elapsed = time.perf_counter() - t0\n"
                "print(len(out), elapsed)\n"
            ) % (os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                 blob_path, flags, max_block_size)

            procs = [
                subprocess.Popen(
                    [sys.executable, "-c", script, str(lo), str(hi)],
                    stdout=subprocess.PIPE, text=True,
                    env={**os.environ, "ZN_THREADS": "1",
                         "ZULTRA_PIPELINE_WORKERS": "1"},
                )
                for lo, hi in spans
            ]
            # Parallel time = the slowest worker's *compute* time, so
            # interpreter startup does not pollute the measurement (on a
            # pod each host's process is long-lived).
            worker_times = []
            for p in procs:
                out, _ = p.communicate()
                assert p.returncode == 0, out
                _, elapsed = out.split()
                worker_times.append(float(elapsed))
            wall = max(worker_times)
            results[workers] = {
                "wall_s": wall,
                "MBps": len(data) / 1e6 / wall,
            }

    base = results[min(worker_counts)]["MBps"] * min(worker_counts)
    for workers, r in results.items():
        r["efficiency"] = r["MBps"] / (base / min(worker_counts) * workers)
    return results
