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


def allreduce_sum_over_devices(per_device_values, devices=None):
    """Sum one vector per device across a 1-axis mesh with a named-axis
    psum (shard_map). ``per_device_values``: array (n_devices, k); returns
    the (k,) total. This is the collective core of corpus_histogram_psum,
    unit-testable on the virtual CPU mesh."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = list(devices if devices is not None else jax.devices())
    vals = np.asarray(per_device_values)
    assert vals.shape[0] == len(devices), (vals.shape, len(devices))
    mesh = Mesh(np.asarray(devices), ("hosts",))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P("hosts"), out_specs=P(), check_vma=False
    )
    def reduce_step(x):  # x: (1, k) local shard
        return jax.lax.psum(x, "hosts")[0]

    arr = jax.device_put(jnp.asarray(vals), NamedSharding(mesh, P("hosts")))
    return np.asarray(jax.jit(reduce_step)(arr))


def corpus_histogram_psum(local_hist: np.ndarray):
    """psum a per-host histogram across hosts (replicated result):
    each process contributes its histogram on its first local device and
    zeros on the rest, then one named-axis psum over a global 1-axis mesh
    sums them. Passthrough for one host."""
    _, count = process_info()
    if count == 1:
        return local_hist
    import jax

    local = jax.local_devices()
    per_device = np.zeros((len(local), np.shape(local_hist)[0]), dtype=np.asarray(local_hist).dtype)
    per_device[0] = local_hist
    # Global mesh over every device of every process; each process supplies
    # only its local shards (jax.make_array_from_process_local_data).
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("hosts",))
    sharding = NamedSharding(mesh, P("hosts"))
    global_vals = jax.make_array_from_process_local_data(sharding, per_device)

    import functools

    from jax import shard_map

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P("hosts"), out_specs=P(), check_vma=False
    )
    def reduce_step(x):
        return jax.lax.psum(x, "hosts")[0]

    return np.asarray(jax.jit(reduce_step)(global_vals))


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
