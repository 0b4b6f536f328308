"""BASELINE config-5 scale run: a large corpus through REAL
jax.distributed windows mode (gloo CPU collectives standing in for a
pod's ICI/DCN), N coordinated processes, each planning its window span
and contributing a psum'd corpus byte-histogram; process 0 stitches the
single bit-exact stream with associative checksum combines.

Usage: python scripts/bench_distributed.py [BYTES] [NPROCS]
Prints one JSON line with wall clock, MB/s, compressed size, a stock-
zlib roundtrip verdict, and the psum'd histogram total.
"""

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512 << 20
    n_procs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from bench import build_corpus

    corpus_path = Path("/tmp/zultra_dist_corpus.bin")
    data = build_corpus(size)
    corpus_path.write_bytes(data)
    out_path = Path("/tmp/zultra_dist_out.gz")
    if out_path.exists():
        out_path.unlink()

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = f"""
import os, sys, time, json
os.environ['JAX_PLATFORMS'] = 'cpu'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address='localhost:{port}',
                           num_processes={n_procs}, process_id=pid)
sys.path.insert(0, {str(REPO)!r})
import zultra_tpu as zt
from zultra_tpu.parallel.multihost import (
    compress_windows_jax_distributed, corpus_histogram_psum, window_spans,
)
data = open({str(corpus_path)!r}, 'rb').read()
t0 = time.perf_counter()
blob = compress_windows_jax_distributed(data, zt.FLAG_GZIP_FRAMING)
wall = time.perf_counter() - t0
# psum'd corpus statistics: per-process byte histogram over its spans.
spans = window_spans(len(data), 1 << 20)
per = -(-len(spans) // {n_procs})
mine = spans[pid * per : (pid + 1) * per]
lo = mine[0][0] if mine else 0
hi = mine[-1][1] if mine else 0
local_hist = np.bincount(
    np.frombuffer(data[lo:hi], np.uint8), minlength=256
).astype(np.int64)
total_hist = corpus_histogram_psum(local_hist)
if pid == 0:
    open({str(out_path)!r}, 'wb').write(blob)
    print(json.dumps({{'wall_s': wall, 'hist_total': int(total_hist.sum()),
                       'compressed': len(blob)}}))
"""
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for i in range(n_procs)
    ]
    outs = [p.communicate()[0] for p in procs]
    wall_total = time.perf_counter() - t0
    assert all(p.returncode == 0 for p in procs), outs
    stats = json.loads(outs[0].strip().splitlines()[-1])

    # Verify with the stock decoder (the reference's own oracle).
    import gzip
    import zlib

    blob = out_path.read_bytes()
    ok = zlib.decompress(blob[10:-8], -15) == data
    crc_ok = int.from_bytes(blob[-8:-4], "little") == (zlib.crc32(data) & 0xFFFFFFFF)

    print(json.dumps({
        "bytes": len(data),
        "n_procs": n_procs,
        "wall_s": round(stats["wall_s"], 2),
        "wall_total_s": round(wall_total, 2),
        "MBps": round(len(data) / 1e6 / stats["wall_s"], 3),
        "compressed_bytes": stats["compressed"],
        "roundtrip_ok": bool(ok),
        "crc_combined_ok": bool(crc_ok),
        "hist_total": stats["hist_total"],
    }))


if __name__ == "__main__":
    main()
