"""Scaling efficiency of the window-sharded SINGLE-STREAM path
(parallel.multihost.compress_windows_multihost): one deflate stream whose
window planning fans out over worker processes, emission stitched on
host 0 — the pod decomposition measured with OS processes on one machine.

    python scripts/measure_scaling.py [bytes] [workers,workers,...]

Prints one JSON line per worker count plus a summary line; asserts every
run is byte-identical to the single-process stream.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024 * 1024
    workers = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [1, 2, 4]
    )

    corpus_path = Path("/tmp/zultra_bench_corpus.bin")
    if not corpus_path.exists() or corpus_path.stat().st_size < total:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", Path(__file__).resolve().parent.parent / "bench.py"
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        bench.build_corpus(max(total, 32 * 1024 * 1024))
    data = corpus_path.read_bytes()[:total]

    import zultra_tpu as zt
    from zultra_tpu.parallel import multihost

    os.environ.setdefault("ZN_THREADS", "1")

    golden = None
    results = {}
    for w in workers:
        # Warm (library build / page cache), then best-of-2.
        best = 1e9
        blob = None
        for _ in range(2):
            t0 = time.perf_counter()
            blob = multihost.compress_windows_multihost(
                data, zt.FLAG_GZIP_FRAMING, max_block_size=0, workers=w
            )
            best = min(best, time.perf_counter() - t0)
        if golden is None:
            golden = blob
            import zlib

            assert zlib.decompress(blob, 15 + 16) == data
        assert blob == golden, f"windows-mode output diverged at workers={w}"
        mbps = total / 1e6 / best
        results[w] = mbps
        print(json.dumps({
            "measure": "windows_mode_scaling", "workers": w,
            "wall_s": round(best, 3), "MBps": round(mbps, 3),
            "byte_identical": True,
        }), flush=True)

    base_w = min(results)
    per_worker_base = results[base_w] / base_w
    eff = {
        w: round(results[w] / (per_worker_base * w), 3) for w in results
    }
    print(json.dumps({
        "measure": "scaling_summary", "cpus": os.cpu_count(),
        "efficiency_vs_linear": eff,
        "note": ("efficiency is vs ideal linear scaling from the smallest "
                 "worker count; counts beyond the host's cores measure "
                 "oversubscription, not the pod decomposition"),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
