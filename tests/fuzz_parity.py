"""Differential parity fuzzer: random (input, framing, block size,
dictionary) configurations compressed by both this framework and the
reference library must produce identical bytes.

Run standalone for long campaigns:
    python tests/fuzz_parity.py [seconds] [seed]
Failures dump a reproducer under /tmp/zultra_fuzz_fail_*.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from conftest import RefLib, _build_reference, generate_lz_data  # noqa: E402

import zultra_tpu as zt  # noqa: E402

FLAGS = [zt.FLAG_GZIP_FRAMING, zt.FLAG_ZLIB_FRAMING, zt.FLAG_DEFLATE_FRAMING]
BLOCK_SIZES = [0, 32768, 65536, 131072]


def random_case(rng: np.random.RandomState):
    kind = rng.randint(6)
    if kind == 0:
        # window-boundary edges: sizes straddling multiples of the block size
        block = int(rng.choice([32768, 65536]))
        base = block * int(rng.randint(1, 4))
        size = base + int(rng.randint(-3, 4))
        data = generate_lz_data(rng, max(size, 1), int(rng.choice([4, 64, 256])), 0.5)
    elif kind == 1:
        data = generate_lz_data(
            rng, int(rng.randint(1, 200000)),
            int(rng.choice([1, 2, 3, 15, 56, 137, 255, 256])),
            float(rng.choice([0.0, 0.2, 0.5, 0.8, 0.95, 0.995])),
        )
        block = int(rng.choice(BLOCK_SIZES))
    elif kind == 2:
        data = rng.bytes(int(rng.randint(1, 150000)))  # incompressible
        block = int(rng.choice(BLOCK_SIZES))
    elif kind == 3:
        # highly repetitive / degenerate
        unit = bytes(rng.randint(0, int(rng.choice([1, 2, 4])) + 1,
                                 int(rng.randint(1, 40))).astype(np.uint8))
        data = (unit * (int(rng.randint(1, 120000)) // max(len(unit), 1) + 1))
        data = data[: int(rng.randint(1, 120000))]
        block = int(rng.choice(BLOCK_SIZES))
    elif kind == 4:
        # text-like: slices of real source files
        src = (Path("/root/reference/src/blockdeflate.c").read_bytes() * 8)
        start = int(rng.randint(0, len(src) // 2))
        data = src[start : start + int(rng.randint(1, len(src) - start))]
        block = int(rng.choice(BLOCK_SIZES))
    else:
        # long runs with sharp transitions (block splitter stress)
        parts = []
        for _ in range(int(rng.randint(2, 8))):
            style = rng.randint(3)
            n = int(rng.randint(1000, 40000))
            if style == 0:
                parts.append(bytes([int(rng.randint(256))]) * n)
            elif style == 1:
                parts.append(rng.bytes(n))
            else:
                parts.append(generate_lz_data(rng, n, 16, 0.7))
        data = b"".join(parts)
        block = int(rng.choice(BLOCK_SIZES))

    flags = int(rng.choice(FLAGS))
    dictionary = None
    # The library (unlike the reference CLI) accepts preset dictionaries
    # with every framing; fuzz them all.
    if rng.randint(4) == 0 and len(data) > 64:
        dictionary = bytes(data[: int(rng.randint(1, min(len(data), 32768)))])
    return data, flags, block, dictionary


def run(seconds: float, seed: int, ref: RefLib | None = None) -> int:
    rng = np.random.RandomState(seed)
    ref = ref or RefLib(_build_reference()[1])
    deadline = time.time() + seconds
    n = 0
    while time.time() < deadline:
        data, flags, block, dictionary = random_case(rng)
        if not data:
            continue
        expect = ref.compress(data, flags, block, dictionary)
        got = zt.compress(data, flags, block, dictionary)
        if n and n % 25 == 0:
            # Device engines jit one executable per padded-shape bucket;
            # random sizes touch many buckets, so cap the cache or a long
            # campaign exhausts host RAM on compiled executables.
            try:
                import jax

                jax.clear_caches()
            except Exception:
                pass
        if got != expect:
            stamp = f"/tmp/zultra_fuzz_fail_{seed}_{n}"
            Path(stamp + ".bin").write_bytes(data)
            Path(stamp + ".meta").write_text(
                f"flags={flags} block={block} dict={len(dictionary or b'')} "
                f"expect={len(expect)} got={len(got)}\n"
            )
            raise AssertionError(
                f"parity mismatch: case {n} flags={flags} block={block} "
                f"size={len(data)} dict={len(dictionary or b'')} -> {stamp}.bin"
            )
        n += 1
    return n


if __name__ == "__main__":
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    count = run(seconds, seed)
    print(f"fuzz OK: {count} cases, seed {seed}")
