"""Build the native engine shared library.

Usage: python zultra_tpu/native/build.py [--debug]
Produces zultra_tpu/native/libzultra_tpu.so.
"""

from __future__ import annotations

import hashlib
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "src"


def _cpu_tag() -> str:
    """Short tag identifying this host's CPU so a -march=native build cached
    on a shared filesystem is never loaded by a different microarchitecture
    (which could SIGILL)."""
    try:
        info = Path("/proc/cpuinfo").read_text()
        lines = [l for l in info.splitlines() if l.startswith(("model name", "flags"))]
        key = lines[0] + (lines[1] if len(lines) > 1 else "") if lines else info[:2048]
    except OSError:
        import platform

        key = platform.processor() or platform.machine()
    return hashlib.sha256(key.encode()).hexdigest()[:12]


OUT = HERE / f"libzultra_tpu-{_cpu_tag()}.so"


def build(debug: bool = False, sanitize: str | None = None) -> Path:
    """Build the shared library. ``sanitize`` may be 'thread' or 'address'
    (the planner threads are the only shared-state concurrency; TSan runs
    are part of the test strategy since the reference is single-threaded
    and has no race surface at all)."""
    flags = ["-O0", "-g"] if debug or sanitize else ["-O3", "-funroll-loops", "-march=native"]
    if sanitize:
        flags += [f"-fsanitize={sanitize}", "-fno-omit-frame-pointer"]
    cmd = [
        "g++", "-std=c++17", "-shared", "-fPIC", "-Wall", "-Wextra",
        "-Wno-unused-parameter", *flags, "-pthread",
        str(SRC / "zultra_native.cpp"), "-o", str(OUT),
    ]
    subprocess.run(cmd, check=True)
    return OUT


def ensure_built() -> Path:
    """Build if missing or stale (any source newer than the library)."""
    if OUT.exists():
        lib_mtime = OUT.stat().st_mtime
        if all(p.stat().st_mtime <= lib_mtime for p in SRC.glob("*")):
            return OUT
    return build()


if __name__ == "__main__":
    sanitize = None
    if "--tsan" in sys.argv:
        sanitize = "thread"
    elif "--asan" in sys.argv:
        sanitize = "address"
    path = build(debug="--debug" in sys.argv, sanitize=sanitize)
    print(f"built {path}")
