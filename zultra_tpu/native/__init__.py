"""Native (C++) engine: ctypes bindings over libzultra_tpu.so.

The native library implements the complete per-window pipeline
(zn_compress_window); stage-level entry points (suffix array, match table,
cost DP) are exposed for cross-validation against the spec engine and the
JAX kernels.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .build import ensure_built

_lib = None


def get_lib():
    global _lib
    if _lib is None:
        path = ensure_built()
        lib = ctypes.CDLL(str(path))
        lib.zn_version.restype = ctypes.c_char_p

        u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(dtype=np.uint16, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")

        lib.zn_suffix_array.restype = ctypes.c_int32
        lib.zn_suffix_array.argtypes = [u8p, ctypes.c_int32, i32p]

        lib.zn_build_matchtable.restype = ctypes.c_int32
        lib.zn_build_matchtable.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, u16p]

        lib.zn_optimize_matches.restype = None
        lib.zn_optimize_matches.argtypes = [
            i32p, i32p, u8p, u16p, ctypes.c_int32, ctypes.c_int32, u16p,
        ]

        lib.zn_compress_window.restype = ctypes.c_int64
        lib.zn_compress_window.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ]

        lib.zn_window_begin.restype = ctypes.c_void_p
        lib.zn_window_begin.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]

        lib.zn_window_begin_with_table.restype = ctypes.c_void_p
        lib.zn_window_begin_with_table.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u16p,
        ]

        lib.zn_window_emit.restype = ctypes.c_int64
        lib.zn_window_emit.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ]

        lib.zn_window_free.restype = None
        lib.zn_window_free.argtypes = [ctypes.c_void_p]

        lib.zn_window_serialized_size.restype = ctypes.c_int64
        lib.zn_window_serialized_size.argtypes = [ctypes.c_void_p]
        lib.zn_window_serialize.restype = ctypes.c_int64
        lib.zn_window_serialize.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
        lib.zn_window_deserialize.restype = ctypes.c_void_p
        lib.zn_window_deserialize.argtypes = [u8p, ctypes.c_int64]
        lib.zn_window_serialized_size_v2.restype = ctypes.c_int64
        lib.zn_window_serialized_size_v2.argtypes = [ctypes.c_void_p]
        lib.zn_window_serialize_v2.restype = ctypes.c_int64
        lib.zn_window_serialize_v2.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
        lib.zn_window_deserialize_v2.restype = ctypes.c_void_p
        lib.zn_window_deserialize_v2.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        _lib = lib
    return _lib


def serialize_window(handle: int) -> bytes:
    """Flatten a planned window job (window bytes + chosen tokens + block
    plans) so it can cross a process/host boundary; emit on the receiver
    via deserialize_window + window_emit."""
    lib = get_lib()
    size = lib.zn_window_serialized_size(ctypes.c_void_p(handle))
    buf = np.empty(size, dtype=np.uint8)
    n = lib.zn_window_serialize(ctypes.c_void_p(handle), buf, size)
    if n < 0:
        raise RuntimeError("window serialization failed")
    return buf.tobytes()


def deserialize_window(blob: bytes) -> int:
    lib = get_lib()
    arr = np.frombuffer(blob, dtype=np.uint8)
    handle = lib.zn_window_deserialize(np.ascontiguousarray(arr), len(blob))
    if not handle:
        raise RuntimeError("window deserialization failed (bad blob)")
    return handle


def serialize_window_compact(handle: int) -> bytes:
    """v2 wire format: walk-order tokens + block plans only — the window
    bytes are reattached at deserialization from the corpus the stitcher
    already holds (~1.5 B per corpus byte on text vs v1's ~5 B; the
    pod-scale plan-allgather payload)."""
    lib = get_lib()
    size = lib.zn_window_serialized_size_v2(ctypes.c_void_p(handle))
    buf = np.empty(size, dtype=np.uint8)
    n = lib.zn_window_serialize_v2(ctypes.c_void_p(handle), buf, size)
    if n < 0:
        raise RuntimeError("window serialization failed")
    return buf.tobytes()


def deserialize_window_compact(blob: bytes, window: np.ndarray) -> int:
    lib = get_lib()
    arr = np.frombuffer(blob, dtype=np.uint8)
    win = np.ascontiguousarray(np.asarray(window, dtype=np.uint8))
    handle = lib.zn_window_deserialize_v2(
        np.ascontiguousarray(arr), len(blob), win, len(win)
    )
    if not handle:
        raise RuntimeError("window deserialization failed (bad blob)")
    return handle


def suffix_array(data: np.ndarray) -> np.ndarray:
    lib = get_lib()
    n = int(data.shape[0])
    sa = np.empty(n, dtype=np.int32)
    if n:
        lib.zn_suffix_array(np.ascontiguousarray(data), n, sa)
    return sa


def build_match_table(window: np.ndarray, start: int) -> np.ndarray:
    """(n, 8, 2) uint16 match table (history rows [0,start) zeroed)."""
    lib = get_lib()
    n = int(window.shape[0])
    table = np.zeros((n, 8, 2), dtype=np.uint16)
    lib.zn_build_matchtable(np.ascontiguousarray(window), n, start, table)
    return table


def optimize_matches(lit_lens, off_lens, window, table, start, end) -> np.ndarray:
    lib = get_lib()
    best = np.zeros((end, 2), dtype=np.uint16)
    lib.zn_optimize_matches(
        np.ascontiguousarray(lit_lens, dtype=np.int32),
        np.ascontiguousarray(off_lens, dtype=np.int32),
        np.ascontiguousarray(window),
        np.ascontiguousarray(table),
        start, end, best,
    )
    return best


def window_emit(handle: int, window_is_last: bool, out: bytearray,
                bits_data: int, bits_count: int):
    """Emit a planned window at the current bit phase and free the job.
    Shared by the native and jax engines."""
    lib = get_lib()
    bd = ctypes.c_uint32(bits_data)
    bc = ctypes.c_int32(bits_count)
    out_arr = np.frombuffer(out, dtype=np.uint8)
    n = lib.zn_window_emit(
        ctypes.c_void_p(handle), 1 if window_is_last else 0,
        out_arr, len(out), ctypes.byref(bd), ctypes.byref(bc),
    )
    if n < 0:
        raise RuntimeError("native window emission failed (output overflow)")
    return int(n), int(bd.value), int(bc.value)


class NativeEngine:
    """Engine running the whole window pipeline in C++."""

    name = "native"

    def __init__(self):
        get_lib()  # build/load eagerly so fallback can trigger

    def find_all_matches(self, window: np.ndarray, start: int, end: int) -> np.ndarray:
        return build_match_table(window, start)

    def compress_window(
        self,
        window: np.ndarray,
        prev: int,
        in_size: int,
        window_is_last: bool,
        out: bytearray,
        bits_data: int,
        bits_count: int,
    ):
        """Returns (n_bytes_written, bits_data, bits_count)."""
        lib = get_lib()
        bd = ctypes.c_uint32(bits_data)
        bc = ctypes.c_int32(bits_count)
        out_arr = np.frombuffer(out, dtype=np.uint8)
        n = lib.zn_compress_window(
            np.ascontiguousarray(window), prev, in_size,
            1 if window_is_last else 0,
            out_arr, len(out), ctypes.byref(bd), ctypes.byref(bc),
        )
        if n < 0:
            raise RuntimeError("native window compression failed (output overflow)")
        return int(n), int(bd.value), int(bc.value)

    # -- pipelined path ----------------------------------------------------

    def begin_window(self, window: np.ndarray, prev: int, in_size: int,
                     n_threads: int = 0) -> int:
        """Run the bit-phase-independent stages (match finding, splitting,
        per-block planning) and return an opaque job handle. Safe to call
        concurrently for several windows: the library copies the window
        bytes and ctypes releases the GIL during the call. ``n_threads``
        caps the per-window block-planning threads (0 = all cores)."""
        lib = get_lib()
        handle = lib.zn_window_begin(np.ascontiguousarray(window), prev, in_size, n_threads)
        if not handle:
            raise RuntimeError("native window planning failed")
        return handle

    def emit_window(self, handle: int, window_is_last: bool, out: bytearray,
                    bits_data: int, bits_count: int):
        """Emit a planned window at the current bit phase and free the job.
        Must be called in stream order."""
        return window_emit(handle, window_is_last, out, bits_data, bits_count)

    def free_window(self, handle: int) -> None:
        get_lib().zn_window_free(ctypes.c_void_p(handle))
