"""Engine registry: pluggable implementations of the compute-heavy stages.

Three engines share identical outputs (bit-exact bitstreams):

* ``spec`` — pure Python/NumPy reference semantics (round 1's source of
  truth, validated byte-for-byte against the reference binary).
* ``native`` — C++ fast path (zultra_tpu/native) for the sequential host
  stages: suffix array, LCP-interval walk, cost DP, token walks.
* ``jax`` — the device pipeline: suffix array + staircase match finder as
  XLA sorts/scans (ops.matchfinder_jax, replacing the reference's lazy
  interval walk with a data-parallel construction); block planning and
  bit emission run through the native planner when the shared library is
  available (zn_window_begin_with_table), else through the spec pipeline.

Selection: ZULTRA_ENGINE env var, or set_engine(); default prefers native
when the shared library is built, falling back to spec.
"""

from __future__ import annotations

import os

import numpy as np


class SpecEngine:
    """Pure Python/NumPy engine with reference-exact semantics."""

    name = "spec"

    def find_all_matches(self, window: np.ndarray, start: int, end: int) -> np.ndarray:
        from .matchfinder import find_all_matches

        return find_all_matches(window, start, end)


class JaxEngine:
    """Device match stage (XLA staircase matchfinder) + host planning.

    With the native library present, ``begin_window``/``emit_window``
    combine the device match table with the C++ block planner/emitter so
    the streaming pipeline overlap works unchanged; without it, the
    engine exposes only ``find_all_matches`` and the spec pipeline runs
    the blocks (slow, used for cross-validation)."""

    name = "jax"

    def __init__(self):
        from .ops.matchfinder_jax import match_table_jax

        self._match_table = match_table_jax
        self._native_lib = None
        try:
            from . import native

            native.get_lib()
            self._native = native
            # Instance attributes so hasattr() reflects availability.
            self.begin_window = self._begin_window
            self.emit_window = self._emit_window
            self.free_window = self._free_window
        except Exception:
            self._native = None

    def find_all_matches(self, window: np.ndarray, start: int, end: int) -> np.ndarray:
        return self._match_table(window, start, end)

    # -- pipelined path (device matches + native planning) ------------------

    def _begin_window(self, window: np.ndarray, prev: int, in_size: int,
                      n_threads: int = 0) -> int:
        n = prev + in_size
        table = self._match_table(window, prev, n).astype(np.uint16)
        lib = self._native.get_lib()
        handle = lib.zn_window_begin_with_table(
            np.ascontiguousarray(window), prev, in_size, n_threads,
            np.ascontiguousarray(table),
        )
        if not handle:
            raise RuntimeError("native window planning failed")
        return handle

    def _emit_window(self, handle: int, window_is_last: bool, out: bytearray,
                     bits_data: int, bits_count: int):
        return self._native.window_emit(handle, window_is_last, out, bits_data, bits_count)

    def _free_window(self, handle: int) -> None:
        import ctypes

        self._native.get_lib().zn_window_free(ctypes.c_void_p(handle))


_active_engine = None


def set_engine(name: str) -> None:
    global _active_engine
    if name == "spec":
        _active_engine = SpecEngine()
    elif name == "native":
        from .native import NativeEngine

        _active_engine = NativeEngine()
    elif name == "jax":
        _active_engine = JaxEngine()
    elif name == "jaxdev":
        from .device_pipeline import DeviceWindowEngine

        _active_engine = DeviceWindowEngine()
    else:
        raise ValueError(f"unknown engine {name!r}")


def get_engine():
    global _active_engine
    if _active_engine is None:
        requested = os.environ.get("ZULTRA_ENGINE")
        if requested:
            set_engine(requested)
        else:
            try:
                set_engine("native")
            except Exception:
                set_engine("spec")
    return _active_engine
