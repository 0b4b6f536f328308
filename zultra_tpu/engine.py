"""Engine registry: pluggable implementations of the compute-heavy stages.

Three engines share identical outputs (bit-exact bitstreams):

* ``spec`` — pure Python/NumPy reference semantics (this round's source of
  truth, validated byte-for-byte against the reference binary).
* ``native`` — C++ fast path (zultra_tpu/native) for the sequential host
  stages: suffix array, LCP-interval walk, cost DP, token walks.
* ``jax`` — JAX/Pallas TPU kernels (zultra_tpu/ops) for the vectorizable
  stages, used by the sharded multi-chip pipeline.

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


_active_engine = None


def set_engine(name: str) -> None:
    global _active_engine
    if name == "spec":
        _active_engine = SpecEngine()
    elif name == "native":
        from .native import NativeEngine

        _active_engine = NativeEngine()
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
