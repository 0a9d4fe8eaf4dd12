"""Monitoring utilities.

The reference's only instrumentation is wall-clock ``Time[]``, objective
``Obj[]`` and evolution ``Dif[]`` arrays plus printf progress
(``CP_PFDR_graph_quadratic_d1_l1.cpp:255-258,323-329``).  The solvers here
return the same trace arrays; this module adds the TPU-side profiler hook.
"""
from __future__ import annotations

import contextlib
from typing import NamedTuple

import numpy as np


class SolveTrace(NamedTuple):
    """User-facing monitoring contract (reference ``Time``/``Obj``/``Dif``)."""
    time: np.ndarray
    obj: np.ndarray
    dif: np.ndarray

    def summary(self) -> str:
        parts = [f"{len(self.time) - 1} iterations"]
        if len(self.time):
            parts.append(f"{self.time[-1]:.3f}s")
        if len(self.obj):
            parts.append(f"objective {self.obj[0]:.6g} -> {self.obj[-1]:.6g}")
        if len(self.dif):
            parts.append(f"final evolution {self.dif[-1]:.3g}")
        return ", ".join(parts)


@contextlib.contextmanager
def profile(log_dir: str):
    """Wraps a solve in a ``jax.profiler`` trace (view with TensorBoard or
    xprof); the TPU equivalent of the reference's CLOCK_MONOTONIC timers."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
