"""Checkpoint / resume for cut-pursuit solver state.

The reference declares warm-restart structs but never tests or persists
them (``CPql1_Restart``, ``/root/reference/include/
CP_PFDR_graph_quadratic_d1_l1.hpp:36-42,125-129``).  Here the outer-loop
state (active-edge flags, component labels, component values) is a plain
NamedTuple of arrays: it round-trips through ``.npz`` files and can resume
a solve on the same or updated observations via the solvers' ``state=``
argument.
"""
from __future__ import annotations


import numpy as np

from ..solvers.cut_pursuit import CPState
from ..solvers.cut_pursuit_simplex import CPSimplexState

_KIND = {"quadratic": CPState, "simplex": CPSimplexState}


def save_state(path, state) -> None:
    """Persists a :class:`CPState` or :class:`CPSimplexState` to ``path``."""
    if isinstance(state, CPState):
        kind = "quadratic"
    elif isinstance(state, CPSimplexState):
        kind = "simplex"
    else:
        raise TypeError(f"unsupported state type {type(state)!r}")
    payload = {f: np.asarray(getattr(state, f)) for f in state._fields}
    np.savez(path, __kind__=kind, **payload)


def load_state(path):
    """Loads a solver state previously saved with :func:`save_state`."""
    with np.load(path) as data:
        kind = str(data["__kind__"])
        cls = _KIND.get(kind)
        if cls is None:
            raise ValueError(f"unknown state kind {kind!r}")
        return cls(**{f: data[f] for f in cls._fields})
