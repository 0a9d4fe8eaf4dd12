"""Checkpoint / resume for solver state.

The reference declares warm-restart structs but never tests or persists
them (``CPql1_Restart``, ``/root/reference/include/
CP_PFDR_graph_quadratic_d1_l1.hpp:36-42,125-129``).  Here solver state is
plain NamedTuples of arrays that round-trip through ``.npz`` files:

* :class:`~..solvers.cut_pursuit.CPState` /
  :class:`~..solvers.cut_pursuit_simplex.CPSimplexState` — outer-loop
  state (active-edge flags, component labels, component values); resumes
  a cut-pursuit solve via the solvers' ``state=`` argument.
* :class:`~..solvers.pfdr_quadratic.PFDRSolveState` — the COMPLETE
  loop-carried inner-solver state (iterate, auxiliary ``zu``/``zv``, the
  preconditioner products, reconditioning threshold, iteration count);
  obtained with ``pfdr_quadratic_d1(..., return_state=True)`` and resumed
  via ``state0=``, reproducing the uninterrupted trajectory exactly.
  Resume requires the same graph container, operator, options and dtype
  (the z layout follows the container's edge order).
"""
from __future__ import annotations


import numpy as np

from ..solvers.cut_pursuit import CPState
from ..solvers.cut_pursuit_simplex import CPSimplexState
from ..solvers.pfdr_quadratic import PFDRSolveState, Precond
from ..solvers.pfdr_simplex import SimplexPrecond, SimplexSolveState

_KIND = {"quadratic": CPState, "simplex": CPSimplexState,
         "pfdr": PFDRSolveState, "pfdr_simplex": SimplexSolveState}


def _flatten(state, prefix=""):
    out = {}
    for f in state._fields:
        v = getattr(state, f)
        if hasattr(v, "_fields"):  # nested NamedTuple (Precond)
            out.update(_flatten(v, prefix=f"{prefix}{f}."))
        else:
            out[prefix + f] = np.asarray(v)
    return out


def save_state(path, state) -> None:
    """Persists a solver state NamedTuple to ``path`` (.npz)."""
    for kind, cls in _KIND.items():
        if isinstance(state, cls):
            break
    else:
        raise TypeError(f"unsupported state type {type(state)!r}")
    np.savez(path, __kind__=kind, **_flatten(state))


def load_state(path):
    """Loads a solver state previously saved with :func:`save_state`."""
    with np.load(path) as data:
        kind = str(data["__kind__"])
        cls = _KIND.get(kind)
        if cls is None:
            raise ValueError(f"unknown state kind {kind!r}")
        if cls is PFDRSolveState or cls is SimplexSolveState:
            pre_cls = Precond if cls is PFDRSolveState else SimplexPrecond
            pre = pre_cls(**{f: data[f"pre.{f}"]
                             for f in pre_cls._fields})
            rest = {f: data[f] for f in cls._fields if f != "pre"}
            return cls(pre=pre, **rest)
        return cls(**{f: data[f] for f in cls._fields})
