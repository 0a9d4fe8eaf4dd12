"""Device-resident min-cut: certified binary-TV relaxation (PDHG).

The reference computes the steepest cut with Boykov-Kolmogorov max-flow —
sequential augmenting-path search over pointer-linked trees
(``/root/reference/src/maxflow.cpp:484``), the one component of the
pipeline with no literal TPU analog (SURVEY §7 "hard parts").  This module
solves the same problem natively on device via the exact total-variation
reformulation of min-cut (Chambolle 2005): the steepest-cut objective

    min_U  sum_{v in U} c_v  +  sum_{e in boundary(U)} w_e

is the binary restriction of the convex program

    min_{x in [0,1]^V}  <c, x>  +  sum_e w_e |x_u - x_v|,

whose LP relaxation is *tight*: by the coarea formula every super-level
set of a relaxed minimizer is an optimal cut.  The relaxation is solved
with a diagonally preconditioned primal-dual hybrid gradient iteration
(Pock & Chambolle 2011) — per iteration one endpoint gather, one clip, one
incidence-gather accumulation and one clip, i.e. exactly the bulk
edge/vertex map-reduce pattern the rest of this library runs at full TPU
speed (no pointer chasing, no scatters).

Certification: a feasible dual point ``z`` (|z| <= 1) lower-bounds every
cut by ``sum_v min(0, (c + K^t z)_v)``; the iteration stops when the best
thresholded cut meets that bound within ``tol`` — the returned cut then
carries an optimality certificate, not a heuristic guarantee.

The host push-relabel (``mincut.cpp``) remains the default for the
cut-pursuit outer loop — at reduced-problem sizes the cut is index work,
not FLOPs, and a sequential solver wins; this device path exists for
full-graph cuts at scales where the graph lives on device and host
round-trips dominate (select with ``CPOptions(cut="device")``).
"""
from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphD1

_THRESHOLDS = 15   # cut candidates per certificate check (coarea levels)


@partial(jax.jit, static_argnames=("it_max", "check_every"))
def _pdhg_min_cut(graph: GraphD1, w, c, tol, it_max: int, check_every: int):
    """Jitted PDHG loop; returns (side [V] bool, gap, iterations)."""
    dtype = w.dtype
    v = graph.num_vertices

    # diagonal preconditioning (alpha = 1): tau_v = 1 / sum_{e ~ v} w_e,
    # sigma_e = 1 / (2 w_e) — convergent for any graph, no operator norm
    deg_w = graph.vertex_degree_weighted(w)
    # vertices with no (nonzero-weight) incident edge have an empty K row:
    # any step size is admissible — pick one that resolves their purely
    # linear subproblem (x -> 0 or 1 by sign of c) in a single step
    tau = jnp.where(deg_w > 0, 1.0 / jnp.maximum(deg_w, 1e-30),
                    1.0 / jnp.maximum(jnp.abs(c), 1e-12))
    sigma = jnp.where(w > 0, 0.5 / jnp.maximum(w, 1e-30), 0.0)

    ts = jnp.linspace(0.03, 0.97, _THRESHOLDS, dtype=dtype)

    def cut_values(x):
        """Objective of the _THRESHOLDS super-level-set cuts of x."""
        side = x[:, None] > ts[None, :]                    # [V, T]
        lin = jnp.sum(jnp.where(side, c[:, None], 0), axis=0)
        su, sv = graph.gather_endpoints(side)              # [E, T]
        bnd = jnp.sum(jnp.where(su != sv, w[:, None], 0), axis=0)
        return lin + bnd

    def gap_state(x, z):
        ktz = graph.edge_to_vertex_sum(w * z, -(w * z))
        dual = jnp.sum(jnp.minimum(c + ktz, 0))
        vals = cut_values(x)
        best = jnp.argmin(vals)
        return vals[best], dual, ts[best]

    def pdhg_chunk(carry, _):
        x, xb, z = carry
        xbu, xbv = graph.gather_endpoints(xb)
        z = jnp.clip(z + sigma * w * (xbu - xbv), -1, 1)
        ktz = graph.edge_to_vertex_sum(w * z, -(w * z))
        x_new = jnp.clip(x - tau * (ktz + c), 0, 1)
        return (x_new, 2 * x_new - x, z), None

    def cond(state):
        x, xb, z, it, gap, _ = state
        return jnp.logical_and(it < it_max, gap > tol)

    def body(state):
        x, xb, z, it, _, _ = state
        (x, xb, z), _ = jax.lax.scan(pdhg_chunk, (x, xb, z), None,
                                     length=check_every)
        primal, dual, t_best = gap_state(x, z)
        return x, xb, z, it + check_every, primal - dual, t_best

    x0 = jnp.full((v,), 0.5, dtype)
    state = (x0, x0, jnp.zeros_like(w), jnp.asarray(0),
             jnp.asarray(jnp.inf, dtype), ts[0])
    x, _, z, it, gap, t_best = jax.lax.while_loop(cond, body, state)
    return x > t_best, gap, it


def min_cut_device(num_vertices: int, eu, ev, w, c, *,
                   graph: GraphD1 | None = None,
                   tol: float = 1e-6, it_max: int = 200_000,
                   check_every: int = 250,
                   dtype=jnp.float32, return_gap: bool = False):
    """Device-resident drop-in for :func:`..maxflow.min_cut`.

    Returns ``side`` (uint8 [V], 1 for vertices in the minimizing U), or
    ``(side, gap, certified)`` when ``return_gap`` is set.  Infinite
    entries of ``c`` are clamped beyond any finite cut, as in the host
    solver.  ``tol`` is the absolute duality-gap certificate the returned
    cut satisfies (relative to the problem's cost scale); if the PDHG
    iteration exits at ``it_max`` with the gap still above it, the cut is
    NOT certified optimal — a :class:`UserWarning` is emitted (the
    reference's analog is its ``test_consistency`` debug checker,
    ``/root/reference/src/maxflow.cpp:633``; cut-pursuit falls back to
    the host solver in that case, see ``solvers/cut_pursuit.py``).
    """
    w = np.asarray(w, np.float64)
    c = np.asarray(c, np.float64)
    big = 1.0 + 2.0 * (float(np.sum(w[np.isfinite(w)]))
                       + float(np.sum(np.abs(c[np.isfinite(c)]))))
    c = np.clip(c, -big, big)
    w = np.minimum(w, big)
    if graph is None:
        graph = GraphD1.create(eu, ev, w, num_vertices=num_vertices,
                               dtype=dtype)
    scale = max(big, 1.0)
    side, gap, it = _pdhg_min_cut(graph, jnp.asarray(w, dtype),
                                  jnp.asarray(c, dtype),
                                  jnp.asarray(tol * scale, dtype),
                                  it_max, check_every)
    side = np.asarray(jax.device_get(side)).astype(np.uint8)
    gap = float(gap)
    certified = gap <= tol * scale
    if not certified:
        warnings.warn(
            f"device min-cut exited at it_max={it_max} with duality gap "
            f"{gap:.3g} > certificate {tol * scale:.3g}; the returned cut "
            "is not certified optimal", UserWarning, stacklevel=2)
    if return_gap:
        return side, gap, certified
    return side


def min_cut_device_with_fallback(num_vertices: int, eu, ev, w, c, *,
                                 tol: float = 1e-6,
                                 it_max: int = 200_000,
                                 check_every: int = 250) -> np.ndarray:
    """Device min-cut that falls back to the host push-relabel when the
    duality-gap certificate fails — cut-pursuit's steepest cut must be
    exact, so an uncertified relaxation result is never used silently."""
    side, _, certified = min_cut_device(num_vertices, eu, ev, w, c,
                                        tol=tol, it_max=it_max,
                                        check_every=min(check_every,
                                                        it_max),
                                        return_gap=True)
    if certified:
        return side
    warnings.warn("falling back to the host min-cut solver for this cut",
                  UserWarning, stacklevel=2)
    from . import min_cut
    return min_cut(num_vertices, eu, ev, w, c)


def cut_value(eu, ev, w, c, side) -> float:
    """Objective ``sum_{v in U} c_v + boundary weight`` of a given cut."""
    side = np.asarray(side, bool)
    w = np.asarray(w, np.float64)
    c = np.asarray(c, np.float64)
    fin_c = np.where(np.isfinite(c), c, 0)
    val = float(np.sum(fin_c[side]))
    val += float(np.sum(w[side[np.asarray(eu)] != side[np.asarray(ev)]]))
    return val
