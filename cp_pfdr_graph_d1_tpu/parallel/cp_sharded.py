"""Sharded-graph device-resident cut-pursuit (the SURVEY §5 capstone).

``cut_pursuit_device`` keeps the full edge/vertex arrays and the PDHG cut
state on ONE chip; this module runs the same algorithm on a VERTEX-SHARDED
stencil graph under ``shard_map``, so cut-pursuit handles graphs larger
than one chip's HBM:

* **steepest cuts** — the certified PDHG binary-TV relaxation
  (:mod:`..maxflow.device`) runs with the iterate, duals and all O(E)
  edge state sharded into row blocks; per-iteration communication is the
  halo exchange of ``HaloStencilGraphD1`` plus psum'd certificate
  scalars.  Warm-started across CP iterations, per direction.
* **connected components** — per-shard min-label propagation + pointer
  jumping (:func:`..ops.components.connected_components_device`) on the
  block-internal subgraph, then a host union-find over the (tiny)
  boundary-edge label pairs; labels compact to the same
  smallest-global-vertex / first-encounter numbering as the
  single-device path, so results are bit-comparable.
* **contraction** — per-shard sort/compaction of the active-edge
  component pairs to a static-capacity triple list (O(active) device
  work and traffic), merged on host into the reduced graph (the reduced
  problem is o(V) by construction and replicated).
* **merge** — the deactivation test (relatively equal endpoint values)
  is per-edge local and runs sharded at the start of the next cut stage.

Host traffic per CP iteration is O(V) for the label fetch + component id
upload and o(V) for everything else; no O(E) array ever leaves the
devices.  Process-spanning meshes are supported (r05): the label /
boundary-pair / compacted-triple fetches go through
``multihost_utils.process_allgather`` when ``jax.process_count() > 1``,
the boundary union-find and the replicated reduced solve run identically
on every process (bit-identical f64 host arithmetic, same contract as
``cp_dist``), and uploads go through ``put_sharded`` (each process
places only its addressable shards) — validated by the 2-process x
4-device gloo stage of ``tests/test_multihost.py``.  Reference stages
replaced:
``/root/reference/src/CP_PFDR_graph_quadratic_d1_l1.cpp:411-549`` (cuts),
``:570-596`` (DFS components), ``:607-661`` (contraction).
"""
from __future__ import annotations

import time as _time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..config import CPOptions
from ..ops.components import connected_components_device
from ..solvers.cut_pursuit import CPResult, CPState
from ..solvers.cut_pursuit_common import (bucket, machine_eps,
                                          host_reduce_dense,
                                          host_reduce_diag)
from ..solvers.pfdr_quadratic import VertexProx
from ..stencil import StencilGraphD1
from .halo import HaloStencilGraphD1
from .mesh import put_sharded

_THRESHOLDS = 15
_TRIPLE_CAP = 1 << 16   # per-shard active-edge compaction capacity


class _Geom(NamedTuple):
    """Static geometry of one row-block shard."""
    h: int
    w: int
    h_loc: int
    shifts: tuple
    wrap: tuple
    axis: str

    @property
    def v_loc(self):
        return self.h_loc * self.w

    @property
    def e_loc(self):
        return len(self.shifts) * self.h_loc * self.w

    @property
    def halo(self):
        return max((abs(dy) for dy, _ in self.shifts), default=0)


def _crossing_mask(g: _Geom) -> np.ndarray:
    """Static bool [E_loc]: edge slots whose head lies in a neighboring
    row block (family-major layout)."""
    m = np.zeros((len(g.shifts), g.h_loc, g.w), bool)
    for k, (dy, _) in enumerate(g.shifts):
        if dy > 0:
            m[k, g.h_loc - dy:, :] = True
        elif dy < 0:
            m[k, :-dy, :] = True
    return m.reshape(-1)


def _halo_graph(g: _Geom, la_loc):
    return HaloStencilGraphD1(la_loc, (g.h_loc, g.w), g.shifts, g.wrap,
                              g.axis)


def _psum(x, axis):
    return jax.lax.psum(x, axis)


def _fetch_sharded(arr):
    """Host copy of a leading-axis-sharded global array; on a
    process-spanning mesh each process holds only its shards, so the
    fetch is an allgather (every process needs the full array for the
    replicated combinatorics)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(arr,
                                                            tiled=True))
    return np.asarray(jax.device_get(arr))


# ---------------------------------------------------------------------------
# sharded PDHG min-cut (the O(E * iters) compute, fully distributed)
# ---------------------------------------------------------------------------

def _pdhg_cut_sharded(graph, w, c, tol_rel, it_max: int,
                      check_every: int, x0, z0, axis: str):
    """Sharded twin of ``maxflow.device._pdhg_min_cut``: identical
    iteration with all reductions psum'd over the shard axis; the
    duality-gap certificate is global, so a certified cut is exactly as
    optimal as in the single-device solver.  ``w`` is the per-edge
    capacity (callers zero out active edges, or supply the
    Kolmogorov-Zabih expansion weights for the multi-label cuts);
    returns the thresholded binary side, not the separated-edge mask."""
    dtype = graph.la_d1.dtype
    big = 1.0 + 2.0 * (_psum(jnp.sum(w), axis)
                       + _psum(jnp.sum(jnp.where(jnp.isfinite(c),
                                                 jnp.abs(c), 0.0)), axis))
    c = jnp.clip(jnp.where(jnp.isfinite(c), c, big), -big, big).astype(dtype)
    tol = (tol_rel * big).astype(dtype)

    deg_w = graph.vertex_degree_weighted(w)
    tau = jnp.where(deg_w > 0, 1.0 / jnp.maximum(deg_w, 1e-30),
                    1.0 / jnp.maximum(jnp.abs(c), 1e-12))
    sigma = jnp.where(w > 0, 0.5 / jnp.maximum(w, 1e-30), 0.0)
    ts = jnp.linspace(0.03, 0.97, _THRESHOLDS, dtype=dtype)

    def cut_values(x):
        side = x[:, None] > ts[None, :]
        lin = _psum(jnp.sum(jnp.where(side, c[:, None], 0), axis=0), axis)
        su, sv = graph.gather_endpoints(side)
        bnd = _psum(jnp.sum(jnp.where(su != sv, w[:, None], 0), axis=0),
                    axis)
        return lin + bnd

    def gap_state(x, z):
        ktz = graph.edge_to_vertex_sum(w * z, -(w * z))
        dual = _psum(jnp.sum(jnp.minimum(c + ktz, 0)), axis)
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
        _, _, _, it, gap, _ = state
        return jnp.logical_and(it < it_max, gap > tol)

    def body(state):
        x, xb, z, it, _, _ = state
        (x, xb, z), _ = jax.lax.scan(pdhg_chunk, (x, xb, z), None,
                                     length=check_every)
        primal, dual, t_best = gap_state(x, z)
        return x, xb, z, it + check_every, primal - dual, t_best

    state = (x0, x0, z0, jnp.asarray(0), jnp.asarray(jnp.inf, dtype),
             ts[0])
    x, _, z, _, gap, t_best = jax.lax.while_loop(cond, body, state)
    side = x > t_best
    return side, gap, big, x, z


# ---------------------------------------------------------------------------
# per-shard stages (bodies run inside shard_map)
# ---------------------------------------------------------------------------

def _stage_cut(y_loc, a_loc, la_loc, la_l1_loc, active, cv_loc, rx,
               cx1, cz1, cx2, cz2, *, g: _Geom, op_kind: str, has_l1: bool,
               positivity: bool, lo: float, hi: float,
               differentiable: bool, dif_tol: float, eps: float,
               cut_tol: float, cut_it_max: int, check_every: int,
               first: bool):
    """Merge + direction costs + the one/two sharded PDHG cuts."""
    graph = _halo_graph(g, la_loc)
    x = rx[cv_loc]

    # -- merge almost-equal neighboring components (local per edge) --------
    if not first:
        xu, xv = graph.gather_endpoints(x)
        d = jnp.abs(xu - xv)
        amax = jnp.maximum(jnp.abs(xu), jnp.abs(xv))
        rel = jnp.where(amax > eps, d / jnp.maximum(amax, eps), d / eps)
        active = active & ~(rel <= dif_tol)

    # -- direction costs (cut_pursuit.py host twin) ------------------------
    if op_kind == "identity":
        dfs = x - y_loc
    elif op_kind == "diag":
        dfs = a_loc * x - y_loc
    else:  # dense, column-sharded: grad = -A_loc^T (obs - psum(A_loc x))
        r = y_loc - _psum(jnp.matmul(a_loc, x,
                                     precision=jax.lax.Precision.HIGHEST),
                          g.axis)
        dfs = -jnp.matmul(a_loc.T, r,
                          precision=jax.lax.Precision.HIGHEST)
    xu, xv = graph.gather_endpoints(x)
    s = jnp.sign(xu - xv) * jnp.where(active, graph.la_d1, 0.0)
    dfs = dfs + graph.edge_to_vertex_sum(s, -s)
    if has_l1:
        dfs = dfs + jnp.sign(x) * la_l1_loc
    zero = x == 0
    if differentiable:
        c1, c2 = dfs, -dfs
    elif has_l1 or positivity:
        l1 = la_l1_loc if has_l1 else jnp.zeros_like(x)
        c1 = dfs + jnp.where(zero, l1, 0.0)
        if positivity:
            c2 = jnp.where(zero, jnp.inf, -dfs)
        else:
            c2 = -dfs + jnp.where(zero, l1, 0.0)
    else:  # bounds
        c1 = jnp.where(x == hi, jnp.inf, dfs) if np.isfinite(hi) else dfs
        c2 = jnp.where(x == lo, jnp.inf, -dfs) if np.isfinite(lo) else -dfs

    w_cut = jnp.where(active, 0.0, graph.la_d1)
    cuttable = ~active & (graph.la_d1 > 0)

    def separated(side):
        su, sv = graph.gather_endpoints(side)
        return (su != sv) & cuttable

    side1, gap1, big1, cx1, cz1 = _pdhg_cut_sharded(
        graph, w_cut, c1, cut_tol, cut_it_max, check_every, cx1, cz1,
        g.axis)
    sep = separated(side1)
    if differentiable:
        gap2, big2 = jnp.zeros_like(gap1), jnp.ones_like(big1)
    else:
        side2, gap2, big2, cx2, cz2 = _pdhg_cut_sharded(
            graph, w_cut, c2, cut_tol, cut_it_max, check_every, cx2, cz2,
            g.axis)
        sep = sep | separated(side2)
    active = active | sep
    n_new = _psum(jnp.sum(sep.astype(jnp.int32)), g.axis)
    return active, n_new, jnp.stack([gap1, big1, gap2, big2]), \
        cx1, cz1, cx2, cz2


def _stage_components(la_loc, active, *, g: _Geom):
    """Per-shard pointer-jumping components + boundary label pairs."""
    crossing = jnp.asarray(_crossing_mask(g))
    mask = ~active & (la_loc > 0) & ~crossing
    local = StencilGraphD1(la_loc, (g.h_loc, g.w), g.shifts,
                           (False, g.wrap[1]))
    lab = connected_components_device(local, mask)            # [V_loc]
    p = jax.lax.axis_index(g.axis)
    glab = (lab + p * g.v_loc).reshape(g.h_loc, g.w)

    # halo-extend the global labels to read the neighbors' boundary rows
    hd = g.halo
    n = jax.lax.psum(1, g.axis)
    up = [(i, (i + 1) % n) for i in range(n)]
    dn = [(i, (i - 1) % n) for i in range(n)]
    top = jax.lax.ppermute(glab[-hd:], g.axis, up) if hd else glab[:0]
    bot = jax.lax.ppermute(glab[:hd], g.axis, dn) if hd else glab[:0]
    ext = jnp.concatenate([top, glab, bot], axis=0)

    pairs, valid = [], []
    act3 = active.reshape(len(g.shifts), g.h_loc, g.w)
    la3 = la_loc.reshape(len(g.shifts), g.h_loc, g.w)
    for k, (dy, dx) in enumerate(g.shifts):
        if dy == 0:
            continue
        rows = (range(g.h_loc - dy, g.h_loc) if dy > 0
                else range(0, -dy))
        for i in rows:
            u_lab = glab[i]                                   # [W]
            v_lab = jnp.roll(ext[hd + i + dy], -dx)
            pairs.append(jnp.stack([u_lab, v_lab], axis=1))
            valid.append(~act3[k, i] & (la3[k, i] > 0))
    if pairs:
        return lab, jnp.concatenate(pairs), jnp.concatenate(valid)
    z = jnp.zeros((1, 2), jnp.int32)
    return lab, z, jnp.zeros((1,), bool)


def _stage_triples(la_loc, active, cv_loc, *, g: _Geom, cap: int):
    """Compacted (cv_u, cv_v, w) triples of the local active edges."""
    graph = _halo_graph(g, la_loc)
    cu, cv = graph.gather_endpoints(cv_loc)
    sel = active & (la_loc > 0)
    count = jnp.sum(sel.astype(jnp.int32))
    idx = jnp.nonzero(sel, size=cap, fill_value=g.e_loc)[0]
    ok = idx < g.e_loc
    safe = jnp.where(ok, idx, 0)
    return (jnp.where(ok, cu[safe], 0).astype(jnp.int32),
            jnp.where(ok, cv[safe], 0).astype(jnp.int32),
            jnp.where(ok, la_loc[safe], 0.0), count)


# ---------------------------------------------------------------------------
# host-side pieces
# ---------------------------------------------------------------------------

def _merge_boundary(labs: np.ndarray, pairs: np.ndarray,
                    valid: np.ndarray, v_loc: int):
    """Union-find over the boundary label pairs; returns (num_components,
    cv [V] int32) with the single-device first-encounter numbering."""
    p_shards = labs.shape[0]
    glab = (labs + (np.arange(p_shards)[:, None] * v_loc)).reshape(-1)
    pu = pairs[..., 0].reshape(-1)[valid.reshape(-1)]
    pv = pairs[..., 1].reshape(-1)[valid.reshape(-1)]
    uniq = np.unique(glab)
    comp = np.searchsorted(uniq, glab)
    n = len(uniq)
    if len(pu):
        import scipy.sparse as _sp
        from scipy.sparse.csgraph import connected_components as _cc
        a = np.searchsorted(uniq, pu)
        b = np.searchsorted(uniq, pv)
        adj = _sp.coo_matrix((np.ones(len(a), np.int8), (a, b)),
                             shape=(n, n))
        ncc, cls = _cc(adj, directed=False)
    else:
        ncc, cls = n, np.arange(n)
    # each merged class keeps its smallest global vertex index as the
    # representative, preserving the reference's first-encounter component
    # numbering (single-device path numbers by smallest member)
    rep = np.full(ncc, np.iinfo(np.int64).max)
    np.minimum.at(rep, cls, uniq)
    root_glab = rep[cls]
    order = np.unique(root_glab)
    compact = np.searchsorted(order, root_glab)
    return len(order), compact[comp].astype(np.int32)


def _reduce_pairs(ru, rv, w, num_components: int, eps: float):
    """``build_reduced_graph`` semantics from pre-selected active pairs."""
    lo = np.minimum(ru, rv)
    hi = np.maximum(ru, rv)
    keys = lo.astype(np.int64) * num_components + hi
    uniq, inv = np.unique(keys, return_inverse=True)
    wsum = np.bincount(inv, weights=w, minlength=len(uniq))
    r_eu = (uniq // num_components).astype(np.int32)
    r_ev = (uniq % num_components).astype(np.int32)
    touched = np.zeros(num_components, bool)
    touched[r_eu] = True
    touched[r_ev] = True
    iso = np.nonzero(~touched)[0].astype(np.int32)
    if len(iso):
        r_eu = np.concatenate([r_eu, iso])
        r_ev = np.concatenate([r_ev, iso])
        wsum = np.concatenate([wsum, np.full(len(iso), eps)])
    return r_eu, r_ev, wsum


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def cp_quadratic_d1_sharded(obs, graph: StencilGraphD1, mesh: Mesh, *,
                            a=None, la_l1=None, positivity: bool = False,
                            bounds=None,
                            opt: CPOptions = CPOptions(),
                            state: Optional[CPState] = None,
                            axis: str = "dp") -> CPResult:
    """Sharded-graph device cut-pursuit on a stencil graph.

    Args:
      obs: observation — ``y`` [V] for identity/diag, [N] for dense ``a``.
      graph: the GLOBAL stencil graph (row-sharded internally).
      mesh: 1-D device mesh; H must divide by its size, block height >=
        the stencil halo.
      a: None (identity), [V] diagonal, or [N, V] dense design matrix.
      state: optional warm restart (``CPResult.state``).

    Returns a :class:`CPResult`; ``cv``/``rx`` match the single-device
    solver's numbering (tested in ``tests/test_parallel.py``).
    """
    t0 = _time.monotonic()
    h, w = graph.field_shape
    num_shards = int(mesh.devices.size)
    if h % num_shards:
        raise ValueError(f"H={h} not divisible by {num_shards} shards")
    g = _Geom(h, w, h // num_shards, graph.shifts, graph.wrap, axis)
    if g.h_loc < g.halo:
        raise ValueError(f"block height {g.h_loc} < halo {g.halo}")
    num_v = h * w
    f = len(g.shifts)
    dtype = np.dtype(np.asarray(obs).dtype)

    if bounds is not None and (la_l1 is not None or positivity):
        raise ValueError("bounds is exclusive with la_l1/positivity")
    lo, hi = (-np.inf, np.inf) if bounds is None else (
        float(bounds[0]), float(bounds[1]))
    has_l1 = la_l1 is not None
    if has_l1:
        la_l1 = np.broadcast_to(np.asarray(la_l1, dtype), (num_v,)).copy()
    differentiable = (not has_l1 and not positivity
                      and not (np.isfinite(lo) or np.isfinite(hi)))
    if bounds is not None:
        vprox = VertexProx(kind="bounds", lo=lo, hi=hi)
    elif has_l1 or positivity:
        vprox = VertexProx(kind="l1", positivity=positivity)
        if not has_l1:
            la_l1 = np.zeros(num_v, dtype)
    else:
        vprox = VertexProx()
    eps = machine_eps(dtype, opt.dif_tol)
    dif_tol2 = opt.dif_tol * opt.dif_tol

    # -- shard the per-vertex / per-edge fields ----------------------------
    def vblocks(x):
        return np.asarray(x).reshape(num_shards, g.v_loc)

    la_np = np.asarray(graph.la_d1).reshape(f, h, w)
    la_blocks = np.stack(
        [la_np[:, p * g.h_loc:(p + 1) * g.h_loc, :].reshape(-1)
         for p in range(num_shards)])
    obs_np = np.asarray(obs)
    op_kind = "identity" if a is None else (
        "diag" if np.asarray(a).ndim == 1 else "dense")
    if op_kind == "dense":
        a_np = np.asarray(a, np.float64)
        a_t_np = np.ascontiguousarray(a_np.T)
        n_obs = a_np.shape[0]
        a_blocks = np.stack(
            [a_np.reshape(n_obs, h, w)[:, p * g.h_loc:(p + 1) * g.h_loc, :]
             .reshape(n_obs, -1).astype(dtype) for p in range(num_shards)])
        y_loc_host = np.broadcast_to(obs_np, (num_shards,) + obs_np.shape)
        diag_np = None
    else:
        diag_np = (np.ones(num_v) if op_kind == "identity"
                   else np.asarray(a, np.float64))
        a_blocks = (vblocks(np.zeros(num_v, dtype)) if op_kind == "identity"
                    else vblocks(np.asarray(a, dtype)))
        y_loc_host = vblocks(obs_np)
    la_l1_blocks = vblocks(la_l1 if (has_l1 or positivity)
                           else np.zeros(num_v, dtype))
    y64 = (obs_np.astype(np.float64) if op_kind != "dense"
           else obs_np.astype(np.float64))

    sh = partial(put_sharded, mesh=mesh, spec=P(axis))
    y_dev = sh(y_loc_host.astype(dtype))
    a_dev = sh(a_blocks)
    la_dev = sh(la_blocks.astype(dtype))
    la_l1_dev = sh(la_l1_blocks)
    active_dev = sh(np.zeros((num_shards, g.e_loc), bool))
    cx1 = cx2 = sh(np.full((num_shards, g.v_loc), 0.5, dtype))
    cz1 = cz2 = sh(np.zeros((num_shards, g.e_loc), dtype))

    # -- scalar initialization (host; reference :66-175) -------------------
    if state is None:
        if op_kind == "dense":
            a1 = a_np.sum(axis=1)
            ry1, raa1 = float(a1 @ y64), float(a1 @ a1)
        else:
            ry1, raa1 = float(y64.sum()), float(diag_np.sum())
        if bounds is not None:
            x1 = min(max(ry1 / raa1, lo), hi)
        else:
            rl1 = float(la_l1.sum()) if has_l1 else 0.0
            if ry1 > rl1:
                x1 = (ry1 - rl1) / raa1
            elif not positivity and ry1 < -rl1:
                x1 = (ry1 + rl1) / raa1
            else:
                x1 = 0.0
        cv = np.zeros(num_v, np.int32)
        rx = np.asarray([x1], dtype)
        num_comp = 1
    else:
        cv = state.cv.copy()
        rx = state.rx.copy()
        num_comp = len(rx)
        active_dev = sh(np.asarray(state.active).reshape(num_shards,
                                                         g.e_loc))

    # -- shard_map stage wrappers (bound to the static geometry) -----------
    chk = min(250, opt.cut_it_max)
    cut_static = dict(g=g, op_kind=op_kind, has_l1=has_l1 or positivity,
                      positivity=positivity, lo=lo, hi=hi,
                      differentiable=differentiable, dif_tol=opt.dif_tol,
                      eps=eps, cut_tol=opt.cut_tol,
                      cut_it_max=opt.cut_it_max, check_every=chk)

    def make_cut(first):
        def body(y_l, a_l, la_l, l1_l, act, cv_l, rx_r, x1, z1, x2, z2):
            act, n_new, gaps, x1, z1, x2, z2 = _stage_cut(
                y_l[0], a_l[0], la_l[0], l1_l[0], act[0], cv_l[0], rx_r,
                x1[0], z1[0], x2[0], z2[0], first=first, **cut_static)
            return (act[None], n_new, gaps, x1[None], z1[None], x2[None],
                    z2[None])
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(), P(), P(axis), P(axis), P(axis),
                       P(axis)),
            check_vma=False)

    cut_first = make_cut(True)
    cut_rest = make_cut(False)

    def comp_body(la_l, act):
        lab, pairs, valid = _stage_components(la_l[0], act[0], g=g)
        return lab[None], pairs[None], valid[None]

    comp_stage = jax.shard_map(
        comp_body, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False)

    tri_cap = [min(_TRIPLE_CAP, g.e_loc)]
    _tri_stages = {}

    def tri_stage(la_l, act, cv_l):
        """Compaction with overflow retry: the capacity is a static
        shard_map kwarg, so doubling it is one retrace — never a
        mid-solve abort (a noisy problem can legitimately cross the
        default cap after a few cuts)."""
        while True:
            cap = tri_cap[0]
            if cap not in _tri_stages:
                def body(la_l, act, cv_l, cap=cap):
                    tu, tv, tw, cnt = _stage_triples(
                        la_l[0], act[0], cv_l[0], g=g, cap=cap)
                    return tu[None], tv[None], tw[None], cnt[None]
                _tri_stages[cap] = jax.shard_map(
                    body, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(axis), P(axis), P(axis)),
                    check_vma=False)
            out = _tri_stages[cap](la_l, act, cv_l)
            cnt = _fetch_sharded(out[3])
            if not np.any(cnt > cap):
                return out
            tri_cap[0] = min(max(2 * cap, int(cnt.max())), g.e_loc)

    # -- main loop ---------------------------------------------------------
    times = [0.0]
    difs = []
    x_prev = rx[cv]
    it = 0
    dif = max(dif_tol2, 1.0)
    pfdr_it_prev = opt.pfdr.it_max

    from .. import native
    use_native = native.available()

    while it < opt.it_max and dif >= dif_tol2:
        rv_cap = bucket(num_comp)
        rx_pad = np.zeros(rv_cap, dtype)
        rx_pad[:num_comp] = rx
        cv_dev = sh(vblocks(cv))
        stage = cut_first if it == 0 and state is None else cut_rest
        (active_dev, n_new_d, gaps, cx1, cz1, cx2, cz2) = stage(
            y_dev, a_dev, la_dev, la_l1_dev, active_dev, cv_dev,
            jnp.asarray(rx_pad), cx1, cz1, cx2, cz2)
        n_new = int(n_new_d)
        gaps = np.asarray(jax.device_get(gaps))
        if (gaps[0] > opt.cut_tol * gaps[1]
                or gaps[2] > opt.cut_tol * gaps[3]):
            import warnings
            warnings.warn("sharded PDHG cut exited uncertified (gap "
                          f"{gaps[0]:.3g}/{gaps[2]:.3g}); increase "
                          "cut_it_max", UserWarning, stacklevel=2)

        if n_new == 0:
            difs.append(0.0)
            dif = 0.0
            it += 1
            times.append(_time.monotonic() - t0)
            continue

        # -- components: sharded pointer jumping + host boundary merge ----
        lab_d, pairs_d, valid_d = comp_stage(la_dev, active_dev)
        labs = _fetch_sharded(lab_d)
        pairs = _fetch_sharded(pairs_d)
        valid = _fetch_sharded(valid_d)
        num_comp, cv = _merge_boundary(labs, pairs, valid, g.v_loc)

        # -- contraction: sharded compaction + host merge ------------------
        cv_dev = sh(vblocks(cv))
        tu_d, tv_d, tw_d, _cnt_d = tri_stage(la_dev, active_dev, cv_dev)
        tu = _fetch_sharded(tu_d).reshape(-1)
        tv = _fetch_sharded(tv_d).reshape(-1)
        tw = _fetch_sharded(tw_d).reshape(-1).astype(np.float64)
        keep = tw > 0
        reu, rev, rla = _reduce_pairs(tu[keep], tv[keep], tw[keep],
                                      num_comp, eps)

        # -- reduced solve (replicated; the reduced problem is o(V)) -------
        rx0 = np.zeros(num_comp, np.float64)
        # warm start: components are constant on vertices; any
        # representative value works — use segment means of the previous
        # full iterate
        cnt_c = np.bincount(cv, minlength=num_comp)
        np.add.at(rx0, cv, x_prev.astype(np.float64))
        rx0 = rx0 / np.maximum(cnt_c, 1)
        if op_kind == "dense":
            pre_at = num_comp < (2 * n_obs * pfdr_it_prev) // (
                n_obs + pfdr_it_prev)
            mode, mat, ry, lipsch = host_reduce_dense(a_t_np, y64, cv,
                                                      num_comp, pre_at)
        else:
            mat, ry, lipsch = host_reduce_diag(diag_np, y64, cv, num_comp)
            mode = 0
        r_la_l1 = None
        if has_l1 or positivity:
            r_la_l1 = np.zeros(num_comp)
            np.add.at(r_la_l1, cv, la_l1.astype(np.float64))
        if use_native:
            rx_new, pfdr_it = native.pfdr_quadratic_d1_host(
                mode, mat, ry, reu, rev, rla,
                la_l1=r_la_l1, positivity=vprox.positivity,
                bounds=(lo, hi) if bounds is not None else None,
                lip_diag=np.asarray(lipsch, np.float64),
                rho=opt.pfdr.rho, cond_min=opt.pfdr.cond_min,
                dif_rcd=opt.pfdr.dif_rcd, dif_tol=opt.pfdr.dif_tol,
                it_max=opt.pfdr.it_max, x0=rx0)
        else:
            rx_new, pfdr_it = _jax_reduced_solve(
                mode, mat, ry, reu, rev, rla, r_la_l1, vprox, lipsch,
                rx0, opt, bounds, dtype)
        pfdr_it_prev = max(int(pfdr_it), 1)
        rx = rx_new.astype(dtype)

        x_full = rx[cv]
        delta = x_full - x_prev
        den = float(np.dot(x_full, x_full))
        dif = float(np.dot(delta, delta)) / (den if den > eps else eps)
        difs.append(dif)
        x_prev = x_full
        it += 1
        times.append(_time.monotonic() - t0)
        if opt.verbose:
            print(f"CP(sharded) it {it}: {num_comp} components, "
                  f"dif {dif:.3g}")

    active_host = _fetch_sharded(active_dev).reshape(-1)
    return CPResult(cv=cv, rx=rx, it=it, time=np.asarray(times),
                    obj=np.zeros(0, dtype), dif=np.asarray(difs),
                    state=CPState(active=active_host, cv=cv, rx=rx))


def _jax_reduced_solve(mode, mat, ry, reu, rev, rla, r_la_l1, vprox,
                       lipsch, rx0, opt: CPOptions, bounds, dtype):
    """Toolchain-free fallback: the staged jitted solver on the (small,
    replicated) reduced problem."""
    from ..config import Lipsch
    from ..graph import GraphD1
    from ..operators import DenseOp, DiagOp, GramOp
    from ..solvers.pfdr_quadratic import pfdr_quadratic_d1

    num_comp = len(rx0)
    gg = GraphD1.create(reu, rev, np.asarray(rla, dtype),
                        num_vertices=num_comp, dtype=jnp.dtype(dtype))
    if mode == 0:
        r_op = DiagOp(jnp.asarray(mat, dtype))
    elif mode == -1:
        r_op = GramOp(jnp.asarray(mat, dtype))
    else:
        r_op = DenseOp(jnp.asarray(mat, dtype))
    res = pfdr_quadratic_d1(
        r_op, jnp.asarray(ry, dtype), gg,
        la_l1=None if r_la_l1 is None else jnp.asarray(r_la_l1, dtype),
        vprox=vprox, lipsch=jnp.asarray(lipsch, dtype),
        ltype=Lipsch.DIAG, x0=jnp.asarray(rx0, dtype), opt=opt.pfdr)
    return np.asarray(jax.device_get(res.x)), int(res.it)
