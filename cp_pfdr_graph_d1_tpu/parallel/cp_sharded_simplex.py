"""Sharded-graph device-resident cut-pursuit for the multi-label family.

Multi-label twin of :mod:`.cp_sharded`: cut-pursuit for
``sum_v f_al(p_v; q_v) + sum_e la_d1 ||p_u - p_v||_1`` over per-vertex
simplex distributions, on a VERTEX-SHARDED stencil graph under
``shard_map``, so the O(E K)-state outer loop handles graphs larger than
one chip's HBM:

* **K-1 alpha-expansion cuts** — the Kolmogorov-Zabih binary energies
  (re-expressed as symmetric weights + unary credits, exactly as the host
  loop :func:`..solvers.cut_pursuit_simplex._alpha_expansion_cuts`) are
  solved by the certified sharded PDHG min-cut of
  :func:`.cp_sharded._pdhg_cut_sharded`, with the loss gradient, the
  per-label unary construction, and all O(E) edge state sharded into row
  blocks; each expansion cut warm-starts from the same label's relaxed
  state of the previous CP iteration.  The cuts are sequential in ``n``
  (cut ``n`` consumes the labels of cut ``n-1``) but run inside ONE
  ``shard_map`` dispatch; certificates sync in one host round trip.
* **components / contraction** — reuse the sharded pointer-jumping +
  host boundary-merge stages of the quadratic module unchanged (they
  depend only on ``active``/``la``).
* **reduced solve** — component barycenters ([rV, K]) accumulate on
  host from the observation copy (o(V) reduced problem, replicated),
  then the native C++ f64 multi-label PFDR (or the jitted solver when
  the toolchain is absent) solves the contracted problem — the same
  contract as the quadratic module's replicated reduced stage.

Host traffic per CP iteration is O(V) for the label/component exchange;
no O(E) or O(E K) array ever leaves the devices.  Reference stages
replaced: ``/root/reference/src/CP_PFDR_graph_loss_d1_simplex.cpp:522-618``
(expansion cuts), ``:643-731`` (contraction), ``:733-766`` (reduced
observations) at beyond-one-chip scale.
"""
from __future__ import annotations

import time as _time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from .. import native
from ..config import CPOptions
from ..solvers.cut_pursuit_common import bucket, machine_eps, np64
from ..solvers.cut_pursuit_simplex import CPSimplexResult, CPSimplexState
from ..stencil import StencilGraphD1
from .cp_sharded import (_Geom, _fetch_sharded, _halo_graph, _merge_boundary,
                         _pdhg_cut_sharded, _psum, _reduce_pairs,
                         _stage_components, _stage_triples)
from .mesh import put_sharded


def _sel_label(a, idx, k: int):
    """``a[v, idx[v]]`` over the label axis as a one-hot contraction
    (K is small and static; no serial gather)."""
    oh = jax.nn.one_hot(idx, k, dtype=a.dtype)
    return jnp.sum(a * oh, axis=-1)


def _stage_cut_simplex(q_loc, la_loc, active, cv_loc, rp, rdi, cx, cz, *,
                       g: _Geom, al: float, k: int, eps: float,
                       cut_tol: float, cut_it_max: int, check_every: int,
                       first: bool):
    """Merge + loss gradient + the K-1 sharded PDHG expansion cuts."""
    graph = _halo_graph(g, la_loc)
    p_loc = rp[cv_loc]                       # [V_loc, K]

    # -- merge almost-equal neighboring components (:782-804, applied at
    # the start of the next cut exactly as the quadratic module) ----------
    if not first:
        pu, pv = graph.gather_endpoints(p_loc)
        d = jnp.max(jnp.abs(pu - pv), axis=-1)
        active = active & ~(d <= eps)

    # -- loss gradient + active-edge d1 subgradients (:327-377) -----------
    if al == 0.0:
        dfs = -q_loc
    elif al == 1.0:
        dfs = p_loc - q_loc
    else:
        al_k = al / k
        al_1 = 1.0 - al
        dfs = -(al_k + al_1 * q_loc) / (al_k / al_1 + p_loc)
    pu, pv = graph.gather_endpoints(p_loc)
    d = pu - pv
    s = jnp.where(d > eps, 1.0, jnp.where(d < -eps, -1.0, 0.0))
    s = jnp.where(active[:, None], s * la_loc[:, None], 0.0)
    dfs = dfs + graph.edge_to_vertex_sum(s, -s)

    # -- K-1 expansion cuts (:522-606) -------------------------------------
    i_of_v = rdi[cv_loc]
    dfs_i = _sel_label(dfs, i_of_v, k)
    inact0 = ~active & (la_loc > 0)
    djv = jnp.zeros(p_loc.shape[:1], jnp.int32)
    gaps = []
    cx_new = []
    cz_new = []
    for n in range(1, k):
        j_of_v = jnp.where(n > i_of_v, n, n - 1)
        dfs_j = _sel_label(dfs, j_of_v, k)
        cur = jnp.where(djv > i_of_v, djv, jnp.maximum(djv - 1, 0))
        dfs_cur = _sel_label(dfs, cur, k)
        theta = jnp.where(djv == 0, dfs_j - dfs_i,
                          jnp.where(djv == n, 0.0, dfs_j - dfs_cur))
        du, dv = graph.gather_endpoints(djv)
        same = du == dv
        valid = ~active & (la_loc > 0)
        w = jnp.where(valid, jnp.where(same, 2.0 * la_loc, la_loc), 0.0)
        credit = jnp.where(valid & ~same, la_loc, 0.0)
        theta = theta - graph.edge_to_vertex_sum(credit, credit)
        side, gap, big, xn, zn = _pdhg_cut_sharded(
            graph, w, theta, cut_tol, cut_it_max, check_every,
            cx[n - 1], cz[n - 1], g.axis)
        cx_new.append(xn)
        cz_new.append(zn)
        gaps.append(jnp.stack([gap, big]))
        djv = jnp.where(side, jnp.int32(n), djv)
    du, dv = graph.gather_endpoints(djv)
    sep = inact0 & (du != dv)
    active = active | sep
    n_new = _psum(jnp.sum(sep.astype(jnp.int32)), g.axis)
    return (active, n_new, jnp.stack(gaps), jnp.stack(cx_new),
            jnp.stack(cz_new))


def cp_loss_d1_simplex_sharded(q, graph: StencilGraphD1, mesh: Mesh, *,
                               al: float, opt: CPOptions = CPOptions(),
                               state: Optional[CPSimplexState] = None,
                               axis: str = "dp") -> CPSimplexResult:
    """Sharded-graph device cut-pursuit, multi-label family.

    Args:
      q: [V, K] observations (vertex-major).
      graph: the GLOBAL stencil graph (row-sharded internally).
      mesh: 1-D device mesh; H must divide by its size, block height >=
        the stencil halo.
      al: loss selector — 0 linear, 1 quadratic, in ]0,1[ smoothed-KL.
      opt: outer options; ``opt.dif_tol >= 1`` switches the stopping
        criterion to the number of changed maximum-likelihood labels.
      state: optional warm restart (``CPSimplexResult.state``).

    Returns a :class:`..solvers.cut_pursuit_simplex.CPSimplexResult`
    whose partition/values match the single-device device-cut solver
    (tested on the 8-device virtual mesh in ``tests/test_parallel.py``).
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
    q_np = np.asarray(q)
    k = q_np.shape[1]
    if k < 2:
        raise ValueError("multi-label cut-pursuit needs K >= 2 labels")
    dtype = q_np.dtype
    label_mode = opt.dif_tol >= 1.0
    tol_scale = opt.dif_tol / num_v if label_mode else opt.dif_tol
    ptol = (opt.pfdr.dif_tol / num_v if opt.pfdr.dif_tol >= 1
            else opt.pfdr.dif_tol)
    eps = machine_eps(dtype, min(tol_scale, ptol))

    # -- shard the per-vertex / per-edge fields ----------------------------
    la_np = np.asarray(graph.la_d1).reshape(f, h, w)
    la_blocks = np.stack(
        [la_np[:, p * g.h_loc:(p + 1) * g.h_loc, :].reshape(-1)
         for p in range(num_shards)])
    q_blocks = q_np.reshape(num_shards, g.v_loc, k)

    sh = partial(put_sharded, mesh=mesh, spec=P(axis))
    q_dev = sh(q_blocks.astype(dtype))
    la_dev = sh(la_blocks.astype(dtype))
    active_dev = sh(np.zeros((num_shards, g.e_loc), bool))
    cx = sh(np.full((num_shards, k - 1, g.v_loc), 0.5, dtype))
    cz = sh(np.zeros((num_shards, k - 1, g.e_loc), dtype))

    # -- initialization: unisimplicial solution (:66-148) -------------------
    if state is None:
        qsum0 = q_np.sum(axis=0)
        if al == 0.0:
            rp = np.zeros((1, k), dtype)
            rp[0, np.argmax(qsum0)] = 1.0
        else:
            rp = (qsum0 / num_v)[None, :].astype(dtype)
        cv = np.zeros(num_v, np.int32)
        num_comp = 1
    else:
        cv = state.cv.copy()
        rp = state.rp.copy()
        num_comp = len(rp)
        active_dev = sh(np.asarray(state.active).reshape(num_shards,
                                                         g.e_loc))

    use_native = native.available()
    chk = min(250, opt.cut_it_max)
    cut_static = dict(g=g, al=float(al), k=k, eps=eps, cut_tol=opt.cut_tol,
                      cut_it_max=opt.cut_it_max, check_every=chk)

    def make_cut(first):
        def body(q_l, la_l, act, cv_l, rp_r, rdi_r, x, z):
            act, n_new, gaps, x, z = _stage_cut_simplex(
                q_l[0], la_l[0], act[0], cv_l[0], rp_r, rdi_r, x[0], z[0],
                first=first, **cut_static)
            return act[None], n_new, gaps, x[None], z[None]
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(),
                      P(axis), P(axis)),
            out_specs=(P(axis), P(), P(), P(axis), P(axis)),
            check_vma=False)

    cut_first = make_cut(True)
    cut_rest = make_cut(False)

    def comp_body(la_l, act):
        lab, pairs, valid = _stage_components(la_l[0], act[0], g=g)
        return lab[None], pairs[None], valid[None]

    comp_stage = jax.shard_map(
        comp_body, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False)

    tri_cap = [min(1 << 16, g.e_loc)]
    _tri_stages = {}

    def tri_stage(la_l, act, cv_l):
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

    def vblocks(x):
        return np.asarray(x).reshape(num_shards, g.v_loc)

    def solve_reduced(rq, rla_f, reu, rev, rla, rp0):
        if use_native:
            rp_new, _ = native.pfdr_loss_d1_simplex_host(
                np64(rq), al, reu, rev, np64(rla),
                la_f=np64(rla_f) if rla_f is not None else None,
                rho=opt.pfdr.rho, cond_min=opt.pfdr.cond_min,
                dif_rcd=opt.pfdr.dif_rcd, dif_tol=opt.pfdr.dif_tol,
                it_max=opt.pfdr.it_max, p0=rp0)
            return rp_new.astype(dtype)
        from ..graph import GraphD1
        from ..solvers.pfdr_simplex import pfdr_loss_d1_simplex
        gg = GraphD1.create(reu, rev, np.asarray(rla, dtype),
                            num_vertices=len(rp0), dtype=jnp.dtype(dtype))
        res = pfdr_loss_d1_simplex(
            gg, jnp.asarray(rq, dtype), al=al,
            la_f=jnp.asarray(rla_f, dtype) if rla_f is not None else None,
            p0=jnp.asarray(rp0, dtype), opt=opt.pfdr)
        return np.asarray(jax.device_get(res.p)).astype(dtype)

    # -- main loop ---------------------------------------------------------
    times = [0.0]
    difs = []
    prev_labels = np.argmax(rp, axis=1)[cv]
    prev_p_full = rp[cv]
    it = 0
    dif = max(opt.dif_tol, 1.0)

    while it < opt.it_max and dif >= opt.dif_tol:
        rv_cap = bucket(num_comp)
        rp_pad = np.full((rv_cap, k), 1.0 / k, dtype)
        rp_pad[:num_comp] = rp
        rdi_pad = np.argmax(rp_pad, axis=1).astype(np.int32)
        cv_dev = sh(vblocks(cv))
        stage = cut_first if it == 0 and state is None else cut_rest
        active_dev, n_new_d, gaps, cx, cz = stage(
            q_dev, la_dev, active_dev, cv_dev, jnp.asarray(rp_pad),
            jnp.asarray(rdi_pad), cx, cz)
        n_new = int(n_new_d)
        certs = np.asarray(jax.device_get(gaps))
        if np.any(certs[:, 0] > opt.cut_tol * certs[:, 1]):
            import warnings
            bad = np.nonzero(certs[:, 0] > opt.cut_tol * certs[:, 1])[0]
            warnings.warn("sharded PDHG expansion cut exited uncertified "
                          f"(cuts {bad + 1}); increase cut_it_max",
                          UserWarning, stacklevel=2)

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
        tu_d, tv_d, tw_d, _ = tri_stage(la_dev, active_dev, cv_dev)
        tu = _fetch_sharded(tu_d).reshape(-1)
        tv = _fetch_sharded(tv_d).reshape(-1)
        tw = _fetch_sharded(tw_d).reshape(-1).astype(np.float64)
        keep = tw > 0
        reu, rev, rla = _reduce_pairs(tu[keep], tv[keep], tw[keep],
                                      num_comp, eps)

        # -- reduced observations + solve (:733-780, replicated) -----------
        qsum = np.zeros((num_comp, k), np.float64)
        np.add.at(qsum, cv, q_np.astype(np.float64))
        sizes = np.bincount(cv, minlength=num_comp).astype(np.float64)
        if al == 0.0:
            rq = qsum
            rp0 = np.zeros((num_comp, k))
            rp0[np.arange(num_comp), np.argmax(qsum, axis=1)] = 1.0
            rla_f = None
        else:
            rq = qsum / np.maximum(sizes, 1)[:, None]
            rp0 = rq.copy()
            rla_f = sizes
        rp = solve_reduced(rq, rla_f, reu, rev, rla, rp0)

        # -- evolution (:806-917) ------------------------------------------
        p_full = rp[cv]
        if label_mode:
            labels = np.argmax(rp, axis=1)[cv]
            dif = float((labels != prev_labels).sum())
            prev_labels = labels
        else:
            dif = float(np.abs(p_full - prev_p_full).sum()) / num_v
            prev_p_full = p_full
        difs.append(dif)
        it += 1
        times.append(_time.monotonic() - t0)
        if opt.verbose:
            print(f"CP-simplex(sharded) it {it}: {num_comp} components, "
                  f"dif {dif:.3g}")

    active_host = _fetch_sharded(active_dev).reshape(-1)
    return CPSimplexResult(
        cv=cv, rp=rp, it=it, time=np.asarray(times),
        obj=np.zeros(0, dtype), dif=np.asarray(difs),
        state=CPSimplexState(active=active_host, cv=cv, rp=rp))
