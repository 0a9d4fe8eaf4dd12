"""Multi-iteration device-resident cut-pursuit: N outer iterations per
dispatch.

The per-iteration device loop (:mod:`.cut_pursuit_device`) still
synchronizes with the host once per CP iteration — on a tunneled chip the
2 RPC round trips (~50 ms) dwarf the 6-14 ms of device compute, making the
outer loop RPC-bound (73% of EEG-scale wall time, BASELINE.md stage
table).  This module chains the complete iteration — steepest PDHG cuts,
pointer-jumping components, sort-based contraction, one-hot operator
reduction, preconditioning, and the whole-solve small-problem Pallas
kernel — inside ONE ``lax.while_loop`` under ONE ``jax.jit``, so an entire
cut-pursuit solve costs a handful of round trips regardless of iteration
count.  Reference loop replaced:
``/root/reference/src/CP_PFDR_graph_quadratic_d1_l1.cpp:321-985``.

Static-capacity contract: the reduced problem lives in fixed
``rv_cap``/``re_cap`` buffers chosen before dispatch.  If the partition
outgrows them mid-chain the loop exits with an overflow flag and the
PRE-CUT state of the offending iteration; the host doubles the capacities
and re-dispatches (the PDHG warm-start states carry over, so the redone
cut is cheap).  Beyond the one-hot contraction cap the solve falls back to
the per-iteration device path.

Exactness: every PDHG cut carries the usual duality-gap certificate; the
flags are AND-accumulated across the chain and checked once at exit.  An
uncertified chain is discarded with a warning and the solve is redone
through the per-iteration path (which falls back to the exact host
min-cut per failing cut) — an uncertified relaxation result is never used
silently.
"""
from __future__ import annotations

import os as _os
import time as _time
import warnings
from functools import partial
from typing import NamedTuple

_DEBUG = bool(_os.environ.get("CPCHAIN_DEBUG"))


def _dbg(label, *arrays):
    """Stage-by-stage sync + timestamped trace (CPCHAIN_DEBUG=1)."""
    if _DEBUG:
        import jax as _jax
        import numpy as _np
        for a in arrays:
            _np.asarray(_jax.device_get(a))
        print(f"[cpchain {_time.monotonic():.3f}] {label}", flush=True)

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CPOptions, Lipsch
from ..graph import GraphD1
from ..operators import DenseOp, DiagOp, GramOp, IdentityOp, QuadOp
from .cut_pursuit import (CPResult, CPState, _reduce_dense, _reduce_diag,
                          _reduce_gram, _ScatterGraph)
from .cut_pursuit_common import bucket, machine_eps
from .cut_pursuit_device import (_contract_pad, _contract_sort,
                                 _device_components, _device_cut,
                                 _device_merge, _direction_costs,
                                 _evolution, _ONEHOT_MAX)
from .pfdr_quadratic import VertexProx, initial_precondition

# IEEE-f32 one-hot contractions (selector entries are 0/1; the value side
# must not be bf16-truncated)
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _vertex_terms_onehot(cvn, x, la_l1, firsts, rv_cap: int):
    """Reduced l1 weights and warm-start representatives WITHOUT the
    [V]-table gather of ``_reduce_vertex_terms`` (element-serial on this
    backend): components are constant and each has exactly one ``firsts``
    vertex, so ``x[rep]`` is the one-hot contraction of ``x * firsts``.
    Also returns the [V, rv_cap] selector for reuse (operator reduction,
    gather-free ``x = s @ rx``)."""
    s = jax.nn.one_hot(cvn, rv_cap, dtype=x.dtype)
    r_la_l1 = _mm(la_l1, s)
    rx0 = _mm(x * firsts.astype(x.dtype), s)
    return r_la_l1, rx0, s


def _build_banded_plan_device(reu, rev, rla, *, rv_cap: int, nt: int,
                              tile: int, wd8: int):
    """Traced twin of :func:`..ops.banded.build_banded_plan`: sorts the
    (padded) reduced edges by min endpoint, computes per-tile window
    starts and local row/lane indices — pure sorts + arithmetic, no
    host step, so the banded whole-solve kernel can run INSIDE the
    chained loop on partitions too large for the one-hot small kernel.

    Inert padding slots (``rla == 0``) are re-keyed to a self-loop at
    ``rv_cap - 1`` so they cluster in the last tiles with zero window
    impact (the host builder pads with copies of the last edge for the
    same reason).  ``wd8`` is static; returns an overflow flag when some
    tile's window exceeds it (the driver escalates or falls back).

    Returns ``(starts8, lur, lul, lvr, lvl, reu_s, rev_s, rla_s, ovf)``.
    """
    e_cap = reu.shape[0]
    epad = nt * tile
    is_pad = rla == 0
    reu = jnp.where(is_pad, rv_cap - 1, reu)
    rev = jnp.where(is_pad, rv_cap - 1, rev)
    if epad > e_cap:
        extra = epad - e_cap
        reu = jnp.concatenate([reu, jnp.full((extra,), rv_cap - 1,
                                             reu.dtype)])
        rev = jnp.concatenate([rev, jnp.full((extra,), rv_cap - 1,
                                             rev.dtype)])
        rla = jnp.concatenate([rla, jnp.zeros((extra,), rla.dtype)])
    key = jnp.minimum(reu, rev)
    key, reu_s, rev_s, rla_s = jax.lax.sort((key, reu, rev, rla),
                                            num_keys=1)
    v8 = rv_cap // 128
    lo_t = jnp.min(jnp.minimum(reu_s, rev_s).reshape(nt, tile), axis=1)
    hi_t = jnp.max(jnp.maximum(reu_s, rev_s).reshape(nt, tile), axis=1)
    starts8 = jnp.clip(jnp.minimum(lo_t // 128, v8 - wd8), 0, None)
    ovf = jnp.any(hi_t // 128 - starts8 >= wd8)
    starts8 = starts8.astype(jnp.int32)
    t8 = tile // 128
    base = jnp.repeat(starts8, tile)

    def local(idx):
        return ((idx // 128 - base).astype(jnp.float32)
                .reshape(nt * t8, 128),
                (idx % 128).astype(jnp.float32).reshape(nt * t8, 128))

    lur, lul = local(reu_s)
    lvr, lvl = local(rev_s)
    return starts8, lur, lul, lvr, lvl, reu_s, rev_s, rla_s, ovf


def _solve_reduced_banded_traced(op_arr, obs, s_onehot, ncomp, rx0,
                                 r_la_l1, plan, it_inner, *,
                                 red_kind: str, rv_cap: int, nt: int,
                                 tile: int, wd8: int, np_pad: int,
                                 vprox: VertexProx, rho: float,
                                 dif_tol: float, has_l1: bool,
                                 interpret: bool):
    """Reduced solve through the banded whole-solve kernel with a
    device-built plan (:func:`_build_banded_plan_device`) — the in-chain
    route for partitions beyond the one-hot small kernel's VMEM cap.
    Returns ``(rx [rv_cap], inner_iterations)``."""
    from ..ops.solve_fused import fused_pfdr_solve

    dt = obs.dtype
    v8 = rv_cap // 128
    starts8, lur, lul, lvr, lvl, reu_s, rev_s, rla_s = plan
    if red_kind == "dense":
        mat = _mm(op_arr, s_onehot)      # [N, rv_cap] column sums
        from ..ops.power_iter import dense_operator_norm
        cn = jnp.sqrt(jnp.sum(mat * mat, axis=0))
        cn_safe = jnp.where(cn > 0, cn, 1)
        lipsch = cn * cn * dense_operator_norm(mat / cn_safe)
        ry = obs
        r_op = DenseOp(mat)
    else:
        rdiag = _mm(op_arr, s_onehot)
        ry = _mm(obs, s_onehot)
        lipsch = rdiag
        r_op = DiagOp(rdiag)
        mat = rdiag
    sg = _ScatterGraph(reu_s, rev_s, rla_s, rv_cap)
    pre = initial_precondition(r_op, ry, sg,
                               r_la_l1 if has_l1 else None, rho, lipsch,
                               Lipsch.DIAG)
    t8 = tile // 128
    eshape = (nt * t8, 128)

    def ef(a):
        return a.reshape(eshape)

    def vf(a):
        return a.reshape(v8, 128)

    if red_kind == "dense":
        a_pad = jnp.pad(mat, ((0, np_pad - mat.shape[0]), (0, 0)))
        op_a, op_b = a_pad.T, a_pad
        aty = vf(r_op.apply_t(ry))
        op_kind = "dense"
    else:
        op_a = vf(mat)
        op_b = jnp.zeros((8, 128), dt)
        aty = vf(ry)
        op_kind = "diag"
    zu0 = rx0[reu_s]
    zv0 = rx0[rev_s]
    eps_mach = float(jnp.finfo(dt).eps)
    eps = dif_tol if (0 < dif_tol < eps_mach) else eps_mach
    x, _, _, it_done, _ = fused_pfdr_solve(
        starts8, lur, lul, lvr, lvl,
        ef(zu0), ef(zv0), ef(pre.wu), ef(pre.wv),
        ef(pre.w_d1u), ef(pre.w_d1v), ef(pre.th_d1),
        vf(rx0), vf(pre.ga), vf(pre.th_l1), aty, op_a, op_b,
        nt=nt, tile=tile, wd8=wd8, v8=v8, np_pad=np_pad,
        op_kind=op_kind, rho=rho, vkind=vprox.kind,
        positivity=vprox.positivity, lo=float(vprox.lo),
        hi=float(vprox.hi), it_max=it_inner,
        dif_tol2=float(dif_tol) ** 2, eps=eps, rv=ncomp,
        interpret=interpret)
    return x.reshape(-1), it_done


class _ChainCarry(NamedTuple):
    active: jax.Array      # [E] bool, current active-edge mask
    x_full: jax.Array      # [V] current iterate (rx[cv])
    x_prev: jax.Array      # [V] previous iterate (evolution test)
    cv: jax.Array          # [V] int32 component labels
    rx: jax.Array          # [rv_cap] component values (padded)
    num_comp: jax.Array    # int32
    it: jax.Array          # int32 completed CP iterations
    dif: jax.Array         # last relative evolution
    difs: jax.Array        # [it_max] evolution trace
    cert_bad: jax.Array    # bool: some cut exited uncertified
    overflow: jax.Array    # bool: partition outgrew rv_cap/re_cap
    ovf_win: jax.Array     # bool: a banded-plan window exceeded wd8
    downshift: jax.Array   # bool: partition now fits a much smaller route
    pre_pending: jax.Array  # bool: settle rx before the first cut
    polished: jax.Array    # bool: in-chain final polish completed
    cx1: jax.Array         # PDHG warm starts (per direction)
    cz1: jax.Array
    cx2: jax.Array
    cz2: jax.Array
    pfdr_tot: jax.Array    # int32 total inner PFDR iterations


def _solve_reduced_traced(op_arr, obs, cvn, ncomp, rx0, r_la_l1,
                          reu, rev, rla, it_inner, *,
                          red_kind: str, rv_cap: int, e_cap: int,
                          np_pad: int, vprox: VertexProx, rho: float,
                          dif_tol: float, has_l1: bool, interpret: bool):
    """One complete reduced solve, fully traced: one-hot operator
    reduction + Lipschitz metric + preconditioning + the whole-solve
    small-problem kernel (the traced twin of
    :func:`.cut_pursuit._reduce_solve_small`; shared layout contract).
    Returns ``(rx [rv_cap], inner_iterations)``."""
    from ..ops.solve_small import fused_pfdr_solve_small

    dt = obs.dtype
    if red_kind == "dense":
        mat, ry, lipsch = _reduce_dense(op_arr, obs, cvn, rv_cap, False)
        r_op = DenseOp(mat)
    elif red_kind == "gram":
        mat, ry, lipsch = _reduce_gram(op_arr, obs, cvn, rv_cap)
        r_op = GramOp(mat)
    else:
        mat, ry, lipsch = _reduce_diag(op_arr, obs, cvn, rv_cap)
        r_op = DiagOp(mat)
    sg = _ScatterGraph(reu, rev, rla, rv_cap)
    pre = initial_precondition(r_op, ry, sg,
                               r_la_l1 if has_l1 else None, rho, lipsch,
                               Lipsch.DIAG)

    def row(v):
        return v.reshape(1, -1).astype(dt)

    if red_kind == "dense":
        n = mat.shape[0]
        a_pad = jnp.pad(mat, ((0, np_pad - n), (0, 0)))
        op_a, op_b = a_pad.T, a_pad
        aty = row(r_op.apply_t(ry))
        op_kind = "dense"
    elif red_kind == "diag":
        op_a = row(mat)
        op_b = jnp.zeros((8, 128), dt)
        aty = row(ry)
        op_kind = "diag"
    else:
        op_a = mat
        op_b = jnp.zeros((8, 128), dt)
        aty = row(ry)
        op_kind = "gram"
    z0 = jnp.stack([rx0[reu], rx0[rev]]).astype(dt)
    ec = jnp.zeros((8, e_cap), dt)
    ec = ec.at[0].set(pre.wu).at[1].set(pre.wv).at[2].set(pre.w_d1u)
    ec = ec.at[3].set(pre.w_d1v).at[4].set(pre.th_d1)
    m = jax.nn.one_hot(jnp.concatenate([reu, rev]), rv_cap, dtype=dt,
                       axis=0)
    eps_mach = float(jnp.finfo(dt).eps)
    eps = dif_tol if (0 < dif_tol < eps_mach) else eps_mach
    x, _, it_done, _ = fused_pfdr_solve_small(
        m, op_a, op_b, aty, row(pre.ga), row(pre.th_l1), row(rx0), z0, ec,
        rv_cap=rv_cap, e_pad=e_cap, np_pad=np_pad, op_kind=op_kind,
        rho=rho, vkind=vprox.kind, positivity=vprox.positivity,
        lo=float(vprox.lo), hi=float(vprox.hi), it_max=it_inner,
        dif_tol2=float(dif_tol) ** 2, eps=eps, rv=ncomp,
        interpret=interpret)
    return x.reshape(-1), it_done


@partial(jax.jit, static_argnames=(
    "red_kind", "rv_cap", "re_cap", "np_pad", "vprox", "rho",
    "pfdr_dif_tol", "has_l1", "positivity", "lo", "hi", "differentiable",
    "interpret", "it_max", "cut_it_max", "check_every", "dif_tol", "eps",
    "fused_stencil", "solve_route", "nt", "tile", "wd8",
    "polish_inexact"))
def _cp_chain(op: QuadOp, op_arr, obs, graph: GraphD1, la_l1_dev,
              carry0: _ChainCarry, it_inner, it_inner_big, it_full,
              cut_tol, *,
              red_kind: str, rv_cap: int, re_cap: int, np_pad: int,
              vprox: VertexProx, rho: float, pfdr_dif_tol: float,
              has_l1: bool, positivity: bool, lo: float, hi: float,
              differentiable: bool, interpret: bool, it_max: int,
              cut_it_max: int, check_every: int, dif_tol: float,
              eps: float, fused_stencil: bool, solve_route: str = "small",
              nt: int = 1, tile: int = 1024, wd8: int = 1,
              polish_inexact: bool = False):
    """The whole outer loop in one dispatch; see module docstring."""
    dif_tol2 = dif_tol * dif_tol
    e_cap = re_cap + rv_cap  # _contract_pad appends rv_cap eps self-loops

    def cond(c: _ChainCarry):
        return ((c.it < it_max) & (c.dif >= dif_tol2) & ~c.overflow
                & ~c.downshift)

    def body(c: _ChainCarry) -> _ChainCarry:
        # -- steepest cut(s), PDHG with warm starts ------------------------
        # (skipped on a pending presolve pass: warm-init partitions carry
        # raw component means, and a cut on unsettled values re-shatters
        # the graph — the partition is solved once first, cut-free)
        def run_cuts(_):
            c1, c2 = _direction_costs(
                op, obs, graph, c.x_full, c.active, la_l1_dev, lo=lo,
                hi=hi, differentiable=differentiable, has_l1=has_l1,
                positivity=positivity)
            if fused_stencil:
                from ..ops.mincut_fused import device_cut_stencil_fused

                def one_cut(cost, x0, z0):
                    return device_cut_stencil_fused(
                        graph, c.active, cost, cut_tol, cut_it_max,
                        check_every, x0, z0, interpret=interpret)
            else:
                def one_cut(cost, x0, z0):
                    return _device_cut(graph, c.active, cost, cut_tol,
                                       cut_it_max, check_every, x0, z0)
            sep, gap1, big1, cx1, cz1 = one_cut(c1, c.cx1, c.cz1)
            bad = gap1 > cut_tol * big1
            if differentiable:
                cx2, cz2 = c.cx2, c.cz2
            else:
                sep2, gap2, big2, cx2, cz2 = one_cut(c2, c.cx2, c.cz2)
                bad = bad | (gap2 > cut_tol * big2)
                sep = sep | sep2
            return sep, bad, cx1, cz1, cx2, cz2

        def skip_cuts(_):
            return (jnp.zeros_like(c.active), jnp.asarray(False),
                    c.cx1, c.cz1, c.cx2, c.cz2)

        sep, bad, cx1, cz1, cx2, cz2 = jax.lax.cond(
            c.pre_pending, skip_cuts, run_cuts, None)
        cert_bad = c.cert_bad | bad
        n_new = jnp.sum(sep.astype(jnp.int32))
        active_new = c.active | sep

        # -- components + contraction geometry -----------------------------
        if fused_stencil:
            from ..ops.components_fused import \
                device_components_stencil_fused
            cvn, ncomp, firsts = device_components_stencil_fused(
                graph, active_new, interpret=interpret)
        else:
            cvn, ncomp, firsts = _device_components(graph, active_new)
        ncomp = ncomp.astype(jnp.int32)  # x64 promotes int reductions
        lo_s, hi_s, w_s, flags, re_count = _contract_sort(cvn, graph,
                                                          active_new)
        ovf = (ncomp > rv_cap) | (re_count > re_cap)

        warm = c._replace(cert_bad=cert_bad, cx1=cx1, cz1=cz1, cx2=cx2,
                          cz2=cz2)

        def bail_overflow(_):
            # PRE-cut active: the host re-dispatches with doubled caps and
            # the warm-started cut is redone cheaply
            return warm._replace(overflow=jnp.asarray(True))

        def bail_no_new(_):
            # nothing to recompute (reference :556-563): dif = 0 ends the
            # loop after counting the iteration
            return warm._replace(
                active=active_new, it=c.it + 1,
                dif=jnp.asarray(0.0, c.dif.dtype),
                difs=c.difs.at[c.it].set(0.0))

        need_solve = (n_new > 0) | c.pre_pending

        def solve(_):
            reu, rev, rla = _contract_pad(lo_s, hi_s, w_s, flags, ncomp,
                                          eps, obs.dtype, rv_cap, re_cap)
            r_la_l1, rx0, sel = _vertex_terms_onehot(
                cvn, c.x_full, la_l1_dev, firsts, rv_cap)

            def finish(rxn, it_done):
                # gather-free full iterate: the selector is one-hot, so
                # s @ rx IS rx[cv] (XLA's big-table gather is
                # element-serial on this backend)
                x_new = _mm(sel, rxn)
                active_m = _device_merge(graph, x_new, active_new, eps,
                                         dif_tol)
                difn = _evolution(x_new, c.x_prev,
                                  eps).astype(c.dif.dtype)
                # a big-capacity banded chain whose partition has
                # collapsed (post-merge) wastes ~20x per iteration vs the
                # small route: exit so the driver re-enters downsized
                down = (jnp.asarray(solve_route == "banded")
                        & (ncomp * 4 <= rv_cap) & (ncomp <= 512)
                        & ~c.pre_pending)
                # a presolve pass settles rx without counting as a CP
                # iteration (no cut happened; dif stays at its sentinel)
                it_next = jnp.where(c.pre_pending, c.it, c.it + 1)
                difn2 = jnp.where(c.pre_pending, c.dif, difn)
                return warm._replace(
                    active=active_m, x_full=x_new, x_prev=x_new, cv=cvn,
                    rx=rxn, num_comp=ncomp, it=it_next, dif=difn2,
                    difs=jnp.where(c.pre_pending, c.difs,
                                   c.difs.at[c.it].set(difn)),
                    downshift=down, pre_pending=jnp.asarray(False),
                    pfdr_tot=c.pfdr_tot + it_done)

            if solve_route == "banded":
                *plan, ovf_w = _build_banded_plan_device(
                    reu, rev, rla, rv_cap=rv_cap, nt=nt, tile=tile,
                    wd8=wd8)

                def bail_win(_):
                    # a window outgrew the static wd8: exit with the
                    # PRE-cut state; the driver escalates wd8 or runs a
                    # host iteration (dynamic window there)
                    return warm._replace(overflow=jnp.asarray(True),
                                         ovf_win=jnp.asarray(True))

                def do_banded(_):
                    # transitional big partitions collapse after the merge;
                    # their solves need enough accuracy for the merge, not
                    # the caller's full tolerance (the small-route /
                    # polish solves restore it)
                    rxn, it_done = _solve_reduced_banded_traced(
                        op_arr, obs, sel, ncomp, rx0, r_la_l1, tuple(plan),
                        it_inner_big, red_kind=red_kind, rv_cap=rv_cap,
                        nt=nt, tile=tile, wd8=wd8, np_pad=np_pad,
                        vprox=vprox, rho=rho, dif_tol=pfdr_dif_tol,
                        has_l1=has_l1, interpret=interpret)
                    return finish(rxn, it_done)

                return jax.lax.cond(ovf_w, bail_win, do_banded, None)
            rxn, it_done = _solve_reduced_traced(
                op_arr, obs, cvn, ncomp, rx0, r_la_l1,
                reu, rev, rla, it_inner, red_kind=red_kind, rv_cap=rv_cap,
                e_cap=e_cap, np_pad=np_pad, vprox=vprox, rho=rho,
                dif_tol=pfdr_dif_tol, has_l1=has_l1, interpret=interpret)
            return finish(rxn, it_done)

        return jax.lax.cond(
            ovf, bail_overflow,
            lambda o: jax.lax.cond(need_solve, solve, bail_no_new, o),
            None)

    out = jax.lax.while_loop(cond, body, carry0)

    if polish_inexact:
        # in-chain final polish: one full-accuracy solve on the settled
        # partition, saving a separate dispatch + host sync.  Skipped on
        # abnormal exits (the driver re-enters and the next chain run
        # polishes), or when a banded window no longer fits (standalone
        # fallback in the driver).
        def do_polish(carry: _ChainCarry) -> _ChainCarry:
            if fused_stencil:
                from ..ops.components_fused import \
                    device_components_stencil_fused
                cvn, ncomp, firsts = device_components_stencil_fused(
                    graph, carry.active, interpret=interpret)
            else:
                cvn, ncomp, firsts = _device_components(graph,
                                                        carry.active)
            ncomp = ncomp.astype(jnp.int32)
            lo_s, hi_s, w_s, flags, re_count = _contract_sort(
                cvn, graph, carry.active)
            ovf = (ncomp > rv_cap) | (re_count > re_cap)

            def run(_):
                reu, rev, rla = _contract_pad(
                    lo_s, hi_s, w_s, flags, ncomp, eps, obs.dtype,
                    rv_cap, re_cap)
                r_la_l1, rx0, sel = _vertex_terms_onehot(
                    cvn, carry.x_full, la_l1_dev, firsts, rv_cap)
                if solve_route == "banded":
                    *plan, ovf_w = _build_banded_plan_device(
                        reu, rev, rla, rv_cap=rv_cap, nt=nt, tile=tile,
                        wd8=wd8)

                    def slv(_):
                        rxn, _it = _solve_reduced_banded_traced(
                            op_arr, obs, sel, ncomp, rx0, r_la_l1,
                            tuple(plan), it_full, red_kind=red_kind,
                            rv_cap=rv_cap, nt=nt, tile=tile, wd8=wd8,
                            np_pad=np_pad, vprox=vprox, rho=rho,
                            dif_tol=pfdr_dif_tol, has_l1=has_l1,
                            interpret=interpret)
                        x_new = _mm(sel, rxn)
                        return carry._replace(
                            cv=cvn, num_comp=ncomp, rx=rxn, x_full=x_new,
                            active=_device_merge(graph, x_new,
                                                 carry.active, eps,
                                                 dif_tol),
                            polished=jnp.asarray(True))
                    return jax.lax.cond(ovf_w, lambda _: carry, slv, None)
                rxn, _it = _solve_reduced_traced(
                    op_arr, obs, cvn, ncomp, rx0, r_la_l1, reu, rev, rla,
                    it_full, red_kind=red_kind, rv_cap=rv_cap,
                    e_cap=e_cap, np_pad=np_pad, vprox=vprox, rho=rho,
                    dif_tol=pfdr_dif_tol, has_l1=has_l1,
                    interpret=interpret)
                x_new = _mm(sel, rxn)
                return carry._replace(
                    cv=cvn, num_comp=ncomp, rx=rxn, x_full=x_new,
                    active=_device_merge(graph, x_new, carry.active, eps,
                                         dif_tol),
                    polished=jnp.asarray(True))

            return jax.lax.cond(ovf, lambda _: carry, run, None)

        do = (~out.overflow & ~out.downshift & ~out.cert_bad
              & (out.num_comp > 1) & (out.it > 0))
        out = jax.lax.cond(do, do_polish, lambda c: c, out)
    return out


@partial(jax.jit, static_argnames=(
    "red_kind", "rv_cap", "re_cap", "np_pad", "vprox", "rho",
    "pfdr_dif_tol", "has_l1", "interpret", "eps", "dif_tol",
    "fused_stencil", "solve_route", "nt", "tile", "wd8"))
def _chain_polish(op_arr, obs, graph: GraphD1, la_l1_dev, active, x_full,
                  x_prev, it_inner, *, red_kind: str,
                  rv_cap: int, re_cap: int, np_pad: int,
                  vprox: VertexProx, rho: float, pfdr_dif_tol: float,
                  has_l1: bool, interpret: bool, eps: float,
                  dif_tol: float, fused_stencil: bool,
                  solve_route: str = "small", nt: int = 1,
                  tile: int = 1024, wd8: int = 1):
    """Full-accuracy solve on the settled partition (the inexact outer
    loop's final polish) in one dispatch.  The partition is refreshed
    from the post-merge active set first (exactly what the next CP
    iteration would see), then solved at full accuracy; returns
    ``(cv, num_comp, rx, x_full, active, dif, overflow)``."""
    e_cap = re_cap + rv_cap
    if fused_stencil:
        from ..ops.components_fused import device_components_stencil_fused
        cvn, ncomp, firsts = device_components_stencil_fused(
            graph, active, interpret=interpret)
    else:
        cvn, ncomp, firsts = _device_components(graph, active)
    ncomp = ncomp.astype(jnp.int32)
    lo_s, hi_s, w_s, flags, re_count = _contract_sort(cvn, graph, active)
    ovf = (ncomp > rv_cap) | (re_count > re_cap)
    reu, rev, rla = _contract_pad(lo_s, hi_s, w_s, flags, ncomp, eps,
                                  obs.dtype, rv_cap, re_cap)
    r_la_l1, rx0, sel = _vertex_terms_onehot(cvn, x_full, la_l1_dev,
                                             firsts, rv_cap)
    if solve_route == "banded":
        *plan, ovf_w = _build_banded_plan_device(
            reu, rev, rla, rv_cap=rv_cap, nt=nt, tile=tile, wd8=wd8)
        ovf = ovf | ovf_w
        rxn, _ = _solve_reduced_banded_traced(
            op_arr, obs, sel, ncomp, rx0, r_la_l1, tuple(plan), it_inner,
            red_kind=red_kind, rv_cap=rv_cap, nt=nt, tile=tile, wd8=wd8,
            np_pad=np_pad, vprox=vprox, rho=rho, dif_tol=pfdr_dif_tol,
            has_l1=has_l1, interpret=interpret)
    else:
        rxn, _ = _solve_reduced_traced(
            op_arr, obs, cvn, ncomp, rx0, r_la_l1, reu, rev,
            rla, it_inner, red_kind=red_kind, rv_cap=rv_cap, e_cap=e_cap,
            np_pad=np_pad, vprox=vprox, rho=rho, dif_tol=pfdr_dif_tol,
            has_l1=has_l1, interpret=interpret)
    x_new = _mm(sel, rxn)
    active_m = _device_merge(graph, x_new, active, eps, dif_tol)
    difn = _evolution(x_new, x_prev, eps)
    return cvn, ncomp, rxn, x_new, active_m, difn, ovf


_TILE = 1024
_BANDED_MAX_RV = 4096
_NT_MAX = 16


def _caps_for(rv_cap: int, np_pad: int, red_kind: str):
    """Largest admissible ``re_cap`` (multiple of 128) for the small-solve
    kernel at this ``rv_cap``, or None when nothing fits."""
    from ..ops.solve_small import supports_small_solve
    best = None
    re_cap = 2 * rv_cap
    while re_cap >= 128:
        if supports_small_solve(rv_cap, re_cap + rv_cap, np_pad, red_kind):
            best = re_cap
            break
        re_cap -= 128
    return best


def _stencil_fusable(graph) -> bool:
    """Whether the fused min-cut + components kernels apply (stencil
    container, single-device, VMEM-admissible geometry)."""
    from ..ops.components_fused import supports_fused_components
    from ..ops.mincut_fused import supports_fused_mincut
    from ..stencil import StencilGraphD1
    if not isinstance(graph, StencilGraphD1) or graph.axis_name is not None:
        return False
    f = len(graph.shifts)
    return (supports_fused_mincut(graph.num_vertices, f)
            and supports_fused_components(graph.num_vertices, f))


def chain_admissible(op: QuadOp, graph, opt: CPOptions, duplex: bool,
                     monitor: bool, dtype) -> bool:
    """Whether the chained loop can run this problem (see module
    docstring); ``chain="on"`` forces the interpreted kernels off-TPU."""
    if opt.chain == "off" or duplex or monitor:
        return False
    if opt.pfdr.dif_rcd != 0 or opt.pfdr.verbose != 0 or opt.verbose != 0:
        return False
    if not isinstance(op, (DenseOp, GramOp, DiagOp, IdentityOp)):
        return False
    if opt.chain != "on":
        if not (jax.default_backend() == "tpu"
                and np.dtype(dtype) == np.float32):
            return False
        # staged (non-fused) cuts/components pay ~100x op-launch overhead
        # per inner iteration on the accelerator; without the fused
        # stencil kernels the per-iteration device path is the better
        # route there
        if not _stencil_fusable(graph):
            return False
    np_pad = (-(-op.a.shape[0] // 128) * 128 if isinstance(op, DenseOp)
              else 128)
    red_kind = ("dense" if isinstance(op, DenseOp)
                else "gram" if isinstance(op, GramOp) else "diag")
    return _caps_for(128, np_pad, red_kind) is not None


def cp_quadratic_d1_chain(op: QuadOp, obs, graph: GraphD1, *,
                          la_l1=None, positivity: bool = False,
                          bounds=None, opt: CPOptions = CPOptions(),
                          state: CPState | None = None,
                          rv_cap0: int | None = None) -> CPResult:
    """Chained device-resident cut-pursuit solve (same contract as
    :func:`.cut_pursuit.cp_quadratic_d1`); see module docstring.

    ``Time`` trace caveat: iterations complete inside one dispatch, so
    per-iteration wall clock is not observable — the trace is the total
    elapsed time spread uniformly over the iterations.
    """
    t0 = _time.monotonic()
    _dbg("enter")
    num_v = graph.num_vertices
    dtype = np.asarray(obs).dtype
    obs_dev = jnp.asarray(obs)

    lo, hi = (-np.inf, np.inf) if bounds is None else (
        float(bounds[0]), float(bounds[1]))
    has_l1 = la_l1 is not None
    if has_l1:
        la_l1_dev = jnp.asarray(
            np.broadcast_to(np.asarray(la_l1, dtype), (num_v,)))
    elif positivity:
        has_l1 = True
        la_l1_dev = jnp.zeros((num_v,), dtype)
    else:
        la_l1_dev = jnp.zeros((num_v,), dtype)
    differentiable = (not has_l1
                      and not (np.isfinite(lo) or np.isfinite(hi)))
    if bounds is not None:
        vprox = VertexProx(kind="bounds", lo=lo, hi=hi)
    elif has_l1:
        vprox = VertexProx(kind="l1", positivity=positivity)
    else:
        vprox = VertexProx()

    eps = machine_eps(dtype, opt.dif_tol)

    if isinstance(op, DenseOp):
        red_kind, op_arr = "dense", op.a
        np_pad = -(-op.a.shape[0] // 128) * 128
    elif isinstance(op, GramOp):
        red_kind, op_arr = "gram", op.gram
        np_pad = 128
    elif isinstance(op, DiagOp):
        red_kind, op_arr = "diag", op.diag
        np_pad = 128
    else:
        red_kind, op_arr = "diag", jnp.ones((num_v,), obs_dev.dtype)
        np_pad = 128
    interp = not (jax.default_backend() == "tpu"
                  and dtype == np.float32)

    # -- warm partition init (TPU-first, beyond the reference) --------------
    # The reference's scalar init makes the FIRST cut shatter the graph
    # into thousands of components (the cut sees a constant iterate), and
    # the early huge reduced solves dominate wall time.  A few hundred
    # full-graph PFDR iterations through the fused stencil kernel cost
    # milliseconds and produce an iterate whose jump set is already close
    # to the final partition — cut-pursuit started from that partition is
    # self-correcting (any partition is a valid warm start, same contract
    # as CPState) and skips the shattered phase entirely.
    if (state is None and opt.chain_init_pfdr > 0
            and not isinstance(op, GramOp)
            and getattr(graph, "supports_fused", False)):
        import dataclasses as _dc
        from ..ops.power_iter import dense_operator_norm
        from .cut_pursuit_common import connected_components
        from .pfdr_quadratic import pfdr_quadratic_d1
        lip0 = getattr(op, "_warm_lip", None)
        if lip0 is None:
            if isinstance(op, DenseOp):
                lip0 = float(dense_operator_norm(op.a))
            elif isinstance(op, DiagOp):
                lip0 = float(jnp.max(op.diag))
            else:
                lip0 = 1.0
            # cache on the operator: dense_operator_norm keys its jit on
            # the (fresh) apply-object identity, so an uncached call pays
            # a retrace every solve
            try:
                op._warm_lip = lip0
            except AttributeError:
                pass
        res0 = pfdr_quadratic_d1(
            op, obs_dev, graph, la_l1=la_l1_dev if has_l1 else None,
            vprox=vprox, lipsch=float(lip0),
            opt=_dc.replace(opt.pfdr, it_max=int(opt.chain_init_pfdr),
                            dif_tol=0.0))
        x0h = np.asarray(jax.device_get(res0.x), np.float64)
        eu_h = np.asarray(graph.eu)
        ev_h = np.asarray(graph.ev)
        la_h = np.asarray(jax.device_get(graph.la_d1))
        diff = np.abs(x0h[eu_h] - x0h[ev_h])
        live = la_h > 0
        md = diff[live].max() if live.any() else 0.0
        # adaptive jump threshold: the iterate is only approximately
        # converged, so small spurious jumps remain — raise the threshold
        # until the partition fits the chain's small-kernel capacity
        # comfortably (the subsequent cuts re-split anything over-merged)
        thr = 0.05 * md
        active0 = np.zeros_like(live)
        ncomp0, cv0 = 1, np.zeros(num_v, np.int32)
        while md > 0:
            active0 = live & (diff > thr)
            ncomp0, cv0 = connected_components(num_v, eu_h, ev_h,
                                               ~active0 & live)
            if ncomp0 <= 384 or thr > md:
                break
            thr *= 1.6
        cnt0 = np.bincount(cv0, minlength=ncomp0)
        sums = np.zeros(ncomp0)
        np.add.at(sums, cv0, x0h)
        state = CPState(active=active0, cv=cv0,
                        rx=(sums / np.maximum(cnt0, 1)).astype(dtype))
        presolve = True  # settle rx on this partition before cutting
        _dbg(f"warm init: {ncomp0} components from "
             f"{int(opt.chain_init_pfdr)} full-graph PFDR iterations")
    else:
        presolve = False

    # -- initialization: single component, scalar prox (:66-175) -----------
    if state is None:
        ry1, raa1 = map(float, jax.device_get(
            jnp.stack(op.ones_image(num_v, obs_dev))))
        if bounds is not None:
            x1 = min(max(ry1 / raa1, lo), hi)
        else:
            rl1 = float(jnp.sum(la_l1_dev)) if has_l1 else 0.0
            if ry1 > rl1:
                x1 = (ry1 - rl1) / raa1
            elif not positivity and ry1 < -rl1:
                x1 = (ry1 + rl1) / raa1
            else:
                x1 = 0.0
        active = jnp.zeros((graph.num_edges,), bool)
        cv = jnp.zeros((num_v,), jnp.int32)
        x_full = jnp.full((num_v,), x1, dtype)
        num_comp = 1
    else:
        active = jnp.asarray(state.active)
        cv = jnp.asarray(state.cv)
        x_full = jnp.asarray(state.rx[state.cv], dtype)
        num_comp = len(state.rx)

    inexact_on = (opt.inexact == "auto"
                  and opt.pfdr.it_max > opt.inexact_cap)
    inner_cap = opt.inexact_cap if inexact_on else opt.pfdr.it_max
    chk = min(250, opt.cut_it_max)

    # largest admissible one-hot capacity of the small-solve kernel
    max_rv_cap = 128
    while (max_rv_cap * 2 <= _ONEHOT_MAX
           and _caps_for(max_rv_cap * 2, np_pad, red_kind) is not None):
        max_rv_cap *= 2

    static = dict(red_kind=red_kind, np_pad=np_pad, vprox=vprox,
                  rho=float(opt.pfdr.rho),
                  pfdr_dif_tol=float(opt.pfdr.dif_tol), has_l1=has_l1,
                  interpret=interp, eps=eps, dif_tol=float(opt.dif_tol),
                  fused_stencil=_stencil_fusable(graph))
    dif_tol2 = float(opt.dif_tol) ** 2

    def _host_delegate(st, it_done, difs_list, times_list):
        """Terminal fallback: finish (or polish) through the host loop
        with the caller's full options — used when the partition never
        fits the chain capacities (rare for the problems this path
        targets)."""
        import dataclasses as _dc
        from .cut_pursuit import cp_quadratic_d1 as _host_cp
        res = _host_cp(op, obs, graph, la_l1=la_l1, positivity=positivity,
                       bounds=bounds,
                       opt=_dc.replace(opt, cut="host", chain="off",
                                       it_max=max(opt.it_max - it_done, 1)),
                       state=st)
        difs = np.concatenate([np.asarray(difs_list), res.dif])
        return res._replace(
            it=it_done + res.it, dif=difs,
            time=np.linspace(0.0, _time.monotonic() - t0,
                             it_done + res.it + 1))

    def _host_one(st):
        """One host-path CP iteration (full dynamic reduced-solve
        routing), inner solves capped like the chain's intermediate
        solves — the hybrid handoff while the partition is too large for
        the static-capacity chain."""
        import dataclasses as _dc
        from .cut_pursuit import cp_quadratic_d1 as _host_cp
        pf = _dc.replace(opt.pfdr, it_max=min(opt.pfdr.it_max, inner_cap))
        return _host_cp(op, obs, graph, la_l1=la_l1, positivity=positivity,
                        bounds=bounds,
                        opt=_dc.replace(opt, cut="host", chain="off",
                                        it_max=1, inexact="off", pfdr=pf),
                        state=st)

    # hybrid driver state (host side)
    it_done = 0
    dif = max(dif_tol2, 1.0)
    difs_list: list = []
    rx_np = (np.asarray([x1], dtype) if state is None
             else np.asarray(state.rx, dtype))
    active_dev = active
    cv_dev = cv
    x_dev = x_full
    cx1 = cx2 = jnp.full((num_v,), 0.5, dtype)
    cz1 = cz2 = jnp.zeros((graph.num_edges,), dtype)
    n_active = int(np.asarray(state.active).sum()) if state is not None \
        else 0
    # the first cut of a fresh solve routinely shatters the single
    # component into thousands — start it on the host (dynamic routing)
    # rather than paying a doomed chain dispatch
    host_forced = num_comp == 1 and rv_cap0 is None
    min_rv = rv_cap0 or 1   # capacity floor raised by overflow exits
    wd8_cur = 8             # banded window width, escalated on overflow

    def _fits(nc, na):
        """Chain route spec for the current partition, or None.

        The DISTINCT reduced-edge count is bounded by the active-edge
        count ``na`` but typically far smaller (many parallel edges merge
        per component pair); for planar inputs it is < 3 nc.  The
        estimate picks the smaller capacity — a wrong guess surfaces as
        a capacity overflow, which the driver escalates."""
        need = min(na, max(3 * nc, 256))
        rc = max(256, bucket(max(nc, min_rv)))
        if rc <= max_rv_cap:
            re_cap = _caps_for(rc, np_pad, red_kind)
            while re_cap is not None and need > re_cap and rc < max_rv_cap:
                rc *= 2
                re_cap = _caps_for(rc, np_pad, red_kind)
            if re_cap is not None and need <= re_cap:
                return dict(solve_route="small", rv_cap=rc, re_cap=re_cap,
                            nt=1, tile=_TILE, wd8=1)
        if red_kind == "gram":
            return None  # [rv, rv] reduced Gram exceeds VMEM beyond small
        from ..ops.solve_fused import supports_fused_solve
        rc = max(256, bucket(max(nc, min_rv)))
        if rc > _BANDED_MAX_RV:
            return None
        nt = max(1, -(-(need + rc) // _TILE))
        while nt & (nt - 1):   # next power of two: bounds compile variants
            nt += 1
        if nt > _NT_MAX:
            return None
        wd8 = min(wd8_cur, rc // 128)
        if not supports_fused_solve(nt, _TILE, wd8, rc // 128, np_pad,
                                    red_kind):
            return None
        return dict(solve_route="banded", rv_cap=rc,
                    re_cap=nt * _TILE - rc, nt=nt, tile=_TILE, wd8=wd8)

    if presolve and num_comp > 1:
        # big warm jump sets shatter on the first cut — skip the doomed
        # small-capacity probe and open at full capacity (downshift exits
        # to the small route as soon as the partition collapses)
        small_ceiling = _caps_for(max_rv_cap, np_pad, red_kind) or 0
        if n_active > small_ceiling and red_kind != "gram":
            min_rv = _BANDED_MAX_RV
            wd8_cur = _BANDED_MAX_RV // 128

    while it_done < opt.it_max and dif >= dif_tol2:
        spec = _fits(num_comp, n_active)
        if spec is not None and not host_forced:
            rv_cap = spec["rv_cap"]
            rx_pad = np.zeros(rv_cap, dtype)
            rx_pad[:min(len(rx_np), rv_cap)] = rx_np[:rv_cap]
            difs_arr = np.zeros(opt.it_max, dtype)
            difs_arr[:it_done] = np.asarray(difs_list, dtype)[:it_done]
            carry = _ChainCarry(
                active=active_dev, x_full=x_dev, x_prev=x_dev, cv=cv_dev,
                rx=jnp.asarray(rx_pad),
                num_comp=jnp.asarray(num_comp, jnp.int32),
                it=jnp.asarray(it_done, jnp.int32),
                dif=jnp.asarray(max(dif_tol2, 1.0), dtype),
                difs=jnp.asarray(difs_arr),
                cert_bad=jnp.asarray(False), overflow=jnp.asarray(False),
                ovf_win=jnp.asarray(False), downshift=jnp.asarray(False),
                pre_pending=jnp.asarray(bool(presolve and num_comp > 1)),
                polished=jnp.asarray(False),
                cx1=cx1, cz1=cz1, cx2=cx2, cz2=cz2,
                pfdr_tot=jnp.asarray(0, jnp.int32))
            _dbg(f"chain dispatch it={it_done} {spec}")
            carry = _cp_chain(
                op, op_arr, obs_dev, graph, la_l1_dev, carry,
                jnp.asarray(inner_cap, jnp.int32),
                jnp.asarray(min(inner_cap, 1500), jnp.int32),
                jnp.asarray(opt.pfdr.it_max, jnp.int32),
                jnp.asarray(opt.cut_tol, dtype),
                it_max=opt.it_max,
                cut_it_max=opt.cut_it_max, check_every=chk,
                differentiable=differentiable, positivity=positivity,
                lo=lo, hi=hi, polish_inexact=inexact_on, **spec, **static)
            overflow, ovf_win, cert_bad, it_new, chain_polished = map(
                lambda v: v.item(),
                jax.device_get((carry.overflow, carry.ovf_win,
                                carry.cert_bad, carry.it,
                                carry.polished)))
            _dbg(f"chain done it={it_new} overflow={overflow} "
                 f"win={ovf_win}")
            if cert_bad:
                # exactness guard: an uncertified relaxed cut somewhere in
                # the chain — redo the whole solve through the
                # per-iteration path, which falls back to the exact host
                # min-cut per failing cut
                warnings.warn(
                    "a chained PDHG cut exited uncertified; redoing the "
                    "solve through the per-iteration device path",
                    UserWarning, stacklevel=2)
                from .cut_pursuit_device import cp_quadratic_d1_device
                return cp_quadratic_d1_device(
                    op, obs, graph, la_l1=la_l1, positivity=positivity,
                    bounds=bounds, opt=opt, state=state)
            # adopt the chain's state (pre-cut state when it overflowed)
            active_dev = carry.active
            x_dev = carry.x_full
            cv_dev = carry.cv
            num_comp = int(carry.num_comp)
            rx_np = np.asarray(jax.device_get(carry.rx))[:max(num_comp, 1)]
            cx1, cz1, cx2, cz2 = carry.cx1, carry.cz1, carry.cx2, carry.cz2
            it_done = it_new
            difs_host = np.asarray(jax.device_get(carry.difs))
            difs_list = list(difs_host[:it_done])
            dif = float(carry.dif)
            n_active = int(jnp.sum(active_dev))
            presolve = False  # consumed (the chain ran the settle pass)
            if overflow:
                if ovf_win:
                    # a banded window outgrew wd8: jump straight to full
                    # width (star-shaped reduced graphs — a background hub
                    # component adjacent to everything — need it; the
                    # intermediate widths were measured to always fail on
                    # those), else let the host (dynamic windows) run
                    from ..ops.solve_fused import supports_fused_solve
                    w2 = spec["rv_cap"] // 128
                    if (w2 > wd8_cur
                            and supports_fused_solve(
                                spec["nt"], _TILE, w2,
                                spec["rv_cap"] // 128, np_pad, red_kind)):
                        wd8_cur = w2
                    else:
                        host_forced = True
                else:
                    # capacity overflow: the cut shattered the partition —
                    # jump straight to the largest buffers AND full
                    # windows (the shattered reduced graph is star-shaped
                    # around the background component, so intermediate
                    # widths always fail; the doubling ladder costs a
                    # dispatch + sync per rung)
                    min_rv = (_BANDED_MAX_RV
                              if red_kind in ("dense", "diag")
                              else max_rv_cap)
                    wd8_cur = max(wd8_cur, _BANDED_MAX_RV // 128)
                    if spec["rv_cap"] >= min_rv or \
                            _fits(num_comp, n_active) is None:
                        host_forced = True
                        min_rv = 1
                continue
            min_rv = 1
        else:
            st = CPState(active=np.asarray(jax.device_get(active_dev)),
                         cv=np.asarray(jax.device_get(cv_dev)),
                         rx=rx_np)
            _dbg(f"host iteration it={it_done} num_comp={num_comp}")
            res1 = _host_one(st)
            st = res1.state
            active_dev = jnp.asarray(st.active)
            cv_dev = jnp.asarray(st.cv)
            rx_np = np.asarray(st.rx, dtype)
            x_dev = jnp.asarray(rx_np[st.cv], dtype)
            num_comp = len(rx_np)
            n_active = int(st.active.sum())
            dif = float(res1.dif[-1]) if len(res1.dif) else 0.0
            difs_list.append(dif)
            it_done += 1
            host_forced = False
            min_rv = 1

    # -- final full-accuracy polish on the settled partition ---------------
    polished = bool(locals().get("chain_polished", False))
    if not polished and inexact_on and it_done > 0 and num_comp > 1:
        spec = _fits(num_comp, n_active)
        if spec is not None:
            _dbg("polish dispatch")
            cvn, ncomp_p, rxn, x_new, active_m, difn, ovf = _chain_polish(
                op_arr, obs_dev, graph, la_l1_dev, active_dev, x_dev,
                x_dev, jnp.asarray(opt.pfdr.it_max, jnp.int32),
                **spec, **static)
            _dbg("polish done", x_new)
            if not bool(ovf):
                cv_dev = cvn
                num_comp = int(jax.device_get(ncomp_p))
                rx_np = np.asarray(jax.device_get(rxn))[:max(num_comp, 1)]
                active_dev = active_m
                x_dev = x_new
                polished = True
        if not polished:
            # partition never fit the chain capacities: finish through
            # the host loop (full accuracy + its own polish)
            st = CPState(active=np.asarray(jax.device_get(active_dev)),
                         cv=np.asarray(jax.device_get(cv_dev)),
                         rx=rx_np)
            return _host_delegate(st, it_done, difs_list, None)

    _dbg("final fetch")
    cv_host = np.asarray(jax.device_get(cv_dev))
    rx_host = np.asarray(rx_np, dtype)[:max(num_comp, 1)]
    active_host = np.asarray(jax.device_get(active_dev))
    elapsed = _time.monotonic() - t0
    return CPResult(
        cv=cv_host, rx=rx_host, it=it_done,
        time=np.linspace(0.0, elapsed, it_done + 1),
        obj=np.zeros(0, dtype),
        dif=np.asarray(difs_list, dtype),
        state=CPState(active=active_host, cv=cv_host, rx=rx_host))


def _rx_from_x(carry: _ChainCarry) -> np.ndarray:
    """Per-component values from the full iterate (components are
    constant, any representative works)."""
    cv = np.asarray(jax.device_get(carry.cv))
    x = np.asarray(jax.device_get(carry.x_full))
    _, reps = np.unique(cv, return_index=True)
    return x[reps]
