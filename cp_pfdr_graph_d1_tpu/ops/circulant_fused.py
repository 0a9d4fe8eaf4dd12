"""Fused Pallas TPU kernel: one PFDR iteration over circulant shift families.

Companion kernel of :class:`..circulant.CirculantGraphD1`: the graph's edges
are bucketed by vertex-index offset ``d = ev - eu``, so family ``f`` connects
every vertex ``u`` to ``u + d_f`` — an endpoint gather is a *flat circular
shift* of the dense vertex field, not a gather.  TPUs have no vector gather
(XLA lowers ``x[eu]`` to a serial per-element loop, the dominant cost of the
staged unstructured path), but they do have cheap in-register circular
shifts (``pltpu.roll``), so each family costs a handful of VPU ops on the
``[V8, 128]`` field regardless of which vertices its edges touch.

Grid = one program per family, then one program per *remainder tile*: edges
whose offset is too rare for a dense family are tiled by the banded plan
(:mod:`.banded`) and processed in the same kernel with on-chip one-hot MXU
selectors — measured ~87 us/iteration cheaper at EEG scale than staging the
remainder through XLA gathers plus a separate scatter kernel.  The
edge->vertex weighted average accumulates into one VMEM scratch across all
programs; the vertex prox and the stopping-test reductions run after the
last tile.  Per-family shift amounts arrive as scalar-prefetch values
``(row, lane)`` for the forward shift and its inverse (dynamic shifts — one
compiled kernel serves any offset set).

Semantics per edge are identical to the reference PFDR iteration
(``/root/reference/src/PFDR_graph_quadratic_d1_l1.cpp:463-529``) and to the
jnp path in :mod:`..solvers.pfdr_quadratic`; equality is enforced by
``tests/test_circulant.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import (HI, _endpoint_sel, _gather_rows, _pack,
                     _scatter_rows, _selectors, _unpack)

# VMEM is ~16 MB/core; leave headroom for compiler temporaries.  Resident
# buffers: 6 field-size VMEM arrays (x, grad, ga, th_l1, x out, acc
# scratch) plus 14 field-size family-block buffers (5 blocked inputs + 2
# blocked outputs, double-buffered by the pipeline) = 20 field copies,
# plus remainder tile blocks (~18 operands x tile, double-buffered).
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
MAX_FUSED_VERTICES = 1 << 20  # absolute cap


def max_fused_vertices(tile: int = 1024, itemsize: int = 4) -> int:
    """Largest padded vertex count whose resident buffers fit VMEM."""
    left = VMEM_BUDGET_BYTES - 36 * tile * itemsize
    return min(MAX_FUSED_VERTICES, max(left, 0) // (20 * itemsize))


def _flat_shift(m, a, b, interpret: bool):
    """``out[k] = m_flat[(k + 128 a + b) % (R * 128)]`` on a [R, 128] field.

    Row part via a dynamic sublane roll; the lane part needs two row
    candidates (lanes that wrap past 128 read the next row), selected by a
    lane iota — 4 VPU ops total, any shift amount.  The same roll-and-select
    code executes under the interpreter (``jnp.roll`` and ``pltpu.roll``
    share semantics: ``out[i] = in[(i - shift) % n]``), so the sign/wrap
    logic is what the CPU tests exercise, not a substitute.
    """
    r = m.shape[0]
    roll = jnp.roll if interpret else pltpu.roll
    t = roll(m, (128 - b) % 128, axis=1)   # t[r,c] = m[r,(c+b)%128]
    y = roll(t, (r - a) % r, axis=0)       # y[i] = t[i+a]
    y2 = roll(t, (r - 1 - a) % r, axis=0)  # y2[i] = t[i+a+1]
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    return jnp.where(lane < 128 - b, y, y2)


def _pair_prox_update(zu, zv, pu_t, pv_t, xu_t, xv_t, wdu, wdv, thd, rho):
    """Per-edge d1 pair prox + relaxation (reference :466-489), layout-
    agnostic (dense family slots or packed edge-major tiles)."""
    au = pu_t - zu
    av = pv_t - zv
    avg = wdu * au + wdv * av
    diff = au - av
    shrunk = jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - thd, 0)
    # Virtual (unassigned) slots evolve zu/zv against their own dense
    # position, while the staged COO path evolves them against endpoint 0:
    # the two paths' z values on virtual slots are path-dependent and must
    # never be consumed — guaranteed because wu=wv=w_d1u=w_d1v=0 there
    # keeps them inert in the average and in reconditioning.
    zu = zu + rho * ((avg + wdv * shrunk) - xu_t)
    zv = zv + rho * ((avg - wdu * shrunk) - xv_t)
    return zu, zv


def _vertex_epilogue(acc, x_ref, thl1_ref, xo_ref, num_ref, den_ref, *,
                     nv, vkind, positivity, lo, hi):
    av8 = acc.shape[0]
    a_ = acc[:]
    # vertex prox (:499-512)
    if vkind == "l1":
        xn = jnp.maximum(a_ - thl1_ref[:], 0)
        if not positivity:
            xn = xn + jnp.minimum(a_ + thl1_ref[:], 0)
    elif vkind == "bounds":
        xn = jnp.clip(a_, lo, hi)
    elif positivity:
        xn = jnp.maximum(a_, 0)
    else:
        xn = a_
    flat = (jax.lax.broadcasted_iota(jnp.int32, (av8, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (av8, 128), 1))
    xn = jnp.where(flat < nv, xn, 0)
    xo_ref[:] = xn
    # evolution reductions (:514-529)
    delta = xn - x_ref[:]
    num_ref[0, 0] = jnp.sum(delta * delta)
    den_ref[0, 0] = jnp.sum(xn * xn)


def _kernel(*refs, nf, nt, tile, wd8, nv, rho, vkind, positivity, lo, hi,
            interpret):
    if nt:
        (offs_ref, starts_ref,
         zu_ref, zv_ref, wu_ref, wdu_ref, thd_ref,
         lur_ref, lul_ref, lvr_ref, lvl_ref,
         zur_ref, zvr_ref, wur_ref, wvr_ref, wdur_ref, wdvr_ref, thdr_ref,
         x_ref, grad_ref, ga_ref, thl1_ref,
         zuo_ref, zvo_ref, zuro_ref, zvro_ref, xo_ref, num_ref, den_ref,
         acc) = refs
    else:
        (offs_ref,
         zu_ref, zv_ref, wu_ref, wdu_ref, thd_ref,
         x_ref, grad_ref, ga_ref, thl1_ref,
         zuo_ref, zvo_ref, xo_ref, num_ref, den_ref, acc) = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(i < nf)
    def _():
        x = x_ref[:]
        # forward step P = 2X - Ga grad (reference :463-464)
        p = 2.0 * x - ga_ref[:] * grad_ref[:]
        a = offs_ref[i, 0]
        b = offs_ref[i, 1]
        # u-endpoint of slot u is u itself; v-endpoint values arrive by shift
        pv = _flat_shift(p, a, b, interpret)
        xv = _flat_shift(x, a, b, interpret)
        # HBM-traffic slimming: the two dropped family fields are exact
        # functions of the streamed ones — w_d1v = 1 - w_d1u (normalized
        # pair), and wv = w_d1v * s * ga_v with s = wu / (w_d1u * ga_u)
        # (see _finalize_precond); ga_v arrives by the same shift.  Virtual
        # slots have wu = 0 -> wv = 0, and padded dense positions have
        # ga = 0, guarded by the safe ratio.
        wdu = wdu_ref[0]
        wdv = 1.0 - wdu
        wu = wu_ref[0]
        gau = ga_ref[:]
        gav = _flat_shift(gau, a, b, interpret)
        ratio = jnp.where(gau > 0, gav / jnp.where(gau > 0, gau, 1), 0.0)
        wv = wu * (wdv / wdu) * ratio
        zu, zv = _pair_prox_update(zu_ref[0], zv_ref[0], p, pv, x, xv,
                                   wdu, wdv, thd_ref[0], rho)
        zuo_ref[0] = zu
        zvo_ref[0] = zv
        # weighted edge->vertex average (:491-497); the v-contribution
        # shifts back by the inverse offset
        acc[:] += wu * zu
        acc[:] += _flat_shift(wv * zv, offs_ref[i, 2],
                              offs_ref[i, 3], interpret)

    if nt:
        @pl.when(i >= nf)
        def _():
            # remainder tile: banded one-hot gathers of the window, prox in
            # the packed edge-major layout, window accumulation — same math
            # as :mod:`.banded_fused`
            pack_rows, lanesel = _selectors(tile)
            dt = x_ref.dtype
            s = starts_ref[jnp.maximum(i - nf, 0)]
            xw = x_ref[pl.ds(s, wd8)]
            pw = 2.0 * xw - ga_ref[pl.ds(s, wd8)] * grad_ref[pl.ds(s, wd8)]
            sels = []
            packed = []
            for lr_ref, ll_ref in ((lur_ref, lul_ref), (lvr_ref, lvl_ref)):
                rsel, lsel = _endpoint_sel(lr_ref, ll_ref, tile, wd8,
                                           pack_rows, lanesel)
                sels.append((rsel, lsel))
                rows_p = _gather_rows(rsel, pw)
                rows_x = _gather_rows(rsel, xw)
                ls = lsel.astype(dt)
                pcol = jnp.sum(rows_p * ls, axis=1, keepdims=True)
                xcol = jnp.sum(rows_x * ls, axis=1, keepdims=True)
                packed.append((_pack(pcol, pack_rows, lanesel),
                               _pack(xcol, pack_rows, lanesel)))
            (pu_t, xu_t), (pv_t, xv_t) = packed
            zu, zv = _pair_prox_update(zur_ref[:], zvr_ref[:], pu_t, pv_t,
                                       xu_t, xv_t, wdur_ref[:], wdvr_ref[:],
                                       thdr_ref[:], rho)
            zuro_ref[:] = zu
            zvro_ref[:] = zv
            win = jnp.zeros((wd8, 128), dt)
            for (rsel, lsel), contrib in ((sels[0], wur_ref[:] * zu),
                                          (sels[1], wvr_ref[:] * zv)):
                col = _unpack(contrib, pack_rows, lanesel)
                d = col * lsel.astype(dt)
                win = win + _scatter_rows(rsel, d)
            acc[pl.ds(s, wd8)] += win

    @pl.when(i == nf + nt - 1)
    def _():
        _vertex_epilogue(acc, x_ref, thl1_ref, xo_ref, num_ref, den_ref,
                         nv=nv, vkind=vkind, positivity=positivity, lo=lo,
                         hi=hi)


@partial(jax.jit, static_argnames=("nf", "vv8", "nt", "tile", "wd8", "nv",
                                   "rho", "vkind", "positivity", "lo", "hi",
                                   "interpret"))
def fused_circulant_iteration(offs, starts8, zu, zv, wu, w_d1u,
                              th_d1, lur, lul, lvr, lvl, zur, zvr, wur, wvr,
                              wdur, wdvr, thdr, x, grad, ga, th_l1, *,
                              nf, vv8, nt, tile, wd8, nv, rho, vkind,
                              positivity, lo, hi, interpret=False):
    """One fused PFDR edge+vertex step: dense shift families + remainder
    tiles in a single ``pallas_call``.

    Args:
      offs: [F, 4] int32 ``(a, b, a_inv, b_inv)`` per family — the forward
        flat shift ``d = 128 a + b`` and its inverse ``(VV - d)``.
      starts8: [nt] int32 remainder-tile window start rows (None if nt==0).
      zu, zv, wu, w_d1u, th_d1: [F, VV8, 128] per-family dense edge fields
        (slot ``u``); ``wv`` and ``w_d1v`` are recomputed in-kernel
        (w_d1v = 1 - w_d1u; wv from wu and the shifted metric), saving two
        HBM streams per family.
      lur..lvl: [nt*T8, 128] remainder local endpoint indices (banded plan).
      zur..thdr: [nt*T8, 128] remainder per-edge fields (None if nt==0).
      x, grad, ga, th_l1: [VV8, 128] dense vertex fields.
      nv: true vertex count (padding masked out of prox/reductions).

    Returns:
      ``(x_new [VV8,128], zu_new, zv_new [F,VV8,128],
      zur_new, zvr_new [nt*T8,128] or None, num, den)``.
    """
    dt = x.dtype
    fblock = pl.BlockSpec((1, vv8, 128),
                          lambda i, *_: (jnp.minimum(i, nf - 1), 0, 0))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = partial(_kernel, nf=nf, nt=nt, tile=tile, wd8=wd8, nv=nv,
                   rho=rho, vkind=vkind, positivity=positivity, lo=lo,
                   hi=hi, interpret=interpret)
    if nt:
        t8 = tile // 128
        tblock = pl.BlockSpec((t8, 128),
                              lambda i, *_: (jnp.maximum(i - nf, 0), 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nf + nt,),
            in_specs=[fblock] * 5 + [tblock] * 11 + [vspec] * 4,
            out_specs=[fblock, fblock, tblock, tblock, vspec, sspec, sspec],
            scratch_shapes=[pltpu.VMEM((vv8, 128), dt)])
        zun, zvn, zurn, zvrn, xn, num, den = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((nf, vv8, 128), dt),
                       jax.ShapeDtypeStruct((nf, vv8, 128), dt),
                       jax.ShapeDtypeStruct((nt * t8, 128), dt),
                       jax.ShapeDtypeStruct((nt * t8, 128), dt),
                       jax.ShapeDtypeStruct((vv8, 128), dt),
                       jax.ShapeDtypeStruct((1, 1), dt),
                       jax.ShapeDtypeStruct((1, 1), dt)),
            interpret=interpret,
        )(offs, starts8, zu, zv, wu, w_d1u, th_d1,
          lur, lul, lvr, lvl, zur, zvr, wur, wvr, wdur, wdvr, thdr,
          x, grad, ga, th_l1)
        return xn, zun, zvn, zurn, zvrn, num[0, 0], den[0, 0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nf,),
        in_specs=[fblock] * 5 + [vspec] * 4,
        out_specs=[fblock, fblock, vspec, sspec, sspec],
        scratch_shapes=[pltpu.VMEM((vv8, 128), dt)])
    zun, zvn, xn, num, den = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nf, vv8, 128), dt),
                   jax.ShapeDtypeStruct((nf, vv8, 128), dt),
                   jax.ShapeDtypeStruct((vv8, 128), dt),
                   jax.ShapeDtypeStruct((1, 1), dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        interpret=interpret,
    )(offs, zu, zv, wu, w_d1u, th_d1, x, grad, ga, th_l1)
    return xn, zun, zvn, None, None, num[0, 0], den[0, 0]
