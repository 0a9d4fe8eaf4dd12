"""Whole-solve Pallas TPU kernel: a complete PFDR solve in ONE kernel.

The cut-pursuit outer loop (``/root/reference/src/
CP_PFDR_graph_quadratic_d1_l1.cpp:842-859``) solves thousands-of-vertex
*reduced* problems for up to ``1e4`` PFDR iterations each.  At those sizes
a staged XLA ``while_loop`` iteration costs ~90 us — not FLOPs, but ~20
small-op launches per iteration on arrays that fit VMEM hundreds of times
over.  This kernel removes every per-iteration op boundary: the whole
solve loop (gradient matvec, banded endpoint gathers, per-edge d1 prox with
relaxation, edge->vertex accumulation, vertex prox, stopping test) runs
inside ONE ``pallas_call`` with ALL state resident in VMEM:

* vertex fields in the dense ``[V8, 128]`` layout; the dense-operator
  gradient is two MXU matvecs through a flat ``[1, RV]`` view (measured
  ~0.6 us at RV=4096, N=96);
* edges in the banded-tile layout of :class:`..ops.banded.BandedPlan`
  (sorted by min endpoint, one-hot selector MXU dots per tile, same
  helpers as :mod:`.banded_fused`);
* the iteration loop is an in-kernel ``lax.while_loop`` with the relative
  iterate-evolution stopping test of the reference
  (``PFDR_graph_quadratic_d1_l1.cpp:353-532``), so a converged solve exits
  early and an unconverged one costs zero dispatch overhead per iteration.

Semantics per iteration are identical to the staged path in
:mod:`..solvers.pfdr_quadratic` (enforced by ``tests/test_solve_fused.py``);
reconditioning/monitoring/verbose runs stay on the staged path (callers
gate).  Supported operators: dense ``[N, V]`` (reference ``N > 0``),
premultiplied Gram (``N < 0``, small V only — the [V, V] matrix must fit
VMEM), diagonal / identity (``N == 0``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import HI, _selectors

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def solve_vmem_bytes(nt: int, tile: int, wd8: int, v8: int, np_pad: int,
                     op_kind: str, itemsize: int = 4) -> int:
    """Resident + live-temporary VMEM estimate of the whole-solve kernel."""
    t8 = tile // 128
    edge = nt * t8 * 128
    op_bytes = {"dense": 2 * v8 * 128 * np_pad,
                "gram": v8 * 128 * v8 * 128,
                "diag": v8 * 128}[op_kind]
    return (itemsize * (
        4 * edge            # index blocks
        + 9 * edge          # 7 edge fields in + zu/zv out
        + 9 * v8 * 128      # vertex fields in/out + x/p/acc scratch
        + op_bytes
        + tile * t8         # pack_rows constant
        + tile * 128        # lanesel constant
        + 10 * tile * 128   # live gather/pack/scatter [T, 128..256] temps
        + 4 * wd8 * 128)    # window temporaries
        # int8 precomputed selectors (prologue; lanes pad to 128)
        + 2 * nt * tile * max(wd8, 128) + 2 * nt * tile * 128)


def supports_fused_solve(nt: int, tile: int, wd8: int, v8: int,
                         np_pad: int, op_kind: str) -> bool:
    return solve_vmem_bytes(nt, tile, wd8, v8, np_pad,
                            op_kind) <= VMEM_BUDGET_BYTES


def _endpoint_sel_val(lr, ll, tile, wd8, pack_rows, lanesel):
    """Value twin of :func:`.banded._endpoint_sel` ([T8,128] blocks in)."""
    dt = jnp.float32
    c = jax.lax.dot_general(pack_rows.astype(dt), lr,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=dt, precision=HI)
    lr_col = jnp.sum(c * lanesel.astype(dt), axis=1, keepdims=True)
    c = jax.lax.dot_general(pack_rows.astype(dt), ll,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=dt, precision=HI)
    ll_col = jnp.sum(c * lanesel.astype(dt), axis=1, keepdims=True)
    lr_i = (lr_col + 0.5).astype(jnp.int32)
    ll_i = (ll_col + 0.5).astype(jnp.int32)
    rsel = (lr_i == jax.lax.broadcasted_iota(
        jnp.int32, (tile, wd8), 1)).astype(jnp.float32)
    lsel = (ll_i == jax.lax.broadcasted_iota(
        jnp.int32, (tile, 128), 1)).astype(jnp.float32)
    return rsel, lsel


def _pack_val(col, pack_rows, lanesel):
    return jnp.dot(pack_rows.astype(col.dtype),
                   col * lanesel.astype(col.dtype),
                   preferred_element_type=col.dtype, precision=HI)


def _unpack_val(dense, pack_rows, lanesel):
    c = jax.lax.dot_general(pack_rows.astype(dense.dtype), dense,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=dense.dtype,
                            precision=HI)
    return jnp.sum(c * lanesel.astype(dense.dtype), axis=1, keepdims=True)


def _kernel(starts_ref, itm_ref,
            lur_ref, lul_ref, lvr_ref, lvl_ref,
            zu0_ref, zv0_ref, wu_ref, wv_ref, wdu_ref, wdv_ref, thd_ref,
            x0_ref, ga_ref, thl1_ref, aty_ref, opa_ref, opb_ref,
            xo_ref, zuo_ref, zvo_ref, it_ref, dif_ref,
            x_s, p_s, acc_s, *,
            nt, tile, wd8, v8, np_pad, op_kind, rho, vkind, positivity,
            lo, hi, dif_tol2, eps, rv):
    it_max = itm_ref[0]  # runtime bound: one compiled kernel per geometry
    dt = x0_ref.dtype
    t8 = tile // 128
    pack_rows, lanesel = _selectors(tile)

    x_s[:] = x0_ref[:]
    zuo_ref[:] = zu0_ref[:]
    zvo_ref[:] = zv0_ref[:]

    def cond(c):
        it, dif = c
        return jnp.logical_and(it < it_max, dif >= dif_tol2)

    def body(c):
        it, _ = c
        x = x_s[:]
        # gradient of the smooth part (reference :356-445)
        if op_kind == "dense":
            xflat = x.reshape(1, v8 * 128)
            # HIGHEST: the MXU's default f32 precision is bf16 truncation,
            # which caps the solve at ~1e-2 relative accuracy (measured);
            # the iterate must converge to difTol ~ 1e-7
            r = jnp.dot(xflat, opa_ref[:],              # [1, NP] = (A x)^t
                        preferred_element_type=dt, precision=HI)
            g = jnp.dot(r, opb_ref[:],                  # [1, RV]
                        preferred_element_type=dt, precision=HI)
            grad = g.reshape(v8, 128) - aty_ref[:]
        elif op_kind == "gram":
            xflat = x.reshape(1, v8 * 128)
            g = jnp.dot(xflat, opa_ref[:], preferred_element_type=dt,
                        precision=HI)
            grad = g.reshape(v8, 128) - aty_ref[:]
        else:  # diag
            grad = opa_ref[:] * x - aty_ref[:]
        # forward step P = 2X - Ga grad (:463-464)
        p_s[:] = 2.0 * x - ga_ref[:] * grad
        acc_s[:] = jnp.zeros_like(acc_s)

        for t in range(nt):
            s = starts_ref[t]
            xw = x_s[pl.ds(s, wd8)]
            pw = p_s[pl.ds(s, wd8)]
            sl = slice(t * t8, (t + 1) * t8)
            sels = []
            packed = []
            for lr, ll in ((lur_ref[sl], lul_ref[sl]),
                           (lvr_ref[sl], lvl_ref[sl])):
                rsel, lsel = _endpoint_sel_val(lr, ll, tile, wd8,
                                               pack_rows, lanesel)
                sels.append((rsel, lsel))
                rows_p = jnp.dot(rsel, pw, preferred_element_type=dt,
                                 precision=HI)          # [T, 128]
                rows_x = jnp.dot(rsel, xw, preferred_element_type=dt,
                                 precision=HI)
                pcol = jnp.sum(rows_p * lsel, axis=1, keepdims=True)
                xcol = jnp.sum(rows_x * lsel, axis=1, keepdims=True)
                packed.append((_pack_val(pcol, pack_rows, lanesel),
                               _pack_val(xcol, pack_rows, lanesel)))
            (pu_e, xu_e), (pv_e, xv_e) = packed

            # per-edge d1 pair prox + relaxation (:466-489)
            zu = zuo_ref[sl]
            zv = zvo_ref[sl]
            au = pu_e - zu
            av = pv_e - zv
            wdu = wdu_ref[sl]
            wdv = wdv_ref[sl]
            avg = wdu * au + wdv * av
            diff = au - av
            shrunk = jnp.sign(diff) * jnp.maximum(
                jnp.abs(diff) - thd_ref[sl], 0)
            zu = zu + rho * ((avg + wdv * shrunk) - xu_e)
            zv = zv + rho * ((avg - wdu * shrunk) - xv_e)
            zuo_ref[sl] = zu
            zvo_ref[sl] = zv

            # weighted edge->vertex accumulation (:491-497)
            win = jnp.zeros((wd8, 128), dt)
            for (rsel, lsel), contrib in ((sels[0], wu_ref[sl] * zu),
                                          (sels[1], wv_ref[sl] * zv)):
                col = _unpack_val(contrib, pack_rows, lanesel)
                d = col * lsel
                win = win + jax.lax.dot_general(
                    rsel, d,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=dt, precision=HI)
            acc_s[pl.ds(s, wd8)] += win

        a = acc_s[:]
        # vertex prox (:499-512)
        if vkind == "l1":
            xn = jnp.maximum(a - thl1_ref[:], 0)
            if not positivity:
                xn = xn + jnp.minimum(a + thl1_ref[:], 0)
        elif vkind == "bounds":
            xn = jnp.clip(a, lo, hi)
        elif positivity:
            xn = jnp.maximum(a, 0)
        else:
            xn = a
        if rv < v8 * 128:
            flat = (jax.lax.broadcasted_iota(jnp.int32, (v8, 128), 0) * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (v8, 128), 1))
            xn = jnp.where(flat < rv, xn, 0)
        # relative iterate evolution (:514-529)
        delta = xn - x
        num = jnp.sum(delta * delta)
        den = jnp.sum(xn * xn)
        dif = jnp.where(den > eps, num / den, num / eps)
        x_s[:] = xn
        return it + 1, dif

    it, dif = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.asarray(max(dif_tol2, 1.0), dt)))
    xo_ref[:] = x_s[:]
    it_ref[0, 0] = it
    dif_ref[0, 0] = dif


@partial(jax.jit, static_argnames=("nt", "tile", "wd8", "v8", "np_pad",
                                   "op_kind", "rho", "vkind", "positivity",
                                   "lo", "hi", "dif_tol2", "eps",
                                   "rv", "interpret"))
def fused_pfdr_solve(starts8, lur, lul, lvr, lvl,
                     zu0, zv0, wu, wv, w_d1u, w_d1v, th_d1,
                     x0, ga, th_l1, aty, op_a, op_b, *,
                     nt, tile, wd8, v8, np_pad, op_kind, rho, vkind,
                     positivity, lo, hi, it_max, dif_tol2, eps, rv,
                     interpret=False):
    """Complete PFDR solve (up to ``it_max`` iterations, early exit on the
    evolution test) in one ``pallas_call``.

    Args:
      starts8, lur..lvl: :class:`..ops.banded.BandedPlan` device arrays.
      zu0..th_d1: [nt*T8, 128] edge fields in plan order.
      x0, ga, th_l1, aty: [V8, 128] dense vertex fields (``aty`` is the
        observation in the operator's gradient convention: ``A^t y`` for
        dense, ``obs`` for gram/diag).
      op_a, op_b: operator payload — dense: ``A^t`` [RV, NP] and ``A``
        [NP, RV] (zero padded, NP a multiple of 128); gram: ``A^t A``
        [RV, RV] and an [8, 128] dummy; diag: diag as a [V8, 128] field
        and a dummy.
      rv: true (padded-problem) vertex count for the prox/reduction mask.

    Returns:
      ``(x [V8,128], zu, zv [nt*T8,128], it, dif)``.
    """
    t8 = tile // 128
    dt = x0.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1,),
        in_specs=[vspec] * 17,
        out_specs=[vspec, vspec, vspec, sspec, sspec],
        scratch_shapes=[pltpu.VMEM((v8, 128), dt),
                        pltpu.VMEM((v8, 128), dt),
                        pltpu.VMEM((v8, 128), dt)])
    kern = partial(_kernel, nt=nt, tile=tile, wd8=wd8, v8=v8,
                   np_pad=np_pad, op_kind=op_kind, rho=rho, vkind=vkind,
                   positivity=positivity, lo=lo, hi=hi,
                   dif_tol2=dif_tol2, eps=eps, rv=rv)
    itm = jnp.asarray(it_max, jnp.int32).reshape(1)
    xn, zun, zvn, it, dif = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((v8, 128), dt),
                   jax.ShapeDtypeStruct((nt * t8, 128), dt),
                   jax.ShapeDtypeStruct((nt * t8, 128), dt),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        interpret=interpret,
    )(starts8, itm, lur, lul, lvr, lvl, zu0, zv0, wu, wv, w_d1u, w_d1v,
      th_d1, x0, ga, th_l1, aty, op_a, op_b)
    return xn, zun, zvn, it[0, 0], dif[0, 0]
