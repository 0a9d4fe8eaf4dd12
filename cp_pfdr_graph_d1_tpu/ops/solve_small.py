"""Whole-solve Pallas kernel for SMALL reduced PFDR problems.

The cut-pursuit outer loop spends most of its iterations on reduced
problems of a few hundred components (the EEG-scale fused LASSO contracts
19.6k vertices to ~200 components after two cuts,
``/root/reference/src/CP_PFDR_graph_quadratic_d1_l1.cpp:570-661``).  At
that size the banded whole-solve kernel (:mod:`.solve_fused`) still pays
~18 small MXU ops per 1024-edge tile per iteration for its on-chip one-hot
machinery — ~15 us/iteration for a problem whose arithmetic is ~0.1 us.

This kernel removes the tile machinery entirely.  For a reduced graph with
``rv`` vertices and ``e`` edges such that a dense one-hot selection matrix
``M [rv, 2e]`` fits VMEM (column ``j < e`` selects ``eu[j]``, column
``e + j`` selects ``ev[j]``), one PFDR iteration is THREE matmuls:

* gradient: ``x [1, rv] @ Gram [rv, rv]`` (or two dense matvecs),
* endpoint gather: ``[p; x] [2, rv] @ M -> [2, 2e]`` (both endpoints of
  both fields in ONE dot),
* edge->vertex scatter: ``w.z [1, 2e] @ M^t -> [1, rv]`` (contracting the
  edge axis of the same M buffer),

plus ~20 row-vector VPU ops for the d1 pair prox / vertex prox / stopping
test.  Everything (M, operator, z state) stays VMEM-resident across the
whole ``lax.while_loop``; measured ~1-2 us/iteration at rv=256 vs ~15 us
for the tiled kernel.  Iteration semantics are identical to
:mod:`..solvers.pfdr_quadratic` (enforced by ``tests/test_solve_small.py``).

The one-hot dots run at ``Precision.HIGHEST`` so gathered values are exact
(selector entries are 0/1) and the gradient matmuls keep f32 accuracy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import HI

VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def small_solve_vmem_bytes(rv_cap: int, e_pad: int, np_pad: int,
                           op_kind: str, itemsize: int = 4) -> int:
    """Resident + live-temporary VMEM estimate ([1, X] rows are physically
    padded to 8 sublanes)."""
    m = rv_cap * 2 * e_pad
    op_bytes = {"dense": 2 * rv_cap * np_pad,
                "gram": rv_cap * rv_cap,
                "diag": 8 * rv_cap}[op_kind]
    rows = 8 * (7 * rv_cap      # x0/ga/thl1/aty in + x out + 2 temps
                + 4 * 2 * e_pad)  # z in/out + gather/scatter temps
    edge = 8 * e_pad            # ec constants block
    return itemsize * (m + op_bytes + rows + edge)


def supports_small_solve(rv_cap: int, e_pad: int, np_pad: int,
                         op_kind: str) -> bool:
    return (rv_cap % 128 == 0 and e_pad % 128 == 0
            and small_solve_vmem_bytes(rv_cap, e_pad, np_pad,
                                       op_kind) <= VMEM_BUDGET_BYTES)


def _kernel(itm_ref, m_ref, opa_ref, opb_ref, aty_ref, ga_ref, thl1_ref,
            x0_ref, z0_ref, ec_ref,
            xo_ref, zo_ref, it_ref, dif_ref, *,
            rv_cap, e_pad, np_pad, op_kind, rho, vkind, positivity,
            lo, hi, dif_tol2, eps):
    it_max = itm_ref[0]
    rv = itm_ref[1]  # runtime true component count: no recompile per rV
    dt = x0_ref.dtype
    xo_ref[:] = x0_ref[:]
    zo_ref[:] = z0_ref[:]
    wu = ec_ref[0:1, :]
    wv = ec_ref[1:2, :]
    wdu = ec_ref[2:3, :]
    wdv = ec_ref[3:4, :]
    thd = ec_ref[4:5, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, rv_cap), 1)
    # f32 one-hot dots: M's entries are 0/1 (exact in bf16), so splitting
    # the VALUE side into three exactly-bf16-representable f32 terms and
    # contracting in ONE default-precision dot replaces the 6-pass HIGHEST
    # dot losslessly (hi+mid+lo reconstructs each f32 exactly; validated
    # bit-level on real MXU hardware by tests/tpu_numerics_main.py).  The
    # stacked rows stay <= 8, i.e. within one MXU sublane tile - the
    # single pass costs the same as ONE of the six HIGHEST passes.
    use_split = dt == jnp.float32

    def split3(vals):
        v_hi = vals.astype(jnp.bfloat16).astype(dt)
        r1 = vals - v_hi
        v_mid = r1.astype(jnp.bfloat16).astype(dt)
        return jnp.concatenate([v_hi, v_mid, r1 - v_mid], axis=0)

    def cond(c):
        it, dif = c
        return jnp.logical_and(it < it_max, dif >= dif_tol2)

    def body(c):
        it, _ = c
        x = xo_ref[:]                                       # [1, RV]
        # gradient of the smooth part (reference :356-445)
        if op_kind == "dense":
            r = jnp.dot(x, opa_ref[:], preferred_element_type=dt,
                        precision=HI)                       # [1, NP]
            g = jnp.dot(r, opb_ref[:], preferred_element_type=dt,
                        precision=HI)                       # [1, RV]
        elif op_kind == "gram":
            g = jnp.dot(x, opa_ref[:], preferred_element_type=dt,
                        precision=HI)
        else:  # diag
            g = opa_ref[:] * x
        grad = g - aty_ref[:]
        # forward step P = 2X - Ga grad (:463-464)
        p = 2.0 * x - ga_ref[:] * grad
        # both endpoints of both fields in one dot: [2, RV] @ [RV, 2E]
        px = jnp.concatenate([p, x], axis=0)
        if use_split:
            g6 = jnp.dot(split3(px), m_ref[:],
                         preferred_element_type=dt)         # [6, 2E]
            gath = g6[0:2] + g6[2:4] + g6[4:6]
        else:
            gath = jnp.dot(px, m_ref[:], preferred_element_type=dt,
                           precision=HI)                    # [2, 2E]
        pu = gath[0:1, :e_pad]
        pv = gath[0:1, e_pad:]
        xu = gath[1:2, :e_pad]
        xv = gath[1:2, e_pad:]
        # per-edge d1 pair prox + relaxation (:466-489)
        zu = zo_ref[0:1, :]
        zv = zo_ref[1:2, :]
        au = pu - zu
        av = pv - zv
        avg = wdu * au + wdv * av
        diff = au - av
        shrunk = jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - thd, 0)
        zu = zu + rho * ((avg + wdv * shrunk) - xu)
        zv = zv + rho * ((avg - wdu * shrunk) - xv)
        zo_ref[0:1, :] = zu
        zo_ref[1:2, :] = zv
        # weighted edge->vertex accumulation (:491-497): contract the edge
        # axis of the SAME selection matrix
        wz = jnp.concatenate([wu * zu, wv * zv], axis=1)    # [1, 2E]
        if use_split:
            a3 = jax.lax.dot_general(
                split3(wz), m_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dt)                  # [3, RV]
            a = a3[0:1] + a3[1:2] + a3[2:3]
        else:
            a = jax.lax.dot_general(
                wz, m_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dt, precision=HI)    # [1, RV]
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
        xn = jnp.where(lane < rv, xn, 0)
        # relative iterate evolution (:514-529)
        delta = xn - x
        num = jnp.sum(delta * delta)
        den = jnp.sum(xn * xn)
        dif = jnp.where(den > eps, num / den, num / eps)
        xo_ref[:] = xn
        return it + 1, dif

    it, dif = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.asarray(max(dif_tol2, 1.0), dt)))
    it_ref[0, 0] = it
    dif_ref[0, 0] = dif


@partial(jax.jit, static_argnames=("rv_cap", "e_pad", "np_pad", "op_kind",
                                   "rho", "vkind", "positivity", "lo",
                                   "hi", "dif_tol2", "eps", "interpret"))
def fused_pfdr_solve_small(m, op_a, op_b, aty, ga, th_l1, x0, z0, ec, *,
                           rv_cap, e_pad, np_pad, op_kind, rho, vkind,
                           positivity, lo, hi, it_max, dif_tol2, eps, rv,
                           interpret=False):
    """Complete small-problem PFDR solve in one ``pallas_call``.

    Args:
      m: [rv_cap, 2 e_pad] one-hot selection matrix (column ``j < e_pad``
        is ``one_hot(eu[j])``, column ``e_pad + j`` is ``one_hot(ev[j])``;
        padding edges carry zero weights and may select any vertex).
      op_a, op_b: operator payload — dense: ``A^t`` [rv_cap, np_pad] and
        ``A`` [np_pad, rv_cap]; gram: ``A^t A`` [rv_cap, rv_cap] and an
        [8, 128] dummy; diag: the diagonal as [1, rv_cap] and a dummy.
      aty, ga, th_l1, x0: [1, rv_cap] vertex rows (``aty`` in the
        operator's gradient convention).
      z0: [2, e_pad] initial auxiliary pairs (zu; zv).
      ec: [8, e_pad] edge constants, rows = (wu, wv, w_d1u, w_d1v, th_d1,
        0, 0, 0).
      rv: true component count (< rv_cap entries are masked).

    Returns:
      ``(x [1, rv_cap], z [2, e_pad], it, dif)``.
    """
    dt = x0.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[vspec] * 9,
        out_specs=[vspec, vspec, sspec, sspec])
    kern = partial(_kernel, rv_cap=rv_cap, e_pad=e_pad, np_pad=np_pad,
                   op_kind=op_kind, rho=rho, vkind=vkind,
                   positivity=positivity, lo=lo, hi=hi, dif_tol2=dif_tol2,
                   eps=eps)
    itm = jnp.stack([jnp.asarray(it_max, jnp.int32),
                     jnp.asarray(rv, jnp.int32)])
    xn, zn, it, dif = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((1, rv_cap), dt),
                   jax.ShapeDtypeStruct((2, e_pad), dt),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        interpret=interpret,
    )(itm, m, op_a, op_b, aty, ga, th_l1, x0, z0, ec)
    return xn, zn, it[0, 0], dif[0, 0]
