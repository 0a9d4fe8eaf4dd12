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

# sized so that, with the split3 live-temp surcharge in
# :func:`solve_vmem_bytes`, admission is slightly TIGHTER than the
# pre-split3 12 MiB gate on measured-working geometries (e.g. the 64x64
# dense case estimates 16.4 MiB and runs on a v5e); callers must still
# guard the first call — admission is an estimate, Mosaic's allocator is
# the authority (the solvers fall back to the staged path on compile
# failure)
VMEM_BUDGET_BYTES = 18 * 1024 * 1024


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
        + 4 * tile * t8     # pack_rows constant + 3x split copies
        + tile * 128        # lanesel constant
        + 22 * tile * 128   # live gather/pack/scatter temps incl. the 3x
                            # split3 copies ([3T, 512] quad, rs3cat)
        + 10 * wd8 * 128    # window temps incl. win3 [3 Wd8, 256]
        + 6 * tile * wd8))  # rs3u/rs3v [T, 3 Wd8] selector copies


def supports_fused_solve(nt: int, tile: int, wd8: int, v8: int,
                         np_pad: int, op_kind: str) -> bool:
    return solve_vmem_bytes(nt, tile, wd8, v8, np_pad,
                            op_kind) <= VMEM_BUDGET_BYTES


def _kernel(starts_ref, itm_ref,
            lur_ref, lul_ref, lvr_ref, lvl_ref,
            zu0_ref, zv0_ref, wu_ref, wv_ref, wdu_ref, wdv_ref, thd_ref,
            x0_ref, ga_ref, thl1_ref, aty_ref, opa_ref, opb_ref,
            xo_ref, zuo_ref, zvo_ref, it_ref, dif_ref,
            x_s, p_s, acc_s, *,
            nt, tile, wd8, v8, np_pad, op_kind, rho, vkind, positivity,
            lo, hi, dif_tol2, eps):
    it_max = itm_ref[0]  # runtime bound: one compiled kernel per geometry
    rv = itm_ref[1]      # runtime true vertex count (prox/reduction mask)
    dt = x0_ref.dtype
    t8 = tile // 128
    pack_rows, lanesel = _selectors(tile)

    x_s[:] = x0_ref[:]
    zuo_ref[:] = zu0_ref[:]
    zvo_ref[:] = zv0_ref[:]

    def cond(c):
        it, dif = c
        return jnp.logical_and(it < it_max, dif >= dif_tol2)

    lanesel2 = jnp.concatenate([lanesel, lanesel], axis=1)      # [T, 256]
    lanesel4 = jnp.concatenate([lanesel2, lanesel2], axis=1)    # [T, 512]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile, wd8), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    # local row indices < wd8 <= 256 and lane indices < 128 are exact under
    # the MXU's DEFAULT (bf16-truncating) precision, so the merged index
    # unpack dot runs single-pass instead of 6-pass HIGHEST
    idx_prec = None if wd8 <= 256 else HI

    # f32 value dots: a 3-term decomposition into exactly-bf16-representable
    # f32 terms (24 = 3 x 8 mantissa bits), contracted in ONE single-pass
    # DEFAULT-precision dot (whose bf16 input truncation is then lossless),
    # replaces the 6-pass HIGHEST dot — exact for the one-hot gather/pack
    # dots (each output is a single selected value and hi+mid+lo
    # reconstructs it exactly), HIGHEST-equivalent for the scatter
    # accumulation (same f32 accumulator, exact term products)
    use_split = dt == jnp.float32

    def split3(vals, axis):
        v_hi = vals.astype(jnp.bfloat16).astype(dt)
        r1 = vals - v_hi
        v_mid = r1.astype(jnp.bfloat16).astype(dt)
        v_lo = r1 - v_mid
        return jnp.concatenate([v_hi, v_mid, v_lo], axis=axis)

    pack3 = jnp.concatenate([pack_rows] * 3, axis=0)   # [3T8, T]
    pack3c = jnp.concatenate([pack_rows] * 3, axis=1)  # [T8, 3T]

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
            win2 = jnp.concatenate([pw, xw], axis=1)    # [Wd8, 256]
            sl = slice(t * t8, (t + 1) * t8)
            # ONE single-pass dot unpacks all four index fields to columns
            cidx = jnp.concatenate([lur_ref[sl], lul_ref[sl],
                                    lvr_ref[sl], lvl_ref[sl]], axis=1)
            ci = jax.lax.dot_general(
                pack_rows, cidx,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=dt, precision=idx_prec)  # [T, 512]
            cil = ci * lanesel4
            lur_i = (jnp.sum(cil[:, 0:128], axis=1, keepdims=True)
                     + 0.5).astype(jnp.int32)
            lul_i = (jnp.sum(cil[:, 128:256], axis=1, keepdims=True)
                     + 0.5).astype(jnp.int32)
            lvr_i = (jnp.sum(cil[:, 256:384], axis=1, keepdims=True)
                     + 0.5).astype(jnp.int32)
            lvl_i = (jnp.sum(cil[:, 384:512], axis=1, keepdims=True)
                     + 0.5).astype(jnp.int32)
            rsel_u = (lur_i == iota_w).astype(dt)
            lsel_u = (lul_i == iota_l).astype(dt)
            rsel_v = (lvr_i == iota_w).astype(dt)
            lsel_v = (lvl_i == iota_l).astype(dt)

            # endpoint gathers: p and x rows jointly per endpoint
            if use_split:
                win3 = split3(win2, axis=0)             # [3 Wd8, 256]
                rs3u = jnp.concatenate([rsel_u] * 3, axis=1)
                rs3v = jnp.concatenate([rsel_v] * 3, axis=1)
                rows_u = jnp.dot(rs3u, win3,
                                 preferred_element_type=dt)  # [T, 256]
                rows_v = jnp.dot(rs3v, win3, preferred_element_type=dt)
            else:
                rows_u = jnp.dot(rsel_u, win2, preferred_element_type=dt,
                                 precision=HI)          # [T, 256]
                rows_v = jnp.dot(rsel_v, win2, preferred_element_type=dt,
                                 precision=HI)
            rlu = rows_u * jnp.concatenate([lsel_u, lsel_u], axis=1)
            rlv = rows_v * jnp.concatenate([lsel_v, lsel_v], axis=1)
            pcol_u = jnp.sum(rlu[:, :128], axis=1, keepdims=True)
            xcol_u = jnp.sum(rlu[:, 128:], axis=1, keepdims=True)
            pcol_v = jnp.sum(rlv[:, :128], axis=1, keepdims=True)
            xcol_v = jnp.sum(rlv[:, 128:], axis=1, keepdims=True)
            # ONE pack dot for all four gathered columns
            quad = jnp.concatenate(
                [pcol_u * lanesel, xcol_u * lanesel,
                 pcol_v * lanesel, xcol_v * lanesel], axis=1)   # [T, 512]
            if use_split:
                packed = jnp.dot(pack3c, split3(quad, axis=0),
                                 preferred_element_type=dt)  # [T8, 512]
            else:
                packed = jnp.dot(pack_rows, quad,
                                 preferred_element_type=dt,
                                 precision=HI)          # [T8, 512]
            pu_e = packed[:, 0:128]
            xu_e = packed[:, 128:256]
            pv_e = packed[:, 256:384]
            xv_e = packed[:, 384:512]

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

            # weighted edge->vertex accumulation (:491-497): ONE unpack
            # dot for both contributions, ONE scatter dot for both
            # endpoints (stacked along the contracted edge axis)
            wz2 = jnp.concatenate([wu_ref[sl] * zu, wv_ref[sl] * zv],
                                  axis=1)               # [T8, 256]
            if use_split:
                cz = jax.lax.dot_general(
                    pack3, split3(wz2, axis=0),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=dt)          # [T, 256]
            else:
                cz = jax.lax.dot_general(
                    pack_rows, wz2,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=dt, precision=HI)  # [T, 256]
            czl = cz * lanesel2
            col_u = jnp.sum(czl[:, :128], axis=1, keepdims=True)
            col_v = jnp.sum(czl[:, 128:], axis=1, keepdims=True)
            d_cat = jnp.concatenate([col_u * lsel_u, col_v * lsel_v],
                                    axis=0)             # [2T, 128]
            rsel_cat = jnp.concatenate([rsel_u, rsel_v], axis=0)
            if use_split:
                rs3cat = jnp.concatenate([rsel_cat] * 3, axis=0)
                win = jax.lax.dot_general(
                    rs3cat, split3(d_cat, axis=0),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=dt)          # [Wd8, 128]
            else:
                win = jax.lax.dot_general(
                    rsel_cat, d_cat,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=dt, precision=HI)  # [Wd8, 128]
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
                                   "interpret"))
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
      rv: true (padded-problem) vertex count for the prox/reduction mask
        (runtime value — no recompile per component count).

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
                   dif_tol2=dif_tol2, eps=eps)
    itm = jnp.stack([jnp.asarray(it_max, jnp.int32),
                     jnp.asarray(rv, jnp.int32)])
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
