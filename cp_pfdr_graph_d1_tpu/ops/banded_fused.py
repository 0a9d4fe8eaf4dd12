"""Fused Pallas TPU kernel: one full PFDR iteration on a banded graph.

The banded container (:mod:`..banded_graph`) previously split an iteration
into XLA endpoint gathers + the banded scatter kernel + ~10 elementwise
fusions; each stage round-trips every edge/vertex array through HBM and
pays its own launch cost, which dominates at EEG scale (~520 us/iter
measured, vs ~11 us for the stencil fused kernel).  This kernel performs
the whole edge + vertex stage of one iteration (forward step, endpoint
gathers, per-edge d1 prox with relaxation, edge->vertex weighted
accumulation, vertex prox, evolution reductions) in ONE ``pallas_call``
over the edge tiles of a :class:`..ops.banded.BandedPlan`:

* vertex fields (x, grad, Gamma, l1 thresholds) stay resident in VMEM in
  the dense ``[V8, 128]`` layout for the whole call;
* per tile, both endpoint gathers are banded one-hot MXU dots against the
  tile's vertex window (same selector machinery as :mod:`.banded`);
* the prox math runs in the dense edge-major ``[T8, 128]`` layout (the
  layout of ``zu``/``zv`` and the preconditioner arrays, so per-edge HBM
  traffic is exactly read-zu/zv + write-zu/zv + read-4-weights);
* the edge->vertex accumulation goes into a VMEM scratch accumulator and
  the vertex prox + stopping-test reductions run once, after the last
  tile.

Semantics are identical to the jnp path in :mod:`..solvers.pfdr_quadratic`
(reference iteration ``/root/reference/src/PFDR_graph_quadratic_d1_l1.cpp:
463-529``); equality is enforced by ``tests/test_banded.py``.
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
# buffers: 6 vertex-field VMEM arrays (x, grad, ga, th_l1, x out, acc
# scratch) plus 26 edge-tile buffers (11 blocked inputs + 2 blocked
# outputs, double-buffered) of ``tile`` elements each, plus the per-tile
# kernel temporaries — dominated by the two live [tile, Wd8] row
# selectors, which grow with the window width (a hub-heavy contracted
# graph can have Wd8 ~ V8, measured 30 MB scoped-vmem OOM at Wd8=1024).
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
MAX_FUSED_VERTICES = 1 << 20  # absolute cap


def fused_vmem_bytes(tile: int, wd8: int, v8: int,
                     itemsize: int = 4) -> int:
    """Scoped-VMEM estimate of one fused-iteration grid step."""
    t8 = tile // 128
    return itemsize * (
        2 * tile * wd8      # two live [T, Wd8] row selectors
        + 3 * tile * 128    # lane selectors + lanesel constant
        + tile * t8         # pack_rows constant
        + 26 * t8 * 128     # double-buffered edge blocks
        + 6 * v8 * 128      # resident vertex fields + acc + x out
        + 6 * wd8 * 128)    # window temporaries (xw, pw, win, dots)


def supports_fused_plan(tile: int, wd8: int, v8: int) -> bool:
    return (v8 * 128 <= MAX_FUSED_VERTICES
            and fused_vmem_bytes(tile, wd8, v8) <= VMEM_BUDGET_BYTES)


def max_fused_vertices(tile: int, itemsize: int = 4) -> int:
    """Largest padded vertex count whose resident buffers fit VMEM
    (window-width-independent part; see :func:`supports_fused_plan`)."""
    left = VMEM_BUDGET_BYTES - 26 * tile * itemsize
    return min(MAX_FUSED_VERTICES, max(left, 0) // (6 * itemsize))


def _kernel(s_ref, lur_ref, lul_ref, lvr_ref, lvl_ref,
            zu_ref, zv_ref, wu_ref, wv_ref, wdu_ref, wdv_ref, thd_ref,
            x_ref, grad_ref, ga_ref, thl1_ref,
            zuo_ref, zvo_ref, xo_ref, num_ref, den_ref, acc,
            *, tile, wd8, nv, rho, vkind, positivity, lo, hi):
    i = pl.program_id(0)
    pack_rows, lanesel = _selectors(tile)
    dt = x_ref.dtype

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = s_ref[i]
    xw = x_ref[pl.ds(s, wd8)]                       # [Wd8, 128]
    # forward step P = 2X - Ga grad (reference :463-464), window only
    pw = 2.0 * xw - ga_ref[pl.ds(s, wd8)] * grad_ref[pl.ds(s, wd8)]

    # endpoint gathers: banded one-hot row dots + lane reduce, packed back
    # to the dense edge-major layout of zu/zv
    sels = []
    packed = []
    for lr_ref, ll_ref in ((lur_ref, lul_ref), (lvr_ref, lvl_ref)):
        rsel, lsel = _endpoint_sel(lr_ref, ll_ref, tile, wd8, pack_rows,
                                   lanesel)
        sels.append((rsel, lsel))
        rows_p = _gather_rows(rsel, pw)             # [T, 128]
        rows_x = _gather_rows(rsel, xw)
        ls = lsel.astype(dt)
        pcol = jnp.sum(rows_p * ls, axis=1, keepdims=True)   # [T, 1]
        xcol = jnp.sum(rows_x * ls, axis=1, keepdims=True)
        packed.append((_pack(pcol, pack_rows, lanesel),
                       _pack(xcol, pack_rows, lanesel)))     # [T8, 128]
    (pu_e, xu_e), (pv_e, xv_e) = packed

    # per-edge d1 pair prox + relaxation (:466-489), edge-major layout
    zu = zu_ref[:]
    zv = zv_ref[:]
    au = pu_e - zu
    av = pv_e - zv
    wdu = wdu_ref[:]
    wdv = wdv_ref[:]
    avg = wdu * au + wdv * av
    diff = au - av
    shrunk = jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - thd_ref[:], 0)
    zu = zu + rho * ((avg + wdv * shrunk) - xu_e)
    zv = zv + rho * ((avg - wdu * shrunk) - xv_e)
    zuo_ref[:] = zu
    zvo_ref[:] = zv

    # weighted edge->vertex accumulation into the resident window (:491-497)
    win = jnp.zeros((wd8, 128), dt)
    for (rsel, lsel), contrib in ((sels[0], wu_ref[:] * zu),
                                  (sels[1], wv_ref[:] * zv)):
        col = _unpack(contrib, pack_rows, lanesel)  # [T, 1]
        d = col * lsel.astype(dt)                   # [T, 128]
        win = win + _scatter_rows(rsel, d)
    acc[pl.ds(s, wd8)] += win

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        a = acc[:]
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
        # zero the padding rows/lanes so the reductions (and clip's lo) see
        # only real vertices
        v8 = a.shape[0]
        flat = (jax.lax.broadcasted_iota(jnp.int32, (v8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (v8, 128), 1))
        xn = jnp.where(flat < nv, xn, 0)
        xo_ref[:] = xn
        # evolution reductions (:514-529)
        delta = xn - x_ref[:]
        num_ref[0, 0] = jnp.sum(delta * delta)
        den_ref[0, 0] = jnp.sum(xn * xn)


@partial(jax.jit, static_argnames=("nt", "tile", "wd8", "v8", "nv", "rho",
                                   "vkind", "positivity", "lo", "hi",
                                   "interpret"))
def fused_banded_iteration(starts8, lur, lul, lvr, lvl,
                           zu, zv, wu, wv, w_d1u, w_d1v, th_d1,
                           x, grad, ga, th_l1, *,
                           nt, tile, wd8, v8, nv, rho, vkind, positivity,
                           lo, hi, interpret=False):
    """One fused PFDR edge+vertex step on a banded plan.

    Args:
      starts8, lur..lvl: the :class:`..ops.banded.BandedPlan` device arrays.
      zu..th_d1: [nt*T8, 128] dense edge-major per-edge arrays.
      x, grad, ga, th_l1: [V8, 128] dense vertex fields (zero padded).
      nv: true vertex count (padding masked out of prox/reductions).

    Returns:
      ``(x_new [V8,128], zu_new, zv_new [nt*T8,128], num, den)``.
    """
    t8 = tile // 128
    dt = x.dtype
    eblock = pl.BlockSpec((t8, 128), lambda i, s: (i, 0))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nt,),
        in_specs=[eblock] * 11 + [vspec] * 4,
        out_specs=[eblock, eblock, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((v8, 128), dt)])
    kern = partial(_kernel, tile=tile, wd8=wd8, nv=nv, rho=rho, vkind=vkind,
                   positivity=positivity, lo=lo, hi=hi)
    zun, zvn, xn, num, den = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nt * t8, 128), dt),
                   jax.ShapeDtypeStruct((nt * t8, 128), dt),
                   jax.ShapeDtypeStruct((v8, 128), dt),
                   jax.ShapeDtypeStruct((1, 1), dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        interpret=interpret,
    )(starts8, lur, lul, lvr, lvl, zu, zv, wu, wv, w_d1u, w_d1v, th_d1,
      x, grad, ga, th_l1)
    return xn, zun, zvn, num[0, 0], den[0, 0]
