"""Fused Pallas TPU kernel: one PFDR iteration over circulant shift families.

Companion kernel of :class:`..circulant.CirculantGraphD1`: the graph's edges
are bucketed by vertex-index offset ``d = ev - eu``, so family ``f`` connects
every vertex ``u`` to ``u + d_f`` — an endpoint gather is a *flat circular
shift* of the dense vertex field, not a gather.  TPUs have no vector gather
(XLA lowers ``x[eu]`` to a serial per-element loop, the dominant cost of the
staged unstructured path), but they do have cheap in-register circular
shifts (``pltpu.roll``), so each family costs a handful of VPU ops on the
``[V8, 128]`` field regardless of which vertices its edges touch.

Grid = one program per family, sequentially accumulating the edge->vertex
weighted average into a VMEM scratch; the vertex prox and the stopping-test
reductions run after the last family.  Per-family shift amounts arrive as
scalar-prefetch values ``(row, lane)`` for the forward shift and its
inverse (dynamic shifts — one compiled kernel serves any offset set).

Remainder edges (rare offsets not worth a dense family) are handled by the
caller in XLA; their vertex accumulation enters through ``racc``.

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

MAX_FUSED_VERTICES = 1 << 20


def _flat_shift(m, a, b, interpret: bool):
    """``out[k] = m_flat[(k + 128 a + b) % (R * 128)]`` on a [R, 128] field.

    Row part via a dynamic sublane roll; the lane part needs two row
    candidates (lanes that wrap past 128 read the next row), selected by a
    lane iota — 4 VPU ops total, any shift amount.
    """
    r = m.shape[0]
    if interpret:
        return jnp.roll(m.reshape(-1), -(a * 128 + b)).reshape(m.shape)
    t = pltpu.roll(m, shift=(128 - b) % 128, axis=1)   # t[r,c] = m[r,(c+b)%128]
    y = pltpu.roll(t, shift=(r - a) % r, axis=0)       # y[i] = t[i+a]
    y2 = pltpu.roll(t, shift=(r - 1 - a) % r, axis=0)  # y2[i] = t[i+a+1]
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    return jnp.where(lane < 128 - b, y, y2)


def _kernel(offs_ref, zu_ref, zv_ref, wu_ref, wv_ref, wdu_ref, wdv_ref,
            thd_ref, x_ref, grad_ref, ga_ref, thl1_ref, racc_ref,
            zuo_ref, zvo_ref, xo_ref, num_ref, den_ref, acc,
            *, nf, nv, rho, vkind, positivity, lo, hi, interpret):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = racc_ref[:]

    x = x_ref[:]
    # forward step P = 2X - Ga grad (reference :463-464)
    p = 2.0 * x - ga_ref[:] * grad_ref[:]
    a = offs_ref[i, 0]
    b = offs_ref[i, 1]
    # u-endpoint of slot u is u itself; v-endpoint values arrive by shift
    pv = _flat_shift(p, a, b, interpret)
    xv = _flat_shift(x, a, b, interpret)

    # per-edge d1 pair prox + relaxation (:466-489)
    zu = zu_ref[0]
    zv = zv_ref[0]
    au = p - zu
    av = pv - zv
    wdu = wdu_ref[0]
    wdv = wdv_ref[0]
    avg = wdu * au + wdv * av
    diff = au - av
    shrunk = jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - thd_ref[0], 0)
    zu = zu + rho * ((avg + wdv * shrunk) - x)
    zv = zv + rho * ((avg - wdu * shrunk) - xv)
    zuo_ref[0] = zu
    zvo_ref[0] = zv

    # weighted edge->vertex average (:491-497); the v-contribution shifts
    # back by the inverse offset
    acc[:] += wu_ref[0] * zu
    acc[:] += _flat_shift(wv_ref[0] * zv, offs_ref[i, 2], offs_ref[i, 3],
                          interpret)

    @pl.when(i == nf - 1)
    def _():
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
        delta = xn - x
        num_ref[0, 0] = jnp.sum(delta * delta)
        den_ref[0, 0] = jnp.sum(xn * xn)


@partial(jax.jit, static_argnames=("nf", "vv8", "nv", "rho", "vkind",
                                   "positivity", "lo", "hi", "interpret"))
def fused_circulant_iteration(offs, zu, zv, wu, wv, w_d1u, w_d1v, th_d1,
                              x, grad, ga, th_l1, racc, *,
                              nf, vv8, nv, rho, vkind, positivity, lo, hi,
                              interpret=False):
    """One fused PFDR edge+vertex step over the dense shift families.

    Args:
      offs: [F, 4] int32 ``(a, b, a_inv, b_inv)`` per family — the forward
        flat shift ``d = 128 a + b`` and its inverse ``(VV - d)``.
      zu..th_d1: [F, VV8, 128] per-family dense edge fields (slot ``u``).
      x, grad, ga, th_l1, racc: [VV8, 128] dense vertex fields (``racc`` is
        the remainder edges' pre-accumulated vertex contribution).
      nv: true vertex count (padding masked out of prox/reductions).

    Returns:
      ``(x_new [VV8,128], zu_new, zv_new [F,VV8,128], num, den)``.
    """
    dt = x.dtype
    fblock = pl.BlockSpec((1, vv8, 128), lambda i, s: (i, 0, 0))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nf,),
        in_specs=[fblock] * 7 + [vspec] * 5,
        out_specs=[fblock, fblock, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((vv8, 128), dt)])
    kern = partial(_kernel, nf=nf, nv=nv, rho=rho, vkind=vkind,
                   positivity=positivity, lo=lo, hi=hi, interpret=interpret)
    zun, zvn, xn, num, den = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nf, vv8, 128), dt),
                   jax.ShapeDtypeStruct((nf, vv8, 128), dt),
                   jax.ShapeDtypeStruct((vv8, 128), dt),
                   jax.ShapeDtypeStruct((1, 1), dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        interpret=interpret,
    )(offs, zu, zv, wu, wv, w_d1u, w_d1v, th_d1, x, grad, ga, th_l1, racc)
    return xn, zun, zvn, num[0, 0], den[0, 0]
