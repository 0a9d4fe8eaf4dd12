"""Fused Pallas kernel: a WHOLE certified PDHG min-cut on a stencil graph.

The staged XLA loop of :func:`..maxflow.device._pdhg_min_cut` pays the
per-op launch overhead ~20x the arithmetic at EEG-scale fields (measured
~200 us per PDHG iteration for 78 KB arrays); a certified cut needs a few
hundred to a few thousand iterations, so a staged cut costs 50-500 ms —
ruinous inside the chained cut-pursuit loop
(:mod:`..solvers.cut_pursuit_chain`), which runs up to two cuts per CP
iteration.  This kernel runs the ENTIRE PDHG iteration — chunks of
``check_every`` primal-dual steps, the coarea threshold sweep, and the
duality-gap certificate — inside one ``pallas_call`` with all state
VMEM-resident; rolls are in-register shifts.  Iteration semantics match
``_pdhg_min_cut`` exactly (same preconditioning, same 15-threshold
certificate; equality enforced by ``tests/test_mincut.py``).

Out-of-range stencil slots carry zero weight, so their circular
wrap-around is inert: ``sigma = 0`` keeps their dual at its (zero) start
and ``w z = 0`` drops them from the adjoint, as in the staged solver.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil_fused import _roll2

_THRESHOLDS = 15
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def mincut_vmem_bytes(num_elems: int, num_families: int,
                      itemsize: int = 4) -> int:
    """Resident VMEM estimate: x/xb/c/tau + out x (5 vertex fields) and
    w/sigma/z + out z (4F family fields), plus ~2 live roll temporaries."""
    return itemsize * num_elems * (7 + 4 * num_families)


def supports_fused_mincut(num_elems: int, num_families: int) -> bool:
    return mincut_vmem_bytes(num_elems, num_families) <= VMEM_BUDGET_BYTES


def _kernel(itm_ref, w_ref, c_ref, tau_ref, sigma_ref, x0_ref, z0_ref,
            tol_ref,
            xo_ref, zo_ref, gap_ref, tbest_ref, it_ref, *,
            shifts, check_every: int, interpret: bool):
    it_max = itm_ref[0]
    dt = x0_ref.dtype
    f = len(shifts)
    ts = [0.03 + (0.97 - 0.03) * i / (_THRESHOLDS - 1)
          for i in range(_THRESHOLDS)]
    tol = tol_ref[0, 0]
    # everything 2-D: per-family planes live as separate loop-carried
    # [H, W] values (a stacked [F, H, W] carry costs Mosaic a relayout
    # per iteration — measured 28x slower than the plane form)
    c = c_ref[:]
    tau = tau_ref[:]
    ws = tuple(w_ref[k] for k in range(f))
    sw = tuple(sigma_ref[k] * w_ref[k] for k in range(f))

    def ktz(z):
        acc = jnp.zeros_like(c)
        for k, (dy, dx) in enumerate(shifts):
            wz = ws[k] * z[k]
            acc = acc + wz - _roll2(wz, dy, dx, interpret)
        return acc

    def pdhg_iter(i, carry):
        x, xb, z = carry
        z = tuple(
            jnp.clip(z[k] + sw[k] * (xb - _roll2(xb, -dy, -dx, interpret)),
                     -1, 1)
            for k, (dy, dx) in enumerate(shifts))
        x_new = jnp.clip(x - tau * (ktz(z) + c), 0, 1)
        return x_new, 2 * x_new - x, z

    def gap_state(x, z):
        dual = jnp.sum(jnp.minimum(c + ktz(z), 0))
        best_val = jnp.asarray(jnp.inf, dt)
        best_t = jnp.asarray(ts[0], dt)
        for t in ts:
            side = (x > t).astype(dt)
            val = jnp.sum(side * c)
            for k, (dy, dx) in enumerate(shifts):
                sv = _roll2(side, -dy, -dx, interpret)
                val = val + jnp.sum(jnp.where(jnp.abs(side - sv) > 0.5,
                                              ws[k], 0.0))
            better = val < best_val
            best_val = jnp.where(better, val, best_val)
            best_t = jnp.where(better, jnp.asarray(t, dt), best_t)
        return best_val - dual, best_t

    def cond(carry):
        _, _, _, it, gap, _ = carry
        return jnp.logical_and(it < it_max, gap > tol)

    def body(carry):
        x, xb, z, it, _, _ = carry
        x, xb, z = jax.lax.fori_loop(0, check_every, pdhg_iter,
                                     (x, xb, z))
        gap, t_best = gap_state(x, z)
        return x, xb, z, it + check_every, gap, t_best

    x0 = x0_ref[:]
    z0 = tuple(z0_ref[k] for k in range(f))
    state = (x0, x0, z0, jnp.int32(0), jnp.asarray(jnp.inf, dt),
             jnp.asarray(ts[0], dt))
    x, _, z, it, gap, t_best = jax.lax.while_loop(cond, body, state)
    xo_ref[:] = x
    for k in range(f):
        zo_ref[k] = z[k]
    gap_ref[0, 0] = gap
    tbest_ref[0, 0] = t_best
    it_ref[0, 0] = it


@partial(jax.jit, static_argnames=("shifts", "check_every", "interpret"))
def fused_pdhg_min_cut(w, c, tau, sigma, x0, z0, tol, it_max, *,
                       shifts, check_every: int, interpret: bool = False):
    """Complete PDHG min-cut in one ``pallas_call``.

    Args:
      w: [F, H, W] edge weights (0 = absent, incl. masked/padded slots).
      c: [H, W] unary costs (already clipped finite).
      tau, sigma: [H, W] / [F, H, W] preconditioned step sizes.
      x0, z0: warm starts ([H, W], [F, H, W]).
      tol: absolute duality-gap certificate (traced scalar).
      it_max: iteration cap (traced scalar; multiples of ``check_every``).

    Returns:
      ``(x [H, W], z [F, H, W], gap, t_best, it)`` — threshold outside
      with ``side = x > t_best``.
    """
    dt = x0.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[vspec] * 6 + [sspec],
        out_specs=[vspec, vspec, sspec, sspec, sspec])
    kern = partial(_kernel, shifts=shifts, check_every=check_every,
                   interpret=interpret)
    itm = jnp.asarray(it_max, jnp.int32).reshape(1)
    x, z, gap, t_best, it = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(x0.shape, dt),
                   jax.ShapeDtypeStruct(z0.shape, dt),
                   jax.ShapeDtypeStruct((1, 1), dt),
                   jax.ShapeDtypeStruct((1, 1), dt),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        interpret=interpret,
    )(itm, w, c, tau, sigma, x0, z0, tol.reshape(1, 1))
    return x, z, gap[0, 0], t_best[0, 0], it[0, 0]


@partial(jax.jit, static_argnames=("it_max", "check_every", "interpret"))
def device_cut_stencil_fused(graph, active, cost, tol_rel, it_max: int,
                             check_every: int, x0=None, z0=None,
                             interpret: bool = False):
    """Drop-in for :func:`..solvers.cut_pursuit_device._device_cut` on
    stencil graphs: same preconditioning, clipping and certificate scale,
    with the whole PDHG loop in the fused kernel.  Returns
    ``(sep [E] bool, gap, big, x [V], z [E])``."""
    h, w_ = graph.field_shape
    f = len(graph.shifts)
    dtype = graph.la_d1.dtype
    wts = jnp.where(active, 0.0, graph.la_d1)
    big = 1.0 + 2.0 * (jnp.sum(wts) + jnp.sum(jnp.where(
        jnp.isfinite(cost), jnp.abs(cost), 0.0)))
    c_cl = jnp.clip(jnp.where(jnp.isfinite(cost), cost, big),
                    -big, big).astype(dtype)
    deg_w = graph.vertex_degree_weighted(wts)
    tau = jnp.where(deg_w > 0, 1.0 / jnp.maximum(deg_w, 1e-30),
                    1.0 / jnp.maximum(jnp.abs(c_cl), 1e-12))
    sigma = jnp.where(wts > 0, 0.5 / jnp.maximum(wts, 1e-30), 0.0)
    if x0 is None:
        x0 = jnp.full((graph.num_vertices,), 0.5, dtype)
    if z0 is None:
        z0 = jnp.zeros((graph.num_edges,), dtype)
    x, z, gap, t_best, _ = fused_pdhg_min_cut(
        wts.reshape(f, h, w_), c_cl.reshape(h, w_), tau.reshape(h, w_),
        sigma.reshape(f, h, w_), x0.reshape(h, w_), z0.reshape(f, h, w_),
        (tol_rel * big).astype(dtype), it_max,
        shifts=graph.shifts, check_every=check_every, interpret=interpret)
    x = x.reshape(-1)
    z = z.reshape(-1)
    side = x > t_best
    su, sv = graph.gather_endpoints(side)
    sep = (su != sv) & ~active & (graph.la_d1 > 0)
    return sep, gap, big, x, z
