"""Fused Pallas TPU kernel for one PFDR iteration's edge + vertex stage.

On a stencil graph the per-iteration edge stage (forward step, per-edge d1
prox, relaxation, edge->vertex weighted average, vertex prox, evolution
reduction) is a chain of ~10 elementwise ops and static rolls per shift
family.  Left to XLA these become several small fusions whose fixed launch
cost dominates at EEG-scale fields (140x140 f32 = 78 KB per array): measured
~5.6 us per family per iteration on a v5e, far above the bytes/FLOP cost.
This kernel performs the whole stage in ONE ``pallas_call`` — every array is
read from and written to VMEM exactly once, rolls are in-register shifts
(``pltpu.roll``), and the stopping-test reductions come out as scalars.

Semantics are bit-identical to the reference jnp path in
:mod:`..solvers.pfdr_quadratic` (same prox formulas —
``/root/reference/src/PFDR_graph_quadratic_d1_l1.cpp:463-529``); equality is
enforced by ``tests/test_stencil.py::test_fused_kernel_matches_jnp``.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~16 MB/core; leave headroom for compiler temporaries.  The
# single-block kernel holds 9F+5 field-size VMEM buffers (4 vertex inputs +
# 1 vertex output + 7F family inputs + 2F family outputs), so the largest
# compilable field is a function of the family count, not a flat constant.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
MAX_FUSED_FIELD_ELEMS = 1 << 20  # absolute cap, any family count


def max_fused_field_elems(num_families: int, itemsize: int = 4) -> int:
    """Largest H*W whose 9F+5 resident buffers fit the VMEM budget."""
    per_elem = (9 * num_families + 5) * itemsize
    return min(MAX_FUSED_FIELD_ELEMS, VMEM_BUDGET_BYTES // per_elem)


def _roll2(x, dy: int, dx: int, interpret: bool):
    """Static circular shift moving element (i, j) to (i+dy, j+dx)."""
    if interpret:
        return jnp.roll(x, (dy, dx), axis=(0, 1))
    h, w = x.shape
    if dy % h:
        x = pltpu.roll(x, shift=dy % h, axis=0)
    if dx % w:
        x = pltpu.roll(x, shift=dx % w, axis=1)
    return x


def _kernel(x_ref, grad_ref, ga_ref, th_l1_ref,
            zu_ref, zv_ref, wu_ref, wv_ref, w_d1u_ref, w_d1v_ref, th_d1_ref,
            xo_ref, zuo_ref, zvo_ref, num_ref, den_ref,
            *, shifts, rho, vkind, positivity, lo, hi, interpret):
    x = x_ref[:]
    # forward step P = 2X - Ga grad (reference :463-464)
    p = 2.0 * x - ga_ref[:] * grad_ref[:]
    acc = jnp.zeros_like(x)
    for f, (dy, dx) in enumerate(shifts):
        pv = _roll2(p, -dy, -dx, interpret)
        xv = _roll2(x, -dy, -dx, interpret)
        zu = zu_ref[f]
        zv = zv_ref[f]
        au = p - zu
        av = pv - zv
        # d1 pair prox (:466-489)
        wdu = w_d1u_ref[f]
        wdv = w_d1v_ref[f]
        avg = wdu * au + wdv * av
        diff = au - av
        shrunk = jnp.sign(diff) * jnp.maximum(
            jnp.abs(diff) - th_d1_ref[f], 0)
        pu = avg + wdv * shrunk
        pvx = avg - wdu * shrunk
        zu = zu + rho * (pu - x)
        zv = zv + rho * (pvx - xv)
        zuo_ref[f] = zu
        zvo_ref[f] = zv
        # weighted average back to vertices (:491-497)
        acc = acc + wu_ref[f] * zu
        acc = acc + _roll2(wv_ref[f] * zv, dy, dx, interpret)
    # vertex prox (:499-512)
    if vkind == "l1":
        xn = jnp.maximum(acc - th_l1_ref[:], 0)
        if not positivity:
            xn = xn + jnp.minimum(acc + th_l1_ref[:], 0)
    elif vkind == "bounds":
        xn = jnp.clip(acc, lo, hi)
    elif positivity:
        xn = jnp.maximum(acc, 0)
    else:
        xn = acc
    xo_ref[:] = xn
    # evolution reductions (:514-529)
    delta = xn - x
    num_ref[0, 0] = jnp.sum(delta * delta)
    den_ref[0, 0] = jnp.sum(xn * xn)


@partial(jax.jit, static_argnames=("shifts", "rho", "vkind", "positivity",
                                   "lo", "hi", "interpret"))
def fused_stencil_iteration(x, grad, ga, th_l1, zu, zv, wu, wv, w_d1u,
                            w_d1v, th_d1, *, shifts: Tuple, rho: float,
                            vkind: str, positivity: bool, lo: float,
                            hi: float, interpret: bool = False):
    """One fused edge+vertex PFDR step on an (H, W) field.

    Args:
      x, grad, ga, th_l1: [H, W] vertex fields.
      zu, zv, wu, wv, w_d1u, w_d1v, th_d1: [F, H, W] per-family edge fields.
      shifts: static ((dy, dx), ...) of the F shift families.
      rho: static relaxation parameter.
      vkind / positivity / lo / hi: static vertex-prox description.
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      (x_new [H, W], zu_new, zv_new [F, H, W], num, den) where num/den are
      the squared evolution and squared norm of the new iterate.
    """
    dt = x.dtype
    kern = partial(_kernel, shifts=shifts, rho=rho, vkind=vkind,
                   positivity=positivity, lo=lo, hi=hi, interpret=interpret)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, dt),
            jax.ShapeDtypeStruct(zu.shape, dt),
            jax.ShapeDtypeStruct(zv.shape, dt),
            jax.ShapeDtypeStruct((1, 1), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[vspec] * 11,
        out_specs=(vspec, vspec, vspec, sspec, sspec),
        interpret=interpret,
    )(x, grad, ga, th_l1, zu, zv, wu, wv, w_d1u, w_d1v, th_d1)
    xn, zun, zvn, num, den = out
    return xn, zun, zvn, num[0, 0], den[0, 0]
