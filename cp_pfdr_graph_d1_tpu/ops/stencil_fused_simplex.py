"""Fused Pallas TPU kernel for one multi-label PFDR iteration.

Multi-label analog of :mod:`.stencil_fused`: the whole iteration — loss
gradient, forward step, per-(family, label) d1 prox, relaxation,
edge->vertex averaging, Michelot simplex projection in the metric, and the
stopping-test reduction — runs as ONE ``pallas_call`` on ``K`` unrolled
[H, W] label planes (layout [K, H, W]; K and the shift families are
static).  The jnp path at EEG scale spends ~30 small XLA dispatches per
iteration; this kernel replaces them all.

Semantics match :mod:`..solvers.pfdr_simplex` exactly (same formulas,
``/root/reference/src/PFDR_graph_loss_d1_simplex.cpp:567-691``); equality
is enforced by ``tests/test_stencil.py::test_fused_simplex_matches_jnp``.
Restrictions: no reconditioning (``dif_rcd == 0``) and no objective
monitoring — the solver falls back to the jnp path otherwise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil_fused import _roll2


def _kernel(p_ref, q_ref, laf_ref, ga_ref, gap_ref, prev_ref,
            zu_ref, zv_ref, wu_ref, wv_ref, wdu_ref, wdv_ref, thd_ref,
            po_ref, prevo_ref, zuo_ref, zvo_ref, dif_ref,
            *, shifts, rho, al, k, has_laf, label_mode, interpret):
    p = [p_ref[c] for c in range(k)]
    # loss gradient (reference :327-354 analog, see pfdr_simplex._loss_grad)
    if al == 0.0:
        g = [-q_ref[c] for c in range(k)]
    else:
        if al == 1.0:
            g = [p[c] - q_ref[c] for c in range(k)]
        else:
            al_k = al / k
            al_1 = 1.0 - al
            g = [-al_1 * (al_k + al_1 * q_ref[c]) / (al_k + al_1 * p[c])
                 for c in range(k)]
        if has_laf:
            laf = laf_ref[0]
            g = [gc * laf for gc in g]
    # forward step
    fp = [2.0 * p[c] - ga_ref[c] * g[c] for c in range(k)]
    acc = [jnp.zeros_like(p[0]) for _ in range(k)]
    for f, (dy, dx) in enumerate(shifts):
        for c in range(k):
            fpv = _roll2(fp[c], -dy, -dx, interpret)
            pv = _roll2(p[c], -dy, -dx, interpret)
            zu = zu_ref[f, c]
            zv = zv_ref[f, c]
            au = fp[c] - zu
            av = fpv - zv
            wdu = wdu_ref[f, c]
            wdv = wdv_ref[f, c]
            avg = wdu * au + wdv * av
            diff = au - av
            shrunk = jnp.sign(diff) * jnp.maximum(
                jnp.abs(diff) - thd_ref[f, c], 0)
            pu = avg + wdv * shrunk
            pvx = avg - wdu * shrunk
            zu = zu + rho * (pu - p[c])
            zv = zv + rho * (pvx - pv)
            zuo_ref[f, c] = zu
            zvo_ref[f, c] = zv
            acc[c] = acc[c] + wu_ref[f, c] * zu
            acc[c] = acc[c] + _roll2(wv_ref[f, c] * zv, dy, dx, interpret)
    # Michelot simplex projection in metric gap (ops/prox.py twin)
    m = [gap_ref[c] for c in range(k)]
    active = [jnp.ones_like(acc[0]) for _ in range(k)]
    la = jnp.zeros_like(acc[0])
    for _ in range(k):
        sx = acc[0] * active[0]
        sm = m[0] * active[0]
        for c in range(1, k):
            sx = sx + acc[c] * active[c]
            sm = sm + m[c] * active[c]
        la = (sx - 1.0) / jnp.where(sm > 0, sm, 1.0)
        active = [active[c] * (acc[c] - la * m[c] > 0).astype(acc[c].dtype)
                  for c in range(k)]
    pn = [jnp.maximum(acc[c] - la * m[c], 0) for c in range(k)]
    for c in range(k):
        po_ref[c] = pn[c]
    # evolution (:653-691)
    if label_mode:
        best = pn[0]
        lab = jnp.zeros_like(pn[0])
        for c in range(1, k):
            better = pn[c] > best
            best = jnp.where(better, pn[c], best)
            lab = jnp.where(better, jnp.full_like(lab, float(c)), lab)
        prev = prev_ref[0]
        dif_ref[0, 0] = jnp.sum((lab != prev).astype(pn[0].dtype))
        prevo_ref[0] = lab
    else:
        s = jnp.abs(pn[0] - prev_ref[0])
        for c in range(1, k):
            s = s + jnp.abs(pn[c] - prev_ref[c])
        dif_ref[0, 0] = jnp.sum(s)
        for c in range(k):
            prevo_ref[c] = pn[c]


@partial(jax.jit, static_argnames=("shifts", "rho", "al", "has_laf",
                                   "label_mode", "interpret"))
def fused_stencil_simplex_iteration(p, q, la_f, ga, ga_proj, prev, zu, zv,
                                    wu, wv, w_d1u, w_d1v, th_d1, *,
                                    shifts, rho: float, al: float,
                                    has_laf: bool, label_mode: bool,
                                    interpret: bool = False):
    """One fused multi-label PFDR step.

    Args:
      p, q, ga, ga_proj: [K, H, W] label planes.
      la_f: [1, H, W] per-vertex loss weights (ignored when not has_laf).
      prev: [K, H, W] previous iterate, or [1, H, W] previous ML labels
        (label_mode).
      zu..th_d1: [F, K, H, W] per-(family, label) edge planes.

    Returns:
      (p_new, prev_new, zu_new, zv_new, dif_sum) — ``dif_sum`` is the
      changed-label count (label_mode) or ``sum |p - prev|`` (caller
      divides by the global vertex count).
    """
    dt = p.dtype
    k = p.shape[0]
    kern = partial(_kernel, shifts=shifts, rho=rho, al=al, k=k,
                   has_laf=has_laf, label_mode=label_mode,
                   interpret=interpret)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, dt),
            jax.ShapeDtypeStruct(prev.shape, dt),
            jax.ShapeDtypeStruct(zu.shape, dt),
            jax.ShapeDtypeStruct(zv.shape, dt),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[vspec] * 13,
        out_specs=(vspec, vspec, vspec, vspec, sspec),
        interpret=interpret,
    )(p, q, la_f, ga, ga_proj, prev, zu, zv, wu, wv, w_d1u, w_d1v, th_d1)
    pn, prevn, zun, zvn, dif = out
    return pn, prevn, zun, zvn, dif[0, 0]
