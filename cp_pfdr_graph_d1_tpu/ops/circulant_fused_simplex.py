"""Fused Pallas TPU kernel: one multi-label PFDR iteration over circulant
shift families.

Multi-label analog of :mod:`.circulant_fused` — the K-axis counterpart the
r04 roofline called for: unstructured-graph simplex PFDR previously fell
back to the staged incidence-gather path (serial per-element XLA gathers,
orders of magnitude below the stencil-simplex kernel).  Here every
per-(edge,label) quantity lives in the circulant container's dense family
layout ``[F, K, VV8, 128]`` (family ``f``, label ``c``, slot ``u``), so an
endpoint gather is a flat circular shift of a dense label plane and the
whole iteration — loss gradient, forward step, per-(family,label) d1 prox,
relaxation, edge->vertex averaging over families and banded remainder
tiles, Michelot simplex projection in the metric, and the stopping-test
reduction — runs as ONE ``pallas_call``.

Grid = one program per family, then one per banded remainder tile, as in
the quadratic kernel; K label planes are statically unrolled inside each
program (as in :mod:`.stencil_fused_simplex`).  The forward-step field
``FP = 2P - Ga grad`` is computed once into a VMEM scratch at program 0
and re-read by every family/tile program.  The two dropped family fields
are recomputed in-kernel exactly as in the quadratic kernel
(``w_d1v = 1 - w_d1u`` — the normalized pair — and
``wv = wu * (w_d1v / w_d1u) * (ga_v / ga_u)``, which covers both the
``al == 0`` fixed-weight case and the general preconditioned case; see
:func:`..solvers.pfdr_simplex._precondition_simplex`), saving two HBM
streams per (family, label).

Semantics per (edge, label) are identical to the staged jnp path in
:mod:`..solvers.pfdr_simplex` and to the reference iteration
(``/root/reference/src/PFDR_graph_loss_d1_simplex.cpp:567-691``); equality
is enforced by ``tests/test_circulant_simplex.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import (_endpoint_sel, _gather_rows, _pack, _scatter_rows,
                     _selectors, _unpack)
from .circulant_fused import VMEM_BUDGET_BYTES, _flat_shift

MAX_FUSED_VERTICES = 1 << 20


def max_fused_vertices_simplex(k: int, tile: int = 1024,
                               itemsize: int = 4) -> int:
    """Largest padded vertex count whose resident buffers fit VMEM for a
    K-label problem.  Resident: ~(8K + 3) vertex-plane copies (p, q, ga,
    ga_proj, prev, laf, p out, prev out, fp + acc scratch) plus 14K
    double-buffered family-block planes, plus remainder tile operands."""
    rem = (4 * 2 + 9 * k * 2) * (tile // 128) * 128 * itemsize
    left = VMEM_BUDGET_BYTES - rem
    return min(MAX_FUSED_VERTICES,
               max(left, 0) // ((22 * k + 3) * itemsize))


def _loss_grad_plane(p, q, al: float, k: int, laf, has_laf: bool):
    """Per-label-plane loss gradient (pfdr_simplex._loss_grad twin)."""
    if al == 0.0:
        g = -q
    elif al == 1.0:
        g = p - q
    else:
        al_k = al / k
        al_1 = 1.0 - al
        g = -al_1 * (al_k + al_1 * q) / (al_k + al_1 * p)
    if al != 0.0 and has_laf:
        g = g * laf
    return g


def _kernel(*refs, nf, nt, tile, wd8, k, nv, rho, al, has_laf, label_mode,
            interpret):
    if nt:
        (offs_ref, starts_ref,
         zu_ref, zv_ref, wu_ref, wdu_ref, thd_ref,
         lur_ref, lul_ref, lvr_ref, lvl_ref,
         zur_ref, zvr_ref, wur_ref, wvr_ref, wdur_ref, wdvr_ref, thdr_ref,
         p_ref, q_ref, laf_ref, ga_ref, gap_ref, prev_ref,
         zuo_ref, zvo_ref, zuro_ref, zvro_ref, po_ref, prevo_ref, dif_ref,
         acc, fps) = refs
    else:
        (offs_ref,
         zu_ref, zv_ref, wu_ref, wdu_ref, thd_ref,
         p_ref, q_ref, laf_ref, ga_ref, gap_ref, prev_ref,
         zuo_ref, zvo_ref, po_ref, prevo_ref, dif_ref, acc, fps) = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        laf = laf_ref[:] if has_laf else None
        for c in range(k):
            g = _loss_grad_plane(p_ref[c], q_ref[c], al, k, laf, has_laf)
            fps[c] = 2.0 * p_ref[c] - ga_ref[c] * g

    @pl.when(i < nf)
    def _():
        a = offs_ref[i, 0]
        b = offs_ref[i, 1]
        ai = offs_ref[i, 2]
        bi = offs_ref[i, 3]
        for c in range(k):
            x = p_ref[c]
            fp = fps[c]
            fpv = _flat_shift(fp, a, b, interpret)
            xv = _flat_shift(x, a, b, interpret)
            wdu = wdu_ref[0, c]
            wdv = 1.0 - wdu
            wu = wu_ref[0, c]
            gau = ga_ref[c]
            gav = _flat_shift(gau, a, b, interpret)
            safe_u = jnp.where(wdu > 0, wdu, 1.0)
            safe_g = jnp.where(gau > 0, gau, 1.0)
            wv = wu * (wdv / safe_u) * jnp.where(gau > 0, gav / safe_g, 0.0)
            zu = zu_ref[0, c]
            zv = zv_ref[0, c]
            au = fp - zu
            av = fpv - zv
            avg = wdu * au + wdv * av
            diff = au - av
            shrunk = jnp.sign(diff) * jnp.maximum(
                jnp.abs(diff) - thd_ref[0, c], 0)
            zu = zu + rho * ((avg + wdv * shrunk) - x)
            zv = zv + rho * ((avg - wdu * shrunk) - xv)
            zuo_ref[0, c] = zu
            zvo_ref[0, c] = zv
            acc[c] += wu * zu
            acc[c] += _flat_shift(wv * zv, ai, bi, interpret)

    if nt:
        @pl.when(i >= nf)
        def _():
            pack_rows, lanesel = _selectors(tile)
            dt = p_ref.dtype
            s = starts_ref[jnp.maximum(i - nf, 0)]
            sels = None
            for c in range(k):
                xw = p_ref[c, pl.ds(s, wd8)]
                pw = fps[c, pl.ds(s, wd8)]
                if sels is None:
                    sels = []
                    for lr_ref, ll_ref in ((lur_ref, lul_ref),
                                           (lvr_ref, lvl_ref)):
                        sels.append(_endpoint_sel(lr_ref, ll_ref, tile,
                                                  wd8, pack_rows, lanesel))
                packed = []
                for rsel, lsel in sels:
                    rows_p = _gather_rows(rsel, pw)
                    rows_x = _gather_rows(rsel, xw)
                    ls = lsel.astype(dt)
                    pcol = jnp.sum(rows_p * ls, axis=1, keepdims=True)
                    xcol = jnp.sum(rows_x * ls, axis=1, keepdims=True)
                    packed.append((_pack(pcol, pack_rows, lanesel),
                                   _pack(xcol, pack_rows, lanesel)))
                (pu_t, xu_t), (pv_t, xv_t) = packed
                zu = zur_ref[c]
                zv = zvr_ref[c]
                au = pu_t - zu
                av = pv_t - zv
                wdu = wdur_ref[c]
                wdv = wdvr_ref[c]
                avg = wdu * au + wdv * av
                diff = au - av
                shrunk = jnp.sign(diff) * jnp.maximum(
                    jnp.abs(diff) - thdr_ref[c], 0)
                zu = zu + rho * ((avg + wdv * shrunk) - xu_t)
                zv = zv + rho * ((avg - wdu * shrunk) - xv_t)
                zuro_ref[c] = zu
                zvro_ref[c] = zv
                win = jnp.zeros((wd8, 128), dt)
                for (rsel, lsel), contrib in ((sels[0], wur_ref[c] * zu),
                                              (sels[1], wvr_ref[c] * zv)):
                    col = _unpack(contrib, pack_rows, lanesel)
                    d = col * lsel.astype(dt)
                    win = win + _scatter_rows(rsel, d)
                acc[c, pl.ds(s, wd8)] += win

    @pl.when(i == nf + nt - 1)
    def _():
        dt = p_ref.dtype
        vv8 = acc.shape[1]
        flat = (jax.lax.broadcasted_iota(jnp.int32, (vv8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (vv8, 128), 1))
        real = flat < nv
        # Michelot simplex projection in metric gap (ops/prox.py twin)
        a_ = [acc[c] for c in range(k)]
        m = [gap_ref[c] for c in range(k)]
        active = [jnp.ones_like(a_[0]) for _ in range(k)]
        la = jnp.zeros_like(a_[0])
        for _ in range(k):
            sx = a_[0] * active[0]
            sm = m[0] * active[0]
            for c in range(1, k):
                sx = sx + a_[c] * active[c]
                sm = sm + m[c] * active[c]
            la = (sx - 1.0) / jnp.where(sm > 0, sm, 1.0)
            active = [active[c] * (a_[c] - la * m[c] > 0).astype(dt)
                      for c in range(k)]
        pn = [jnp.where(real, jnp.maximum(a_[c] - la * m[c], 0), 0)
              for c in range(k)]
        for c in range(k):
            po_ref[c] = pn[c]
        # evolution (reference :653-691)
        if label_mode:
            best = pn[0]
            lab = jnp.zeros_like(pn[0])
            for c in range(1, k):
                better = pn[c] > best
                best = jnp.where(better, pn[c], best)
                lab = jnp.where(better, jnp.full_like(lab, float(c)), lab)
            prev = prev_ref[0]
            dif_ref[0, 0] = jnp.sum(
                jnp.where(real, (lab != prev).astype(dt), 0))
            prevo_ref[0] = lab
        else:
            sdif = jnp.abs(pn[0] - prev_ref[0])
            for c in range(1, k):
                sdif = sdif + jnp.abs(pn[c] - prev_ref[c])
            dif_ref[0, 0] = jnp.sum(jnp.where(real, sdif, 0))
            for c in range(k):
                prevo_ref[c] = pn[c]


@partial(jax.jit, static_argnames=("nf", "vv8", "nt", "tile", "wd8", "k",
                                   "nv", "rho", "al", "has_laf",
                                   "label_mode", "interpret"))
def fused_circulant_simplex_iteration(offs, starts8, zu, zv, wu, w_d1u,
                                      th_d1, lur, lul, lvr, lvl,
                                      zur, zvr, wur, wvr, wdur, wdvr, thdr,
                                      p, q, la_f, ga, ga_proj, prev, *,
                                      nf, vv8, nt, tile, wd8, k, nv,
                                      rho, al, has_laf, label_mode,
                                      interpret=False):
    """One fused multi-label PFDR edge+vertex step over shift families.

    Args:
      offs: [F, 4] int32 per-family flat shift ``(a, b, a_inv, b_inv)``.
      starts8: [nt] int32 remainder-tile window start rows (None if nt==0).
      zu..th_d1: [F, K, VV8, 128] per-(family, label) dense edge fields
        (slot ``u``); ``wv``/``w_d1v`` recomputed in-kernel.
      lur..lvl: [nt*T8, 128] remainder local endpoint indices (label-
        independent, shared across the K planes).
      zur..thdr: [K, nt*T8, 128] remainder per-(edge, label) fields.
      p, q, ga, ga_proj: [K, VV8, 128] dense label planes.
      la_f: [VV8, 128] per-vertex loss weights (ignored unless has_laf).
      prev: [K, VV8, 128] previous iterate, or [1, VV8, 128] previous ML
        labels (label_mode).
      nv: true vertex count (padding masked out of projection/reductions).

    Returns:
      ``(p_new [K,VV8,128], prev_new, zu_new, zv_new [F,K,VV8,128],
      zur_new, zvr_new [K,nt*T8,128] or None, dif_sum)``.
    """
    dt = p.dtype
    fblock = pl.BlockSpec((1, k, vv8, 128),
                          lambda i, *_: (jnp.minimum(i, nf - 1), 0, 0, 0))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = partial(_kernel, nf=nf, nt=nt, tile=tile, wd8=wd8, k=k, nv=nv,
                   rho=rho, al=al, has_laf=has_laf, label_mode=label_mode,
                   interpret=interpret)
    scratch = [pltpu.VMEM((k, vv8, 128), dt), pltpu.VMEM((k, vv8, 128), dt)]
    if nt:
        t8 = tile // 128
        tblock = pl.BlockSpec((t8, 128),
                              lambda i, *_: (jnp.maximum(i - nf, 0), 0))
        ktblock = pl.BlockSpec((k, t8, 128),
                               lambda i, *_: (0, jnp.maximum(i - nf, 0), 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nf + nt,),
            in_specs=[fblock] * 5 + [tblock] * 4 + [ktblock] * 7
            + [vspec] * 6,
            out_specs=[fblock, fblock, ktblock, ktblock, vspec, vspec,
                       sspec],
            scratch_shapes=scratch)
        zun, zvn, zurn, zvrn, pn, prevn, dif = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((nf, k, vv8, 128), dt),
                       jax.ShapeDtypeStruct((nf, k, vv8, 128), dt),
                       jax.ShapeDtypeStruct((k, nt * t8, 128), dt),
                       jax.ShapeDtypeStruct((k, nt * t8, 128), dt),
                       jax.ShapeDtypeStruct((k, vv8, 128), dt),
                       jax.ShapeDtypeStruct(prev.shape, dt),
                       jax.ShapeDtypeStruct((1, 1), dt)),
            interpret=interpret,
        )(offs, starts8, zu, zv, wu, w_d1u, th_d1,
          lur, lul, lvr, lvl, zur, zvr, wur, wvr, wdur, wdvr, thdr,
          p, q, la_f, ga, ga_proj, prev)
        return pn, prevn, zun, zvn, zurn, zvrn, dif[0, 0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nf,),
        in_specs=[fblock] * 5 + [vspec] * 6,
        out_specs=[fblock, fblock, vspec, vspec, sspec],
        scratch_shapes=scratch)
    zun, zvn, pn, prevn, dif = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nf, k, vv8, 128), dt),
                   jax.ShapeDtypeStruct((nf, k, vv8, 128), dt),
                   jax.ShapeDtypeStruct((k, vv8, 128), dt),
                   jax.ShapeDtypeStruct(prev.shape, dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        interpret=interpret,
    )(offs, zu, zv, wu, w_d1u, th_d1, p, q, la_f, ga, ga_proj, prev)
    return pn, prevn, zun, zvn, None, None, dif[0, 0]
