"""Fused Pallas kernel: connected components of a masked stencil graph.

The generic device path (:func:`.components.connected_components_device`)
accelerates min-label propagation with pointer jumping ``l <- l[l]`` — a
[V]-from-[V] gather that this TPU backend executes as element-serial
dynamic slices (measured ~seconds per gather at V = 19.6k), making the
per-CP-iteration components stage the dominant cost of the chained
cut-pursuit loop.  On a stencil graph the propagation step itself is
rolls + minimums — VPU work — so this kernel drops pointer jumping
entirely and instead runs MANY cheap propagation rounds inside one
``pallas_call`` (all state VMEM-resident, ~1-2 us per round), with a
convergence check every ``chunk`` rounds.  Rounds needed equal the
largest component's graph diameter: O(H + W) for the blob-like components
cut-pursuit produces, worst case H*W for snakes — still milliseconds.

Labels converge to the smallest vertex index per component (the
reference's DFS first-encounter numbering after compaction,
``/root/reference/src/CP_PFDR_graph_quadratic_d1_l1.cpp:570-596``).
Labels are carried as f32 (exact for V < 2^24; in-kernel int rolls are
avoided for Mosaic portability) and returned as int32.

Compaction to 0..rV-1 avoids the [V]-table gather with the double-sort
trick: sort (root, vertex) pairs, run-length number the sorted roots,
sort back by vertex — two ``lax.sort_key_val`` calls, no gathers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil_fused import _roll2

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def supports_fused_components(num_elems: int, num_families: int,
                              itemsize: int = 4) -> bool:
    """l/prev/out + 2F masks + ~2 roll temporaries."""
    return (itemsize * num_elems * (5 + 2 * num_families)
            <= VMEM_BUDGET_BYTES)


def _kernel(mu_ref, mv_ref, lab_ref, rounds_ref, *,
            shifts, h: int, w: int, chunk: int, it_max: int,
            interpret: bool):
    """``mu[k]``: edge (k,i,j) present looking forward (tail at (i,j));
    ``mv[k]``: same mask pre-rolled so position (i+dy, j+dx) sees it."""
    dt = jnp.float32
    big = jnp.asarray(float(h * w), dt)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    l0 = (row * w + col).astype(dt)

    def one_round(_, l):
        for k, (dy, dx) in enumerate(shifts):
            fwd = jnp.where(mu_ref[k] > 0, _roll2(l, -dy, -dx, interpret),
                            big)
            bwd = jnp.where(mv_ref[k] > 0, _roll2(l, dy, dx, interpret),
                            big)
            l = jnp.minimum(l, jnp.minimum(fwd, bwd))
        return l

    def cond(carry):
        _, changed, it = carry
        return jnp.logical_and(changed, it < it_max)

    def body(carry):
        l, _, it = carry
        l_new = jax.lax.fori_loop(0, chunk, one_round, l)
        return l_new, jnp.any(l_new != l), it + chunk

    l, _, rounds = jax.lax.while_loop(
        cond, body, (l0, jnp.asarray(True), jnp.int32(0)))
    lab_ref[:] = l
    rounds_ref[0, 0] = rounds


@partial(jax.jit, static_argnames=("shifts", "h", "w", "chunk", "it_max",
                                   "interpret"))
def _fused_components_call(mu, mv, *, shifts, h: int, w: int, chunk: int,
                           it_max: int, interpret: bool):
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = partial(_kernel, shifts=shifts, h=h, w=w, chunk=chunk,
                   it_max=it_max, interpret=interpret)
    lab, rounds = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((h, w), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[vspec, vspec],
        out_specs=(vspec, sspec),
        interpret=interpret,
    )(mu, mv)
    return lab, rounds[0, 0]


@partial(jax.jit, static_argnames=("interpret",))
def stencil_components_fused(graph, edge_mask, interpret: bool = False):
    """Roots (smallest reachable vertex index, int32 [V]) of the masked
    stencil graph; fused-kernel twin of
    :func:`.components.connected_components_device`."""
    h, w = graph.field_shape
    f = len(graph.shifts)
    m3 = edge_mask.reshape(f, h, w).astype(jnp.float32)
    mv = jnp.stack([jnp.roll(m3[k], (dy, dx), axis=(0, 1))
                    for k, (dy, dx) in enumerate(graph.shifts)])
    lab, _ = _fused_components_call(
        m3, mv, shifts=graph.shifts, h=h, w=w, chunk=64, it_max=h * w,
        interpret=interpret)
    return lab.reshape(-1).astype(jnp.int32)


@jax.jit
def compact_labels_device(roots):
    """First-encounter 0..rV-1 renumbering WITHOUT a [V]-table gather:
    double-sort (see module docstring).  Returns
    ``(cv int32 [V], num_comp int32, firsts bool [V])``."""
    v = roots.shape[0]
    iota = jnp.arange(v, dtype=jnp.int32)
    firsts = roots == iota
    num = jnp.sum(firsts.astype(jnp.int32))
    sroots, sidx = jax.lax.sort_key_val(roots, iota)
    flags = sroots != jnp.concatenate(
        [jnp.full((1,), -1, sroots.dtype), sroots[:-1]])
    runid = (jnp.cumsum(flags.astype(jnp.int32)) - 1).astype(jnp.int32)
    _, cv = jax.lax.sort_key_val(sidx, runid)
    return cv, num, firsts


@partial(jax.jit, static_argnames=("interpret",))
def device_components_stencil_fused(graph, active, interpret: bool = False):
    """Drop-in for :func:`..solvers.cut_pursuit_device._device_components`
    on stencil graphs; returns ``(cv, num_comp, firsts)``."""
    mask = ~active & (graph.la_d1 > 0)
    roots = stencil_components_fused(graph, mask, interpret=interpret)
    return compact_labels_device(roots)
