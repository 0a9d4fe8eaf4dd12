"""Banded gather/scatter Pallas kernels for unstructured graphs on TPU.

TPUs have no vector gather: ``x[eu]`` on an E~40k edge list lowers to a
serial per-element loop (~7 ns/element, measured ~540 us per endpoint pair
at EEG scale), which makes unstructured-mesh PFDR two orders of magnitude
slower than the stencil path.  This module re-expresses both transfers as
MXU matmuls against *one-hot selection matrices generated on-chip*:

* vertices live in a dense ``[V8, 128]`` layout (vertex ``v`` at row
  ``v // 128``, lane ``v % 128``);
* edges are sorted by ``min(eu, ev)`` and cut into tiles of ``T``; after a
  bandwidth-reducing vertex ordering (see :func:`rcm_order`) every tile's
  endpoints fall inside a narrow window of ``Wd8`` consecutive rows;
* per tile, a row-selector ``rsel[t, r] = (row(e_t) == r)`` (an on-chip
  iota compare) gathers whole rows with one ``[T, Wd8] @ [Wd8, 128]`` MXU
  dot, and a lane-selector reduce picks the element — exactly (selector
  entries are 0/1, value dots run at ``Precision.HIGHEST``);
* the scatter is the transposed pair of dots, accumulated over the
  sequential grid into a VMEM scratch (deterministic, race-free);
* per-edge inputs/outputs use a dense edge-major ``[T8, 128]`` layout
  (edge ``t`` at ``(t // 128, t % 128)``), converted to/from the kernel's
  column form by small one-hot pack/unpack dots, so HBM traffic stays at
  ~4 bytes/edge (a ``[T, 1]`` layout would be tiled to 128 lanes and cost
  128x — measured 82 MB/iteration).

No reference counterpart: the reference's OpenMP loops read scattered
memory directly (``/root/reference/src/PFDR_graph_quadratic_d1_l1.cpp:
466-497``); this is the TPU-native equivalent of that memory system.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one-hot selector dots run at HIGHEST: Pallas-mosaic supports only
# DEFAULT (bf16, would truncate the gathered values) and HIGHEST
HI = jax.lax.Precision.HIGHEST


class BandedPlan(NamedTuple):
    """Host-built tiling of a sorted edge list (all arrays device-ready).

    Attributes:
      starts8: [nt] int32 window start row of each tile.
      lur, lul, lvr, lvl: [nt*T8, 128] float32 dense edge-major local row /
        lane indices of the u/v endpoints (exact small ints).
      num_tiles, tile, wd8, v8: static geometry.
    """
    starts8: np.ndarray
    lur: np.ndarray
    lul: np.ndarray
    lvr: np.ndarray
    lvl: np.ndarray
    num_tiles: int
    tile: int
    wd8: int
    v8: int


def rcm_order(eu, ev, num_vertices: int):
    """Bandwidth-reducing vertex permutation (reverse Cuthill-McKee).

    Returns ``order`` such that relabeling ``v -> inv[v]`` (with
    ``inv = argsort(order)``) makes ``|eu - ev|`` small, which tightens the
    banded windows.  Callers must permute every per-vertex quantity
    (operator columns, weights) consistently.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    e = np.ones(len(eu), np.int8)
    adj = coo_matrix((e, (eu, ev)), shape=(num_vertices, num_vertices))
    adj = (adj + adj.T).tocsr()
    return np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))


def build_banded_plan(eu, ev, num_vertices: int, tile: int = 1024,
                      round_wd8: bool = False):
    """Sorts edges by min endpoint, tiles them, and computes windows.

    Returns ``(plan, perm, epad)``: the plan, the edge permutation applied
    (callers must reorder per-edge data with it; positions >= len(perm) are
    inert padding), and the padded edge count ``nt * tile``.

    ``round_wd8`` rounds the window width up to a power of two (capped at
    ``v8``): the cut-pursuit reduced graphs change geometry every outer
    iteration, and a bucketed ``wd8`` bounds the number of distinct kernel
    shapes that must compile.
    """
    if tile % 1024:
        raise ValueError("tile must be a multiple of 1024 (the Pallas TPU "
                         "block sublane constraint: tile/128 % 8 == 0)")
    eu = np.asarray(eu, np.int64)
    ev = np.asarray(ev, np.int64)
    e = len(eu)
    if e == 0:
        raise ValueError("empty edge set")
    perm = np.argsort(np.minimum(eu, ev), kind="stable")
    eu, ev = eu[perm], ev[perm]
    nt = -(-e // tile)
    epad = nt * tile
    # pad with (weight-0) copies of the last edge: keeps the last window
    # tight and the padding inert
    eu = np.concatenate([eu, np.full(epad - e, eu[-1])])
    ev = np.concatenate([ev, np.full(epad - e, ev[-1])])

    v8 = -(-num_vertices // 128)
    starts8 = np.empty(nt, np.int32)
    wd = 0
    for i in range(nt):
        sl = slice(i * tile, (i + 1) * tile)
        lo = min(eu[sl].min(), ev[sl].min())
        hi = max(eu[sl].max(), ev[sl].max())
        starts8[i] = lo // 128
        wd = max(wd, int(hi) + 1 - int(starts8[i]) * 128)
    wd8 = -(-wd // 128)
    if round_wd8:
        p2 = 1
        while p2 < wd8:
            p2 *= 2
        wd8 = p2
    wd8 = min(wd8, v8)
    starts8 = np.minimum(starts8, v8 - wd8).clip(0)

    t8 = tile // 128

    def local(idx):
        row = idx // 128 - starts8.astype(np.int64).repeat(tile)
        return (row.astype(np.float32).reshape(nt * t8, 128),
                (idx % 128).astype(np.float32).reshape(nt * t8, 128))

    lur, lul = local(eu)
    lvr, lvl = local(ev)
    plan = BandedPlan(starts8, lur, lul, lvr, lvl, nt, tile, wd8, v8)
    return plan, perm, epad


# -- kernel helpers ----------------------------------------------------------


def _split3(vals, axis=0):
    """3-term exactly-bf16-representable f32 decomposition: contracting the
    stacked terms against a one-hot (0/1, bf16-exact) selector in ONE
    default-precision dot replaces the 6-pass HIGHEST dot losslessly
    (hi+mid+lo reconstructs every f32; validated on real MXU hardware by
    tests/tpu_numerics_main.py via the solve kernels)."""
    v_hi = vals.astype(jnp.bfloat16).astype(vals.dtype)
    r1 = vals - v_hi
    v_mid = r1.astype(jnp.bfloat16).astype(vals.dtype)
    return jnp.concatenate([v_hi, v_mid, r1 - v_mid], axis=axis)


def _use_split(dt) -> bool:
    return dt == jnp.float32


def _unpack(dense, pack_rows, lanesel, exact: bool = False):
    """[T8, 128] dense edge-major -> [T, 1] column (exact one-hot dots).

    ``exact=True`` marks values already exactly representable in bf16
    (small integer index blocks): the dot runs single-pass DEFAULT
    precision outright.  General f32 values go through the split3
    single-pass decomposition (or 6-pass HIGHEST off-f32)."""
    dt = dense.dtype
    if exact or not _use_split(dt):
        prec = None if exact else HI
        c = jax.lax.dot_general(pack_rows.astype(dt), dense,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=dt, precision=prec)
    else:
        pr3 = jnp.concatenate([pack_rows.astype(dt)] * 3, axis=0)
        c = jax.lax.dot_general(pr3, _split3(dense, axis=0),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=dt)
    return jnp.sum(c * lanesel.astype(dt), axis=1, keepdims=True)  # [T, 1]


def _pack(col, pack_rows, lanesel):
    """[T, 1] column -> [T8, 128] dense edge-major."""
    dt = col.dtype
    d = col * lanesel.astype(dt)                        # [T, 128]
    if _use_split(dt):
        pr3 = jnp.concatenate([pack_rows.astype(dt)] * 3, axis=1)
        return jnp.dot(pr3, _split3(d, axis=0),
                       preferred_element_type=dt)       # [T8, 128]
    return jnp.dot(pack_rows.astype(dt), d,
                   preferred_element_type=dt, precision=HI)


def _selectors(tile: int):
    t8 = tile // 128
    rows = jax.lax.broadcasted_iota(jnp.int32, (t8, tile), 1) // 128
    pack_rows = (rows == jax.lax.broadcasted_iota(
        jnp.int32, (t8, tile), 0)).astype(jnp.float32)   # [T8, T]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 0) % 128
    lanesel = (lanes == jax.lax.broadcasted_iota(
        jnp.int32, (tile, 128), 1)).astype(jnp.float32)  # [T, 128]
    return pack_rows, lanesel


def _gather_rows(rsel, win):
    """rsel [T, Wd8] one-hot @ win [Wd8, 128] — split3 single-pass on f32."""
    dt = win.dtype
    if _use_split(dt):
        rs3 = jnp.concatenate([rsel.astype(dt)] * 3, axis=1)
        return jnp.dot(rs3, _split3(win, axis=0), preferred_element_type=dt)
    return jnp.dot(rsel.astype(dt), win, preferred_element_type=dt,
                   precision=HI)


def _scatter_rows(rsel, d):
    """rsel^T [Wd8, T] @ d [T, 128] (contracting T) — split3 on f32."""
    dt = d.dtype
    if _use_split(dt):
        rs3 = jnp.concatenate([rsel.astype(dt)] * 3, axis=0)
        return jax.lax.dot_general(rs3, _split3(d, axis=0),
                                   dimension_numbers=(((0,), (0,)),
                                                      ((), ())),
                                   preferred_element_type=dt)
    return jax.lax.dot_general(rsel.astype(dt), d,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=dt, precision=HI)


def _endpoint_sel(lr_ref, ll_ref, tile, wd8, pack_rows, lanesel):
    """Builds (rsel [T, Wd8], lsel [T, 128]) from dense index blocks."""
    # local row indices < wd8 <= 256 and lane indices < 128 are exact in
    # bf16, so the index unpack dots run single-pass DEFAULT precision
    exact = wd8 <= 256
    lr = _unpack(lr_ref[:], pack_rows, lanesel, exact=exact)  # [T, 1]
    ll = _unpack(ll_ref[:], pack_rows, lanesel, exact=True)
    lr = (lr + 0.5).astype(jnp.int32)  # exact f32 ints; +0.5 guards rounding
    ll = (ll + 0.5).astype(jnp.int32)
    rsel = (lr == jax.lax.broadcasted_iota(
        jnp.int32, (tile, wd8), 1)).astype(jnp.float32)
    lsel = (ll == jax.lax.broadcasted_iota(
        jnp.int32, (tile, 128), 1)).astype(jnp.float32)
    return rsel, lsel


def _gather_kernel(s_ref, lur_ref, lul_ref, lvr_ref, lvl_ref, x_ref,
                   ou_ref, ov_ref, *, tile, wd8, n_val):
    i = pl.program_id(0)
    pack_rows, lanesel = _selectors(tile)
    win = x_ref[pl.ds(s_ref[i], wd8)]  # [Wd8, 128, n_val]
    for (lr_ref, ll_ref, o_ref) in ((lur_ref, lul_ref, ou_ref),
                                    (lvr_ref, lvl_ref, ov_ref)):
        rsel, lsel = _endpoint_sel(lr_ref, ll_ref, tile, wd8, pack_rows,
                                   lanesel)
        dt = win.dtype
        for k in range(n_val):
            rows = _gather_rows(rsel, win[..., k])          # [T, 128]
            val = jnp.sum(rows * lsel.astype(dt), axis=1, keepdims=True)
            o_ref[:, :, k] = _pack(val, pack_rows, lanesel)


def _scatter_kernel(s_ref, lur_ref, lul_ref, lvr_ref, lvl_ref,
                    vu_ref, vv_ref, out_ref, acc, *, tile, wd8, v8):
    i = pl.program_id(0)
    pack_rows, lanesel = _selectors(tile)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    dt = vu_ref.dtype
    win = jnp.zeros((wd8, 128), dt)
    for (lr_ref, ll_ref, v_ref) in ((lur_ref, lul_ref, vu_ref),
                                    (lvr_ref, lvl_ref, vv_ref)):
        rsel, lsel = _endpoint_sel(lr_ref, ll_ref, tile, wd8, pack_rows,
                                   lanesel)
        col = _unpack(v_ref[:], pack_rows, lanesel)   # [T, 1]
        d = col * lsel.astype(dt)                      # [T, 128]
        win = win + _scatter_rows(rsel, d)
    s = s_ref[i]
    acc[pl.ds(s, wd8)] += win

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


# -- public entry points -----------------------------------------------------


@partial(jax.jit, static_argnames=("nt", "tile", "wd8", "v8", "n_val",
                                   "interpret"))
def _banded_gather(starts8, lur, lul, lvr, lvl, x_dense, *, nt, tile, wd8,
                   v8, n_val, interpret):
    t8 = tile // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nt,),
        in_specs=[pl.BlockSpec((t8, 128), lambda i, s: (i, 0))] * 4 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((t8, 128, n_val), lambda i, s: (i, 0, 0))]
        * 2)
    kern = partial(_gather_kernel, tile=tile, wd8=wd8, n_val=n_val)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nt * t8, 128, n_val),
                                        x_dense.dtype)] * 2,
        interpret=interpret,
    )(starts8, lur, lul, lvr, lvl, x_dense)


@partial(jax.jit, static_argnames=("nt", "tile", "wd8", "v8", "interpret"))
def _banded_scatter(starts8, lur, lul, lvr, lvl, vals_u, vals_v, *, nt,
                    tile, wd8, v8, interpret):
    t8 = tile // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nt,),
        in_specs=[pl.BlockSpec((t8, 128), lambda i, s: (i, 0))] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((v8, 128), vals_u.dtype)])
    kern = partial(_scatter_kernel, tile=tile, wd8=wd8, v8=v8)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v8, 128), vals_u.dtype),
        interpret=interpret,
    )(starts8, lur, lul, lvr, lvl, vals_u, vals_v)


def banded_gather(plan: BandedPlan, xs, *, interpret: bool = False):
    """Gathers endpoint values for every edge of the plan.

    Args:
      plan: a :class:`BandedPlan` (device arrays).
      xs: list of [V] vertex vectors (f32), gathered jointly.

    Returns:
      ``(us, vs)``: lists of [Epad] edge vectors, ``us[k] = xs[k][eu]``.
    """
    v8, nt, tile = plan.v8, plan.num_tiles, plan.tile
    n_val = len(xs)
    stack = jnp.stack([_to_dense_v(x, v8) for x in xs], axis=-1)
    ou, ov = _banded_gather(
        plan.starts8, plan.lur, plan.lul, plan.lvr, plan.lvl, stack,
        nt=nt, tile=tile, wd8=plan.wd8, v8=v8, n_val=n_val,
        interpret=interpret)
    e = nt * tile
    return ([ou[..., k].reshape(e) for k in range(n_val)],
            [ov[..., k].reshape(e) for k in range(n_val)])


def banded_scatter(plan: BandedPlan, vals_u, vals_v, num_vertices: int, *,
                   interpret: bool = False):
    """Edge->vertex accumulation ``out[v] = sum_u-slots + sum_v-slots``."""
    t8 = plan.tile // 128
    shape = (plan.num_tiles * t8, 128)
    out = _banded_scatter(
        plan.starts8, plan.lur, plan.lul, plan.lvr, plan.lvl,
        vals_u.reshape(shape), vals_v.reshape(shape),
        nt=plan.num_tiles, tile=plan.tile, wd8=plan.wd8, v8=plan.v8,
        interpret=interpret)
    return out.reshape(-1)[:num_vertices]


def _to_dense_v(x, v8):
    """[V] -> [V8, 128] (zero padded)."""
    v = x.shape[0]
    pad = v8 * 128 - v
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(v8, 128)
