"""Halo-overlapped fused PFDR iteration for vertex-sharded stencil graphs.

The plain halo path (:class:`..parallel.halo.HaloStencilGraphD1`) issues a
blocking ``ppermute`` and only then computes — two full synchronization
points per iteration.  This kernel realizes the SURVEY §5 design instead:
the boundary-row exchange rides ``pltpu.make_async_remote_copy`` (direct
chip-to-chip RDMA over ICI) while the interior edge work proceeds:

* phase 1 — compute the forward step ``p``, START the RDMA of the
  ``halo`` top/bottom rows of ``x`` and ``p`` to the ring neighbors;
* phase 2 — per family, the d1 prox / relaxation / accumulation for every
  edge whose head stays in-block (the O(H_loc W) bulk) — RDMA in flight;
* phase 3 — wait; process the boundary-crossing edge rows (O(halo W)),
  collecting their v-side contributions into per-direction strips;
* phase 4 — START the RDMA returning those contribution strips, wait,
  fold the received strips into the accumulator, vertex prox, evolution
  reductions.

Exactly two RDMA rounds per iteration — the same communication volume as
the ppermute path, but overlapped with phase 2's compute instead of
serializing before it.  Semantics match the staged halo path bit-for-bit
(enforced by ``tests/test_parallel.py::test_halo_fused_*``); the reference
edge stage being distributed is
``/root/reference/src/PFDR_graph_quadratic_d1_l1.cpp:466-497``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def max_halo_fused_field_elems(num_families: int, itemsize: int = 4) -> int:
    """Largest local H_loc*W whose 9F+6 resident buffers fit VMEM."""
    per_elem = (9 * num_families + 6) * itemsize
    return VMEM_BUDGET_BYTES // per_elem


def _row_add(arr, lo: int, v):
    """``arr[lo:lo+k] += v`` with STATIC bounds via slice+concat (Pallas
    kernels cannot lower ``.at[].add`` scatters)."""
    k = v.shape[0]
    parts = []
    if lo > 0:
        parts.append(arr[:lo])
    parts.append(arr[lo:lo + k] + v)
    if lo + k < arr.shape[0]:
        parts.append(arr[lo + k:])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _kernel(x_ref, grad_ref, ga_ref, thl1_ref,
            zu_ref, zv_ref, wu_ref, wv_ref, wdu_ref, wdv_ref, thd_ref,
            xo_ref, zuo_ref, zvo_ref, num_ref, den_ref,
            rx_a, rp_a, rx_b, rb_p, ctr_a_recv, ctr_b_recv,
            ctr_up_send, ctr_dn_send, p_scr, acc_scr,
            sem_xa, sem_pa, sem_xb, sem_pb, sem_ca, sem_cb,
            rsem_xa, rsem_pa, rsem_xb, rsem_pb, rsem_ca, rsem_cb,
            *, shifts, hd, rho, vkind, positivity, lo, hi, axis,
            nshards, interpret):
    h, w = x_ref.shape
    dt = x_ref.dtype
    my = jax.lax.axis_index(axis)
    ns = jnp.int32(nshards)  # x64 mode: keep the ring ids int32
    nxt = jax.lax.rem(my + jnp.int32(1), ns)
    prv = jax.lax.rem(my + ns - jnp.int32(1), ns)

    def rdma(src, dst, ssem, rsem, dev):
        return pltpu.make_async_remote_copy(
            src_ref=src, dst_ref=dst, send_sem=ssem, recv_sem=rsem,
            device_id=dev, device_id_type=pltpu.DeviceIdType.LOGICAL)

    x = x_ref[:]
    p = 2.0 * x - ga_ref[:] * grad_ref[:]
    p_scr[:] = p

    # -- phase 1: start the x/p halo exchange ------------------------------
    # rx_a/rp_a receive the PREVIOUS shard's last rows (the rows globally
    # above this block); rx_b/rb_p receive the NEXT shard's first rows.
    c_xa = rdma(x_ref.at[pl.ds(h - hd, hd)], rx_a, sem_xa, rsem_xa, nxt)
    c_pa = rdma(p_scr.at[pl.ds(h - hd, hd)], rp_a, sem_pa, rsem_pa, nxt)
    c_xb = rdma(x_ref.at[pl.ds(0, hd)], rx_b, sem_xb, rsem_xb, prv)
    c_pb = rdma(p_scr.at[pl.ds(0, hd)], rb_p, sem_pb, rsem_pb, prv)
    c_xa.start()
    c_pa.start()
    c_xb.start()
    c_pb.start()

    roll = jnp.roll if interpret else pltpu.roll

    def lane_roll(a, dx):
        if dx % w == 0:
            return a
        return roll(a, (-dx) % w, axis=1)

    def lane_roll_back(a, dx):
        if dx % w == 0:
            return a
        return roll(a, dx % w, axis=1)

    def pair_prox(pu, pv, xu, xv, zu, zv, wdu, wdv, thd):
        au = pu - zu
        av = pv - zv
        avg = wdu * au + wdv * av
        diff = au - av
        shrunk = jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - thd, 0)
        zu = zu + rho * ((avg + wdv * shrunk) - xu)
        zv = zv + rho * ((avg - wdu * shrunk) - xv)
        return zu, zv

    # -- phase 2: interior edges (head stays in-block), RDMA in flight -----
    acc = jnp.zeros_like(x)
    for f, (dy, dx) in enumerate(shifts):
        if dy == 0:
            pv = lane_roll(p, dx)
            xv = lane_roll(x, dx)
            zu, zv = pair_prox(p, pv, x, xv, zu_ref[f], zv_ref[f],
                               wdu_ref[f], wdv_ref[f], thd_ref[f])
            zuo_ref[f] = zu
            zvo_ref[f] = zv
            acc = acc + wu_ref[f] * zu
            acc = acc + lane_roll_back(wv_ref[f] * zv, dx)
        elif dy > 0:
            hi_r = h - dy  # u-rows [0, hi_r) have in-block heads
            pv = lane_roll(p[dy:], dx)
            xv = lane_roll(x[dy:], dx)
            zu, zv = pair_prox(p[:hi_r], pv, x[:hi_r], xv,
                               zu_ref[f, :hi_r], zv_ref[f, :hi_r],
                               wdu_ref[f, :hi_r], wdv_ref[f, :hi_r],
                               thd_ref[f, :hi_r])
            zuo_ref[f, :hi_r] = zu
            zvo_ref[f, :hi_r] = zv
            acc = _row_add(acc, 0, wu_ref[f, :hi_r] * zu)
            acc = _row_add(acc, dy,
                           lane_roll_back(wv_ref[f, :hi_r] * zv, dx))
        else:  # dy < 0: heads lie |dy| rows above
            a = -dy  # u-rows [a, h) have in-block heads
            pv = lane_roll(p[:h - a], dx)
            xv = lane_roll(x[:h - a], dx)
            zu, zv = pair_prox(p[a:], pv, x[a:], xv,
                               zu_ref[f, a:], zv_ref[f, a:],
                               wdu_ref[f, a:], wdv_ref[f, a:],
                               thd_ref[f, a:])
            zuo_ref[f, a:] = zu
            zvo_ref[f, a:] = zv
            acc = _row_add(acc, a, wu_ref[f, a:] * zu)
            acc = _row_add(acc, 0,
                           lane_roll_back(wv_ref[f, a:] * zv, dx))

    # -- phase 3: wait, boundary-crossing edges ----------------------------
    c_xa.wait()
    c_pa.wait()
    c_xb.wait()
    c_pb.wait()
    up_send = jnp.zeros((hd, w), dt)
    dn_send = jnp.zeros((hd, w), dt)
    for f, (dy, dx) in enumerate(shifts):
        if dy > 0:
            r0 = h - dy  # crossing u-rows [r0, h); v-rows [0, dy) of NEXT
            pv = lane_roll(rb_p[:dy], dx)
            xv = lane_roll(rx_b[:dy], dx)
            zu, zv = pair_prox(p[r0:], pv, x[r0:], xv,
                               zu_ref[f, r0:], zv_ref[f, r0:],
                               wdu_ref[f, r0:], wdv_ref[f, r0:],
                               thd_ref[f, r0:])
            zuo_ref[f, r0:] = zu
            zvo_ref[f, r0:] = zv
            acc = _row_add(acc, r0, wu_ref[f, r0:] * zu)
            up_send = _row_add(up_send, 0,
                               lane_roll_back(wv_ref[f, r0:] * zv, dx))
        elif dy < 0:
            a = -dy  # crossing u-rows [0, a); v-rows [h-a, h) of PREV
            pv = lane_roll(rp_a[hd - a:], dx)
            xv = lane_roll(rx_a[hd - a:], dx)
            zu, zv = pair_prox(p[:a], pv, x[:a], xv,
                               zu_ref[f, :a], zv_ref[f, :a],
                               wdu_ref[f, :a], wdv_ref[f, :a],
                               thd_ref[f, :a])
            zuo_ref[f, :a] = zu
            zvo_ref[f, :a] = zv
            acc = _row_add(acc, 0, wu_ref[f, :a] * zu)
            dn_send = _row_add(dn_send, hd - a,
                               lane_roll_back(wv_ref[f, :a] * zv, dx))

    # -- phase 4: return the contribution strips, fold, finish -------------
    ctr_up_send[:] = up_send
    ctr_dn_send[:] = dn_send
    # ctr_a_recv lands on the NEXT shard (contributions to its rows
    # [0, hd)); ctr_b_recv lands on the PREVIOUS shard (its last hd rows)
    c_ca = rdma(ctr_up_send, ctr_a_recv, sem_ca, rsem_ca, nxt)
    c_cb = rdma(ctr_dn_send, ctr_b_recv, sem_cb, rsem_cb, prv)
    c_ca.start()
    c_cb.start()
    c_ca.wait()
    c_cb.wait()
    acc = _row_add(acc, 0, ctr_a_recv[:])
    acc = _row_add(acc, h - hd, ctr_b_recv[:])
    acc_scr[:] = acc

    # vertex prox (:499-512)
    if vkind == "l1":
        xn = jnp.maximum(acc - thl1_ref[:], 0)
        if not positivity:
            xn = xn + jnp.minimum(acc + thl1_ref[:], 0)
    elif vkind == "bounds":
        xn = jnp.clip(acc, lo, hi)
    elif positivity:
        xn = jnp.maximum(acc, 0)
    else:
        xn = acc
    xo_ref[:] = xn
    delta = xn - x
    num_ref[0, 0] = jnp.sum(delta * delta)
    den_ref[0, 0] = jnp.sum(xn * xn)


def halo_fused_iteration(x, grad, ga, th_l1, zu, zv, wu, wv, w_d1u, w_d1v,
                         th_d1, *, shifts, hd: int, rho: float, vkind: str,
                         positivity: bool, lo: float, hi: float, axis: str,
                         nshards: int, interpret: bool = False):
    """One halo-overlapped edge+vertex PFDR step on a LOCAL [H_loc, W]
    row block (call inside ``shard_map`` over the ring ``axis``).

    Args mirror :func:`.stencil_fused.fused_stencil_iteration`, on local
    blocks; ``hd`` is the halo depth (``max |dy|``, must be <= H_loc).

    Returns ``(x_new, zu_new, zv_new, num_local, den_local)`` — the
    stopping-test reductions are LOCAL (caller psums them).
    """
    dt = x.dtype
    f = len(shifts)
    h, w = x.shape
    kern = partial(_kernel, shifts=shifts, hd=hd, rho=rho, vkind=vkind,
                   positivity=positivity, lo=lo, hi=hi, axis=axis,
                   nshards=nshards, interpret=interpret)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    strip = pltpu.VMEM((hd, w), dt)
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), dt),
            jax.ShapeDtypeStruct((f, h, w), dt),
            jax.ShapeDtypeStruct((f, h, w), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        in_specs=[vspec] * 11,
        out_specs=(vspec, vspec, vspec, sspec, sspec),
        scratch_shapes=[strip, strip, strip, strip, strip, strip,
                        strip, strip,
                        pltpu.VMEM((h, w), dt), pltpu.VMEM((h, w), dt)]
        + [pltpu.SemaphoreType.DMA] * 12,
        interpret=interpret,
    )(x, grad, ga, th_l1, zu, zv, wu, wv, w_d1u, w_d1v, th_d1)
    xn, zun, zvn, num, den = out
    return xn, zun, zvn, num[0, 0], den[0, 0]
