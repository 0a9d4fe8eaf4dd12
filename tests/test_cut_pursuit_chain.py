"""Chained device-resident cut-pursuit (solvers/cut_pursuit_chain.py).

Runs with ``chain="on"`` so the fused Pallas kernels execute in the
interpreter on the CPU backend; the host path is the correctness
reference (the chain can settle on a different near-optimal partition,
so parity is asserted on the OBJECTIVE, like the reference's own Obj
trace contract)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cp_pfdr_graph_d1_tpu import DenseOp, IdentityOp
from cp_pfdr_graph_d1_tpu.config import CPOptions, PFDROptions
from cp_pfdr_graph_d1_tpu.graph import GraphD1
from cp_pfdr_graph_d1_tpu.stencil import StencilGraphD1
from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1
from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_chain import (
    cp_quadratic_d1_chain)

PF = PFDROptions(rho=1.5, dif_tol=1e-7, it_max=4000)


def grid_problem(h=16, w=16, n=24, seed=0):
    rng = np.random.default_rng(seed)
    v = h * w
    idx = np.arange(v).reshape(h, w)
    eu = np.concatenate([idx[:, :-1].ravel(),
                         idx[:-1, :].ravel()]).astype(np.int32)
    ev = np.concatenate([idx[:, 1:].ravel(),
                         idx[1:, :].ravel()]).astype(np.int32)
    a = (rng.normal(size=(n, v)) / np.sqrt(n)).astype(np.float32)
    x_true = np.zeros(v, np.float32)
    x_true[idx[4:8, 4:8].ravel()] = 2.0
    y = (a @ x_true + 0.02 * rng.normal(size=n)).astype(np.float32)
    return eu, ev, a, y


def objective(x, a, y, eu, ev, la_d1, la_l1=None):
    x = np.asarray(x, np.float64)
    r = a.astype(np.float64) @ x - y.astype(np.float64)
    obj = 0.5 * r @ r + np.sum(la_d1 * np.abs(x[eu] - x[ev]))
    if la_l1 is not None:
        obj += np.sum(la_l1 * np.abs(x))
    return obj


def test_chain_stencil_matches_host_objective():
    """Full chain (fused cut/components kernels + small-solve route +
    warm partition init + in-chain polish) on a stencil graph."""
    h = w = 16
    eu, ev, a, y = grid_problem(h, w)
    la_l1 = np.full(h * w, 0.03, np.float32)
    gs = StencilGraphD1.create((h, w), {(0, 1): 0.1, (1, 0): 0.1},
                               dtype=jnp.float32)
    gc = GraphD1.create(eu, ev, 0.1, dtype=jnp.float32)
    op = DenseOp(jnp.asarray(a))
    res_h = cp_quadratic_d1(op, jnp.asarray(y), gc, la_l1=la_l1,
                            positivity=True,
                            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=PF))
    res_c = cp_quadratic_d1(op, jnp.asarray(y), gs, la_l1=la_l1,
                            positivity=True,
                            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=PF,
                                          cut="device", chain="on"))
    oh = objective(res_h.rx[res_h.cv], a, y, eu, ev, 0.1, la_l1)
    oc = objective(res_c.rx[res_c.cv], a, y, eu, ev, 0.1, la_l1)
    assert oc <= oh * (1 + 1e-3) + 1e-9
    assert np.all(res_c.rx[res_c.cv] >= 0)


def test_chain_coo_generic_path():
    """Chain on a plain COO graph exercises the generic (non-fused-
    stencil) cut and components stages."""
    eu, ev, a, y = grid_problem()
    la_l1 = np.full(a.shape[1], 0.03, np.float32)
    gc = GraphD1.create(eu, ev, 0.1, dtype=jnp.float32)
    op = DenseOp(jnp.asarray(a))
    res_h = cp_quadratic_d1(op, jnp.asarray(y), gc, la_l1=la_l1,
                            positivity=True,
                            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=PF))
    res_c = cp_quadratic_d1(op, jnp.asarray(y), gc, la_l1=la_l1,
                            positivity=True,
                            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=PF,
                                          cut="device", chain="on"))
    oh = objective(res_h.rx[res_h.cv], a, y, eu, ev, 0.1, la_l1)
    oc = objective(res_c.rx[res_c.cv], a, y, eu, ev, 0.1, la_l1)
    assert oc <= oh * (1 + 1e-3) + 1e-9


def test_chain_bounds_family():
    eu, ev, a, y = grid_problem(seed=2)
    h = w = 16
    gs = StencilGraphD1.create((h, w), {(0, 1): 0.1, (1, 0): 0.1},
                               dtype=jnp.float32)
    gc = GraphD1.create(eu, ev, 0.1, dtype=jnp.float32)
    op = DenseOp(jnp.asarray(a))
    res_h = cp_quadratic_d1(op, jnp.asarray(y), gc, bounds=(-0.5, 1.5),
                            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=PF))
    res_c = cp_quadratic_d1(op, jnp.asarray(y), gs, bounds=(-0.5, 1.5),
                            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=PF,
                                          cut="device", chain="on"))
    oh = objective(res_h.rx[res_h.cv], a, y, eu, ev, 0.1)
    oc = objective(res_c.rx[res_c.cv], a, y, eu, ev, 0.1)
    assert oc <= oh * (1 + 1e-3) + 1e-9
    x = res_c.rx[res_c.cv]
    assert x.min() >= -0.5 - 1e-6 and x.max() <= 1.5 + 1e-6


def test_chain_capacity_overflow_ladder():
    """A noisy identity problem whose partition exceeds a forced tiny
    initial capacity: the driver must escalate (and hand off to host
    iterations at the wall) without losing correctness."""
    rng = np.random.default_rng(1)
    h = w = 24
    v = h * w
    idx = np.arange(v).reshape(h, w)
    eu = np.concatenate([idx[:, :-1].ravel(),
                         idx[:-1, :].ravel()]).astype(np.int32)
    ev = np.concatenate([idx[:, 1:].ravel(),
                         idx[1:, :].ravel()]).astype(np.int32)
    xt = np.zeros((h, w), np.float32)
    xt[4:12, 4:12] = 1.0
    xt[14:20, 10:20] = -0.7
    y = (xt + 0.4 * rng.standard_normal((h, w))).astype(np.float32).ravel()
    g = GraphD1.create(eu, ev, 0.15, dtype=jnp.float32)
    opt = CPOptions(dif_tol=1e-5, it_max=8, pfdr=PF, cut="device",
                    chain="on")
    res_h = cp_quadratic_d1(IdentityOp(), jnp.asarray(y), g,
                            opt=CPOptions(dif_tol=1e-5, it_max=8, pfdr=PF))
    res_c = cp_quadratic_d1_chain(IdentityOp(), jnp.asarray(y), g,
                                  opt=opt, rv_cap0=128)

    def obj(x):
        x = np.asarray(x, np.float64)
        d = x - y.astype(np.float64)
        return 0.5 * d @ d + np.sum(0.15 * np.abs(x[eu] - x[ev]))

    assert obj(res_c.rx[res_c.cv]) <= obj(res_h.rx[res_h.cv]) * (1 + 1e-3)


def test_chain_banded_route():
    """Forcing the capacity floor above the small kernel's cap routes the
    reduced solves through the banded whole-solve kernel with the
    device-built plan."""
    rng = np.random.default_rng(3)
    h = w = 32
    v = h * w
    idx = np.arange(v).reshape(h, w)
    eu = np.concatenate([idx[:, :-1].ravel(),
                         idx[:-1, :].ravel()]).astype(np.int32)
    ev = np.concatenate([idx[:, 1:].ravel(),
                         idx[1:, :].ravel()]).astype(np.int32)
    xt = np.zeros((h, w), np.float32)
    xt[6:16, 6:16] = 1.0
    y = (xt + 0.3 * rng.standard_normal((h, w))).astype(np.float32).ravel()
    g = GraphD1.create(eu, ev, 0.1, dtype=jnp.float32)
    res_h = cp_quadratic_d1(IdentityOp(), jnp.asarray(y), g,
                            opt=CPOptions(dif_tol=1e-5, it_max=5, pfdr=PF))
    res_c = cp_quadratic_d1_chain(
        IdentityOp(), jnp.asarray(y), g,
        opt=CPOptions(dif_tol=1e-5, it_max=5, pfdr=PF, cut="device",
                      chain="on"),
        rv_cap0=1024)  # floor above the small-kernel cap -> banded route

    def obj(x):
        x = np.asarray(x, np.float64)
        d = x - y.astype(np.float64)
        return 0.5 * d @ d + np.sum(0.1 * np.abs(x[eu] - x[ev]))

    assert obj(res_c.rx[res_c.cv]) <= obj(res_h.rx[res_h.cv]) * (1 + 1e-3)


def test_chain_warm_restart_state():
    """The chain accepts a warm-restart state and keeps improving."""
    eu, ev, a, y = grid_problem(seed=5)
    h = w = 16
    gs = StencilGraphD1.create((h, w), {(0, 1): 0.1, (1, 0): 0.1},
                               dtype=jnp.float32)
    la_l1 = np.full(a.shape[1], 0.03, np.float32)
    op = DenseOp(jnp.asarray(a))
    opt3 = CPOptions(dif_tol=1e-6, it_max=2, pfdr=PF, cut="device",
                     chain="on")
    opt_full = CPOptions(dif_tol=1e-6, it_max=10, pfdr=PF, cut="device",
                         chain="on")
    part = cp_quadratic_d1(op, jnp.asarray(y), gs, la_l1=la_l1,
                           positivity=True, opt=opt3)
    rest = cp_quadratic_d1(op, jnp.asarray(y), gs, la_l1=la_l1,
                           positivity=True, opt=opt_full, state=part.state)
    full = cp_quadratic_d1(op, jnp.asarray(y), gs, la_l1=la_l1,
                           positivity=True, opt=opt_full)
    o_rest = objective(rest.rx[rest.cv], a, y, eu, ev, 0.1, la_l1)
    o_full = objective(full.rx[full.cv], a, y, eu, ev, 0.1, la_l1)
    assert o_rest <= o_full * (1 + 1e-3) + 1e-9


def test_fused_kernels_match_staged():
    """The fused min-cut and components kernels agree with their staged
    twins (interpret mode)."""
    from cp_pfdr_graph_d1_tpu.maxflow.device import cut_value
    from cp_pfdr_graph_d1_tpu.ops.components_fused import \
        device_components_stencil_fused
    from cp_pfdr_graph_d1_tpu.ops.mincut_fused import \
        device_cut_stencil_fused
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_device import (
        _device_components, _device_cut)

    h = w = 20
    g = StencilGraphD1.create((h, w), {(0, 1): 0.3, (1, 0): 0.3},
                              dtype=jnp.float32)
    r = np.random.default_rng(0)
    active = jnp.asarray(r.random(g.num_edges) < 0.1)
    c = jnp.asarray(r.standard_normal(g.num_vertices).astype(np.float32))
    tol = jnp.asarray(1e-6, jnp.float32)

    _, gap1, big1, x1, _ = _device_cut(g, active, c, tol, 50_000, 250)
    _, gap2, big2, x2, _ = device_cut_stencil_fused(
        g, active, c, tol, 50_000, 250, interpret=True)
    eu = np.asarray(g.eu)
    ev = np.asarray(g.ev)
    w_np = np.where(np.asarray(active), 0.0, np.asarray(g.la_d1))
    cb = np.asarray(jnp.clip(c, -big1, big1), np.float64)
    v1 = cut_value(eu, ev, w_np, cb, np.asarray(x1) > 0.5)
    v2 = cut_value(eu, ev, w_np, cb, np.asarray(x2) > 0.5)
    # both certified within the same absolute gap -> equal cut objectives
    assert abs(v1 - v2) <= 2 * float(tol) * float(big1) + 1e-4

    cvs, ncs, fs = _device_components(g, active)
    cvf, ncf, ff = device_components_stencil_fused(g, active,
                                                   interpret=True)
    assert int(ncs) == int(ncf)
    np.testing.assert_array_equal(np.asarray(cvs), np.asarray(cvf))
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(ff))


def test_banded_plan_device_matches_host():
    """The device-built banded plan reproduces the host builder's sorted
    layout semantics (same windows given the same wd8)."""
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_chain import \
        _build_banded_plan_device

    rng = np.random.default_rng(0)
    rv_cap, e_cap = 256, 512
    ncomp = 200
    ne = 300
    reu = rng.integers(0, ncomp, ne).astype(np.int32)
    rev = rng.integers(0, ncomp, ne).astype(np.int32)
    rla = rng.uniform(0.1, 1.0, ne).astype(np.float32)
    reu_p = np.concatenate([reu, np.zeros(e_cap - ne, np.int32)])
    rev_p = np.concatenate([rev, np.zeros(e_cap - ne, np.int32)])
    rla_p = np.concatenate([rla, np.zeros(e_cap - ne, np.float32)])
    out = _build_banded_plan_device(
        jnp.asarray(reu_p), jnp.asarray(rev_p), jnp.asarray(rla_p),
        rv_cap=rv_cap, nt=1, tile=1024, wd8=2)
    starts8, lur, lul, lvr, lvl, reu_s, rev_s, rla_s, ovf = out
    assert not bool(ovf)
    reu_s = np.asarray(reu_s)
    rev_s = np.asarray(rev_s)
    rla_s = np.asarray(rla_s)
    # sorted by min endpoint; weights permuted consistently
    key = np.minimum(reu_s, rev_s)
    assert np.all(np.diff(key) >= 0)
    # the multiset of live (u, v, w) triples is preserved
    live = rla_s > 0
    got = sorted(zip(reu_s[live], rev_s[live], np.round(rla_s[live], 5)))
    want = sorted(zip(reu, rev, np.round(rla, 5)))
    assert got == want
    # local indices reconstruct the endpoints
    s0 = int(np.asarray(starts8)[0])
    lur = np.asarray(lur).reshape(-1)
    lul = np.asarray(lul).reshape(-1)
    rec = ((lur + s0) * 128 + lul).astype(np.int32)
    np.testing.assert_array_equal(rec, reu_s)


def test_components_high_density_converges():
    """Regression: the generic device components' former round cap
    (2 log2 V + 8) under-converged on snake-shaped components at high
    cut densities (560 instead of 558 components on a 96x96 grid at 45%
    active) — both the generic and the fused path must match scipy."""
    from cp_pfdr_graph_d1_tpu.ops.components_fused import \
        device_components_stencil_fused
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_common import \
        connected_components
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_device import \
        _device_components

    side = 48
    sgc = StencilGraphD1.create((side, side), {(0, 1): 0.3, (1, 0): 0.3},
                                dtype=jnp.float32)
    rr = np.random.default_rng(5)
    act_np = rr.random(sgc.num_edges) < 0.45
    eu = np.asarray(sgc.eu)
    ev = np.asarray(sgc.ev)
    la = np.asarray(sgc.la_d1)
    nc_true, cv_true = connected_components(side * side, eu, ev,
                                            ~act_np & (la > 0))
    cvf, ncf, _ = device_components_stencil_fused(sgc, jnp.asarray(act_np),
                                                  interpret=True)
    assert int(ncf) == nc_true
    np.testing.assert_array_equal(np.asarray(cvf), cv_true)
    keep = la > 0
    g = GraphD1.create(eu[keep], ev[keep], la[keep],
                       num_vertices=side * side, dtype=jnp.float32)
    cvg, ncg, _ = _device_components(g, jnp.asarray(act_np[keep]))
    assert int(ncg) == nc_true
    np.testing.assert_array_equal(np.asarray(cvg), cv_true)
