"""Whole-solve fused kernel vs the staged PFDR loop.

The one-kernel solve loop (:mod:`cp_pfdr_graph_d1_tpu.ops.solve_fused`,
interpreter mode here) must reproduce the staged ``lax.while_loop`` path
iteration-for-iteration: same iterate, same iteration count, same
early-stopping decision.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import (DenseOp, DiagOp, GramOp, IdentityOp,
                                  PFDROptions, VertexProx,
                                  pfdr_quadratic_d1)
from cp_pfdr_graph_d1_tpu.banded_graph import BandedGraphD1
from cp_pfdr_graph_d1_tpu.config import Lipsch

from .conftest import make_grid_graph


def problem(v=300, n=24, seed=0, dtype=np.float32):
    r = np.random.default_rng(seed)
    eu, ev, la = make_grid_graph(15, v // 15, seed=seed)
    a = (r.standard_normal((n, v)) / np.sqrt(n)).astype(dtype)
    x_true = np.zeros(v, dtype)
    x_true[r.integers(0, v, 30)] = 1.0
    y = (a @ x_true + 0.01 * r.standard_normal(n)).astype(dtype)
    return eu, ev, la.astype(dtype), a, y


def run_pair(op, obs, graph, *, la_l1=None, vprox=VertexProx(),
             lipsch=None, ltype=Lipsch.SCAL, it_max=60, dif_tol=0.0,
             x0=None):
    """(whole-solve result, staged result) on the same banded graph."""
    opt_on = PFDROptions(rho=1.4, dif_tol=dif_tol, it_max=it_max,
                         fused="on")
    opt_off = PFDROptions(rho=1.4, dif_tol=dif_tol, it_max=it_max,
                          fused="off")
    r_on = pfdr_quadratic_d1(op, obs, graph, la_l1=la_l1, vprox=vprox,
                             lipsch=lipsch, ltype=ltype, x0=x0, opt=opt_on)
    r_off = pfdr_quadratic_d1(op, obs, graph, la_l1=la_l1, vprox=vprox,
                              lipsch=lipsch, ltype=ltype, x0=x0,
                              opt=opt_off)
    return r_on, r_off


@pytest.mark.parametrize("vkind", ["l1", "l1pos", "bounds", "none"])
def test_whole_solve_matches_staged(vkind):
    eu, ev, la, a, y = problem()
    v = a.shape[1]
    graph = BandedGraphD1.create(eu, ev, la, num_vertices=v,
                                 dtype=jnp.float32)
    lip = float(np.linalg.eigvalsh((a @ a.T).astype(np.float64))[-1])
    la_l1 = None
    if vkind == "l1":
        vprox = VertexProx(kind="l1")
        la_l1 = jnp.full((v,), 0.05, jnp.float32)
    elif vkind == "l1pos":
        vprox = VertexProx(kind="l1", positivity=True)
        la_l1 = jnp.full((v,), 0.05, jnp.float32)
    elif vkind == "bounds":
        vprox = VertexProx(kind="bounds", lo=-0.2, hi=0.7)
    else:
        vprox = VertexProx()
    r_on, r_off = run_pair(DenseOp(jnp.asarray(a)), jnp.asarray(y), graph,
                           la_l1=la_l1, vprox=vprox, lipsch=lip)
    assert int(r_on.it) == int(r_off.it)
    np.testing.assert_allclose(np.asarray(r_on.x), np.asarray(r_off.x),
                               rtol=0, atol=2e-5)


def test_whole_solve_early_stop_matches():
    eu, ev, la, a, y = problem(seed=3)
    v = a.shape[1]
    graph = BandedGraphD1.create(eu, ev, la, num_vertices=v,
                                 dtype=jnp.float32)
    lip = float(np.linalg.eigvalsh((a @ a.T).astype(np.float64))[-1])
    r_on, r_off = run_pair(DenseOp(jnp.asarray(a)), jnp.asarray(y), graph,
                           la_l1=jnp.full((v,), 0.05, jnp.float32),
                           vprox=VertexProx(kind="l1"), lipsch=lip,
                           it_max=4000, dif_tol=1e-3)
    assert int(r_off.it) < 4000  # the tolerance actually fires
    assert int(r_on.it) == int(r_off.it)
    np.testing.assert_allclose(np.asarray(r_on.x), np.asarray(r_off.x),
                               rtol=0, atol=2e-5)


def test_whole_solve_gram_and_diag_modes():
    eu, ev, la, a, y = problem(v=225, n=16, seed=5)
    v = a.shape[1]
    graph = BandedGraphD1.create(eu, ev, la, num_vertices=v,
                                 dtype=jnp.float32)
    la_l1 = jnp.full((v,), 0.03, jnp.float32)
    vprox = VertexProx(kind="l1")
    gram = (a.T @ a).astype(np.float32)
    aty = (a.T @ y).astype(np.float32)
    lipg = float(np.linalg.eigvalsh(gram.astype(np.float64))[-1])
    r_on, r_off = run_pair(GramOp(jnp.asarray(gram)), jnp.asarray(aty),
                           graph, la_l1=la_l1, vprox=vprox, lipsch=lipg)
    assert int(r_on.it) == int(r_off.it)
    np.testing.assert_allclose(np.asarray(r_on.x), np.asarray(r_off.x),
                               rtol=0, atol=2e-5)

    r = np.random.default_rng(7)
    d = (0.5 + r.random(v)).astype(np.float32)
    obs = (d * r.standard_normal(v)).astype(np.float32)
    r_on, r_off = run_pair(DiagOp(jnp.asarray(d)), jnp.asarray(obs), graph,
                           la_l1=la_l1, vprox=vprox)
    assert int(r_on.it) == int(r_off.it)
    np.testing.assert_allclose(np.asarray(r_on.x), np.asarray(r_off.x),
                               rtol=0, atol=2e-5)

    obs = r.standard_normal(v).astype(np.float32)
    r_on, r_off = run_pair(IdentityOp(), jnp.asarray(obs), graph,
                           la_l1=la_l1, vprox=vprox)
    assert int(r_on.it) == int(r_off.it)
    np.testing.assert_allclose(np.asarray(r_on.x), np.asarray(r_off.x),
                               rtol=0, atol=2e-5)


def test_whole_solve_warm_start_and_state():
    eu, ev, la, a, y = problem(seed=11)
    v = a.shape[1]
    graph = BandedGraphD1.create(eu, ev, la, num_vertices=v,
                                 dtype=jnp.float32)
    lip = float(np.linalg.eigvalsh((a @ a.T).astype(np.float64))[-1])
    r = np.random.default_rng(1)
    x0 = jnp.asarray(r.standard_normal(v).astype(np.float32))
    r_on, r_off = run_pair(DenseOp(jnp.asarray(a)), jnp.asarray(y), graph,
                           la_l1=jnp.full((v,), 0.05, jnp.float32),
                           vprox=VertexProx(kind="l1"), lipsch=lip, x0=x0)
    np.testing.assert_allclose(np.asarray(r_on.x), np.asarray(r_off.x),
                               rtol=0, atol=2e-5)
    # return_state: the whole-solve path produces a resumable state whose
    # continuation matches an uninterrupted staged run
    opt = PFDROptions(rho=1.4, dif_tol=0.0, it_max=30, fused="on")
    res, st = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), graph,
        la_l1=jnp.full((v,), 0.05, jnp.float32),
        vprox=VertexProx(kind="l1"), lipsch=lip, x0=x0, opt=opt,
        return_state=True)
    opt_more = PFDROptions(rho=1.4, dif_tol=0.0, it_max=60, fused="off")
    res2 = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), graph,
        la_l1=jnp.full((v,), 0.05, jnp.float32),
        vprox=VertexProx(kind="l1"), lipsch=lip, opt=opt_more, state0=st)
    full = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), graph,
        la_l1=jnp.full((v,), 0.05, jnp.float32),
        vprox=VertexProx(kind="l1"), lipsch=lip, x0=x0,
        opt=PFDROptions(rho=1.4, dif_tol=0.0, it_max=60, fused="off"))
    assert int(res2.it) == 60
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(full.x),
                               rtol=0, atol=3e-5)


def test_cut_pursuit_device_fused_route_matches_host():
    """The cut-pursuit reduced solves routed to the whole-solve kernel
    (fused="on" exercises the device route under the interpreter) must
    land on the same partition/values as the pure-host route."""
    from cp_pfdr_graph_d1_tpu import CPOptions, GraphD1
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1

    h = w = 8
    v = h * w
    idx = np.arange(v).reshape(h, w)
    eu = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    ev = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    r = np.random.default_rng(3)
    la = (0.3 * (0.5 + r.random(eu.shape[0]))).astype(np.float32)
    n = 30
    a = (r.normal(size=(n, v)) / np.sqrt(n)).astype(np.float32)
    x_true = np.zeros((h, w), np.float32)
    x_true[1:4, 1:4] = 1.5
    x_true[5:7, 4:7] = -2.0
    y = (a @ x_true.ravel() + 0.02 * r.normal(size=n)).astype(np.float32)
    la_l1 = np.full(v, 0.02, np.float32)
    g = GraphD1.create(eu, ev, la, dtype=jnp.float32)

    def solve(fused, host_small):
        opt = CPOptions(dif_tol=1e-5, it_max=12, host_small=host_small,
                        pfdr=PFDROptions(rho=1.5, dif_tol=1e-6,
                                         it_max=3000, fused=fused))
        return cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                               la_l1=la_l1, opt=opt)

    res_dev = solve("on", "off")     # device fused-solve route (interpret)
    res_host = solve("off", "off")   # staged jnp route
    x_dev = np.asarray(res_dev.rx)[np.asarray(res_dev.cv)]
    x_host = np.asarray(res_host.rx)[np.asarray(res_host.cv)]
    np.testing.assert_allclose(x_dev, x_host, rtol=0, atol=5e-4)
