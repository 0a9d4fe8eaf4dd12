"""Native C++ PFDR (host path for small reduced problems) vs the JAX
solver: same math, so iterates must agree to float64 rounding."""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import (DenseOp, GramOp, GraphD1, PFDROptions,
                                  VertexProx, pfdr_quadratic_d1)
from cp_pfdr_graph_d1_tpu import native
from cp_pfdr_graph_d1_tpu.config import CPOptions, Lipsch
from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1

from .conftest import make_grid_graph

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native PFDR unavailable")


def make_problem(v=60, n=30, e=140, seed=0):
    r = np.random.default_rng(seed)
    eu = r.integers(0, v, e).astype(np.int32)
    ev = ((eu + 1 + r.integers(0, v - 1, e)) % v).astype(np.int32)
    la = 0.2 + 0.2 * r.random(e)
    a = r.normal(size=(n, v)) / np.sqrt(n)
    y = a @ (r.normal(size=v) * (r.random(v) < 0.3))
    return eu, ev, la, a, y


def test_native_matches_jax_dense_l1_recond():
    eu, ev, la, a, y = make_problem()
    v, n = a.shape[1], a.shape[0]
    r = np.random.default_rng(1)
    la_l1 = 0.05 + 0.02 * r.random(v)
    lipd = np.sum(a * a, axis=0) * 3.0
    g = GraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64)
    opt = PFDROptions(rho=1.4, cond_min=1e-3, dif_rcd=1e-2, dif_tol=1e-9,
                      it_max=2000)
    res = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
        la_l1=jnp.asarray(la_l1), vprox=VertexProx(kind="l1",
                                                   positivity=True),
        lipsch=jnp.asarray(lipd), ltype=Lipsch.DIAG, opt=opt)
    xh, ith = native.pfdr_quadratic_d1_host(
        n, a, y, eu, ev, la, la_l1=la_l1, positivity=True, lip_diag=lipd,
        rho=1.4, cond_min=1e-3, dif_rcd=1e-2, dif_tol=1e-9, it_max=2000)
    assert ith == int(res.it)
    np.testing.assert_allclose(xh, np.asarray(res.x), atol=1e-13)


def test_native_matches_jax_gram_bounds():
    eu, ev, la, a, y = make_problem(seed=2)
    v = a.shape[1]
    gm = a.T @ a
    aty = a.T @ y
    lip = float(np.linalg.eigvalsh(gm)[-1])
    g = GraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64)
    opt = PFDROptions(dif_tol=1e-9, it_max=1500)
    res = pfdr_quadratic_d1(
        GramOp(jnp.asarray(gm)), jnp.asarray(aty), g,
        vprox=VertexProx(kind="bounds", lo=-0.1, hi=0.4), lipsch=lip,
        opt=opt)
    xh, ith = native.pfdr_quadratic_d1_host(
        -1, gm, aty, eu, ev, la, bounds=(-0.1, 0.4), lip_scal=lip,
        dif_tol=1e-9, it_max=1500)
    assert ith == int(res.it)
    np.testing.assert_allclose(xh, np.asarray(res.x), atol=1e-13)


def test_native_warm_start():
    eu, ev, la, a, y = make_problem(seed=3)
    v, n = a.shape[1], a.shape[0]
    lip = float(np.linalg.svd(a, compute_uv=False)[0] ** 2)
    x_cold, it_cold = native.pfdr_quadratic_d1_host(
        n, a, y, eu, ev, la, la_l1=np.full(v, 0.05), lip_scal=lip,
        dif_tol=1e-10, it_max=5000)
    x_warm, it_warm = native.pfdr_quadratic_d1_host(
        n, a, y, eu, ev, la, la_l1=np.full(v, 0.05), lip_scal=lip,
        dif_tol=1e-10, it_max=5000, x0=x_cold)
    assert it_warm < it_cold
    np.testing.assert_allclose(x_warm, x_cold, atol=1e-8)


def test_cp_host_small_matches_device_path():
    """The full cut-pursuit solve must agree between the device reduced
    pipeline and the host-small (native C++) pipeline."""
    eu, ev, la = make_grid_graph(10, 10, seed=4)
    la = 0.15 * la
    v = 100
    r = np.random.default_rng(5)
    a = r.normal(size=(40, v)) / np.sqrt(40)
    x_true = np.zeros(v)
    x_true[r.integers(0, v, 10)] = 2.0
    y = a @ x_true + 0.02 * r.normal(size=40)
    g = GraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64)
    la_l1 = np.full(v, 0.04)
    base_opt = CPOptions(dif_tol=1e-5, it_max=10, host_small="off",
                         pfdr=PFDROptions(rho=1.5, dif_tol=1e-8,
                                          it_max=5000))
    host_opt = CPOptions(dif_tol=1e-5, it_max=10, host_small="on",
                         pfdr=PFDROptions(rho=1.5, dif_tol=1e-8,
                                          it_max=5000))
    op = DenseOp(jnp.asarray(a))
    obs = jnp.asarray(y)
    base = cp_quadratic_d1(op, obs, g, la_l1=la_l1, opt=base_opt)
    host = cp_quadratic_d1(op, obs, g, la_l1=la_l1, opt=host_opt)
    np.testing.assert_allclose(host.rx[host.cv], base.rx[base.cv],
                               atol=1e-6)


def test_cp_host_small_bounds():
    eu, ev, la = make_grid_graph(8, 8, seed=6)
    v = 64
    r = np.random.default_rng(7)
    a = r.normal(size=(24, v)) / np.sqrt(24)
    y = a @ np.clip(r.normal(size=v), -0.5, 0.8)
    g = GraphD1.create(eu, ev, 0.1 * la, num_vertices=v, dtype=jnp.float64)
    kw = dict(bounds=(-0.5, 0.8))
    op = DenseOp(jnp.asarray(a))
    obs = jnp.asarray(y)
    # tight inner tolerance: the two pipelines use different power-method
    # random inits, so loose solves differ at the tolerance scale
    pf = PFDROptions(dif_tol=1e-9, it_max=5000)
    base = cp_quadratic_d1(
        op, obs, g, opt=CPOptions(dif_tol=1e-6, host_small="off", pfdr=pf),
        **kw)
    host = cp_quadratic_d1(
        op, obs, g, opt=CPOptions(dif_tol=1e-6, host_small="on", pfdr=pf),
        **kw)
    np.testing.assert_allclose(host.rx[host.cv], base.rx[base.cv],
                               atol=1e-6)


def test_native_simplex_matches_jax():
    """Native multi-label PFDR vs the JAX solver (all losses, la_f,
    reconditioning, both stopping modes)."""
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu.solvers.pfdr_simplex import pfdr_loss_d1_simplex

    h, w, k = 7, 8, 4
    eu, ev, la = make_grid_graph(h, w, seed=8)
    la = 0.3 * la
    v = h * w
    r = np.random.default_rng(9)
    q = np.abs(r.normal(size=(v, k))) + 0.05
    q /= q.sum(1, keepdims=True)
    g = GraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64)
    for al, la_f, dif_tol, dif_rcd in [(0.0, None, 1e-8, 0.0),
                                       (1.0, 1.2, 1e-8, 1e-2),
                                       (0.5, None, 1.0, 0.0)]:
        opt = PFDROptions(rho=1.3, cond_min=1e-3, dif_rcd=dif_rcd,
                          dif_tol=dif_tol, it_max=600)
        laf_arr = np.full(v, la_f) if la_f is not None else None
        res = pfdr_loss_d1_simplex(
            g, jnp.asarray(q), al=al,
            la_f=jnp.asarray(laf_arr) if laf_arr is not None else None,
            opt=opt)
        ph, ith = native.pfdr_loss_d1_simplex_host(
            q, al, eu, ev, la, la_f=laf_arr, rho=1.3, cond_min=1e-3,
            dif_rcd=dif_rcd, dif_tol=dif_tol, it_max=600)
        assert ith == int(res.it), (al, ith, int(res.it))
        np.testing.assert_allclose(ph, np.asarray(res.p), atol=1e-12,
                                   err_msg=f"al={al}")


def test_cp_simplex_host_small_matches_device():
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_simplex import (
        cp_loss_d1_simplex)

    h, w, k = 10, 10, 3
    eu, ev, la = make_grid_graph(h, w, seed=10)
    v = h * w
    r = np.random.default_rng(11)
    true = (np.arange(v) * k // v)
    q = np.full((v, k), 0.2 / k)
    q[np.arange(v), true] += 0.8
    q += 0.1 * r.random((v, k))
    q /= q.sum(1, keepdims=True)
    g = GraphD1.create(eu, ev, 0.4 * la, num_vertices=v, dtype=jnp.float64)
    pf = PFDROptions(rho=1.2, dif_tol=1e-9, it_max=3000)
    base = cp_loss_d1_simplex(
        g, jnp.asarray(q), al=0.5,
        opt=CPOptions(dif_tol=1e-5, it_max=8, host_small="off", pfdr=pf))
    host = cp_loss_d1_simplex(
        g, jnp.asarray(q), al=0.5,
        opt=CPOptions(dif_tol=1e-5, it_max=8, host_small="on", pfdr=pf))
    # the two pipelines stop reduced solves on slightly different iterates
    # (padded vs unpadded evolution normalization), so compare the
    # labeling (the multi-label contract) plus a loose value check
    np.testing.assert_array_equal(host.rp[host.cv].argmax(1),
                                  base.rp[base.cv].argmax(1))
    np.testing.assert_allclose(host.rp[host.cv], base.rp[base.cv],
                               atol=5e-4)
