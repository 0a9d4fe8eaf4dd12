"""Reference-parity API layer: one entry per MEX binding + the Boost entry.

Checks argument conventions (AtA premultiplication, l22 weighting and
objective correction, diagonal-A squaring in ``CP_quadratic_l1``) against
both the core solvers and the compiled reference.
"""
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import api

from . import _oracle
from .conftest import make_grid_graph


def problem(seed=0, h=6, w=6, n=20):
    v = h * w
    eu, ev, la = make_grid_graph(h, w, seed=seed)
    r = np.random.default_rng(seed + 400)
    a = r.normal(size=(n, v)) / np.sqrt(n)
    x_true = np.zeros((h, w))
    x_true[1:4, 2:5] = 1.0
    y = a @ x_true.ravel() + 0.02 * r.normal(size=n)
    return eu, ev, 0.3 * la, a, y.astype(np.float64)


def test_cp_l1_and_AtA_agree():
    eu, ev, la, a, y = problem()
    la_l1 = 0.02
    out = api.cp_quadratic_d1_l1(y, a, eu, ev, la, la_l1,
                                 CP_difTol=1e-5, PFDR_difTol=1e-8)
    out2 = api.cp_quadratic_d1_l1_AtA(a.T @ y, a.T @ a, eu, ev, la, la_l1,
                                      CP_difTol=1e-5, PFDR_difTol=1e-8)
    np.testing.assert_allclose(out.rX[out.Cv], out2.rX[out2.Cv], atol=1e-4)


def test_l22_objective_correction():
    eu, ev, la, _, _ = problem()
    v = 36
    r = np.random.default_rng(3)
    y = r.normal(size=v)
    w = r.uniform(0.5, 2.0, size=v)
    out = api.cp_l22_d1_l1(y, w, eu, ev, la, 0.05, CP_difTol=1e-6,
                           PFDR_difTol=1e-9, monitor=True)
    # monitored objective includes the +1/2||y||^2_w constant: evaluate the
    # true functional at the solution and compare
    x = out.rX[out.Cv]
    d1 = np.sum(la * np.abs(x[eu] - x[ev]))
    true_obj = 0.5 * np.sum(w * (y - x) ** 2) + d1 + 0.05 * np.sum(np.abs(x))
    np.testing.assert_allclose(out.Obj[-1], true_obj, rtol=1e-6)


@pytest.mark.oracle
def test_boost_binding_diagonal_mode():
    """1-D A: the binding squares A and premultiplies obs
    (``CP_quadratic_l1_py.cpp:118-129``)."""
    eu, ev, la, _, _ = problem(seed=1)
    v = 36
    r = np.random.default_rng(4)
    y = r.normal(size=v) + 1.0
    d = r.uniform(0.5, 2.0, size=v)
    cv, rx = api.CP_quadratic_l1(y, eu, ev, la, d, 0.05,
                                 CP_difTol=1e-6, PFDR_difTol=1e-9)
    cv_r, rx_r, _, _ = _oracle.cp_ql1(
        d * d * y / d, d * d, eu, ev, la, np.full(v, 0.05), 0, N=0,
        CP_difTol=1e-6, CP_itMax=10, difTol=1e-9, itMax=10_000)
    np.testing.assert_allclose(rx[cv], rx_r[cv_r], atol=1e-5)


def test_pfdr_entries_run():
    eu, ev, la, a, y = problem(seed=2)
    lip = np.linalg.svd(a, compute_uv=False)[0] ** 2
    out = api.pfdr_quadratic_d1_l1(y, a, eu, ev, la, 0.05, L=lip,
                                   PFDR_difTol=1e-7, monitor=True)
    assert out.Obj[-1] < out.Obj[0]
    out_b = api.pfdr_quadratic_d1_bounds(y, a, eu, ev, la, -0.5, 0.5,
                                         L=lip, PFDR_difTol=1e-7)
    assert out_b.X.min() >= -0.5 - 1e-9 and out_b.X.max() <= 0.5 + 1e-9
    q = np.abs(np.random.default_rng(0).normal(size=(36, 3)))
    q /= q.sum(1, keepdims=True)
    out_s = api.pfdr_loss_d1_simplex_api(q, 1.0, eu, ev, la,
                                         PFDR_difTol=1e-7)
    np.testing.assert_allclose(out_s.X.sum(1), 1.0, atol=1e-9)


def test_cp_simplex_api():
    eu, ev, la, _, _ = problem(seed=3)
    r = np.random.default_rng(6)
    q = np.abs(r.normal(size=(36, 3))) + 0.1
    q /= q.sum(1, keepdims=True)
    out = api.cp_loss_d1_simplex(q, 1.0, eu, ev, la, CP_difTol=1e-4,
                                 PFDR_difTol=1e-7)
    assert out.rX.shape[1] == 3
    p = out.rX[out.Cv]
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-8)
