"""Cut-pursuit outer solver vs the compiled reference oracle.

Reference entries: ``CP_PFDR_graph_quadratic_d1_l1``
(``/root/reference/src/CP_PFDR_graph_quadratic_d1_l1.cpp:212``) and the
bounds variant.  The steepest-cut/contract/re-solve trajectory is compared
end-to-end: final full solutions must agree within the convergence
tolerance, and partitions must agree on well-separated problems.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import CPOptions, DenseOp, GraphD1, IdentityOp, \
    PFDROptions
from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1

from . import _oracle
from .conftest import make_grid_graph


def make_problem(h=8, w=8, n=30, seed=0, noise=0.02):
    v = h * w
    eu, ev, la = make_grid_graph(h, w, seed=seed)
    r = np.random.default_rng(seed + 200)
    a = r.normal(size=(n, v)) / np.sqrt(n)
    # piecewise-constant ground truth: two constant blobs
    x_true = np.zeros((h, w))
    x_true[1:4, 1:4] = 1.5
    x_true[5:7, 4:7] = -2.0
    x_true = x_true.ravel()
    y = a @ x_true + noise * r.normal(size=n)
    return eu, ev, 0.3 * la, a, y


def full_solution(cv, rx):
    return np.asarray(rx)[np.asarray(cv)]


@pytest.mark.oracle
def test_dense_l1_matches_reference():
    eu, ev, la, a, y = make_problem()
    la_l1 = np.full(a.shape[1], 0.02)
    opt = CPOptions(dif_tol=1e-5, it_max=12,
                    pfdr=PFDROptions(rho=1.5, dif_tol=1e-8, it_max=10_000))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        la_l1=la_l1, opt=opt)
    cv_r, rx_r, it_r, _ = _oracle.cp_ql1(
        y, a, eu, ev, la, la_l1, 0, CP_difTol=1e-5, CP_itMax=12, rho=1.5,
        difTol=1e-8, itMax=10_000)
    x_ours = full_solution(res.cv, res.rx)
    x_ref = full_solution(cv_r, rx_r)
    np.testing.assert_allclose(x_ours, x_ref, atol=2e-5)
    # partition granularity agrees on this well-separated problem (exact
    # equality is not a contract: near-tolerance merges depend on the PFDR
    # trajectory, which warm-starting shifts slightly)
    assert abs(len(res.rx) - len(rx_r)) <= 1


@pytest.mark.oracle
def test_dense_l1_positivity_matches_reference():
    eu, ev, la, a, y = make_problem(seed=1)
    # positive ground truth for a meaningful positivity run
    la_l1 = np.full(a.shape[1], 0.05)
    opt = CPOptions(dif_tol=1e-5, it_max=10,
                    pfdr=PFDROptions(rho=1.0, dif_tol=1e-8, it_max=10_000))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        la_l1=la_l1, positivity=True, opt=opt)
    cv_r, rx_r, it_r, _ = _oracle.cp_ql1(
        y, a, eu, ev, la, la_l1, 1, CP_difTol=1e-5, CP_itMax=10,
        difTol=1e-8, itMax=10_000)
    np.testing.assert_allclose(full_solution(res.cv, res.rx),
                               full_solution(cv_r, rx_r), atol=2e-5)
    assert full_solution(res.cv, res.rx).min() >= 0


@pytest.mark.oracle
def test_identity_fused_lasso_matches_reference():
    """Identity operator: graph-TV denoising (l22 + d1 + l1)."""
    eu, ev, la, _, _ = make_problem(seed=2)
    v = 64
    r = np.random.default_rng(5)
    x_true = np.zeros((8, 8))
    x_true[2:6, 2:6] = 1.0
    y = x_true.ravel() + 0.1 * r.normal(size=v)
    la_l1 = np.full(v, 0.05)
    opt = CPOptions(dif_tol=1e-6, it_max=12,
                    pfdr=PFDROptions(dif_tol=1e-9, it_max=10_000))
    res = cp_quadratic_d1(
        IdentityOp(), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        la_l1=la_l1, opt=opt)
    cv_r, rx_r, it_r, _ = _oracle.cp_ql1(
        y, None, eu, ev, la, la_l1, 0, N=0, CP_difTol=1e-6, CP_itMax=12,
        difTol=1e-9, itMax=10_000)
    np.testing.assert_allclose(full_solution(res.cv, res.rx),
                               full_solution(cv_r, rx_r), atol=2e-5)


@pytest.mark.oracle
def test_bounds_matches_reference():
    eu, ev, la, a, y = make_problem(seed=3)
    opt = CPOptions(dif_tol=1e-5, it_max=10,
                    pfdr=PFDROptions(dif_tol=1e-8, it_max=10_000))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        bounds=(-1.0, 1.0), opt=opt)
    cv_r, rx_r, it_r = _oracle.cp_qbounds(
        y, a, eu, ev, la, -1.0, 1.0, CP_difTol=1e-5, CP_itMax=10,
        difTol=1e-8, itMax=10_000)
    x = full_solution(res.cv, res.rx)
    np.testing.assert_allclose(x, full_solution(cv_r, rx_r), atol=2e-5)
    assert x.min() >= -1 - 1e-12 and x.max() <= 1 + 1e-12


def test_objective_decreases_and_partition_compresses():
    eu, ev, la, a, y = make_problem(seed=4)
    la_l1 = np.full(a.shape[1], 0.02)
    opt = CPOptions(dif_tol=1e-5, it_max=10,
                    pfdr=PFDROptions(rho=1.5, dif_tol=1e-8, it_max=10_000))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        la_l1=la_l1, opt=opt, monitor=True)
    assert res.obj[-1] < res.obj[0]
    # cut pursuit's whole point: far fewer components than vertices
    assert len(res.rx) < a.shape[1] // 2
    assert res.time.shape == (res.it + 1,)
    assert res.dif.shape == (res.it,)


def test_warm_restart_continues():
    """The reference's warm restart is declared but untested
    (``CP_PFDR_graph_quadratic_d1_l1.hpp:129``); here it is exercised:
    restarting from a converged state with the same data stops immediately
    at the same solution."""
    eu, ev, la, a, y = make_problem(seed=6)
    la_l1 = np.full(a.shape[1], 0.02)
    opt = CPOptions(dif_tol=1e-5, it_max=10,
                    pfdr=PFDROptions(dif_tol=1e-8, it_max=10_000))
    g = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    res = cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                          la_l1=la_l1, opt=opt)
    res2 = cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                           la_l1=la_l1, opt=opt, state=res.state)
    np.testing.assert_allclose(full_solution(res2.cv, res2.rx),
                               full_solution(res.cv, res.rx), atol=1e-6)
    assert res2.it <= 2


@pytest.mark.oracle
def test_duplex_matches_reference():
    """Duplex two-layer ternary cut
    (``CP_PFDR_graph_quadratic_d1_l1_duplex.cpp:237``)."""
    eu, ev, la, a, y = make_problem(seed=8)
    la_l1 = np.full(a.shape[1], 0.02)
    opt = CPOptions(dif_tol=1e-5, it_max=12,
                    pfdr=PFDROptions(rho=1.5, dif_tol=1e-8, it_max=10_000))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        la_l1=la_l1, duplex=True, opt=opt)
    cv_r, rx_r, it_r, _ = _oracle.cp_ql1(
        y, a, eu, ev, la, la_l1, 0, CP_difTol=1e-5, CP_itMax=12, rho=1.5,
        difTol=1e-8, itMax=10_000, duplex=True)
    np.testing.assert_allclose(full_solution(res.cv, res.rx),
                               full_solution(cv_r, rx_r), atol=2e-5)


def test_duplex_agrees_with_two_cuts():
    eu, ev, la, a, y = make_problem(seed=9)
    la_l1 = np.full(a.shape[1], 0.02)
    opt = CPOptions(dif_tol=1e-5, it_max=12,
                    pfdr=PFDROptions(rho=1.5, dif_tol=1e-8, it_max=10_000))
    g = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    r1 = cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                         la_l1=la_l1, opt=opt)
    r2 = cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                         la_l1=la_l1, duplex=True, opt=opt)
    np.testing.assert_allclose(full_solution(r1.cv, r1.rx),
                               full_solution(r2.cv, r2.rx), atol=1e-4)


@pytest.mark.oracle
def test_device_loop_matches_reference():
    """The fully device-resident CP loop (cut='device': device cuts,
    components, contraction, merge) reaches the reference solution."""
    eu, ev, la, a, y = make_problem(seed=3)
    la_l1 = np.full(a.shape[1], 0.02)
    opt = CPOptions(dif_tol=1e-5, it_max=12, cut="device",
                    pfdr=PFDROptions(rho=1.5, dif_tol=1e-8, it_max=10_000))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        la_l1=la_l1, positivity=False, opt=opt)
    cv_r, rx_r, _, _ = _oracle.cp_ql1(
        y, a, eu, ev, la, la_l1, 0, CP_difTol=1e-5, CP_itMax=12, rho=1.5,
        difTol=1e-8, itMax=10_000)
    np.testing.assert_allclose(full_solution(res.cv, res.rx),
                               full_solution(cv_r, rx_r), atol=2e-5)


@pytest.mark.oracle
def test_device_loop_bounds_matches_reference():
    eu, ev, la, a, y = make_problem(seed=5)
    opt = CPOptions(dif_tol=1e-5, it_max=12, cut="device",
                    pfdr=PFDROptions(rho=1.5, dif_tol=1e-8, it_max=10_000))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        bounds=(-1.0, 1.0), opt=opt)
    cv_r, rx_r = _oracle.cp_qbounds(
        y, a, eu, ev, la, -1.0, 1.0, CP_difTol=1e-5, CP_itMax=12, rho=1.5,
        difTol=1e-8, itMax=10_000)[:2]
    np.testing.assert_allclose(full_solution(res.cv, res.rx),
                               full_solution(cv_r, rx_r), atol=2e-5)


def test_device_loop_warm_restart():
    """The device loop accepts and returns warm-restart state."""
    eu, ev, la, a, y = make_problem(seed=7)
    la_l1 = np.full(a.shape[1], 0.02)
    pfdr = PFDROptions(rho=1.5, dif_tol=1e-9, it_max=5000)
    g = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    full = cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                           la_l1=la_l1,
                           opt=CPOptions(dif_tol=1e-6, it_max=10,
                                         pfdr=pfdr, cut="device"))
    part = cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                           la_l1=la_l1,
                           opt=CPOptions(dif_tol=1e-6, it_max=3,
                                         pfdr=pfdr, cut="device"))
    rest = cp_quadratic_d1(DenseOp(jnp.asarray(a)), jnp.asarray(y), g,
                           la_l1=la_l1, state=part.state,
                           opt=CPOptions(dif_tol=1e-6, it_max=10,
                                         pfdr=pfdr, cut="device"))
    np.testing.assert_allclose(full_solution(rest.cv, rest.rx),
                               full_solution(full.cv, full.rx), atol=1e-6)


def test_device_segment_reduction_matches_onehot():
    """At component counts beyond the one-hot cap, the run-length segment
    reductions must equal the one-hot contractions (same math, O(V N)
    memory instead of O(V rV))."""
    from cp_pfdr_graph_d1_tpu.solvers import cut_pursuit_device as d

    r = np.random.default_rng(12)
    v, n, num_comp = 9000, 8, 6000  # > _ONEHOT_MAX = 4096
    rv_cap = 8192
    # contiguous first-encounter labels, like _device_components produces
    cv_raw = r.integers(0, num_comp, v).astype(np.int32)
    _, idx = np.unique(cv_raw, return_index=True)
    rank = np.argsort(np.argsort(idx)).astype(np.int32)
    _, inv = np.unique(cv_raw, return_inverse=True)
    cv = rank[inv]  # labels renumbered in first-encounter order
    nc = int(cv.max()) + 1
    a = r.normal(size=(n, v))
    obs = r.normal(size=n)
    diag = r.uniform(0.5, 2.0, v)
    la_l1 = r.uniform(0.0, 1.0, v)

    ra, ry, lip = d._segment_reduce_dense(jnp.asarray(a), jnp.asarray(obs),
                                          jnp.asarray(cv), rv_cap, False)
    s_mat = np.zeros((v, rv_cap))
    s_mat[np.arange(v), cv] = 1.0
    np.testing.assert_allclose(np.asarray(ra), a @ s_mat, atol=1e-9)

    rd, ryd, lipd = d._segment_reduce_diag(jnp.asarray(diag),
                                           jnp.asarray(obs[:1].repeat(v)),
                                           jnp.asarray(cv), rv_cap)
    np.testing.assert_allclose(np.asarray(rd), diag @ s_mat, atol=1e-9)

    firsts = np.zeros(v, bool)
    firsts[np.unique(cv, return_index=True)[1]] = True
    # firsts in _device_components marks smallest-index roots; emulate:
    # first occurrence per label in vertex order
    x = r.normal(size=v)
    x_const = x[np.unique(cv, return_index=True)[1]][cv]  # comp-constant
    rl1, rx0 = d._reduce_vertex_terms(jnp.asarray(cv), jnp.asarray(x_const),
                                      jnp.asarray(la_l1),
                                      jnp.asarray(firsts), rv_cap)
    np.testing.assert_allclose(np.asarray(rl1), la_l1 @ s_mat, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(rx0)[:nc],
        x_const[np.unique(cv, return_index=True)[1]], atol=0)

    # lexsort contraction at > 2^15 pair keys' worth of components
    g = GraphD1.create(
        r.integers(0, v, 20000).astype(np.int32),
        r.integers(0, v, 20000).astype(np.int32),
        r.uniform(0.1, 1.0, 20000), num_vertices=v, dtype=jnp.float64)
    active = jnp.asarray(r.random(20000) < 0.5)
    lo, hi, w, flags, cnt = d._contract_sort(jnp.asarray(cv), g, active)
    reu, rev, rla = d._contract_pad(lo, hi, w, flags,
                                    jnp.asarray(nc, jnp.int32), 1e-12,
                                    np.dtype(np.float64),
                                    rv_cap, int(2 ** np.ceil(np.log2(
                                        max(int(cnt), 8)))))
    # oracle: dict-accumulated contraction
    want = {}
    act = np.asarray(active)
    eu_h, ev_h, la_h = (np.asarray(g.eu), np.asarray(g.ev),
                        np.asarray(g.la_d1))
    for e in range(20000):
        if act[e] and la_h[e] > 0:
            key = (min(cv[eu_h[e]], cv[ev_h[e]]),
                   max(cv[eu_h[e]], cv[ev_h[e]]))
            want[key] = want.get(key, 0.0) + la_h[e]
    got = {}
    for i in range(len(np.asarray(reu))):
        wgt = float(np.asarray(rla)[i])
        if wgt > 1e-11:
            key = (int(np.asarray(reu)[i]), int(np.asarray(rev)[i]))
            got[key] = got.get(key, 0.0) + wgt
    assert set(got) == set(want)
    for kk in want:
        np.testing.assert_allclose(got[kk], want[kk], rtol=1e-9)
