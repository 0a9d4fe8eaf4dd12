"""Multi-label cut-pursuit vs the compiled reference oracle.

Reference entry: ``CP_PFDR_graph_loss_d1_simplex``
(``/root/reference/src/CP_PFDR_graph_loss_d1_simplex.cpp:186``).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import CPOptions, GraphD1, PFDROptions
from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_simplex import \
    cp_loss_d1_simplex

from . import _oracle
from .conftest import make_grid_graph


def make_problem(h=8, w=8, k=3, seed=0, conf=0.85):
    v = h * w
    eu, ev, la = make_grid_graph(h, w, seed=seed)
    r = np.random.default_rng(seed + 300)
    true = np.zeros((h, w), int)
    true[:, w // 3:] = 1
    true[h // 2:, 2 * (w // 3):] = 2
    q = np.full((v, k), (1 - conf) / (k - 1))
    q[np.arange(v), true.ravel()] = conf
    q = 0.7 * q + 0.3 * r.dirichlet(np.ones(k), v)
    q /= q.sum(axis=1, keepdims=True)
    return eu, ev, 0.3 * la, q, true.ravel()


@pytest.mark.oracle
@pytest.mark.parametrize("al", [0.0, 1.0, 0.3])
def test_losses_match_reference(al):
    eu, ev, la, q, _ = make_problem(seed=int(al * 10))
    opt = CPOptions(dif_tol=1e-4, it_max=10,
                    pfdr=PFDROptions(rho=1.2, dif_tol=1e-8, it_max=5000))
    res = cp_loss_d1_simplex(
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        jnp.asarray(q, jnp.float64), al=al, opt=opt)
    cv_r, rp_r, it_r = _oracle.cp_simplex(
        q, al, eu, ev, la, CP_difTol=1e-4, CP_itMax=10, rho=1.2,
        difTol=1e-8, itMax=5000)
    p_ours = res.rp[res.cv]
    p_ref = rp_r[cv_r]
    np.testing.assert_allclose(p_ours, p_ref, atol=5e-4)
    # the maximum-likelihood labelings must agree exactly
    np.testing.assert_array_equal(p_ours.argmax(1), p_ref.argmax(1))


@pytest.mark.oracle
def test_label_count_mode_matches_reference():
    eu, ev, la, q, _ = make_problem(seed=7)
    opt = CPOptions(dif_tol=1.0, it_max=10,
                    pfdr=PFDROptions(dif_tol=1e-7, it_max=5000))
    res = cp_loss_d1_simplex(
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        jnp.asarray(q, jnp.float64), al=1.0, opt=opt)
    cv_r, rp_r, it_r = _oracle.cp_simplex(
        q, 1.0, eu, ev, la, CP_difTol=1.0, CP_itMax=10,
        difTol=1e-7, itMax=5000)
    np.testing.assert_array_equal(res.rp[res.cv].argmax(1),
                                  rp_r[cv_r].argmax(1))


def test_denoises_label_field():
    eu, ev, la, q, true = make_problem(seed=9, conf=0.8)
    opt = CPOptions(dif_tol=1e-4, it_max=8,
                    pfdr=PFDROptions(rho=1.5, dif_tol=1e-7, it_max=3000))
    res = cp_loss_d1_simplex(
        GraphD1.create(eu, ev, la, dtype=jnp.float64),
        jnp.asarray(q, jnp.float64), al=1.0, opt=opt, monitor=True)
    labels = res.rp[res.cv].argmax(1)
    acc = (labels == true).mean()
    noisy_acc = (q.argmax(1) == true).mean()
    assert acc >= noisy_acc
    assert res.obj[-1] <= res.obj[0]
    # contraction achieved
    assert res.rp.shape[0] < q.shape[0] // 2


def test_device_cut_matches_host_simplex():
    """Alpha-expansion with the device min-cut reaches the host-cut
    labeling (CPOptions(cut="device"))."""
    eu, ev, la, q, _ = make_problem(seed=4)
    graph = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    pfdr = PFDROptions(rho=1.2, dif_tol=1e-8, it_max=5000)
    base = cp_loss_d1_simplex(
        graph, jnp.asarray(q, jnp.float64), al=0.5,
        opt=CPOptions(dif_tol=1e-4, it_max=8, pfdr=pfdr, cut="host"))
    res = cp_loss_d1_simplex(
        graph, jnp.asarray(q, jnp.float64), al=0.5,
        opt=CPOptions(dif_tol=1e-4, it_max=8, pfdr=pfdr, cut="device"))
    ml_base = np.argmax(np.asarray(base.rp)[np.asarray(base.cv)], axis=1)
    ml_dev = np.argmax(np.asarray(res.rp)[np.asarray(res.cv)], axis=1)
    np.testing.assert_array_equal(ml_dev, ml_base)


def test_device_loop_solution_matches_host():
    """The fully device-resident multi-label loop reproduces the host
    loop's distributions, not just its labeling."""
    eu, ev, la, q, _ = make_problem(seed=11)
    graph = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    pfdr = PFDROptions(rho=1.2, dif_tol=1e-9, it_max=8000)
    for al in (0.0, 1.0, 0.3):
        base = cp_loss_d1_simplex(
            graph, jnp.asarray(q, jnp.float64), al=al,
            opt=CPOptions(dif_tol=1e-4, it_max=8, pfdr=pfdr, cut="host",
                          host_small="off"))
        res = cp_loss_d1_simplex(
            graph, jnp.asarray(q, jnp.float64), al=al,
            opt=CPOptions(dif_tol=1e-4, it_max=8, pfdr=pfdr, cut="device"))
        np.testing.assert_allclose(res.rp[res.cv], base.rp[base.cv],
                                   atol=1e-6, err_msg=f"al={al}")


def test_device_loop_label_mode_and_restart():
    """Label-count stopping and warm restart on the device loop."""
    eu, ev, la, q, _ = make_problem(seed=13)
    graph = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    pfdr = PFDROptions(dif_tol=1e-7, it_max=4000)
    full = cp_loss_d1_simplex(
        graph, jnp.asarray(q, jnp.float64), al=1.0,
        opt=CPOptions(dif_tol=1.0, it_max=10, pfdr=pfdr, cut="device"))
    part = cp_loss_d1_simplex(
        graph, jnp.asarray(q, jnp.float64), al=1.0,
        opt=CPOptions(dif_tol=1.0, it_max=2, pfdr=pfdr, cut="device"))
    rest = cp_loss_d1_simplex(
        graph, jnp.asarray(q, jnp.float64), al=1.0, state=part.state,
        opt=CPOptions(dif_tol=1.0, it_max=10, pfdr=pfdr, cut="device"))
    np.testing.assert_array_equal(
        np.argmax(rest.rp[rest.cv], 1), np.argmax(full.rp[full.cv], 1))


def test_device_loop_cut_fallback():
    """A starved PDHG budget falls back to host expansion cuts and still
    reaches the host solution."""
    eu, ev, la, q, _ = make_problem(seed=15)
    graph = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    pfdr = PFDROptions(rho=1.2, dif_tol=1e-9, it_max=8000)
    base = cp_loss_d1_simplex(
        graph, jnp.asarray(q, jnp.float64), al=1.0,
        opt=CPOptions(dif_tol=1e-4, it_max=8, pfdr=pfdr, cut="host",
                      host_small="off"))
    with pytest.warns(UserWarning, match="falling back"):
        res = cp_loss_d1_simplex(
            graph, jnp.asarray(q, jnp.float64), al=1.0,
            opt=CPOptions(dif_tol=1e-4, it_max=8, pfdr=pfdr, cut="device",
                          cut_it_max=1))
    np.testing.assert_allclose(res.rp[res.cv], base.rp[base.cv], atol=1e-6)
