"""Multi-label PFDR (loss + d1 + simplex) vs the compiled reference oracle.

Reference entry: ``PFDR_graph_loss_d1_simplex``
(``/root/reference/src/PFDR_graph_loss_d1_simplex.cpp:372``), losses keyed on
``al`` (0 linear, 1 quadratic, in ]0,1[ smoothed-KL).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import GraphD1, PFDROptions, pfdr_loss_d1_simplex

from . import _oracle
from .conftest import make_grid_graph


def make_problem(v=36, k=4, seed=0):
    eu, ev, la = make_grid_graph(6, v // 6, seed=seed)
    r = np.random.default_rng(seed + 50)
    # piecewise-constant label field + noise
    labels = r.integers(0, k, size=v)
    q = np.full((v, k), 0.1 / (k - 1))
    q[np.arange(v), labels] = 0.9
    q += 0.05 * r.random((v, k))
    q /= q.sum(axis=1, keepdims=True)
    return eu, ev, la * 0.2, q


def run_both(al, la_f=None, seed=0, dif_tol=1e-9, it_max=2000, rho=1.0,
             dif_rcd=0.0, k=4):
    eu, ev, la, q = make_problem(k=k, seed=seed)
    g = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    opt = PFDROptions(rho=rho, dif_rcd=dif_rcd, dif_tol=dif_tol,
                      it_max=it_max)
    res = pfdr_loss_d1_simplex(
        g, jnp.asarray(q, jnp.float64), al=al,
        la_f=None if la_f is None else jnp.asarray(la_f, jnp.float64),
        opt=opt, monitor=True)
    p_ref, it_ref = _oracle.pfdr_simplex(
        q, al, eu, ev, la, La_f=la_f, rho=rho, difRcd=dif_rcd,
        difTol=dif_tol, itMax=it_max)
    return np.asarray(res.p), int(res.it), p_ref, it_ref, np.asarray(res.obj)


@pytest.mark.oracle
@pytest.mark.parametrize("al", [0.0, 1.0, 0.2])
def test_losses_match_reference(al):
    p, it, p_ref, it_ref, obj = run_both(al)
    np.testing.assert_allclose(p, p_ref, atol=1e-6)
    # iterates on the simplex
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-9)
    assert p.min() >= -1e-12


@pytest.mark.oracle
def test_quadratic_with_vertex_weights_matches_reference():
    r = np.random.default_rng(9)
    la_f = r.uniform(0.5, 3.0, size=36)
    p, it, p_ref, it_ref, _ = run_both(1.0, la_f=la_f, seed=2)
    np.testing.assert_allclose(p, p_ref, atol=1e-6)


@pytest.mark.oracle
def test_kl_with_reconditioning_matches_reference():
    p, it, p_ref, it_ref, _ = run_both(0.4, seed=3, rho=1.4, dif_rcd=1e-3,
                                       dif_tol=1e-10)
    np.testing.assert_allclose(p, p_ref, atol=5e-6)


@pytest.mark.oracle
def test_short_trace_matches_reference_exactly():
    """Fixed 20 iterations: iterates should agree to near machine precision,
    proving each update (forward, prox, projection) matches."""
    p, it, p_ref, it_ref, _ = run_both(1.0, seed=4, dif_tol=0.0, it_max=20)
    assert it == it_ref == 20
    np.testing.assert_allclose(p, p_ref, atol=1e-12)


def test_objective_decreases_and_labels_stabilize():
    eu, ev, la, q = make_problem(seed=5)
    g = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    res = pfdr_loss_d1_simplex(
        g, jnp.asarray(q, jnp.float64), al=1.0,
        opt=PFDROptions(dif_tol=0.0, it_max=300), monitor=True)
    obj = np.asarray(res.obj)
    assert obj[-1] < obj[0]
    assert obj[-1] == min(obj)


def test_label_count_stopping_mode():
    """dif_tol >= 1 switches to counting changed maximum-likelihood labels
    (``PFDR_graph_loss_d1_simplex.cpp:653-676``)."""
    eu, ev, la, q = make_problem(seed=6)
    g = GraphD1.create(eu, ev, la, dtype=jnp.float64)
    res = pfdr_loss_d1_simplex(
        g, jnp.asarray(q, jnp.float64), al=1.0,
        opt=PFDROptions(dif_tol=1.0, it_max=500))
    assert int(res.it) < 500  # stops when no label changes
