"""K-axis circulant fused kernel vs the staged multi-label PFDR path.

The unstructured multi-label fast path (``ops/circulant_fused_simplex``):
the fused circulant solve (interpreted kernel on CPU) must match the
staged incidence-gather solve on the plain COO container to float64
rounding — same math, different memory system.  Reference iteration being
re-expressed: ``/root/reference/src/PFDR_graph_loss_d1_simplex.cpp:
567-691``.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import GraphD1, PFDROptions, pfdr_loss_d1_simplex
from cp_pfdr_graph_d1_tpu.circulant import CirculantGraphD1

from .conftest import make_grid_graph


def mesh_problem(v=600, k=4, seed=0):
    """Grid plus random chords (families + a COO remainder), piecewise-
    constant label field with noise."""
    r = np.random.default_rng(seed)
    eu, ev, la = make_grid_graph(24, v // 24, seed=seed)
    extra = 40
    ceu = r.integers(0, v, extra).astype(np.int32)
    cev = ((ceu + r.integers(1, v // 2, extra)) % v).astype(np.int32)
    keep = ceu != cev
    eu = np.concatenate([eu, ceu[keep]])
    ev = np.concatenate([ev, cev[keep]])
    la = np.concatenate([la, 0.4 + r.random(keep.sum())])
    labels = r.integers(0, k, size=v)
    q = np.full((v, k), 0.1 / (k - 1))
    q[np.arange(v), labels] = 0.9
    q += 0.05 * r.random((v, k))
    q /= q.sum(axis=1, keepdims=True)
    return eu, ev, 0.15 * la, q


def run_pair(al, k=4, la_f=None, dif_tol=1e-7, it_max=300, rho=1.2,
             seed=0):
    eu, ev, la, q = mesh_problem(k=k, seed=seed)
    v = q.shape[0]
    opt_st = PFDROptions(rho=rho, dif_tol=dif_tol, it_max=it_max,
                         fused="off")
    opt_fu = PFDROptions(rho=rho, dif_tol=dif_tol, it_max=it_max,
                         fused="on")
    kw = dict(al=al,
              la_f=None if la_f is None else jnp.asarray(la_f, jnp.float64))
    base = pfdr_loss_d1_simplex(
        GraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64),
        jnp.asarray(q, jnp.float64), opt=opt_st, **kw)
    circ = CirculantGraphD1.create(eu, ev, la, num_vertices=v,
                                   dtype=jnp.float64, max_families=8,
                                   min_count=4)
    assert circ.supports_fused_simplex(k) and circ.num_rem > 0
    fused = pfdr_loss_d1_simplex(circ, jnp.asarray(q, jnp.float64),
                                 opt=opt_fu, **kw)
    return base, fused


@pytest.mark.parametrize("al", [0.0, 1.0, 0.2])
def test_fused_circulant_simplex_matches_staged(al):
    base, fused = run_pair(al)
    assert int(fused.it) == int(base.it)
    np.testing.assert_allclose(np.asarray(fused.p), np.asarray(base.p),
                               atol=1e-9)
    p = np.asarray(fused.p)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-9)
    assert p.min() >= -1e-12


def test_fused_circulant_simplex_vertex_weights():
    r = np.random.default_rng(3)
    la_f = r.uniform(0.5, 3.0, size=600)
    base, fused = run_pair(1.0, la_f=la_f, seed=2)
    assert int(fused.it) == int(base.it)
    np.testing.assert_allclose(np.asarray(fused.p), np.asarray(base.p),
                               atol=1e-9)


def test_fused_circulant_simplex_label_mode():
    """dif_tol >= 1 switches to changed-ML-label stopping; counts must
    agree between the two memory systems."""
    base, fused = run_pair(0.2, k=3, dif_tol=1.0, it_max=150, seed=4)
    assert int(fused.it) == int(base.it)
    np.testing.assert_allclose(np.asarray(fused.p), np.asarray(base.p),
                               atol=1e-9)


def test_fused_circulant_simplex_no_remainder():
    """Pure-grid offsets decompose remainder-free; the nt == 0 kernel
    variant must agree with the staged path."""
    eu, ev, la = make_grid_graph(16, 16, seed=6)
    v, k = 256, 4
    r = np.random.default_rng(7)
    q = r.random((v, k))
    q /= q.sum(axis=1, keepdims=True)
    circ = CirculantGraphD1.create(eu, ev, 0.1 * la, num_vertices=v,
                                   dtype=jnp.float64, max_families=4,
                                   min_count=2)
    assert circ.num_rem == 0
    base = pfdr_loss_d1_simplex(
        GraphD1.create(eu, ev, 0.1 * la, num_vertices=v,
                       dtype=jnp.float64),
        jnp.asarray(q, jnp.float64), al=0.5,
        opt=PFDROptions(dif_tol=1e-7, it_max=200, fused="off"))
    fused = pfdr_loss_d1_simplex(
        circ, jnp.asarray(q, jnp.float64), al=0.5,
        opt=PFDROptions(dif_tol=1e-7, it_max=200, fused="on"))
    assert int(fused.it) == int(base.it)
    np.testing.assert_allclose(np.asarray(fused.p), np.asarray(base.p),
                               atol=1e-9)


def test_fused_circulant_simplex_resume():
    """Kill/resume through the fused circulant loop is trajectory-exact."""
    eu, ev, la, q = mesh_problem(seed=8)
    v = q.shape[0]
    circ = CirculantGraphD1.create(eu, ev, la, num_vertices=v,
                                   dtype=jnp.float64, max_families=8,
                                   min_count=4)
    qd = jnp.asarray(q, jnp.float64)
    full = pfdr_loss_d1_simplex(
        circ, qd, al=1.0,
        opt=PFDROptions(dif_tol=0.0, it_max=120, fused="on"))
    res1, st = pfdr_loss_d1_simplex(
        circ, qd, al=1.0,
        opt=PFDROptions(dif_tol=0.0, it_max=60, fused="on"),
        return_state=True)
    assert int(res1.it) == 60
    res2 = pfdr_loss_d1_simplex(
        circ, qd, al=1.0,
        opt=PFDROptions(dif_tol=0.0, it_max=120, fused="on"), state0=st)
    assert int(res2.it) == 120
    np.testing.assert_allclose(np.asarray(res2.p), np.asarray(full.p),
                               atol=1e-12)
