"""Unit tests for the numeric primitives (L1 of the layer map)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import GraphD1
from cp_pfdr_graph_d1_tpu.ops import (d1_pair_prox, operator_norm,
                                      proj_simplex_metric, soft_threshold)

from . import _oracle


def test_soft_threshold():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = soft_threshold(x, 1.0)
    np.testing.assert_allclose(out, [-1.0, 0.0, 0.0, 0.0, 1.0])
    out = soft_threshold(x, 1.0, positivity=True)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0, 0.0, 1.0])


def test_d1_pair_prox_is_prox_of_abs_difference():
    # prox of th*|a-b| under weights w_u, w_v: check optimality by comparing
    # with a fine numeric minimization.
    rng = np.random.default_rng(0)
    for _ in range(20):
        pu, pv = rng.normal(size=2)
        wu = rng.uniform(0.2, 0.8)
        wv = 1 - wu
        th = rng.uniform(0.1, 2.0)
        # d1_pair_prox takes the already-scaled threshold
        # th = la * (wu + wv) / (wu * wv); with wu + wv = 1 this is the prox
        # of la|x - y| = th*wu*wv|x - y| in the metric diag(wu, wv).
        xu, xv = d1_pair_prox(jnp.asarray(pu), jnp.asarray(pv),
                              wu, wv, th)
        # objective: wu/2 (x-pu)^2 + wv/2 (y-pv)^2 + wu*wv*th |x-y|

        def f(x, y):
            return (0.5 * wu * (x - pu) ** 2 + 0.5 * wv * (y - pv) ** 2
                    + wu * wv * th * abs(x - y))

        base = f(float(xu), float(xv))
        for dx in (-1e-4, 0, 1e-4):
            for dy in (-1e-4, 0, 1e-4):
                assert f(float(xu) + dx, float(xv) + dy) >= base - 1e-9


def test_proj_simplex_uniform_metric():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 7))
    p = np.asarray(proj_simplex_metric(jnp.asarray(x), 1.0))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-10)
    assert (p >= 0).all()
    # KKT: for active coords, p = x - la; la consistent per row
    for i in range(50):
        act = p[i] > 0
        la = (x[i][act] - p[i][act])
        np.testing.assert_allclose(la, la[0], atol=1e-9)


@pytest.mark.oracle
def test_proj_simplex_metric_vs_reference():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(100, 5)) * 2
    m = rng.uniform(0.1, 1.0, size=(100, 5))
    ours = np.asarray(proj_simplex_metric(jnp.asarray(x), jnp.asarray(m)))
    ref = _oracle.proj_simplex_metric(x, m)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_operator_norm_vs_svd():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(40, 25)))

    sq = float(operator_norm(lambda x: a.T @ (a @ x), 25, jnp.float64,
                             tol=1e-9, it_max=10_000))
    expected = np.linalg.svd(np.asarray(a), compute_uv=False)[0] ** 2
    np.testing.assert_allclose(sq, expected, rtol=1e-4)


@pytest.mark.oracle
@pytest.mark.parametrize("shape", [(12, 400), (400, 12), (60, 50)])
def test_dense_operator_norm_cost_rule_vs_reference(shape):
    """dense_operator_norm applies the reference's pre-symmetrization cost
    rule (operator_norm_matrix.cpp:116) and matches the reference value on
    tall, wide, and near-square matrices."""
    from cp_pfdr_graph_d1_tpu.ops.power_iter import dense_operator_norm

    rng = np.random.default_rng(13)
    a = rng.normal(size=shape)
    ours = float(dense_operator_norm(jnp.asarray(a), tol=1e-6,
                                     it_max=1000))
    ref = _oracle.operator_norm(a, nTol=1e-6, itMax=1000)
    expected = np.linalg.svd(a, compute_uv=False)[0] ** 2
    np.testing.assert_allclose(ours, expected, rtol=1e-3)
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_graph_edge_to_vertex_sum_matches_dense_scatter():
    rng = np.random.default_rng(4)
    v, e = 30, 80
    eu = rng.integers(0, v, e).astype(np.int32)
    ev = rng.integers(0, v, e).astype(np.int32)
    g = GraphD1.create(eu, ev, np.ones(e), num_vertices=v, dtype=jnp.float64)
    vu = rng.normal(size=e)
    vv = rng.normal(size=e)
    out = np.asarray(g.edge_to_vertex_sum(jnp.asarray(vu), jnp.asarray(vv)))
    expect = np.zeros(v)
    np.add.at(expect, eu, vu)
    np.add.at(expect, ev, vv)
    np.testing.assert_allclose(out, expect, atol=1e-12)


def test_graph_edge_to_vertex_sum_2d():
    rng = np.random.default_rng(5)
    v, e, k = 10, 25, 4
    eu = rng.integers(0, v, e).astype(np.int32)
    ev = rng.integers(0, v, e).astype(np.int32)
    g = GraphD1.create(eu, ev, np.ones(e), num_vertices=v, dtype=jnp.float64)
    vu = rng.normal(size=(e, k))
    vv = rng.normal(size=(e, k))
    out = np.asarray(g.edge_to_vertex_sum(jnp.asarray(vu), jnp.asarray(vv)))
    expect = np.zeros((v, k))
    np.add.at(expect, eu, vu)
    np.add.at(expect, ev, vv)
    np.testing.assert_allclose(out, expect, atol=1e-12)


# ---------------------------------------------------------------------------
# device-resident connected components (ops/components.py)
# ---------------------------------------------------------------------------

def test_device_components_match_scipy():
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import GraphD1
    from cp_pfdr_graph_d1_tpu.ops.components import (
        compact_labels, connected_components_device)
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_common import (
        connected_components)

    r = np.random.default_rng(23)
    for trial in range(6):
        v = int(r.integers(10, 200))
        e = int(r.integers(v // 2, 2 * v))
        eu = r.integers(0, v, e).astype(np.int32)
        ev = r.integers(0, v, e).astype(np.int32)
        mask = r.random(e) < 0.6
        graph = GraphD1.create(eu, ev, np.ones(e), num_vertices=v,
                               dtype=jnp.float64)
        roots = connected_components_device(graph, jnp.asarray(mask))
        n_dev, cv_dev = compact_labels(np.asarray(roots))
        n_ref, cv_ref = connected_components(v, eu, ev, mask)
        assert n_dev == n_ref, f"trial {trial}"
        np.testing.assert_array_equal(cv_dev, cv_ref)


def test_device_components_long_path():
    """A V-long path is the propagation worst case: needs the jumping."""
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import GraphD1
    from cp_pfdr_graph_d1_tpu.ops.components import (
        compact_labels, connected_components_device)

    v = 512
    eu = np.arange(v - 1, dtype=np.int32)
    ev = eu + 1
    graph = GraphD1.create(eu, ev, np.ones(v - 1), num_vertices=v,
                           dtype=jnp.float64)
    mask = np.ones(v - 1, bool)
    mask[200] = False  # split into two components
    roots = connected_components_device(graph, jnp.asarray(mask))
    n, cv = compact_labels(np.asarray(roots))
    assert n == 2
    assert (cv[:201] == 0).all() and (cv[201:] == 1).all()
