"""Banded MXU gather/scatter graph container vs the plain COO container.

The Pallas kernels run in interpreter mode here (CPU); the selection math
is exact (one-hot dots), so results must match the plain container to
rounding of the scatter's summation order.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import (DenseOp, GraphD1, PFDROptions, VertexProx,
                                  pfdr_quadratic_d1)
from cp_pfdr_graph_d1_tpu.banded_graph import BandedGraphD1
from cp_pfdr_graph_d1_tpu.ops.banded import rcm_order

from .conftest import make_grid_graph


def irregular_graph(v=500, seed=0):
    """Random planar-ish mesh: grid plus random chords, shuffled labels."""
    r = np.random.default_rng(seed)
    eu, ev, la = make_grid_graph(25, v // 25, seed=seed)
    extra = 60
    ceu = r.integers(0, v, extra).astype(np.int32)
    cev = ((ceu + r.integers(1, 40, extra)) % v).astype(np.int32)
    eu = np.concatenate([eu, ceu])
    ev = np.concatenate([ev, cev])
    la = np.concatenate([la, 0.5 + r.random(extra)])
    return eu, ev, la


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_banded_gather_matches_plain(dtype):
    eu, ev, la = irregular_graph()
    v = 500
    plain = GraphD1.create(eu, ev, la, num_vertices=v, dtype=dtype)
    band = BandedGraphD1.create(eu, ev, la, num_vertices=v, dtype=dtype,
                                tile=1024, mode="interpret")
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=v).astype(dtype))
    bu, bv = band.gather_endpoints(x)
    # compare on the banded graph's own (permuted, padded) edge list
    xn = np.asarray(x)
    np.testing.assert_allclose(np.asarray(bu), xn[np.asarray(band.eu)],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(bv), xn[np.asarray(band.ev)],
                               rtol=0, atol=0)
    # [V, K] variant
    xk = jnp.asarray(r.normal(size=(v, 3)).astype(dtype))
    bu, bv = band.gather_endpoints(xk)
    np.testing.assert_allclose(np.asarray(bu),
                               np.asarray(xk)[np.asarray(band.eu)],
                               rtol=0, atol=0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_banded_scatter_matches_plain(dtype):
    eu, ev, la = irregular_graph(seed=2)
    v = 500
    band = BandedGraphD1.create(eu, ev, la, num_vertices=v, dtype=dtype,
                                tile=1024, mode="interpret")
    r = np.random.default_rng(3)
    e = band.num_edges
    vu = jnp.asarray(r.normal(size=e).astype(dtype))
    vv = jnp.asarray(r.normal(size=e).astype(dtype))
    out = np.asarray(band.edge_to_vertex_sum(vu, vv))
    ref = np.zeros(v, np.asarray(vu).dtype)
    np.add.at(ref, np.asarray(band.eu), np.asarray(vu))
    np.add.at(ref, np.asarray(band.ev), np.asarray(vv))
    tol = 1e-12 if dtype == jnp.float64 else 1e-5
    np.testing.assert_allclose(out, ref, rtol=tol, atol=tol)


def test_banded_pfdr_matches_plain():
    """Full PFDR solve on the banded container == plain container (f64)."""
    eu, ev, la = irregular_graph(seed=4)
    v = 500
    la = 0.15 * la
    r = np.random.default_rng(5)
    a = r.normal(size=(40, v)) / np.sqrt(40)
    x_true = np.zeros(v)
    x_true[r.integers(0, v, 12)] = 2.0
    y = a @ x_true + 0.02 * r.normal(size=40)
    lip = float(np.linalg.svd(a, compute_uv=False)[0] ** 2)
    opt = PFDROptions(rho=1.3, dif_tol=1e-8, it_max=500)
    kw = dict(la_l1=jnp.full((v,), 0.03), vprox=VertexProx(kind="l1"),
              lipsch=lip, opt=opt)
    base = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64), **kw)
    band = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        BandedGraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64,
                             tile=1024, mode="interpret"), **kw)
    assert int(band.it) == int(base.it)
    np.testing.assert_allclose(np.asarray(band.x), np.asarray(base.x),
                               atol=1e-10)


def test_rcm_reduces_bandwidth():
    eu, ev, la = irregular_graph(seed=6)
    v = 500
    r = np.random.default_rng(7)
    shuf = r.permutation(v).astype(np.int32)
    eu_s, ev_s = shuf[eu], shuf[ev]
    order = rcm_order(eu_s, ev_s, v)
    inv = np.argsort(order)
    bw_before = np.abs(eu_s.astype(int) - ev_s).max()
    bw_after = np.abs(inv[eu_s].astype(int) - inv[ev_s]).max()
    assert bw_after < bw_before


@pytest.mark.parametrize("vprox", [
    VertexProx(kind="l1"),
    VertexProx(kind="l1", positivity=True),
    VertexProx(kind="bounds", lo=-0.5, hi=1.2),
    VertexProx(kind="none"),
])
def test_banded_fused_matches_plain(vprox):
    """The fused whole-iteration banded kernel (interpreted on CPU) must
    produce the same solve as the plain container's unfused path."""
    eu, ev, la = irregular_graph(seed=8)
    v = 500
    la = 0.15 * la
    r = np.random.default_rng(9)
    a = r.normal(size=(32, v)) / np.sqrt(32)
    y = a @ r.normal(size=v)
    lip = float(np.linalg.svd(a, compute_uv=False)[0] ** 2)
    la_l1 = jnp.full((v,), 0.03) if vprox.kind == "l1" else None
    kw = dict(la_l1=la_l1, vprox=vprox, lipsch=lip)
    base = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y),
        GraphD1.create(eu, ev, la, num_vertices=v, dtype=jnp.float64),
        opt=PFDROptions(rho=1.4, dif_tol=1e-8, it_max=400, fused="off"),
        **kw)
    band = BandedGraphD1.create(eu, ev, la, num_vertices=v,
                                dtype=jnp.float64, tile=1024,
                                mode="interpret")
    assert band.supports_fused
    fused = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), band,
        opt=PFDROptions(rho=1.4, dif_tol=1e-8, it_max=400, fused="on"),
        **kw)
    assert int(fused.it) == int(base.it)
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(base.x),
                               atol=1e-10)
