"""Dense-selection small-problem whole-solve kernel vs the staged loop.

The one-dispatch reduce+precondition+solve pipeline
(:func:`cp_pfdr_graph_d1_tpu.solvers.cut_pursuit._reduce_solve_small`,
kernel in :mod:`cp_pfdr_graph_d1_tpu.ops.solve_small`, interpreter mode
here) must reproduce the staged ``lax.while_loop`` path on the same
reduced problem: same iterate, same iteration count.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import (DenseOp, DiagOp, GramOp, PFDROptions,
                                  VertexProx, pfdr_quadratic_d1)
from cp_pfdr_graph_d1_tpu.config import Lipsch
from cp_pfdr_graph_d1_tpu.graph import GraphD1
from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import (_reduce_diag,
                                                      _reduce_dense,
                                                      _reduce_gram,
                                                      _reduce_solve_small,
                                                      pack_small_inputs)


def run_small(op_arr, obs, cv, reu, rev, rla, r_la_l1, x0, it_max, rv, *,
              rv_cap, e_cap, kind, pre_at, np_pad, vprox, rho, dif_tol,
              interpret):
    buf = pack_small_inputs(np.asarray(cv), np.asarray(reu),
                            np.asarray(rev), np.asarray(rla),
                            None if r_la_l1 is None else np.asarray(r_la_l1),
                            np.asarray(x0), it_max, rv, rv_cap, e_cap,
                            np.asarray(obs).dtype)
    out = np.asarray(_reduce_solve_small(
        op_arr, obs, jnp.asarray(buf), rv_cap=rv_cap, e_cap=e_cap,
        kind=kind, pre_at=pre_at, np_pad=np_pad, vprox=vprox, rho=rho,
        dif_tol=dif_tol, has_l1=r_la_l1 is not None, interpret=interpret))
    return out[:rv_cap], int(out[rv_cap])


def ring_problem(v=128, n=24, seed=0, dtype=np.float32):
    r = np.random.default_rng(seed)
    eu = np.arange(v, dtype=np.int32)
    ev = ((np.arange(v) + 1) % v).astype(np.int32)
    la = np.full(v, 0.3, dtype)
    a = (r.standard_normal((n, v)) / np.sqrt(n)).astype(dtype)
    x_true = (r.random(v) > 0.7).astype(dtype)
    y = (a @ x_true + 0.01 * r.standard_normal(n)).astype(dtype)
    return eu, ev, la, a, y


@pytest.mark.parametrize("mode", ["dense", "pre_at", "gram", "diag"])
@pytest.mark.parametrize("vkind", ["l1pos", "l1", "bounds", "none"])
def test_small_solve_matches_staged(mode, vkind):
    dtype = np.float32
    eu, ev, la, a, y = ring_problem(dtype=dtype)
    v = a.shape[1]
    cv = np.arange(v, dtype=np.int32)  # identity reduction
    la_l1 = None
    if vkind == "l1pos":
        vprox = VertexProx(kind="l1", positivity=True)
        la_l1 = np.full(v, 0.02, dtype)
    elif vkind == "l1":
        vprox = VertexProx(kind="l1")
        la_l1 = np.full(v, 0.02, dtype)
    elif vkind == "bounds":
        vprox = VertexProx(kind="bounds", lo=-0.1, hi=0.6)
    else:
        vprox = VertexProx()
    it_max = 120

    if mode == "gram":
        op_arr = jnp.asarray((a.T @ a).astype(dtype))
        obs = jnp.asarray((a.T @ y).astype(dtype))
        kind, pre_at = "gram", False
    elif mode == "diag":
        op_arr = jnp.asarray(np.sum(a * a, axis=0).astype(dtype))
        obs = jnp.asarray((a.T @ y).astype(dtype))
        kind, pre_at = "diag", False
    else:
        op_arr = jnp.asarray(a)
        obs = jnp.asarray(y)
        kind, pre_at = "dense", mode == "pre_at"

    x_small, it_small = run_small(
        op_arr, obs, cv, eu, ev, la, la_l1, np.zeros(v, dtype), it_max, v,
        rv_cap=128, e_cap=128, kind=kind, pre_at=pre_at, np_pad=128,
        vprox=vprox, rho=1.4, dif_tol=0.0, interpret=True)
    x_small = np.asarray(x_small)

    # staged twin on the same reduced quantities
    if kind == "dense":
        mat, ry, lipsch = _reduce_dense(op_arr, obs, jnp.asarray(cv), 128,
                                        pre_at)
        r_op = GramOp(mat) if pre_at else DenseOp(mat)
    elif kind == "gram":
        mat, ry, lipsch = _reduce_gram(op_arr, obs, jnp.asarray(cv), 128)
        r_op = GramOp(mat)
    else:
        mat, ry, lipsch = _reduce_diag(op_arr, obs, jnp.asarray(cv), 128)
        r_op = DiagOp(mat)
    g = GraphD1.create(eu, ev, la, num_vertices=v)
    res = pfdr_quadratic_d1(
        r_op, ry, g,
        la_l1=None if la_l1 is None else jnp.asarray(la_l1),
        vprox=vprox, lipsch=lipsch, ltype=Lipsch.DIAG,
        x0=jnp.zeros(v, dtype),
        opt=PFDROptions(rho=1.4, dif_tol=0.0, it_max=it_max, fused="off"))
    x_ref = np.asarray(res.x)
    assert int(it_small) == int(res.it)
    np.testing.assert_allclose(x_small, x_ref, rtol=0, atol=3e-5)


def test_small_solve_early_stop_and_padding():
    """Early exit on the evolution test, with rv < rv_cap and padded
    zero-weight edges (the cut-pursuit calling convention)."""
    dtype = np.float32
    eu, ev, la, a, y = ring_problem(seed=5, dtype=dtype)
    v = a.shape[1]
    rv = 100  # contract to fewer components than the cap
    r = np.random.default_rng(7)
    cv = np.sort(r.integers(0, rv, v)).astype(np.int32)
    cv[:rv] = np.arange(rv)
    cv = np.sort(cv).astype(np.int32)
    # reduced ring on rv vertices, padded to e_cap with zero-weight loops
    reu = np.arange(rv, dtype=np.int32)
    rev = ((np.arange(rv) + 1) % rv).astype(np.int32)
    rla = np.full(rv, 0.3, dtype)
    e_cap = 128
    pad = e_cap - rv
    reu_p = np.concatenate([reu, np.zeros(pad, np.int32)])
    rev_p = np.concatenate([rev, np.zeros(pad, np.int32)])
    rla_p = np.concatenate([rla, np.zeros(pad, dtype)])
    la_l1 = np.full(128, 0.02, dtype)
    vprox = VertexProx(kind="l1", positivity=True)

    x_small, it_small = run_small(
        jnp.asarray(a), jnp.asarray(y), cv, reu_p, rev_p, rla_p,
        la_l1, np.zeros(128, dtype), 2000, rv,
        rv_cap=128, e_cap=e_cap, kind="dense", pre_at=False, np_pad=128,
        vprox=vprox, rho=1.4, dif_tol=1e-4, interpret=True)
    x_small = np.asarray(x_small)
    assert int(it_small) < 2000  # the evolution test fired
    assert np.all(x_small[rv:] == 0)  # padded components stay zero

    mat, ry, lipsch = _reduce_dense(jnp.asarray(a), jnp.asarray(y),
                                    jnp.asarray(cv), 128, False)
    g = GraphD1.create(reu_p, rev_p, rla_p, num_vertices=128)
    res = pfdr_quadratic_d1(
        DenseOp(mat), ry, g, la_l1=jnp.asarray(la_l1), vprox=vprox,
        lipsch=lipsch, ltype=Lipsch.DIAG, x0=jnp.zeros(128, dtype),
        opt=PFDROptions(rho=1.4, dif_tol=1e-4, it_max=2000, fused="off"))
    assert int(it_small) == int(res.it)
    np.testing.assert_allclose(x_small[:rv], np.asarray(res.x)[:rv],
                               rtol=0, atol=3e-5)
