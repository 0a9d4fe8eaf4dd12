"""Min-cut primitive vs brute force enumeration on tiny graphs."""
import itertools

import numpy as np
import pytest

from cp_pfdr_graph_d1_tpu import maxflow


def brute_force(n, eu, ev, w, c):
    best, best_u = np.inf, None
    for bits in itertools.product([0, 1], repeat=n):
        u = np.array(bits, bool)
        val = float(c[u].sum())
        cut = u[eu] != u[ev]
        val += float(w[cut].sum())
        if val < best - 1e-12:
            best, best_u = val, u
    return best, best_u


def energy(u, eu, ev, w, c):
    val = float(c[u.astype(bool)].sum())
    val += float(w[u[eu] != u[ev]].sum())
    return val


@pytest.mark.parametrize("seed", range(12))
def test_random_small_graphs(seed):
    rng = np.random.default_rng(seed)
    n = 9
    e = 16
    eu = rng.integers(0, n, e).astype(np.int32)
    ev = rng.integers(0, n, e).astype(np.int32)
    w = rng.uniform(0, 1, e)
    w[rng.random(e) < 0.2] = 0.0
    c = rng.normal(size=n)
    side = maxflow.min_cut(n, eu, ev, w, c)
    best, _ = brute_force(n, eu, ev, w, c)
    got = energy(side, eu, ev, w, c)
    assert got == pytest.approx(best, abs=1e-9)


def test_infinite_costs():
    rng = np.random.default_rng(3)
    n = 8
    eu = np.arange(n - 1, dtype=np.int32)
    ev = np.arange(1, n, dtype=np.int32)
    w = rng.uniform(0.1, 1, n - 1)
    c = rng.normal(size=n)
    c[2] = np.inf   # must never be in U
    c[5] = -np.inf  # must always be in U
    side = maxflow.min_cut(n, eu, ev, w, c)
    assert side[2] == 0 and side[5] == 1
    # compare against brute force with clamped values
    c2 = np.clip(c, -1e3, 1e3)
    best, _ = brute_force(n, eu, ev, w, c2)
    assert energy(side, eu, ev, w, c2) == pytest.approx(best, abs=1e-9)


def test_python_fallback_agrees():
    rng = np.random.default_rng(11)
    n, e = 12, 24
    eu = rng.integers(0, n, e).astype(np.int32)
    ev = rng.integers(0, n, e).astype(np.int32)
    w = rng.uniform(0, 1, e)
    c = rng.normal(size=n)
    native = maxflow.min_cut(n, eu, ev, w, c)
    fallback = maxflow._min_cut_python(n, eu, ev, w, w, c)
    assert energy(native, eu, ev, w, c) == pytest.approx(
        energy(fallback, eu, ev, w, c), abs=1e-9)


def test_larger_random_graph_against_fallback():
    rng = np.random.default_rng(13)
    n, e = 400, 1200
    eu = rng.integers(0, n, e).astype(np.int32)
    ev = rng.integers(0, n, e).astype(np.int32)
    w = rng.uniform(0, 0.3, e)
    c = rng.normal(size=n)
    native = maxflow.min_cut(n, eu, ev, w, c)
    fallback = maxflow._min_cut_python(n, eu, ev, w, w, c)
    assert energy(native, eu, ev, w, c) == pytest.approx(
        energy(fallback, eu, ev, w, c), abs=1e-8)


# ---------------------------------------------------------------------------
# device-resident min-cut (certified binary-TV relaxation, maxflow/device.py)
# ---------------------------------------------------------------------------

def test_device_cut_matches_host_random():
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import maxflow
    from cp_pfdr_graph_d1_tpu.maxflow.device import (cut_value,
                                                     min_cut_device)

    r = np.random.default_rng(11)
    for trial in range(10):
        v = int(r.integers(6, 40))
        e = int(r.integers(v, 3 * v))
        eu = r.integers(0, v, e).astype(np.int32)
        ev = r.integers(0, v, e).astype(np.int32)
        keep = eu != ev
        eu, ev = eu[keep], ev[keep]
        w = r.random(len(eu)) * 2
        c = r.normal(size=v) * 3
        host = maxflow.min_cut(v, eu, ev, w, c)
        dev = min_cut_device(v, eu, ev, w, c, dtype=jnp.float64, tol=1e-9)
        assert cut_value(eu, ev, w, c, dev) <= \
            cut_value(eu, ev, w, c, host) + 1e-7, f"trial {trial}"


def test_device_cut_infinite_costs():
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu.maxflow.device import min_cut_device

    # a path graph where vertex 0 is forced out of U and vertex 3 into it
    eu = np.array([0, 1, 2], np.int32)
    ev = np.array([1, 2, 3], np.int32)
    w = np.array([0.5, 0.01, 0.5])
    c = np.array([np.inf, 0.1, -0.1, -np.inf])
    side = min_cut_device(4, eu, ev, w, c, dtype=jnp.float64, tol=1e-9)
    assert side[0] == 0 and side[3] == 1
    # the cheap middle edge is the optimal boundary
    assert side.tolist() == [0, 0, 1, 1]


def test_device_cut_grid_value():
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import maxflow
    from cp_pfdr_graph_d1_tpu.maxflow.device import (cut_value,
                                                     min_cut_device)
    from .conftest import make_grid_graph

    h = w_ = 12
    eu, ev, la = make_grid_graph(h, w_, seed=4)
    la = 0.3 * la
    r = np.random.default_rng(5)
    c = r.normal(size=h * w_)
    host = maxflow.min_cut(h * w_, eu, ev, la, c)
    dev = min_cut_device(h * w_, eu, ev, la, c, dtype=jnp.float64,
                         tol=1e-9)
    assert abs(cut_value(eu, ev, la, c, dev)
               - cut_value(eu, ev, la, c, host)) < 1e-7


def test_device_cut_certificate_warning_and_gap():
    """A starved PDHG loop (tiny it_max) emits the uncertified warning and
    reports the failed gap; with the normal budget the same cut certifies."""
    import pytest

    from cp_pfdr_graph_d1_tpu.maxflow.device import min_cut_device
    from .conftest import make_grid_graph

    eu, ev, w = make_grid_graph(8, 8, seed=5)
    r = np.random.default_rng(6)
    c = r.normal(size=64)
    with pytest.warns(UserWarning, match="not certified"):
        side, gap, certified = min_cut_device(64, eu, ev, w, c, it_max=1,
                                              check_every=1,
                                              return_gap=True)
    assert not certified and gap > 0
    side, gap, certified = min_cut_device(64, eu, ev, w, c,
                                          return_gap=True)
    assert certified


def test_device_cut_fallback_matches_host():
    """min_cut_device_with_fallback under a starved budget warns, falls
    back to the host solver, and returns the exact host cut value."""
    import pytest

    from cp_pfdr_graph_d1_tpu import maxflow
    from cp_pfdr_graph_d1_tpu.maxflow.device import (
        cut_value, min_cut_device_with_fallback)
    from .conftest import make_grid_graph

    eu, ev, w = make_grid_graph(8, 8, seed=7)
    r = np.random.default_rng(8)
    c = r.normal(size=64)
    with pytest.warns(UserWarning, match="falling back"):
        side = min_cut_device_with_fallback(64, eu, ev, w, c, it_max=1)
    want = cut_value(eu, ev, w, c, maxflow.min_cut(64, eu, ev, w, c))
    np.testing.assert_allclose(cut_value(eu, ev, w, c, side), want,
                               rtol=1e-12)


def test_cut_pursuit_device_cut_fallback():
    """cp_quadratic_d1(cut="device") with a starved PDHG budget falls back
    to host cuts and still reaches the host-cut solution."""
    import jax.numpy as jnp
    import pytest

    from cp_pfdr_graph_d1_tpu import CPOptions, DenseOp, GraphD1, \
        PFDROptions
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1
    from .conftest import make_grid_graph

    h = w_ = 8
    v = h * w_
    eu, ev, la = make_grid_graph(h, w_, seed=21)
    r = np.random.default_rng(22)
    a = r.normal(size=(30, v)) / np.sqrt(30)
    x_true = np.zeros((h, w_))
    x_true[1:4, 1:4] = 1.5
    y = a @ x_true.ravel() + 0.02 * r.normal(size=30)
    la_l1 = np.full(v, 0.02)
    graph = GraphD1.create(eu, ev, 0.3 * la, dtype=jnp.float64)
    pfdr = PFDROptions(rho=1.5, dif_tol=1e-9, it_max=5000)

    base = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
        opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=pfdr, cut="host"))
    with pytest.warns(UserWarning, match="falling back"):
        res = cp_quadratic_d1(
            DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=pfdr,
                          cut="device", cut_it_max=1))
    np.testing.assert_allclose(np.asarray(res.rx)[np.asarray(res.cv)],
                               np.asarray(base.rx)[np.asarray(base.cv)],
                               atol=1e-6)


def test_cut_pursuit_with_device_cut():
    """cp_quadratic_d1(cut="device") reaches the host-cut solution."""
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import CPOptions, DenseOp, GraphD1, \
        PFDROptions
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1
    from .conftest import make_grid_graph

    h = w_ = 8
    v = h * w_
    eu, ev, la = make_grid_graph(h, w_, seed=9)
    r = np.random.default_rng(17)
    a = r.normal(size=(30, v)) / np.sqrt(30)
    x_true = np.zeros((h, w_))
    x_true[1:4, 1:4] = 1.5
    x_true[5:7, 4:7] = -2.0
    y = a @ x_true.ravel() + 0.02 * r.normal(size=30)
    la_l1 = np.full(v, 0.02)
    graph = GraphD1.create(eu, ev, 0.3 * la, dtype=jnp.float64)
    pfdr = PFDROptions(rho=1.5, dif_tol=1e-9, it_max=5000)

    base = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
        opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=pfdr, cut="host"))
    res = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
        opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=pfdr, cut="device"))

    np.testing.assert_allclose(np.asarray(res.rx)[np.asarray(res.cv)],
                               np.asarray(base.rx)[np.asarray(base.cv)],
                               atol=1e-6)


def test_directed_device_cut_matches_host():
    """The asymmetric-dual PDHG directed cut reaches the native directed
    push-relabel's cut value on random directed graphs."""
    from cp_pfdr_graph_d1_tpu.maxflow.device import min_cut_directed_device
    import jax.numpy as jnp
    for seed in range(4):
        r = np.random.default_rng(seed + 40)
        n, e = 24, 70
        eu = r.integers(0, n, e).astype(np.int32)
        ev = ((eu + 1 + r.integers(0, n - 1, e)) % n).astype(np.int32)
        w_uv = r.uniform(0.0, 1.0, e)
        w_vu = r.uniform(0.0, 1.0, e)
        c = r.normal(size=n)
        side_d = min_cut_directed_device(n, eu, ev, w_uv, w_vu, c,
                                         dtype=jnp.float64)
        side_h = maxflow.min_cut_directed(n, eu, ev, w_uv, w_vu, c)

        def val(side):
            side = side.astype(bool)
            v = float(np.sum(c[side]))
            v += float(np.sum(w_uv[side[eu] & ~side[ev]]))
            v += float(np.sum(w_vu[side[ev] & ~side[eu]]))
            return v

        np.testing.assert_allclose(val(side_d), val(side_h), atol=1e-6)


def test_directed_python_fallback_agrees():
    """The directed Dinic fallback (toolchain-free duplex path) equals the
    native directed solver."""
    for seed in range(3):
        r = np.random.default_rng(seed + 50)
        n, e = 16, 40
        eu = r.integers(0, n, e).astype(np.int32)
        ev = ((eu + 1 + r.integers(0, n - 1, e)) % n).astype(np.int32)
        w_uv = r.uniform(0.0, 1.0, e)
        w_vu = r.uniform(0.0, 1.0, e)
        c = r.normal(size=n)
        side_py = maxflow._min_cut_python(n, eu, ev, w_uv, w_vu, c)
        side_h = maxflow.min_cut_directed(n, eu, ev, w_uv, w_vu, c)

        def val(side):
            side = side.astype(bool)
            v = float(np.sum(c[side]))
            v += float(np.sum(w_uv[side[eu] & ~side[ev]]))
            v += float(np.sum(w_vu[side[ev] & ~side[eu]]))
            return v

        np.testing.assert_allclose(val(side_py), val(side_h), atol=1e-9)


def test_duplex_device_loop_matches_host_duplex():
    """cp_quadratic_d1(duplex=True, cut="device") — the device ternary
    cut — reaches the host duplex solution."""
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import CPOptions, DenseOp, GraphD1, \
        PFDROptions
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1
    from .conftest import make_grid_graph

    h = w_ = 8
    v = h * w_
    eu, ev, la = make_grid_graph(h, w_, seed=31)
    r = np.random.default_rng(32)
    a = r.normal(size=(30, v)) / np.sqrt(30)
    x_true = np.zeros((h, w_))
    x_true[1:4, 1:4] = 1.5
    x_true[5:7, 4:7] = -2.0
    y = a @ x_true.ravel() + 0.02 * r.normal(size=30)
    la_l1 = np.full(v, 0.02)
    graph = GraphD1.create(eu, ev, 0.3 * la, dtype=jnp.float64)
    pfdr = PFDROptions(rho=1.5, dif_tol=1e-9, it_max=5000)

    for positivity in (False, True):
        base = cp_quadratic_d1(
            DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
            positivity=positivity, duplex=True,
            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=pfdr, cut="host"))
        res = cp_quadratic_d1(
            DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
            positivity=positivity, duplex=True,
            opt=CPOptions(dif_tol=1e-5, it_max=10, pfdr=pfdr,
                          cut="device"))
        np.testing.assert_allclose(
            np.asarray(res.rx)[np.asarray(res.cv)],
            np.asarray(base.rx)[np.asarray(base.cv)], atol=1e-6,
            err_msg=f"positivity={positivity}")


def test_duplex_device_cut_fallback():
    """A starved duplex PDHG budget falls back to the host directed cut."""
    import jax.numpy as jnp
    import pytest

    from cp_pfdr_graph_d1_tpu import CPOptions, DenseOp, GraphD1, \
        PFDROptions
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1
    from .conftest import make_grid_graph

    h = w_ = 6
    v = h * w_
    eu, ev, la = make_grid_graph(h, w_, seed=33)
    r = np.random.default_rng(34)
    a = r.normal(size=(20, v)) / np.sqrt(20)
    y = a @ r.normal(size=v) * 0.3
    la_l1 = np.full(v, 0.02)
    graph = GraphD1.create(eu, ev, 0.3 * la, dtype=jnp.float64)
    pfdr = PFDROptions(rho=1.5, dif_tol=1e-9, it_max=5000)

    base = cp_quadratic_d1(
        DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
        duplex=True,
        opt=CPOptions(dif_tol=1e-5, it_max=8, pfdr=pfdr, cut="host"))
    with pytest.warns(UserWarning, match="falling back"):
        res = cp_quadratic_d1(
            DenseOp(jnp.asarray(a)), jnp.asarray(y), graph, la_l1=la_l1,
            duplex=True,
            opt=CPOptions(dif_tol=1e-5, it_max=8, pfdr=pfdr, cut="device",
                          cut_it_max=1))
    np.testing.assert_allclose(np.asarray(res.rx)[np.asarray(res.cv)],
                               np.asarray(base.rx)[np.asarray(base.cv)],
                               atol=1e-6)
