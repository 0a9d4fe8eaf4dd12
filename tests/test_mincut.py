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
    fallback = maxflow._min_cut_python(n, eu, ev, w, c)
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
    fallback = maxflow._min_cut_python(n, eu, ev, w, c)
    assert energy(native, eu, ev, w, c) == pytest.approx(
        energy(fallback, eu, ev, w, c), abs=1e-8)
