"""TPU drive: circulant fused kernel vs staged path on an unstructured mesh.

Checks (1) the fused circulant Pallas kernel compiles and runs on the real
chip, (2) its solve matches the staged COO path, (3) measures per-iteration
time for the staged COO, banded, and circulant containers (honest timing:
one jitted while_loop doing all iterations, host materialization barrier).

Run: PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=axon python examples/drive_circulant_tpu.py
"""
import sys
import time

import numpy as np


def delaunay_mesh(v=19600, seed=0):
    from scipy.spatial import Delaunay
    r = np.random.default_rng(seed)
    pts = r.random((v, 2))
    tri = Delaunay(pts)
    edges = set()
    for s in tri.simplices:
        for i in range(3):
            a, b = int(s[i]), int(s[(i + 1) % 3])
            edges.add((min(a, b), max(a, b)))
    eu = np.fromiter((e[0] for e in edges), np.int32, len(edges))
    ev = np.fromiter((e[1] for e in edges), np.int32, len(edges))
    return pts, eu, ev


def main():
    import jax
    import jax.numpy as jnp

    import cp_pfdr_graph_d1_tpu as cp
    from cp_pfdr_graph_d1_tpu.circulant import (CirculantGraphD1,
                                                offset_coverage, strip_order)

    print("backend:", jax.default_backend(), flush=True)
    v = 19600
    n = 91
    pts, eu, ev = delaunay_mesh(v)
    order = strip_order(pts)
    inv = np.empty(v, np.int64)
    inv[order] = np.arange(v)
    eu, ev = inv[eu].astype(np.int32), inv[ev].astype(np.int32)
    print(f"V={v} E={len(eu)} coverage(top64)={offset_coverage(eu, ev):.3f}",
          flush=True)

    r = np.random.default_rng(1)
    a = (r.standard_normal((n, v)) / np.sqrt(n)).astype(np.float32)
    x_true = np.zeros(v, np.float32)
    x_true[r.integers(0, v, 500)] = 1.0
    y = (a @ x_true + 0.01 * r.standard_normal(n)).astype(np.float32)
    la_d1 = np.full(len(eu), 2e-3, np.float32)
    la_l1 = jnp.full((v,), 2e-3, jnp.float32)
    lip = float(np.linalg.eigvalsh((a @ a.T).astype(np.float64))[-1])
    op = cp.DenseOp(jnp.asarray(a))
    obs = jnp.asarray(y)
    vprox = cp.VertexProx(kind="l1", positivity=True)
    kw = dict(la_l1=la_l1, vprox=vprox, lipsch=lip)

    def solve(graph, iters, fused):
        opt = cp.PFDROptions(rho=1.5, dif_tol=0.0, it_max=iters, fused=fused)
        res = cp.pfdr_quadratic_d1(op, obs, graph, opt=opt, **kw)
        return np.asarray(res.x)

    def timed(graph, fused, iters_time=20000):
        solve(graph, iters_time, fused)  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            solve(graph, iters_time, fused)
            best = min(best, time.perf_counter() - t0)
        return best / iters_time

    it_check = 300
    g_coo = cp.GraphD1.create(eu, ev, la_d1, num_vertices=v)
    t0 = time.perf_counter()
    x_ref = solve(g_coo, it_check, "off")
    print(f"staged COO check solve done ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    g_circ = CirculantGraphD1.create(eu, ev, la_d1, num_vertices=v)
    print(f"circulant: {len(g_circ.offsets)} families, vv8={g_circ.vv8}, "
          f"remainder={g_circ.num_rem} edges, supports_fused="
          f"{g_circ.supports_fused}", flush=True)
    t0 = time.perf_counter()
    x_circ = solve(g_circ, it_check, "auto")
    print(f"circulant fused check solve done ({time.perf_counter()-t0:.1f}s)",
          flush=True)
    err = np.max(np.abs(x_circ - x_ref)) / max(np.max(np.abs(x_ref)), 1e-12)
    print(f"rel max err circulant-vs-staged @ {it_check} iters: {err:.3e}",
          flush=True)
    if err > 1e-4:
        print("MISMATCH — fused circulant kernel disagrees", flush=True)
        sys.exit(1)

    t_circ = timed(g_circ, "auto")
    print(f"circulant fused: {t_circ*1e6:.1f} us/iter = "
          f"{len(eu)/t_circ/1e6:.0f}e6 edge-updates/s", flush=True)
    t_coo = timed(g_coo, "off", iters_time=2000)
    print(f"staged COO:      {t_coo*1e6:.1f} us/iter = "
          f"{len(eu)/t_coo/1e6:.0f}e6 edge-updates/s", flush=True)
    g_band = cp.BandedGraphD1.create(eu, ev, la_d1, num_vertices=v)
    x_band = solve(g_band, it_check, "auto")
    errb = np.max(np.abs(x_band - x_ref)) / max(np.max(np.abs(x_ref)), 1e-12)
    t_band = timed(g_band, "auto", iters_time=2000)
    print(f"banded fused:    {t_band*1e6:.1f} us/iter = "
          f"{len(eu)/t_band/1e6:.0f}e6 edge-updates/s (err {errb:.1e})",
          flush=True)
    print(f"circulant speedup vs COO: {t_coo/t_circ:.1f}x, "
          f"vs banded: {t_band/t_circ:.1f}x", flush=True)


if __name__ == "__main__":
    main()
