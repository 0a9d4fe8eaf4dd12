"""Benchmark: PFDR TV edge-updates/s on an EEG-scale fused LASSO problem.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

The problem mirrors the reference's EEG example
(``/root/reference/octave/example_EEG_CP.m``: dense A with N=91
observations, V ~ 19.6k cortical-mesh vertices, ~2V edges; the bundled
EEG.mat is absent from the mount so the problem is regenerated
synthetically with the same structure).  ``value`` is sustained TV edge
updates per second of our TPU solver; ``vs_baseline`` is the speedup
against the reference C++/OpenMP PFDR (compiled from the read-only mount,
run on this host's CPUs) on identical inputs.

Timing honesty: the TPU chip is reached through a tunnel with a ~30 ms
RPC round trip per dispatch, and ``block_until_ready`` does not reliably
cover remote completion — so the timed run (a) materializes the result to
host numpy and (b) runs ITERS_TIME iterations in ONE jitted while_loop so
the fixed RPC cost is <10% of the measurement.  Correctness is checked
separately at ITERS iterations against the reference solver.
"""
import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the 40k-iteration timing variant takes ~30 s to
# compile; cache it across driver runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V_SIDE = 140                 # V = 19600 ~ EEG cortical mesh size
N_OBS = 91                   # EEG electrode count
ITERS = 400                  # solution-check run (matches reference run)
ITERS_TIME = 40000           # timing run: device time >> tunnel RPC cost
LA_D1 = 2e-3
LA_L1 = 2e-3


def build_problem(dtype=np.float32):
    h = w = V_SIDE
    v = h * w
    idx = np.arange(v).reshape(h, w)
    eu = np.concatenate([idx[:, :-1].ravel(),
                         idx[:-1, :].ravel()]).astype(np.int32)
    ev = np.concatenate([idx[:, 1:].ravel(),
                         idx[1:, :].ravel()]).astype(np.int32)
    r = np.random.default_rng(7)
    a = (r.standard_normal((N_OBS, v)) / np.sqrt(N_OBS)).astype(dtype)
    x_true = np.zeros(v, dtype)
    for _ in range(3):  # a few active sources, constant patches
        i, j = r.integers(10, h - 16, 2)
        x_true[idx[i:i + 6, j:j + 6].ravel()] = r.uniform(0.5, 2.0)
    y = (a @ x_true + 0.01 * r.standard_normal(N_OBS)).astype(dtype)
    la_d1 = np.full(eu.shape, LA_D1, dtype)
    la_l1 = np.full(v, LA_L1, dtype)
    return eu, ev, la_d1, a, y, la_l1


def run_ours(eu, ev, la_d1, a, y, la_l1, lip):
    import jax
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import (DenseOp, GraphD1, PFDROptions,
                                      VertexProx, pfdr_quadratic_d1)
    from cp_pfdr_graph_d1_tpu.stencil import StencilGraphD1

    # the benchmark mesh is a grid: use the gather-free stencil container
    # (identical math; the reference solves the same COO edge set)
    graph = StencilGraphD1.create(
        (V_SIDE, V_SIDE), {(0, 1): LA_D1, (1, 0): LA_D1},
        dtype=jnp.float32)
    op = DenseOp(jnp.asarray(a))
    obs = jnp.asarray(y)
    l1 = jnp.asarray(la_l1)
    vprox = VertexProx(kind="l1", positivity=True)

    def solve(iters):
        opt = PFDROptions(rho=1.5, dif_tol=0.0, it_max=iters)
        res = pfdr_quadratic_d1(op, obs, graph, la_l1=l1, vprox=vprox,
                                lipsch=lip, opt=opt)
        return np.asarray(res.x)  # host materialization barrier

    x_check = solve(ITERS)  # also compiles the timing variant's sibling
    solve(ITERS_TIME)       # compile + warm the timing variant
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        solve(ITERS_TIME)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS_TIME, x_check


def run_reference(eu, ev, la_d1, a, y, la_l1, lip):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests import _oracle
    t0 = time.perf_counter()
    x, it, _, _ = _oracle.pfdr_ql1(
        y, a, eu, ev, la_d1, la_l1, 1, L=lip, rho=1.5, difTol=0.0,
        itMax=ITERS)
    return time.perf_counter() - t0, x, it


def main():
    eu, ev, la_d1, a, y, la_l1 = build_problem()
    lip = float(np.linalg.eigvalsh((a @ a.T).astype(np.float64))[-1])
    e = len(eu)

    t_iter, x_ours = run_ours(eu, ev, la_d1, a, y, la_l1, lip)
    updates_per_s = e / t_iter

    vs = 0.0
    try:
        t_ref, x_ref, it_ref = run_reference(eu, ev, la_d1, a, y, la_l1,
                                             lip)
        ref_updates = e * it_ref / t_ref
        vs = updates_per_s / ref_updates
        # sanity: same minimizer (float32 vs double solver, loose tol)
        err = np.max(np.abs(x_ours - x_ref)) / max(1e-12,
                                                   np.max(np.abs(x_ref)))
        if err > 0.05:
            print(f"WARNING: solver mismatch rel={err:.3g}",
                  file=sys.stderr)
    except Exception as ex:  # noqa: BLE001
        print(f"WARNING: reference baseline unavailable: {ex}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "PFDR TV edge-updates/s (EEG-scale fused LASSO)",
        "value": round(updates_per_s, 1),
        "unit": "edge-updates/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
