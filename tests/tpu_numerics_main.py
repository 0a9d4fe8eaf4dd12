"""On-chip numerics acceptance for the whole-solve kernels (standalone).

Run on the REAL TPU backend (not interpret — the MXU's bf16-truncating
default precision does not exist in interpreter mode, so interpreter-only
tests cannot catch kernel-precision regressions; that is how round 3's
objective regression shipped):

    PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=axon \
        python tests/tpu_numerics_main.py

Exits 0 when every check passes, 1 with a message otherwise.  The pytest
wrapper ``test_tpu_numerics.py`` subprocess-runs this when CP_TPU_TESTS=1.

Ground truths are produced by a CPU float64 subprocess (``--stage=cpu``,
spawned automatically with the chip claim skipped) because x64 cannot be
toggled inside the TPU process.  Checks, all vs those f64 truths:

1. the SMALL dense-selection whole-solve kernel route
   (``ops/solve_small.py`` via ``_reduce_solve_small``, incl. the in-jit
   f32 one-hot reduce + preconditioning) — end-to-end cut-pursuit
   objective parity at the reference gate (1e-3 relative), dense and
   premultiplied-Gram operator modes;
2. the BANDED whole-solve kernel (``ops/solve_fused.py`` incl. the
   split3 single-pass value dots and merged index dots) — fixed-iteration
   PFDR solve vs the staged f64 iteration, objective and iterate;
3. the staged (XLA while_loop) f32 path on TPU — guards the operator
   ADT's HIGHEST-precision products against regressions to MXU default.

Oracle contract: SURVEY §4(a) — objective at convergence within the
reference tolerance; the f64 staged/host-native solvers used as truth are
themselves oracle-verified by the CPU pytest suite.
"""
import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

TRUTH_PATH = "/tmp/cp_tpu_numerics_truth.npz"
FAILURES = []


def check(name, ok, detail):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name}: {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def build_problem(side=96, n_obs=64, seed=7, dtype=np.float32):
    v = side * side
    idx = np.arange(v).reshape(side, side)
    eu = np.concatenate([idx[:, :-1].ravel(),
                         idx[:-1, :].ravel()]).astype(np.int32)
    ev = np.concatenate([idx[:, 1:].ravel(),
                         idx[1:, :].ravel()]).astype(np.int32)
    r = np.random.default_rng(seed)
    a = (r.standard_normal((n_obs, v)) / np.sqrt(n_obs)).astype(dtype)
    x_true = np.zeros(v, dtype)
    for _ in range(3):
        i, j = r.integers(8, side - 14, 2)
        x_true[idx[i:i + 6, j:j + 6].ravel()] = r.uniform(0.5, 2.0)
    y = (a @ x_true + 0.01 * r.standard_normal(n_obs)).astype(dtype)
    la_d1 = np.full(eu.shape, 2e-3, dtype)
    la_l1 = np.full(v, 2e-3, dtype)
    return eu, ev, la_d1, a, y, la_l1


def objective_f64(x, a, y, eu, ev, la_d1, la_l1):
    x = np.asarray(x, np.float64)
    r = a.astype(np.float64) @ x - y.astype(np.float64)
    tv = np.sum(la_d1.astype(np.float64) * np.abs(x[eu] - x[ev]))
    l1 = np.sum(la_l1.astype(np.float64) * np.abs(x))
    return 0.5 * r @ r + tv + l1


PF = dict(rho=1.5, cond_min=1e-3, dif_rcd=0.0, dif_tol=1e-7, it_max=10_000)


def stage_cpu():
    """f64 ground truths, written to TRUTH_PATH (runs on CPU, x64)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from cp_pfdr_graph_d1_tpu import (DenseOp, GraphD1, PFDROptions,
                                      VertexProx, pfdr_quadratic_d1)
    from cp_pfdr_graph_d1_tpu.banded_graph import BandedGraphD1
    from cp_pfdr_graph_d1_tpu.config import CPOptions
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1

    eu, ev, la_d1, a, y, la_l1 = build_problem()
    graph = GraphD1.create(eu, ev, la_d1.astype(np.float64),
                           dtype=jnp.float64)
    opt64 = CPOptions(dif_tol=1e-4, it_max=12,
                      pfdr=PFDROptions(**PF, fused="off"), host_small="on")
    res64 = cp_quadratic_d1(DenseOp(jnp.asarray(a, jnp.float64)),
                            jnp.asarray(y, jnp.float64), graph,
                            la_l1=la_l1.astype(np.float64),
                            positivity=True, opt=opt64)
    f64 = objective_f64(res64.rx[res64.cv], a, y, eu, ev, la_d1, la_l1)

    eu2, ev2, la2, a2, y2, l12 = build_problem(side=64, n_obs=64, seed=3)
    v2 = 64 * 64
    bg64 = BandedGraphD1.create(eu2, ev2, la2.astype(np.float64),
                                num_vertices=v2, dtype=jnp.float64,
                                round_wd8=True)
    lip = float(np.linalg.eigvalsh((a2 @ a2.T).astype(np.float64))[-1])
    res_s = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a2, jnp.float64)), jnp.asarray(y2, jnp.float64),
        bg64, la_l1=jnp.asarray(l12, jnp.float64),
        vprox=VertexProx(kind="l1", positivity=True), lipsch=lip,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=400, fused="off"))
    x_s = np.asarray(res_s.x)[:v2]
    np.savez(TRUTH_PATH, f64=f64, x_s=x_s, lip=lip)
    print(f"cpu truths written: cp objective {f64:.6g}", flush=True)


def stage_tpu():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend != "tpu":
        print(f"ERROR: need the real TPU backend, got {backend!r} "
              "(run with JAX_PLATFORMS=axon)", file=sys.stderr)
        return 1

    from cp_pfdr_graph_d1_tpu import (DenseOp, GramOp, GraphD1, PFDROptions,
                                      VertexProx, pfdr_quadratic_d1)
    from cp_pfdr_graph_d1_tpu.banded_graph import BandedGraphD1
    from cp_pfdr_graph_d1_tpu.config import CPOptions
    from cp_pfdr_graph_d1_tpu.ops.solve_fused import supports_fused_solve
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1

    truth = np.load(TRUTH_PATH)
    f64 = float(truth["f64"])
    x_s = truth["x_s"]
    lip = float(truth["lip"])

    eu, ev, la_d1, a, y, la_l1 = build_problem()
    obj = lambda x: objective_f64(x, a, y, eu, ev, la_d1, la_l1)  # noqa
    graph = GraphD1.create(eu, ev, la_d1, dtype=jnp.float32)
    op = DenseOp(jnp.asarray(a))
    obs = jnp.asarray(y)

    # -- 1a. small-kernel route, dense mode (+ in-jit reduce/precondition) -
    opt_dev = CPOptions(dif_tol=1e-4, it_max=12, pfdr=PFDROptions(**PF),
                        host_small="off")
    res = cp_quadratic_d1(op, obs, graph, la_l1=la_l1, positivity=True,
                          opt=opt_dev)
    f = obj(res.rx[res.cv])
    check("cp-small-kernel-dense", f <= f64 * (1 + 1e-3),
          f"objective {f:.6g} vs f64 {f64:.6g}")

    # -- 1b. small-kernel route, premultiplied Gram mode -------------------
    gram = (a.T @ a).astype(np.float32)
    aty = (a.T @ y.astype(np.float64)).astype(np.float32)
    res_g = cp_quadratic_d1(GramOp(jnp.asarray(gram)), jnp.asarray(aty),
                            graph, la_l1=la_l1, positivity=True,
                            opt=opt_dev)
    fg = obj(res_g.rx[res_g.cv])
    check("cp-small-kernel-gram", fg <= f64 * (1 + 1e-3),
          f"objective {fg:.6g} vs f64 {f64:.6g}")

    # -- 2. banded whole-solve kernel, fixed iterations vs staged f64 ------
    eu2, ev2, la2, a2, y2, l12 = build_problem(side=64, n_obs=64, seed=3)
    v2 = 64 * 64
    bg = BandedGraphD1.create(eu2, ev2, la2, num_vertices=v2,
                              dtype=jnp.float32, round_wd8=True)
    pln = bg.plan
    assert supports_fused_solve(pln.num_tiles, pln.tile, pln.wd8, pln.v8,
                                128, "dense"), \
        "test geometry must be admitted by the banded whole-solve kernel"
    obj2 = lambda x: objective_f64(x, a2, y2, eu2, ev2, la2, l12)  # noqa
    fs = obj2(x_s)
    opt_f = PFDROptions(rho=1.5, dif_tol=0.0, it_max=400, fused="auto")
    res_f = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a2)), jnp.asarray(y2), bg,
        la_l1=jnp.asarray(l12), vprox=VertexProx(kind="l1", positivity=True),
        lipsch=lip, opt=opt_f)
    x_f = np.asarray(res_f.x)[:v2]
    ff = obj2(x_f)
    rel = abs(ff - fs) / max(abs(fs), 1e-12)
    xrel = (np.max(np.abs(x_f - x_s))
            / max(1e-12, float(np.max(np.abs(x_s)))))
    check("fused-banded-vs-staged-f64", rel < 1e-4 and xrel < 1e-2,
          f"objective rel {rel:.3g} (f32 {ff:.6g} / f64 {fs:.6g}), "
          f"iterate rel-inf {xrel:.3g} after 400 its")

    # -- 3. staged f32 TPU path (operator ADT HIGHEST products) ------------
    res_t = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a2)), jnp.asarray(y2), bg,
        la_l1=jnp.asarray(l12), vprox=VertexProx(kind="l1", positivity=True),
        lipsch=lip, opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=400,
                                    fused="off"))
    ft = obj2(np.asarray(res_t.x)[:v2])
    relt = abs(ft - fs) / max(abs(fs), 1e-12)
    check("staged-f32-tpu-vs-f64", relt < 1e-4,
          f"objective rel {relt:.3g} (f32 {ft:.6g} / f64 {fs:.6g})")

    if FAILURES:
        print(f"FAILED: {FAILURES}", file=sys.stderr)
        return 1
    print("all on-chip numerics checks passed")
    return 0


def main():
    if "--stage=cpu" in sys.argv:
        stage_cpu()
        return 0
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the chip claim (we hold it)
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--stage=cpu"], env=env)
    if r.returncode != 0:
        print("ERROR: cpu ground-truth stage failed", file=sys.stderr)
        return 1
    return stage_tpu()


if __name__ == "__main__":
    sys.exit(main())
