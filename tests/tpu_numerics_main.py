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
   ADT's HIGHEST-precision products against regressions to MXU default;
4. the STENCIL fused iteration kernel (``ops/stencil_fused.py``) —
   fixed-iteration PFDR vs the staged f64 truth;
5. the STENCIL SIMPLEX fused kernel (``ops/stencil_fused_simplex.py``,
   K = 4 incl. the sort-free Michelot projection) vs staged f64;
6. the CIRCULANT fused kernel (``ops/circulant_fused.py``, split3
   one-hot remainder machinery) on the same edges vs the same truth,
   and (6b) the K-axis circulant SIMPLEX kernel
   (``ops/circulant_fused_simplex.py``) on grid+chord edges vs its
   staged f64 twin;
7. the HALO RDMA kernel (``ops/halo_fused.py``) as a 1-shard
   self-copy ring vs the staged path on chip;
8. the fused PDHG MIN-CUT and COMPONENTS kernels
   (``ops/mincut_fused.py`` / ``ops/components_fused.py``) vs their
   staged twins on chip (cut objective within the shared certificate,
   labels bit-equal);
9. the CHAINED outer loop (``solvers/cut_pursuit_chain.py``, incl. the
   device-built banded plan) — end-to-end objective at the same gate.

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

    # stencil-container truth on the 96x96 problem (same edges as the
    # GraphD1 above; the container changes the execution path, not the
    # math)
    from cp_pfdr_graph_d1_tpu.stencil import StencilGraphD1
    sg64 = StencilGraphD1.create((96, 96), {(0, 1): 2e-3, (1, 0): 2e-3},
                                 dtype=jnp.float64)
    lip96 = float(np.linalg.eigvalsh((a @ a.T).astype(np.float64))[-1])
    res_sg = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a, jnp.float64)), jnp.asarray(y, jnp.float64),
        sg64, la_l1=jnp.asarray(la_l1, jnp.float64),
        vprox=VertexProx(kind="l1", positivity=True), lipsch=lip96,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=400, fused="off"))
    x_sg = np.asarray(res_sg.x)

    # multi-label truth, K = 4 on the same grid
    from cp_pfdr_graph_d1_tpu.solvers.pfdr_simplex import \
        pfdr_loss_d1_simplex
    rq = np.random.default_rng(11)
    q4 = rq.dirichlet(np.full(4, 0.7), size=96 * 96).astype(np.float64)
    res_sx = pfdr_loss_d1_simplex(
        sg64, jnp.asarray(q4), al=1.0,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=300, fused="off"))
    p_sx = np.asarray(res_sx.p)

    # multi-label circulant truth: same grid plus random chords so the
    # K-axis kernel's remainder one-hot tiles are exercised on the MXU
    from cp_pfdr_graph_d1_tpu.graph import GraphD1 as _G
    rc = np.random.default_rng(13)
    ceu = rc.integers(0, 96 * 96, 600).astype(np.int32)
    cev = ((ceu + rc.integers(1, 4000, 600)) % (96 * 96)).astype(np.int32)
    keepc = ceu != cev
    eu_c = np.concatenate([eu, ceu[keepc]])
    ev_c = np.concatenate([ev, cev[keepc]])
    la_c = np.concatenate([la_d1, np.full(int(keepc.sum()), 2e-3,
                                          la_d1.dtype)])
    g_c64 = _G.create(eu_c, ev_c, la_c.astype(np.float64),
                      num_vertices=96 * 96, dtype=jnp.float64)
    res_cx = pfdr_loss_d1_simplex(
        g_c64, jnp.asarray(q4), al=1.0,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=300, fused="off"))
    p_cx = np.asarray(res_cx.p)

    np.savez(TRUTH_PATH, f64=f64, x_s=x_s, lip=lip, x_sg=x_sg,
             lip96=lip96, q4=q4, p_sx=p_sx, eu_c=eu_c, ev_c=ev_c,
             la_c=la_c, p_cx=p_cx)
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

    # -- 4. stencil fused iteration kernel vs staged f64 -------------------
    from cp_pfdr_graph_d1_tpu.stencil import StencilGraphD1
    x_sg = truth["x_sg"]
    lip96 = float(truth["lip96"])
    sg = StencilGraphD1.create((96, 96), {(0, 1): 2e-3, (1, 0): 2e-3},
                               dtype=jnp.float32)
    res_st = pfdr_quadratic_d1(
        op, obs, sg, la_l1=jnp.asarray(la_l1),
        vprox=VertexProx(kind="l1", positivity=True), lipsch=lip96,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=400, fused="auto"))
    fs96 = obj(x_sg)
    fst = obj(np.asarray(res_st.x))
    rel = abs(fst - fs96) / max(abs(fs96), 1e-12)
    check("fused-stencil-vs-staged-f64", rel < 1e-4,
          f"objective rel {rel:.3g} (f32 {fst:.6g} / f64 {fs96:.6g})")

    # -- 5. stencil simplex fused kernel (K = 4) vs staged f64 -------------
    from cp_pfdr_graph_d1_tpu.solvers.pfdr_simplex import \
        pfdr_loss_d1_simplex
    q4 = truth["q4"].astype(np.float32)
    p_sx = truth["p_sx"]
    res_sx = pfdr_loss_d1_simplex(
        sg, jnp.asarray(q4), al=1.0,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=300, fused="auto"))
    p_f = np.asarray(res_sx.p)
    perr = float(np.max(np.abs(p_f - p_sx)))
    check("fused-simplex-vs-staged-f64", perr < 5e-4,
          f"iterate max-abs {perr:.3g} after 300 its")

    # -- 6. circulant fused kernel (split3 path) on the same edges ---------
    from cp_pfdr_graph_d1_tpu.circulant import CirculantGraphD1
    cg = CirculantGraphD1.create(eu, ev, la_d1, num_vertices=96 * 96,
                                 dtype=jnp.float32)
    res_c = pfdr_quadratic_d1(
        op, obs, cg, la_l1=jnp.asarray(la_l1),
        vprox=VertexProx(kind="l1", positivity=True), lipsch=lip96,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=400, fused="auto"))
    fc = obj(np.asarray(res_c.x)[:96 * 96])
    relc = abs(fc - fs96) / max(abs(fs96), 1e-12)
    check("fused-circulant-vs-staged-f64", relc < 1e-4,
          f"objective rel {relc:.3g} (f32 {fc:.6g} / f64 {fs96:.6g})")

    # -- 6b. K-axis circulant SIMPLEX kernel (r05) vs staged f64 -----------
    # grid + chords: shift families AND remainder one-hot tiles on the MXU
    cgx = CirculantGraphD1.create(truth["eu_c"], truth["ev_c"],
                                  truth["la_c"].astype(np.float32),
                                  num_vertices=96 * 96, dtype=jnp.float32)
    assert cgx.num_rem > 0 and cgx.supports_fused_simplex(4)
    res_cs = pfdr_loss_d1_simplex(
        cgx, jnp.asarray(q4), al=1.0,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=300, fused="auto"))
    perr_c = float(np.max(np.abs(np.asarray(res_cs.p) - truth["p_cx"])))
    check("fused-circulant-simplex-vs-staged-f64", perr_c < 5e-4,
          f"iterate max-abs {perr_c:.3g} after 300 its")

    # -- 7. halo RDMA kernel as a 1-shard self-copy ring -------------------
    # (its lane-roll slices need the field width 128-aligned; separate
    # 64x128 problem, compared against the staged f32 path — which check
    # 3/4 tie to the f64 truth)
    from jax.sharding import Mesh
    from cp_pfdr_graph_d1_tpu.parallel import (pfdr_quadratic_d1_halo,
                                               shard_stencil_problem)
    hh, hw, hn = 64, 128, 32
    rh = np.random.default_rng(9)
    a_h = (rh.standard_normal((hn, hh * hw)) / np.sqrt(hn)
           ).astype(np.float32)
    y_h = rh.standard_normal(hn).astype(np.float32)
    sgh = StencilGraphD1.create((hh, hw), {(0, 1): 0.02, (1, 0): 0.02},
                                dtype=jnp.float32)
    la_l1h = np.full(hh * hw, 0.02, np.float32)
    liph = float(np.linalg.eigvalsh((a_h @ a_h.T).astype(np.float64))[-1])
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    prob = shard_stencil_problem(a_h, y_h, sgh, 1)
    res_h = pfdr_quadratic_d1_halo(
        prob, mesh1, la_l1=la_l1h,
        vprox=VertexProx(kind="l1", positivity=True), lipsch=liph,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=120, fused="on"))
    res_hr = pfdr_quadratic_d1(
        DenseOp(jnp.asarray(a_h)), jnp.asarray(y_h), sgh,
        la_l1=jnp.asarray(la_l1h),
        vprox=VertexProx(kind="l1", positivity=True), lipsch=liph,
        opt=PFDROptions(rho=1.5, dif_tol=0.0, it_max=120, fused="off"))
    herr = float(np.max(np.abs(np.asarray(res_h.x)
                               - np.asarray(res_hr.x))))
    check("halo-rdma-1ring-vs-staged", herr < 3e-4,
          f"iterate max-abs {herr:.3g} after 120 its")

    # -- 8. fused min-cut / components kernels vs staged twins -------------
    from cp_pfdr_graph_d1_tpu.maxflow.device import cut_value
    from cp_pfdr_graph_d1_tpu.ops.components_fused import \
        device_components_stencil_fused
    from cp_pfdr_graph_d1_tpu.ops.mincut_fused import \
        device_cut_stencil_fused
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit_device import (
        _device_components, _device_cut)
    sgc = StencilGraphD1.create((96, 96), {(0, 1): 0.3, (1, 0): 0.3},
                                dtype=jnp.float32)
    rr = np.random.default_rng(5)
    act = jnp.asarray(rr.random(sgc.num_edges) < 0.45)
    cc = jnp.asarray(rr.standard_normal(sgc.num_vertices)
                     .astype(np.float32))
    tol = jnp.asarray(1e-6, jnp.float32)
    _, g1, b1, xc1, _ = _device_cut(sgc, act, cc, tol, 100_000, 250)
    _, g2, b2, xc2, _ = device_cut_stencil_fused(sgc, act, cc, tol,
                                                 100_000, 250)
    eu_c, ev_c = np.asarray(sgc.eu), np.asarray(sgc.ev)
    w_np = np.where(np.asarray(act), 0.0, np.asarray(sgc.la_d1))
    cb = np.asarray(jnp.clip(cc, -b1, b1), np.float64)
    v1 = cut_value(eu_c, ev_c, w_np, cb, np.asarray(xc1) > 0.5)
    v2 = cut_value(eu_c, ev_c, w_np, cb, np.asarray(xc2) > 0.5)
    ok_cut = (abs(v1 - v2) <= 2 * 1e-6 * float(b1) + 1e-3
              and float(g2) <= 1e-6 * float(b2))
    check("fused-mincut-vs-staged", ok_cut,
          f"cut objectives {v1:.6g} / {v2:.6g}, gap {float(g2):.3g}")
    cvs, ncs, _ = _device_components(sgc, act)
    cvf, ncf, _ = device_components_stencil_fused(sgc, act)
    ok_comp = (int(ncs) == int(ncf)
               and bool(np.array_equal(np.asarray(cvs), np.asarray(cvf))))
    check("fused-components-vs-staged", ok_comp,
          f"{int(ncs)} vs {int(ncf)} components, labels "
          f"{'equal' if ok_comp else 'DIFFER'}")

    # -- 9. chained outer loop end-to-end ----------------------------------
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import \
        cp_quadratic_d1 as _cp
    opt_chain = CPOptions(dif_tol=1e-4, it_max=12, pfdr=PFDROptions(**PF),
                          cut="device", chain="auto", cut_tol=1e-6,
                          cut_it_max=100_000)
    res_ch = _cp(op, obs, sg, la_l1=la_l1, positivity=True, opt=opt_chain)
    fch = obj(np.asarray(res_ch.rx)[np.asarray(res_ch.cv)])
    check("cp-chained-loop", fch <= f64 * (1 + 1e-3),
          f"objective {fch:.6g} vs f64 {f64:.6g}")

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
