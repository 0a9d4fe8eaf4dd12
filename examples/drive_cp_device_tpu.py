"""TPU drive: fully device-resident cut-pursuit on a >=1M-edge graph.

Runs cp_quadratic_d1 with cut="device" (device cuts, components,
contraction, merge — per-iteration host traffic is five scalars) on a
724x724 grid TV denoising problem (V=524k, E=1.047M), and compares wall
time and solution against the host-combinatorics path on the same
problem.  Denoising (identity operator) keeps the problem well-posed at
this scale so both loops converge to the same piecewise-constant
minimizer.

The graph is built as a :class:`~cp_pfdr_graph_d1_tpu.stencil
.StencilGraphD1`: every device stage (PDHG min-cut, connected
components, contraction keys, merge) is container-aware, so the per-PDHG
-iteration endpoint transfers run as field rolls instead of per-element
gathers — the difference between ~14 ms and ~microseconds per inner
iteration at E=1M.

Run: PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=axon \
     python examples/drive_cp_device_tpu.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import cp_pfdr_graph_d1_tpu as cp
    from cp_pfdr_graph_d1_tpu.solvers.cut_pursuit import cp_quadratic_d1

    print("backend:", jax.default_backend(), flush=True)
    h = w = 724
    v = h * w
    idx = np.arange(v).reshape(h, w)
    eu = np.concatenate([idx[:, :-1].ravel(),
                         idx[:-1, :].ravel()]).astype(np.int32)
    ev = np.concatenate([idx[:, 1:].ravel(),
                         idx[1:, :].ravel()]).astype(np.int32)
    print(f"V={v} E={len(eu)}", flush=True)
    r = np.random.default_rng(0)
    x_true = np.zeros((h, w), np.float32)
    x_true[100:300, 100:300] = 1.5
    x_true[400:600, 350:650] = -1.0
    y = (x_true.ravel() + 0.1 * r.standard_normal(v)).astype(np.float32)
    la_d1 = np.full(len(eu), 0.15, np.float32)
    la_l1 = np.full(v, 0.01, np.float32)
    from cp_pfdr_graph_d1_tpu.stencil import StencilGraphD1
    graph = StencilGraphD1.create((h, w), {(0, 1): 0.15, (1, 0): 0.15})
    op = cp.IdentityOp()
    obs = jnp.asarray(y)
    pfdr = cp.PFDROptions(rho=1.5, dif_tol=1e-7, it_max=2000)

    def run(cut, label):
        t0 = time.perf_counter()
        res = cp_quadratic_d1(
            op, obs, graph, la_l1=la_l1,
            opt=cp.CPOptions(dif_tol=1e-4, it_max=4, pfdr=pfdr, cut=cut,
                             cut_tol=1e-5, host_small="off", verbose=1))
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s, it={res.it}, rV={len(res.rx)}",
              flush=True)
        return res, dt

    dev, t_dev_cold = run("device", "device loop (cold)")
    dev, t_dev = run("device", "device loop (warm)")
    host, t_host = run("host", "host loop")
    x_d = dev.rx[dev.cv]
    x_h = host.rx[host.cv]
    err = np.max(np.abs(x_d - x_h)) / max(1e-12, np.max(np.abs(x_h)))
    print(f"rel max err device-vs-host: {err:.3g}", flush=True)
    print(f"speedup device/host (warm): {t_host / t_dev:.2f}x", flush=True)


if __name__ == "__main__":
    main()
