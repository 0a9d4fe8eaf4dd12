"""Unstructured-graph container with banded MXU gather/scatter.

:class:`BandedGraphD1` is the TPU-fast container for graphs with no stencil
structure (cortical meshes, point clouds): it reorders edges into banded
tiles at construction and routes every endpoint gather and edge->vertex
accumulation through the Pallas kernels of :mod:`.ops.banded` instead of
XLA's serial per-element gathers.  Math is identical to :class:`.GraphD1`
(enforced by ``tests/test_banded.py``); only the edge ORDER differs (an
internal permutation — the solvers are order-agnostic).

Window tightness (and thus speed) depends on the vertex numbering; apply
:func:`.ops.banded.rcm_order` to mesh problems first (the EEG-style
workloads are already near-banded by construction).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .graph import GraphD1
from .ops.banded import (BandedPlan, banded_gather, banded_scatter,
                         build_banded_plan)


@jax.tree_util.register_pytree_node_class
class BandedGraphD1(GraphD1):
    """d1 graph whose transfers run as banded one-hot MXU matmuls."""

    def __init__(self, eu, ev, la_d1, num_vertices: int, plan: BandedPlan,
                 mode: str = "auto", axis_name=None):
        # deliberately skip GraphD1.__init__: the [V, max_degree] incidence
        # table is unused here (the padded duplicate edges would blow up
        # max_degree) — transfers go through the banded kernels
        self.eu = eu
        self.ev = ev
        self.la_d1 = la_d1
        self.num_vertices = int(num_vertices)
        self.num_edges = int(eu.shape[0])
        self.plan = plan
        self.mode = mode
        self.axis_name = axis_name
        self.incidence = None

    @classmethod
    def create(cls, eu, ev, la_d1, num_vertices=None, dtype=jnp.float32,
               tile: int = 1024, mode: str = "auto",
               round_wd8: bool = False) -> "BandedGraphD1":
        """Builds the banded container from host edge arrays.

        Edges are re-sorted by min endpoint and padded to a tile multiple
        with weight-0 duplicates of the last edge (inert in every solver).

        Args:
          mode: "auto" — banded scatter kernel on TPU (measured 1.8-2.7x
            over the XLA scatter path), plain XLA gathers (which beat the
            banded gather: XLA's serial gather reads ~7 ns/element while
            the one-hot lane-selection burns ~E*128 VPU ops); "full" —
            both kernels; "interpret" — Pallas interpreter everywhere
            (tests); "jnp" — no kernels.
          round_wd8: bucket the window width to a power of two (bounds
            kernel recompiles when many graphs of varying geometry are
            solved, e.g. the cut-pursuit reduced problems).
        """
        eu = np.asarray(eu, np.int32)
        ev = np.asarray(ev, np.int32)
        la = np.asarray(la_d1, dtype)
        if la.ndim == 0:
            la = np.full(eu.shape, la, dtype=la.dtype)
        if num_vertices is None:
            num_vertices = int(max(eu.max(initial=-1),
                                   ev.max(initial=-1)) + 1)
        plan, perm, epad = build_banded_plan(eu, ev, num_vertices, tile,
                                             round_wd8=round_wd8)
        e = len(eu)
        eu_p = np.concatenate([eu[perm], np.full(epad - e, eu[perm][-1],
                                                 np.int32)])
        ev_p = np.concatenate([ev[perm], np.full(epad - e, ev[perm][-1],
                                                 np.int32)])
        la_p = np.concatenate([la[perm], np.zeros(epad - e, la.dtype)])
        dev_plan = BandedPlan(
            jnp.asarray(plan.starts8), jnp.asarray(plan.lur),
            jnp.asarray(plan.lul), jnp.asarray(plan.lvr),
            jnp.asarray(plan.lvl), plan.num_tiles, plan.tile, plan.wd8,
            plan.v8)
        return cls(jnp.asarray(eu_p), jnp.asarray(ev_p), jnp.asarray(la_p),
                   num_vertices, dev_plan, mode)

    # -- fused single-kernel PFDR iteration ----------------------------------

    @property
    def supports_fused(self):
        """True when the fused whole-iteration kernel applies (see
        :mod:`.ops.banded_fused`); distributed (axis_name) graphs and the
        pure-jnp mode fall back to the staged path."""
        from .ops.banded_fused import supports_fused_plan
        return (self.mode != "jnp" and self.axis_name is None
                and supports_fused_plan(self.plan.tile, self.plan.wd8,
                                        self.plan.v8))

    def fused_iteration(self, x, grad, pre, zu, zv, rho: float, vprox,
                        interpret: bool):
        """One fused edge+vertex PFDR step (one ``pallas_call`` over the
        banded edge tiles; see :func:`.ops.banded_fused
        .fused_banded_iteration`)."""
        from .ops.banded import _to_dense_v
        from .ops.banded_fused import fused_banded_iteration
        p = self.plan
        t8 = p.tile // 128
        eshape = (p.num_tiles * t8, 128)

        def re(a):
            return a.reshape(eshape)

        def rv(a):
            return _to_dense_v(jnp.broadcast_to(a, (self.num_vertices,)), p.v8)

        xn, zun, zvn, num, den = fused_banded_iteration(
            p.starts8, p.lur, p.lul, p.lvr, p.lvl,
            re(zu), re(zv), re(pre.wu), re(pre.wv),
            re(pre.w_d1u), re(pre.w_d1v), re(pre.th_d1),
            rv(x), rv(grad), rv(pre.ga), rv(pre.th_l1),
            nt=p.num_tiles, tile=p.tile, wd8=p.wd8, v8=p.v8,
            nv=self.num_vertices, rho=float(rho), vkind=vprox.kind,
            positivity=vprox.positivity, lo=float(vprox.lo),
            hi=float(vprox.hi), interpret=interpret)
        e = self.num_edges
        return (xn.reshape(-1)[:self.num_vertices],
                zun.reshape(e), zvn.reshape(e), num, den)

    # -- kernel dispatch -----------------------------------------------------

    def _use_kernel(self, op: str):
        if self.mode == "interpret":
            return True, True
        if self.mode == "jnp":
            return False, False
        on_tpu = jax.default_backend() == "tpu"
        if self.mode == "full":
            return on_tpu, False
        # auto: only the scatter kernel wins over XLA (see class docstring)
        return on_tpu and op == "scatter", False

    def gather_endpoints(self, x):
        use, interp = self._use_kernel("gather")
        if not use or (x.dtype != jnp.float32 and not interp):
            return x[self.eu], x[self.ev]
        if x.ndim == 1:
            us, vs = banded_gather(self.plan, [x], interpret=interp)
            return us[0], vs[0]
        cols = [x[:, k] for k in range(x.shape[1])]
        us, vs = banded_gather(self.plan, cols, interpret=interp)
        return jnp.stack(us, axis=-1), jnp.stack(vs, axis=-1)

    def edge_to_vertex_sum(self, vals_u, vals_v):
        use, interp = self._use_kernel("scatter")
        if not use or (vals_u.dtype != jnp.float32 and not interp):
            return self._jnp_edge_to_vertex(vals_u, vals_v)
        if vals_u.ndim == 1:
            out = banded_scatter(self.plan, vals_u, vals_v,
                                 self.num_vertices, interpret=interp)
        else:
            out = jnp.stack(
                [banded_scatter(self.plan, vals_u[:, k], vals_v[:, k],
                                self.num_vertices, interpret=interp)
                 for k in range(vals_u.shape[1])], axis=-1)
        if self.axis_name is not None:
            out = jax.lax.psum(out, self.axis_name)
        return out

    def edge_to_vertex_min(self, vals_u, vals_v, init):
        """Scatter-min fallback (no incidence table here; the padded
        duplicate edges are weight-0, so callers' masks must map them to
        ``init``)."""
        out = jnp.full((self.num_vertices,) + vals_u.shape[1:], init,
                       vals_u.dtype)
        out = out.at[self.eu].min(vals_u).at[self.ev].min(vals_v)
        if self.axis_name is not None:
            out = jax.lax.pmin(out, self.axis_name)
        return out

    def _jnp_edge_to_vertex(self, vals_u, vals_v):
        """Segment-sum fallback (CPU float64 path; no incidence table)."""
        out = jnp.zeros((self.num_vertices,) + vals_u.shape[1:],
                        vals_u.dtype)
        out = out.at[self.eu].add(vals_u).at[self.ev].add(vals_v)
        if self.axis_name is not None:
            out = jax.lax.psum(out, self.axis_name)
        return out

    # -- pytree protocol -----------------------------------------------------

    def tree_flatten(self):
        children = (self.eu, self.ev, self.la_d1, self.plan.starts8,
                    self.plan.lur, self.plan.lul, self.plan.lvr,
                    self.plan.lvl)
        aux = (self.num_vertices, self.plan.num_tiles, self.plan.tile,
               self.plan.wd8, self.plan.v8, self.mode, self.axis_name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        eu, ev, la_d1, starts8, lur, lul, lvr, lvl = children
        (num_vertices, nt, tile, wd8, v8, mode, axis_name) = aux
        plan = BandedPlan(starts8, lur, lul, lvr, lvl, nt, tile, wd8, v8)
        return cls(eu, ev, la_d1, num_vertices, plan, mode, axis_name)
