"""Mesh helpers.

The reference's only parallelism is intra-process OpenMP
(``compute_num_threads``, e.g. ``PFDR_graph_quadratic_d1_l1.cpp:31-41``).
The TPU-native equivalent is a ``jax.sharding.Mesh`` over real or virtual
devices; collectives ride ICI within a slice.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devs = jax.devices()
    if num_devices is None:
        num_devices = len(devs)
    if num_devices > len(devs):
        raise ValueError(f"requested {num_devices} devices, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:num_devices]), (axis,))
