"""Device-mesh helpers.

The reference is strictly single-process (SURVEY.md §2: no multiprocessing /
threading / IPC anywhere); scale-out here is jax.sharding over a TPU slice:
batch ('data') and frame-block ('time') axes, with XLA inserting ICI
collectives as needed. A virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) stands in for multi-chip
hardware in tests and dry runs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on one 'data' axis. shape=(d, t) with
    axis_names=('data', 'time') splits them 2-D.
    """
    devs = jax.devices()
    if shape is None:
        shape = (len(devs),)
    n = int(np.prod(shape))
    if n > len(devs):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devs)}")
    if n == len(devs):
        # topology-aware placement on real hardware: mesh_utils arranges
        # the grid so each mesh axis rides contiguous ICI links — a naive
        # reshape can put non-adjacent chips on one axis and route
        # collectives over slow links (results identical, throughput not)
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh(shape, devices=devs)
        except Exception:  # pragma: no cover - virtual/odd topologies
            arr = np.array(devs).reshape(shape)
    else:
        arr = np.array(devs[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: str = "data"
                   ) -> NamedSharding:
    """Shard the leading dimension over `batch_axis`, replicate the rest."""
    return NamedSharding(mesh, P(batch_axis, *([None] * (ndim - 1))))
