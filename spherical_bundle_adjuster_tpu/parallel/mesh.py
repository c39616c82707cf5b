"""Device mesh helpers for the distributed solvers.

The reference has no distributed layer (SURVEY.md §2: OpenMP only); the
TPU-native communication backend is JAX collectives over a
`jax.sharding.Mesh` — `psum` for camera-system reduction, sharded
landmark/pair axes for data parallelism (ICI within a slice, DCN across).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n_devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_leading(mesh: Mesh, axis_name: str = "data"):
    """NamedSharding that splits the leading array axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
