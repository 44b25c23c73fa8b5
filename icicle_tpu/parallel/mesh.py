"""Device-mesh construction — the TPU replacement for ICICLE's one-thread-per-
device multi-device model (reference docs/start/architecture/multi-device.md:
47-66, thread-local device_api.h:185-187). Here multi-device = SPMD over a
jax.sharding.Mesh with ICI collectives; there is no per-thread device state.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_vec(mesh: Mesh, arr, axis_in_array: int = 0):
    """Place `arr` sharded along `axis_in_array` over the mesh's first axis."""
    spec = [None] * arr.ndim
    spec[axis_in_array] = mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
