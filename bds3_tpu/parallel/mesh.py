"""Device-mesh construction and sharding helpers.

The receiver's parallel axes (SURVEY.md section 2.5): the satellite/
channel axis is embarrassingly parallel (the domain's "data parallel"),
the Doppler-bin axis shards the acquisition search, and the time axis
shards long captures (with overlap-save halos for acquisition and
sequential state handoff for tracking).  All are expressed as named mesh
axes + NamedSharding so XLA inserts the collectives.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, ...] = ("channel",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Build a mesh over the first n_devices devices.

    Default: 1-D "channel" mesh (satellite fan-out).  For 2-D pass e.g.
    axis_names=("time", "channel"), shape=(2, 4).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def channel_sharding(mesh: Mesh, axis: str = "channel") -> NamedSharding:
    """Shard leading (channel/PRN) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
