"""Mesh construction and sharding helpers.

The framework's parallel axis is the CPI-frame axis (the reference's dask
chunk axis, main.py:56-194): frames are data-parallel apart from the 50% CPI
overlap, which becomes a neighbour halo exchange (see halo.py). A 1-D
``('frames',)`` mesh is therefore the default; multi-host pods flatten
(hosts × chips) onto the same axis so halos ride ICI within a host slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "frames") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def local_mesh(axis_name: str = "frames") -> Mesh:
    """A 1-D mesh over this process's local devices only.

    The multi-host runtime (parallel/distributed.py) runs one independent
    local-mesh program per host — host-boundary halos come off disk, so no
    cross-host mesh is needed on the hot path.
    """
    return Mesh(np.asarray(jax.local_devices()), (axis_name,))


def frame_sharding(mesh: Mesh, axis_name: str = "frames") -> NamedSharding:
    """NamedSharding that splits the leading (frame) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
