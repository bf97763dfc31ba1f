"""Mesh + sharding construction for data-parallel training/rendering."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def maybe_data_mesh(min_devices: int = 2,
                    shape=(-1,), axes=("data",)) -> Optional[Mesh]:
    """A mesh when more than one device is visible, else None (the
    single-chip jit path needs no sharding annotations).

    shape/axes come from Config.mesh_shape/mesh_axes: the default (-1,)
    is the 1-D data mesh; a multi-axis shape (e.g. (-1, 2) with
    ("data", "model")) reshapes the device array for future
    model/sequence-sharded variants — batch sharding rides the axis named
    "data" either way.
    """
    devices = jax.devices()
    if len(devices) < min_devices:
        return None
    if tuple(shape) == (-1,):
        return data_mesh(devices, axes[0] if axes else "data")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray/batch) axis of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
