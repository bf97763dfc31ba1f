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


def maybe_data_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """A data mesh when more than one device is visible, else None (the
    single-chip jit path needs no sharding annotations)."""
    devices = jax.devices()
    return data_mesh(devices) if len(devices) >= min_devices else None


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray/batch) axis of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
