import jax
import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu.parallel import (batch_sharding, data_mesh,
                                     maybe_data_mesh, replicated_sharding)


def test_data_mesh_and_shardings():
    mesh = data_mesh()
    assert mesh.size == 8  # virtual CPU mesh from conftest
    assert maybe_data_mesh() is not None
    bs = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    x = jnp.arange(64.0).reshape(64, 1)
    xs = jax.device_put(x, bs)
    xr = jax.device_put(x, rep)
    # Batch-sharded: each device holds 1/8 of the rows; replicated: all.
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (8, 1)
    assert xr.addressable_shards[0].data.shape == (64, 1)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))
