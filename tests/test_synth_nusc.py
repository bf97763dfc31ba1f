"""The oracle-content nuScenes-format scene writer must produce a directory
the full loader ingests coherently (geometry, depth scale, tracks, LiDAR)."""

import numpy as np
import pytest

from nerf_lidar_tpu.data import nuscenes, synth_nusc


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_nusc"))
    synth_nusc.write_scene_dir(root, num_frames=4, sensor_num=2,
                               height=40, width=64,
                               lidar_points_per_beam=64)
    return root


def test_loader_ingests_written_scene(scene_root):
    scene = nuscenes.load_scene(scene_root, sensor_num=2)
    d = scene.data
    assert d.images.shape == (8, 40, 64, 3)
    assert np.isfinite(d.images).all() and d.images.max() <= 1.0
    # Depth: loader divides PNG by 256 and multiplies by the PCA scale, so
    # loaded depth / scale must equal the oracle's metric depth.
    metric = d.depths / scene.frame.scale
    assert 1.0 < metric[metric > 0].max() < 256.0
    # Semantics carry the oracle classes incl. sky (10).
    assert (d.semantics == 10).any()
    # The dynamic sphere produced a track covering the frame window.
    assert scene.tracks is not None and scene.tracks.shape[0] == 1
    assert scene.track_classes == ["vehicle.car"]
    assert (scene.tracks[0, :, 4:7] > 0).any()
    # Moving-object mask excluded some pixels.
    assert d.masks.sum() > 0


def test_written_scene_geometry_consistency(scene_root):
    # Re-rendering GT depth through the LOADED poses must match the stored
    # depth images: the poses_bounds round-trip is geometrically exact.
    from nerf_lidar_tpu.data import camera as camlib
    scene = nuscenes.load_scene(scene_root, sensor_num=2,
                                load_objects=False)
    d = scene.data
    i = 0
    x, y = np.meshgrid(np.arange(64), np.arange(40))
    rays = camlib.pixels_to_rays(x.reshape(-1), y.reshape(-1),
                                 d.pixtocam[i], d.camtoworlds[i])
    # Trace the ORACLE in world coordinates: PCA rotations are orthonormal,
    # so z-normalized pixel directions keep their parameterization and the
    # world-frame t equals the stored metric z-depth; the loader multiplies
    # by frame.scale to get scene units.
    f = scene.frame
    o_w = f.scene_to_world_points(rays["origins"])
    dirs_w = f.scene_to_world_dirs(rays["directions"])
    static = synth_nusc._corridor_scene(0)
    scene_t = synth_nusc._scene_at(static, 0.0, 1.3)
    gt = scene_t.trace(o_w, dirs_w)
    got = d.depths[i].reshape(-1)
    want = gt["depth"] * f.scale
    mask = gt["hit"] & (gt["depth"] < 80) & (got > 0)
    err = np.abs(got[mask] - want[mask])
    assert np.median(err) < 0.02 * np.median(want[mask])


def test_lidar_rays_hit_oracle_surfaces(scene_root):
    scene = nuscenes.load_scene(scene_root, sensor_num=2)
    d = scene.data
    assert d.lidar_origins is not None and d.lidar_origins.shape[0] > 100
    # Replaying the loaded rays through the oracle reproduces the depths.
    f = scene.frame
    o_w = f.scene_to_world_points(d.lidar_origins)
    dirs_w = d.lidar_dirs  # unit in scene coords == rotated unit in world
    static = synth_nusc._corridor_scene(0)
    # Sweep 0 is at t=0.
    scene_t = synth_nusc._scene_at(static, 0.0, 1.3)
    n = min(500, o_w.shape[0])
    gt = scene_t.trace(o_w[:n], f.scene_to_world_dirs(dirs_w[:n]))
    depth_w = d.lidar_depth[:n] / f.scale
    mask = gt["hit"]
    err = np.abs(gt["depth"][mask] - depth_w[mask])
    assert np.median(err) < 0.05 * np.median(depth_w[mask])
