"""Tanks-and-Temples / DTU loaders (data/tat_dtu.py) against synthetic
fixtures in the exact on-disk layouts the reference consumes
(waymo_zipnerf_dataset.py:817-1010)."""

import os

import numpy as np
import pytest

from nerf_lidar_tpu.data import camera as camlib
from nerf_lidar_tpu.data import tat_dtu


def _write_png(path, h=6, w=8, seed=0):
    import imageio.v2 as imageio
    rng = np.random.RandomState(seed)
    imageio.imwrite(path, rng.randint(0, 255, (h, w, 3), np.uint8))


def _ring_poses(n, radius=4.0):
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = np.array([radius * np.cos(th), radius * np.sin(th), 1.0])
        poses.append(camlib.lookat_pose(eye, np.zeros(3)))
    return np.stack(poses)  # [n, 3, 4] OpenGL c2w


def _rotation(seed):
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_decompose_projection_roundtrip():
    rng = np.random.RandomState(3)
    for seed in range(5):
        k = np.array([[500.0, 0.3, 320.0],
                      [0.0, 510.0, 240.0],
                      [0.0, 0.0, 1.0]])
        k[0, 0] += seed * 10
        r = _rotation(seed)
        c = rng.randn(3) * 2
        p = k @ np.concatenate([r, (-r @ c)[:, None]], axis=1)
        p = p * (-1.3 if seed % 2 else 2.0)  # arbitrary projective scale
        k2, r2, c2 = tat_dtu.decompose_projection(p)
        np.testing.assert_allclose(k2, k / k[2, 2], atol=1e-8)
        np.testing.assert_allclose(r2, r, atol=1e-8)
        np.testing.assert_allclose(c2, c, atol=1e-7)


def test_tat_nerfpp_loader(tmp_path):
    root = str(tmp_path)
    poses = _ring_poses(3)
    intrin = np.eye(4)
    intrin[0, 0] = intrin[1, 1] = 100.0
    intrin[0, 2], intrin[1, 2] = 4.0, 3.0
    for sp, n in (("train", 3), ("test", 2)):
        for d in ("rgb", "pose", "intrinsics"):
            os.makedirs(os.path.join(root, sp, d))
        for i in range(n):
            _write_png(os.path.join(root, sp, "rgb", f"{i:05d}.png"), seed=i)
            # On-disk poses are OpenCV; the loader must flip Y/Z to OpenGL.
            pose_cv = camlib.pad_poses(poses[i][None])[0] @ np.diag(
                [1.0, -1.0, -1.0, 1.0])
            np.savetxt(os.path.join(root, sp, "pose", f"{i:05d}.txt"),
                       pose_cv)
            np.savetxt(os.path.join(root, sp, "intrinsics",
                                    f"{i:05d}.txt"), intrin)

    scene = tat_dtu.load_tat_nerfpp(root, split="train")
    assert scene.data.images.shape == (3, 6, 8, 3)
    np.testing.assert_allclose(scene.data.camtoworlds, poses[:3], atol=1e-6)
    # focal from intrinsics[0,0], principal point at the image center.
    np.testing.assert_allclose(
        scene.data.pixtocam,
        np.linalg.inv(camlib.intrinsic_matrix(100.0, 100.0, 4.0, 3.0)),
        atol=1e-6)
    test_scene = tat_dtu.load_tat_nerfpp(root, split="test")
    assert test_scene.data.images.shape[0] == 2


def test_tat_fvs_loader(tmp_path):
    root = str(tmp_path)
    n = 10
    base = os.path.join(root, "dense", "ibr3d_pw_0.25")
    os.makedirs(base)
    c2w_gl = _ring_poses(n)
    # FVS ships COLMAP world-to-cam of the OpenCV-frame camera.
    w2c = np.linalg.inv(camlib.pad_poses(c2w_gl @ np.diag(
        [1.0, -1.0, -1.0, 1.0])))
    np.save(os.path.join(base, "Rs.npy"), w2c[:, :3, :3])
    np.save(os.path.join(base, "ts.npy"), w2c[:, :3, 3])
    ks = np.tile(camlib.intrinsic_matrix(80.0, 80.0, 4.0, 3.0), (n, 1, 1))
    np.save(os.path.join(base, "Ks.npy"), ks)
    for i in range(n):
        _write_png(os.path.join(base, f"im_{i:05d}.png"), seed=i)

    scene = tat_dtu.load_tat_fvs(root, split="train", llffhold=5)
    assert scene.data.images.shape[0] == 8  # 10 minus every-5th test view
    test_scene = tat_dtu.load_tat_fvs(root, split="test", llffhold=5)
    assert test_scene.data.images.shape[0] == 2
    # PCA normalization puts camera centers inside the unit ball.
    assert np.abs(scene.data.camtoworlds[:, :3, 3]).max() <= 1.0 + 1e-5
    assert scene.render_poses is not None
    # Too-large factor must name the available ladder.
    with pytest.raises(ValueError):
        tat_dtu.load_tat_fvs(root, factor=1)


def test_dtu_loader(tmp_path):
    root = os.path.join(str(tmp_path), "scans", "scan1")
    cal = os.path.join(str(tmp_path), "cal18")
    os.makedirs(root)
    os.makedirs(cal)
    n = 2
    k = np.array([[90.0, 0.0, 4.0], [0.0, 90.0, 3.0], [0.0, 0.0, 1.0]])
    c2w_gl = _ring_poses(n)
    for i in range(1, n + 1):
        # 8 lighting conditions per image index define n_images.
        for light in [f"{j}_r5000" for j in range(7)] + ["max"]:
            _write_png(os.path.join(root, f"rect_{i:03d}_{light}.png"),
                       seed=i)
        w2c = np.linalg.inv(camlib.pad_poses(
            c2w_gl[i - 1][None] @ np.diag([1.0, -1.0, -1.0, 1.0])))[0]
        p = k @ w2c[:3]
        np.savetxt(os.path.join(cal, f"pos_{i:03d}.txt"), p)

    scene = tat_dtu.load_dtu(root, split="train", dtu_light_cond=2,
                             dtuhold=2, cal_dir=cal)
    # Every-2nd is test: with 2 images, train keeps index 1.
    assert scene.data.images.shape == (1, 6, 8, 3)
    assert scene.data.pixtocam.shape == (1, 3, 3)
    np.testing.assert_allclose(scene.data.pixtocam[0], np.linalg.inv(k),
                               atol=1e-6)
    # Recentered + rescaled camera centers sit within the unit ball.
    full = tat_dtu.load_dtu(root, split="test", dtu_light_cond=2,
                            dtuhold=2, cal_dir=cal)
    assert np.abs(full.data.camtoworlds[:, :3, 3]).max() <= 1.0 + 1e-5
    # The default cal path (<root>/../../cal18) resolves the same files.
    scene_default = tat_dtu.load_dtu(root, split="train", dtu_light_cond=2,
                                     dtuhold=2)
    np.testing.assert_allclose(scene_default.data.camtoworlds,
                               scene.data.camtoworlds, atol=1e-7)


def test_registry_dispatch(tmp_path, monkeypatch):
    """cli.load_scene_for routes the three new loader names."""
    import dataclasses

    from nerf_lidar_tpu import cli, configs

    called = {}

    def fake(name):
        def fn(*a, **kw):
            called[name] = (a, kw)
            return "scene"
        return fn

    monkeypatch.setattr(tat_dtu, "load_tat_nerfpp", fake("tat_nerfpp"))
    monkeypatch.setattr(tat_dtu, "load_tat_fvs", fake("tat_fvs"))
    monkeypatch.setattr(tat_dtu, "load_dtu", fake("dtu"))
    cfg = configs.tiny_debug()
    for name in ("tat_nerfpp", "tat_fvs", "dtu"):
        c = dataclasses.replace(cfg, dataset_loader=name,
                                data_dir=str(tmp_path))
        assert cli.load_scene_for(c, "train") == "scene"
    assert set(called) == {"tat_nerfpp", "tat_fvs", "dtu"}


def test_splits_loaded_maps_global_to_local(tmp_path):
    # Split ids are GLOBAL; SceneData holds the selected subset. The
    # "loaded" key records which global views were loaded so cli train's
    # test-view monitor can map through it (a global id used directly as
    # a subset index silently monitored a TRAIN view).
    root = str(tmp_path)
    n = 10
    base = os.path.join(root, "dense", "ibr3d_pw_0.25")
    os.makedirs(base)
    c2w_gl = _ring_poses(n)
    w2c = np.linalg.inv(camlib.pad_poses(c2w_gl @ np.diag(
        [1.0, -1.0, -1.0, 1.0])))
    np.save(os.path.join(base, "Rs.npy"), w2c[:, :3, :3])
    np.save(os.path.join(base, "ts.npy"), w2c[:, :3, 3])
    ks = np.tile(camlib.intrinsic_matrix(80.0, 80.0, 4.0, 3.0), (n, 1, 1))
    np.save(os.path.join(base, "Ks.npy"), ks)
    for i in range(n):
        _write_png(os.path.join(base, f"im_{i:05d}.png"), seed=i)

    train = tat_dtu.load_tat_fvs(root, split="train", llffhold=5)
    loaded = train.splits["loaded"]
    assert train.data.images.shape[0] == len(loaded)
    # No test id was loaded into the train subset.
    assert not set(train.splits["test"]).intersection(loaded)
    test = tat_dtu.load_tat_fvs(root, split="test", llffhold=5)
    # Global test id 0 maps to local row 0 of the test subset.
    assert int(np.nonzero(test.splits["loaded"] ==
                          test.splits["test"][0])[0][0]) == 0
