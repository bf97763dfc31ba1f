"""LLFF/COLMAP loader: binary-model parse roundtrip, pose conventions,
NDC forward-facing mode, Blender transforms.json fallback."""

import json
import os

import numpy as np
import pytest

from nerf_lidar_tpu.data import camera as camlib
from nerf_lidar_tpu.data import colmap, llff
from nerf_lidar_tpu.data import quaternion as quat


def _random_c2w(rng):
    """Random OpenCV-convention camera-to-world [4,4]."""
    q = quat.normalize(rng.standard_normal(4))
    m = np.eye(4)
    m[:3, :3] = quat.to_rotation_matrix(q)
    m[:3, 3] = rng.standard_normal(3) * 2.0
    return m


def _write_model(sparse, c2ws, model="PINHOLE",
                 params=(100.0, 110.0, 32.0, 24.0)):
    os.makedirs(sparse, exist_ok=True)
    cameras = {1: colmap.Camera(1, model, 64, 48,
                                np.asarray(params, np.float64))}
    images = {}
    for i, c2w in enumerate(c2ws):
        w2c = np.linalg.inv(c2w)
        images[i + 1] = colmap.Image(
            i + 1, quat.from_rotation_matrix(w2c[:3, :3]), w2c[:3, 3], 1,
            f"im_{i:03d}.png")
    colmap.write_cameras_bin(os.path.join(sparse, "cameras.bin"), cameras)
    colmap.write_images_bin(os.path.join(sparse, "images.bin"), images)
    colmap.write_points3d_bin(os.path.join(sparse, "points3D.bin"),
                              np.random.RandomState(0).randn(7, 3))
    return cameras, images


def test_colmap_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    c2ws = [_random_c2w(rng) for _ in range(5)]
    sparse = str(tmp_path / "sparse" / "0")
    _write_model(sparse, c2ws)

    names, poses, pixtocam, dist, camtype, points, wh = \
        colmap.load_nerf_poses(sparse)
    assert names == [f"im_{i:03d}.png" for i in range(5)]
    assert dist is None and camtype == "perspective"
    assert wh == (64, 48)
    assert points.shape == (7, 3)
    # Intrinsics: K = [[fx,0,cx],[0,fy,cy],[0,0,1]] inverted.
    K = np.linalg.inv(pixtocam)
    assert np.allclose(np.diag(K)[:2], [100.0, 110.0], atol=1e-9)
    # Poses come back in NeRF (right, up, back) axes: undo the flip and
    # compare to the OpenCV c2w that was written.
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    for i in range(5):
        got = np.concatenate([poses[i] @ flip, np.eye(4)[3:]], axis=0)
        assert np.allclose(got, c2ws[i], atol=1e-8), i


def test_colmap_distortion_models(tmp_path):
    cases = [
        ("SIMPLE_RADIAL", (90.0, 32.0, 24.0, 0.05),
         {"k1": 0.05}, "perspective"),
        ("RADIAL", (90.0, 32.0, 24.0, 0.05, -0.01),
         {"k1": 0.05, "k2": -0.01}, "perspective"),
        ("OPENCV", (90.0, 95.0, 32.0, 24.0, 0.05, -0.01, 1e-3, -2e-3),
         {"k1": 0.05, "k2": -0.01, "p1": 1e-3, "p2": -2e-3}, "perspective"),
        ("OPENCV_FISHEYE", (90.0, 95.0, 32.0, 24.0, 0.05, -0.01, 2e-3, 1e-4),
         {"k1": 0.05, "k2": -0.01, "k3": 2e-3, "k4": 1e-4}, "fisheye"),
    ]
    rng = np.random.default_rng(1)
    for model, params, want_dist, want_type in cases:
        sparse = str(tmp_path / model / "sparse" / "0")
        _write_model(sparse, [_random_c2w(rng)], model=model, params=params)
        _, _, _, dist, camtype, _, _ = colmap.load_nerf_poses(sparse)
        assert camtype == want_type, model
        assert dist == pytest.approx(want_dist), model


def test_colmap_text_fallback(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    os.makedirs(sparse)
    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        f.write("# comment\n1 SIMPLE_PINHOLE 64 48 80.0 32.0 24.0\n")
    rng = np.random.default_rng(2)
    c2w = _random_c2w(rng)
    w2c = np.linalg.inv(c2w)
    q = quat.from_rotation_matrix(w2c[:3, :3])
    t = w2c[:3, 3]
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        f.write("# comment\n")
        f.write(f"1 {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 "
                "a.png\n")
        f.write("\n")  # empty 2D-point line
    names, poses, pixtocam, dist, camtype, _, _ = \
        colmap.load_nerf_poses(sparse)
    assert names == ["a.png"]
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    got = np.concatenate([poses[0] @ flip, np.eye(4)[3:]], axis=0)
    assert np.allclose(got, c2w, atol=1e-6)


def _write_capture(tmp_path, n=10, forward=False):
    import imageio.v2 as imageio
    rng = np.random.default_rng(3)
    c2ws = []
    for i in range(n):
        # A loose forward-facing rig: small offsets, looking along -z
        # (OpenGL) == +z in OpenCV terms.
        m = np.eye(4)
        m[:3, 3] = [0.1 * i, 0.05 * rng.standard_normal(), 5.0]
        c2ws.append(m)
    _write_model(str(tmp_path / "sparse" / "0"), c2ws)
    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    for i in range(n):
        imageio.imwrite(str(img_dir / f"im_{i:03d}.png"),
                        rng.integers(0, 255, (48, 64, 3), np.uint8))
    pb = np.zeros((n, 17))
    pb[:, -2], pb[:, -1] = 2.0, 20.0
    np.save(str(tmp_path / "poses_bounds.npy"), pb)
    return str(tmp_path)


def test_llff_scene_360(tmp_path):
    root = _write_capture(tmp_path)
    scene = llff.load_scene(root, split="train", llffhold=5)
    test = llff.load_scene(root, split="test", llffhold=5)
    assert scene.data.images.shape == (8, 48, 64, 3)  # 10 - every 5th
    assert test.data.images.shape == (2, 48, 64, 3)
    assert scene.data.camtoworlds.shape == (8, 3, 4)
    # PCA normalization: positions inside the unit box.
    assert np.abs(scene.data.camtoworlds[:, :3, 3]).max() <= 1.0 + 1e-5
    assert scene.render_poses is not None and len(scene.render_poses) > 0
    assert scene.data.pixtocam_ndc is None
    assert 0 < scene.data.near < scene.data.far


def test_llff_scene_forward_facing_ndc(tmp_path):
    root = _write_capture(tmp_path)
    scene = llff.load_scene(root, split="train", llffhold=5,
                            forward_facing=True)
    d = scene.data
    assert d.pixtocam_ndc is not None
    assert d.near == 0.0 and d.far == 1.0
    # Rays through the batcher land in the NDC cube: origins on the z=-1
    # plane, directions spanning to the z=+1 plane.
    from nerf_lidar_tpu.data.batching import RayBatcher
    b = RayBatcher(d, 256, 1, seed=0)
    batch = b.next()
    assert np.allclose(batch["origins"][:, 2], -1.0, atol=1e-4)
    assert np.allclose(batch["directions"][:, 2], 2.0, atol=1e-4)
    assert np.abs(batch["origins"][:, :2]).max() < 4.0
    # Multisample bases are finite unit vectors.
    for k in ("base_x", "base_y"):
        assert np.all(np.isfinite(batch[k]))
        assert np.allclose(np.linalg.norm(batch[k], axis=-1), 1.0, atol=1e-4)
    assert scene.render_poses.shape[1:] == (3, 4)


def test_llff_downsample_factor(tmp_path):
    root = _write_capture(tmp_path)
    scene = llff.load_scene(root, split="train", llffhold=5)
    half = llff.load_scene(root, split="train", llffhold=5, factor=2)
    assert half.data.images.shape == (8, 24, 32, 3)
    # Inverse intrinsics scale with the factor: focal halves.
    assert np.isclose(half.data.pixtocam[0, 0],
                      scene.data.pixtocam[0, 0] * 2.0)


def test_blender_transforms_json(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.default_rng(4)
    n = 4
    frames = []
    os.makedirs(tmp_path / "images")
    for i in range(n):
        m = np.eye(4)
        m[:3, 3] = rng.standard_normal(3)
        frames.append({"file_path": f"images/r_{i}",
                       "transform_matrix": m.tolist()})
        imageio.imwrite(str(tmp_path / "images" / f"r_{i}"),
                        rng.integers(0, 255, (40, 60, 3), np.uint8),
                        format="png")
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    scene = llff.load_scene(str(tmp_path), split="train", llffhold=8)
    assert scene.data.images.shape[1:] == (40, 60, 3)
    # Focal from camera_angle_x: f = 0.5 * W / tan(0.5 * angle).
    want_f = 0.5 * 60 / np.tan(0.4)
    assert np.isclose(1.0 / scene.data.pixtocam[0, 0], want_f, rtol=1e-5)


def test_config_registry_llff(tmp_path):
    root = _write_capture(tmp_path)
    import dataclasses

    from nerf_lidar_tpu import cli, configs
    cfg = dataclasses.replace(configs.tiny_debug(), dataset_loader="llff",
                              data_dir=root, llffhold=5)
    scene = cli.load_scene_for(cfg, "train")
    assert scene.data.num_views == 8
    assert scene.tracks is None and scene.lidar is None


def test_forward_facing_ndc_train_step(tmp_path):
    """A training step runs and learns on NDC rays (near=0, far=1): the
    warp, contraction, and losses must all accept the projective-space
    geometry the forward-facing LLFF mode produces."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_lidar_tpu import configs
    from nerf_lidar_tpu.data.batching import RayBatcher
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.train import train_step

    root = _write_capture(tmp_path)
    scene = llff.load_scene(root, split="train", llffhold=5,
                            forward_facing=True)
    cfg = dataclasses.replace(configs.tiny_debug(), batch_size=128,
                              patch_size=1, lr_init=5e-3, lr_final=5e-3,
                              lr_delay_steps=0)
    batcher = RayBatcher(scene.data, cfg.batch_size, 1, seed=0)
    model = Model(cfg.model)
    batch = jax.tree.map(jnp.asarray, batcher.next())
    params = model.init(jax.random.PRNGKey(0), None, batch)
    state, tx = train_step.create_train_state(cfg, params)
    step = train_step.make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(12):
        key, sub = jax.random.split(key)
        batch = jax.tree.map(jnp.asarray, batcher.next())
        state, stats = step(state, batch, sub, None, None)
        loss = float(stats["loss"])
        assert np.isfinite(loss)
        first = loss if first is None else first
    assert loss < first, (first, loss)


def test_colmap_images_txt_empty_points_keeps_parity(tmp_path):
    """An image with ZERO 2D observations writes an empty points line;
    the parser must not lose pose/points alternation for later images."""
    sparse = str(tmp_path / "sparse" / "0")
    os.makedirs(sparse)
    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        f.write("1 SIMPLE_PINHOLE 64 48 80.0 32.0 24.0\n")
    rng = np.random.default_rng(5)
    c2ws = [_random_c2w(rng) for _ in range(3)]
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        f.write("# Image list\n")
        for i, c2w in enumerate(c2ws):
            w2c = np.linalg.inv(c2w)
            q = quat.from_rotation_matrix(w2c[:3, :3])
            t = w2c[:3, 3]
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} 1 im_{i}.png\n")
            # Middle image has no observations -> empty line.
            f.write("\n" if i == 1 else "512.5 384.25 7 100.0 200.0 8\n")
    names, poses, *_ = colmap.load_nerf_poses(sparse)
    assert names == ["im_0.png", "im_1.png", "im_2.png"]
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    for i, c2w in enumerate(c2ws):
        got = np.concatenate([poses[i] @ flip, np.eye(4)[3:]], axis=0)
        assert np.allclose(got, c2w, atol=1e-6)


def test_llff_missing_image_raises(tmp_path):
    """A COLMAP entry whose image file is absent must fail loudly, not
    silently pair the pose with a positionally-guessed file."""
    root = _write_capture(tmp_path, n=6)
    os.remove(os.path.join(root, "images", "im_002.png"))
    with pytest.raises(FileNotFoundError, match="im_002"):
        llff.load_scene(root, split="train")


def test_train_split_shards_round_robin_by_rank(tmp_path):
    """Multi-host LLFF loading shards TRAIN images per rank (reference
    datasets.py:931-935): disjoint per-rank view sets whose union is the
    full train split; the test split stays replicated."""
    root = _write_capture(tmp_path, n=9)
    full = llff.load_scene(root, split="train", llffhold=5)
    r0 = llff.load_scene(root, split="train", llffhold=5,
                         process_index=0, process_count=2)
    r1 = llff.load_scene(root, split="train", llffhold=5,
                         process_index=1, process_count=2)
    n0, n1 = r0.data.num_views, r1.data.num_views
    assert n0 + n1 == full.data.num_views
    assert abs(n0 - n1) <= 1
    # Disjoint pixels: rank images interleave the full set.
    np.testing.assert_array_equal(r0.data.images[0], full.data.images[0])
    np.testing.assert_array_equal(r1.data.images[0], full.data.images[1])
    t0 = llff.load_scene(root, split="test", llffhold=5,
                         process_index=0, process_count=2)
    t1 = llff.load_scene(root, split="test", llffhold=5,
                         process_index=1, process_count=2)
    assert t0.data.num_views == t1.data.num_views
