"""RawNeRF raw-sensor pipeline: demosaic correctness, EXIF processing,
exposure indexing, the .npy raw loader, and the end-to-end rawnerf_mode
LLFF path feeding exposure values through the batcher."""

import json
import os

import numpy as np

from nerf_lidar_tpu.utils import raw


def _mosaic(rgb):
    """[H, W, 3] -> RGGB mosaic [H, W]."""
    h, w, _ = rgb.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    mask = raw.pixels_to_bayer_mask(xx, yy)
    return (rgb * mask).sum(-1)


def test_bayer_mask_pattern():
    m = raw.pixels_to_bayer_mask(np.arange(4)[None, :].repeat(4, 0),
                                 np.arange(4)[:, None].repeat(4, 1))
    assert m.shape == (4, 4, 3)
    assert m[0, 0, 0] == 1 and m[0, 1, 1] == 1 and m[1, 0, 1] == 1 \
        and m[1, 1, 2] == 1
    # Exactly one channel observed per pixel.
    assert np.all(m.sum(-1) == 1)


def test_demosaic_constant_exact():
    rgb = np.full((8, 10, 3), 0.25, np.float32)
    out = raw.bilinear_demosaic(_mosaic(rgb))
    assert np.allclose(out, 0.25, atol=1e-6)


def test_demosaic_preserves_observed_samples():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    bayer = _mosaic(rgb)
    out = raw.bilinear_demosaic(bayer)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    mask = raw.pixels_to_bayer_mask(xx, yy).astype(bool)
    # At observed sites the demosaic returns the sample unchanged.
    assert np.allclose(out[mask], bayer.reshape(-1), atol=1e-6)


def test_demosaic_recovers_smooth_image():
    # A smooth gradient is reconstructed accurately away from edges.
    h, w = 32, 48
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    rgb = np.stack([xx, 0.5 * (xx + yy), yy], -1).astype(np.float32)
    out = raw.bilinear_demosaic(_mosaic(rgb))
    err = np.abs(out[2:-2, 2:-2] - rgb[2:-2, 2:-2]).max()
    assert err < 0.02, err


def test_postprocess_raw_gamma_and_exposure():
    img = np.full((4, 4, 3), 0.5, np.float32)
    srgb = raw.postprocess_raw(img, np.eye(3), exposure=0.5)
    assert np.allclose(srgb, 1.0, atol=1e-6)  # exposure point -> white
    dark = raw.postprocess_raw(np.full((4, 4, 3), 1e-4, np.float32),
                               np.eye(3), exposure=1.0)
    assert np.all(dark < 0.01)  # linear segment near zero


def _exif(shutter_denom, wb=(0.6, 1.0, 0.7)):
    return {
        "BlackLevel": 64,
        "WhiteLevel": 1023,
        "AsShotNeutral": f"{wb[0]} {wb[1]} {wb[2]}",
        "ColorMatrix2": "1 0 0 0 1 0 0 0 1",
        "ShutterSpeed": f"1/{shutter_denom}",
    }


def test_process_exif_cam2rgb_rows():
    meta = raw.process_exif([_exif(100), _exif(50)])
    assert meta["ShutterSpeed"].shape == (2,)
    assert np.isclose(meta["ShutterSpeed"][1], 1 / 50)
    cam2rgb = meta["cam2rgb"]
    assert cam2rgb.shape == (2, 3, 3)
    # rgb2camwb is row-normalized, so cam2rgb @ camwb-white == rgb-white:
    # pure sensor white (AsShotNeutral) maps to (1, 1, 1).
    white = np.array([0.6, 1.0, 0.7])
    assert np.allclose(cam2rgb[0] @ white, 1.0, atol=1e-6)


def _write_raw_scene(tmp_path, n=3, h=16, w=20):
    rng = np.random.default_rng(1)
    raw_dir = tmp_path / "raw"
    os.makedirs(raw_dir)
    denoms = [100] * (n - 1) + [50]  # two unique shutters
    for i in range(n):
        mosaic = rng.uniform(64, 1023, (h, w)).astype(np.float32)
        np.save(str(raw_dir / f"im_{i:03d}.npy"), mosaic)
        with open(raw_dir / f"im_{i:03d}.json", "w") as f:
            json.dump([_exif(denoms[i])], f)
    return [f"im_{i:03d}.npy" for i in range(n)]


def test_load_raw_dataset_npy(tmp_path):
    names = _write_raw_scene(tmp_path)
    images, meta = raw.load_raw_dataset(str(tmp_path), names)
    assert images.shape == (3, 16, 20, 3)
    # Shutter 1/50 is slower (brighter) than 1/100 -> index 0.
    assert list(meta["exposure_idx"]) == [1, 1, 0]
    assert np.allclose(meta["exposure_values"], [0.5, 0.5, 1.0])
    # White balance (1/0.6, 1, 1/0.7) lifts the brightest channel ~1.67x.
    assert 0 < meta["exposure"] < 3.0
    srgb = meta["postprocess_fn"](images[0])
    assert srgb.shape == images[0].shape
    assert srgb.min() >= 0 and srgb.max() <= 1

    half, _ = raw.load_raw_dataset(str(tmp_path), names, n_downsample=2)
    assert half.shape == (3, 8, 10, 3)


def test_best_fit_affine_roundtrip():
    rng = np.random.default_rng(2)
    gt = rng.uniform(0, 1, (12, 12, 3))
    est = 2.5 * gt + 0.1 + rng.normal(0, 1e-3, gt.shape)
    matched = raw.match_images_affine(est, gt)
    assert np.abs(matched - gt).max() < 0.01


def test_llff_rawnerf_mode_feeds_exposures(tmp_path):
    """End-to-end: COLMAP poses + raw/ mosaics -> SceneData with exposure
    fields -> RayBatcher emits per-ray exposure_values/idx."""
    from nerf_lidar_tpu.data import colmap, llff
    from nerf_lidar_tpu.data import quaternion as quat
    from nerf_lidar_tpu.data.batching import RayBatcher

    n = 4
    c2ws = []
    for i in range(n):
        m = np.eye(4)
        m[:3, 3] = [0.2 * i, 0.0, 3.0]
        c2ws.append(m)
    sparse = str(tmp_path / "sparse" / "0")
    os.makedirs(sparse)
    cameras = {1: colmap.Camera(1, "PINHOLE",
                                20, 16, np.array([30.0, 30.0, 10.0, 8.0]))}
    images = {}
    for i, c2w in enumerate(c2ws):
        w2c = np.linalg.inv(c2w)
        images[i + 1] = colmap.Image(
            i + 1, quat.from_rotation_matrix(w2c[:3, :3]), w2c[:3, 3], 1,
            f"im_{i:03d}.npy")
    colmap.write_cameras_bin(os.path.join(sparse, "cameras.bin"), cameras)
    colmap.write_images_bin(os.path.join(sparse, "images.bin"), images)
    _write_raw_scene(tmp_path, n=n)

    scene = llff.load_scene(str(tmp_path), split="train", llffhold=4,
                            rawnerf_mode=True)
    d = scene.data
    assert d.exposure_values is not None and d.exposure_idx is not None
    assert d.images.shape[0] == 3  # every 4th view held out

    b = RayBatcher(d, 64, 1, seed=0)
    batch = b.next()
    assert batch["exposure_values"].shape == (64, 3)
    assert batch["exposure_idx"].shape == (64, 1)
    assert set(np.unique(batch["exposure_values"])) <= {0.5, 1.0}


def test_process_exif_shutter_formats():
    """exiftool emits '1/250' fractions, '3/10' non-unit fractions, whole
    seconds '2', and bare floats for long exposures."""
    exifs = []
    for s in ("1/250", "3/10", "2", 0.5):
        e = _exif(100)
        e["ShutterSpeed"] = s
        exifs.append(e)
    meta = raw.process_exif(exifs)
    assert np.allclose(meta["ShutterSpeed"], [1 / 250, 0.3, 2.0, 0.5])


def test_load_raw_dataset_per_cfa_black_level(tmp_path):
    """4-value BlackLevel (one per RGGB site, the common DNG case) must
    subtract per mosaic position, not crash or misbroadcast."""
    raw_dir = tmp_path / "raw"
    os.makedirs(raw_dir)
    h, w = 8, 10
    blacks = np.array([[500.0, 510.0], [520.0, 530.0]])
    names = []
    for i in range(2):
        mosaic = np.full((h, w), 600.0, np.float32)
        np.save(str(raw_dir / f"b_{i}.npy"), mosaic)
        e = _exif(100 - i)  # two unique shutters
        e["BlackLevel"] = "500 510 520 530"
        with open(raw_dir / f"b_{i}.json", "w") as f:
            json.dump([e], f)
        names.append(f"b_{i}.npy")
    images, meta = raw.load_raw_dataset(str(tmp_path), names)
    assert images.shape == (2, h, w, 3)
    # Before demosaic, site (y, x) should hold (600 - black[y%2, x%2]) /
    # (1023 - black[y%2, x%2]). Check via the observed-sample-preserving
    # property of the bilinear demosaic on each channel's own sites.
    want = (600.0 - blacks) / (1023.0 - blacks)
    # R sites (even, even) carry channel 0; B sites (odd, odd) channel 2.
    assert np.allclose(images[0, 0, 0, 0], want[0, 0], atol=1e-6)
    assert np.allclose(images[0, 1, 1, 2], want[1, 1], atol=1e-6)
    # G sites: (0, 1) -> black 510, (1, 0) -> black 520.
    assert np.allclose(images[0, 0, 1, 1], want[0, 1], atol=1e-6)
    assert np.allclose(images[0, 1, 0, 1], want[1, 0], atol=1e-6)


def test_rawnerf_exposure_anchor_is_split_global(tmp_path):
    """The exposure anchor (brightest shutter, idx 0) must come from the
    WHOLE capture even when that view is held out of the split, so train
    and test exposure_values agree on what 1.0 means."""
    from nerf_lidar_tpu.data import colmap, llff
    from nerf_lidar_tpu.data import quaternion as quat

    n = 4
    sparse = str(tmp_path / "sparse" / "0")
    os.makedirs(sparse)
    cameras = {1: colmap.Camera(1, "PINHOLE",
                                20, 16, np.array([30.0, 30.0, 10.0, 8.0]))}
    images = {}
    for i in range(n):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.2 * i, 0.0, 3.0]
        w2c = np.linalg.inv(c2w)
        images[i + 1] = colmap.Image(
            i + 1, quat.from_rotation_matrix(w2c[:3, :3]), w2c[:3, 3], 1,
            f"im_{i:03d}.npy")
    colmap.write_cameras_bin(os.path.join(sparse, "cameras.bin"), cameras)
    colmap.write_images_bin(os.path.join(sparse, "images.bin"), images)

    raw_dir = tmp_path / "raw"
    os.makedirs(raw_dir)
    rng = np.random.default_rng(3)
    denoms = [25, 100, 100, 100]  # brightest shutter ONLY on view 0
    for i in range(n):
        np.save(str(raw_dir / f"im_{i:03d}.npy"),
                rng.uniform(64, 1023, (16, 20)).astype(np.float32))
        with open(raw_dir / f"im_{i:03d}.json", "w") as f:
            json.dump([_exif(denoms[i])], f)

    # llffhold=4 holds out view 0 (the anchor) into the test split.
    train = llff.load_scene(str(tmp_path), split="train", llffhold=4,
                            rawnerf_mode=True)
    test = llff.load_scene(str(tmp_path), split="test", llffhold=4,
                           rawnerf_mode=True)
    # Train views all have shutter 1/100; anchor is 1/25 (global).
    assert np.allclose(train.data.exposure_values, 0.25)
    assert np.all(train.data.exposure_idx == 1)
    assert np.allclose(test.data.exposure_values, 1.0)
    assert np.all(test.data.exposure_idx == 0)
    # Render poses for this collinear rig fall back to the spiral and are
    # finite (the inward ellipse is undefined, camera.py guard).
    assert np.isfinite(train.render_poses).all()


def test_view_rays_carries_exposure():
    """eval/in-train renders must feed the same exposure keys train
    batches carry (models/model.py:218-229)."""
    from nerf_lidar_tpu.cli import _view_rays
    from nerf_lidar_tpu.data.batching import SceneData

    h, w = 6, 8
    data = SceneData(
        camtoworlds=np.tile(np.eye(4)[:3], (2, 1, 1)).astype(np.float32),
        pixtocam=np.linalg.inv(np.array(
            [[10.0, 0, 4], [0, 10.0, 3], [0, 0, 1]])).astype(np.float32),
        images=np.zeros((2, h, w, 3), np.float32), near=0.1, far=10.0,
        exposure_values=np.array([0.25, 1.0], np.float32),
        exposure_idx=np.array([1, 0], np.int32))
    rays = _view_rays(data, 0)
    assert rays["exposure_values"].shape == (h, w, 3)
    assert np.allclose(rays["exposure_values"], 0.25)
    assert rays["exposure_idx"].shape == (h, w, 1)
    assert np.all(rays["exposure_idx"] == 1)
