import numpy as np
import pytest

from nerf_lidar_tpu import native
from nerf_lidar_tpu.lidar import range_image
from nerf_lidar_tpu.raydrop import features as feat_lib


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_decode_bin_matches_numpy():
    rng = np.random.RandomState(0)
    scan = rng.randn(1000, 5).astype(np.float32) * 20
    xyz, inten, depth = native.decode_bin(scan, 3.0, 100.0)
    d = np.linalg.norm(scan[:, :3], axis=1)
    keep = (d > 3) & (d < 100)
    np.testing.assert_allclose(xyz, scan[keep, :3])
    np.testing.assert_allclose(inten, scan[keep, 3])
    np.testing.assert_allclose(depth, d[keep], rtol=1e-5)


def test_native_projection_matches_numpy():
    rng = np.random.RandomState(1)
    pts = (rng.randn(4000, 3) * 10).astype(np.float32)
    sem = rng.randint(0, 19, 4000).astype(np.float32)
    rgb = rng.rand(4000, 3).astype(np.float32)
    nat = range_image.project_points(pts, sem, rgb, h=32, w=256,
                                     use_native=True)
    ref = range_image.project_points(pts, sem, rgb, h=32, w=256,
                                     use_native=False)
    np.testing.assert_array_equal(nat.proj_x, ref.proj_x)
    np.testing.assert_array_equal(nat.proj_y, ref.proj_y)
    np.testing.assert_allclose(nat.range, ref.range, rtol=1e-5)
    np.testing.assert_array_equal(nat.mask, ref.mask)
    filled = ref.mask > 0
    # Winning-point ties can differ only at equal depth; ranges already
    # matched, so semantic/rgb/xyz must agree wherever depths are unique.
    np.testing.assert_allclose(nat.xyz[filled], ref.xyz[filled], atol=1e-5)
    np.testing.assert_array_equal(nat.semantic[filled], ref.semantic[filled])


def test_native_depth_filter_matches_numpy():
    rng = np.random.RandomState(2)
    num_beams, per_beam = 16, 128
    az = np.tile(np.linspace(0, 2 * np.pi, per_beam), num_beams)
    r = (5 + 0.2 * np.sin(az)).astype(np.float32)
    dirs = np.stack([np.cos(az), np.sin(az),
                     np.tile(np.linspace(-0.3, 0.2, num_beams),
                             (per_beam, 1)).T.reshape(-1)], -1)
    pts = (dirs * r[:, None]).astype(np.float32)
    sem = rng.randint(0, 19, num_beams * per_beam).astype(np.float32)
    nat = native.depth_filter_mask(pts, sem, num_beams=num_beams)
    ref = feat_lib.depth_filter_mask.__wrapped__(pts, sem,
                                                 num_beams=num_beams) \
        if hasattr(feat_lib.depth_filter_mask, "__wrapped__") else None
    # Compare against the inline numpy implementation.
    pts_r = pts.reshape(num_beams, -1, 3)
    neighbors = np.stack([np.roll(pts_r, i, axis=1)
                          for i in range(-3, 4) if i != 0], axis=-1)
    raw = np.broadcast_to(pts_r[..., None], neighbors.shape)
    dist = np.linalg.norm(raw - neighbors, axis=-2)
    count = (dist < 1.0).sum(axis=-1)
    sem_r = sem.reshape(num_beams, -1)
    edge = np.stack([np.roll(sem_r, i, axis=1) != sem_r
                     for i in (-1, 1)], -1).sum(-1)
    want = ((count > 1) | (edge > 0)
            | (sem_r == 13)).reshape(-1)
    np.testing.assert_array_equal(nat, want)


def test_native_projection_speedup():
    import time
    rng = np.random.RandomState(3)
    pts = (rng.randn(35200, 3) * 20).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        range_image.project_points(pts, h=32, w=1024, use_native=True)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        range_image.project_points(pts, h=32, w=1024, use_native=False)
    t_np = time.perf_counter() - t0
    print(f"native {t_nat:.3f}s vs numpy {t_np:.3f}s")
    assert t_nat < t_np  # native must not be slower
