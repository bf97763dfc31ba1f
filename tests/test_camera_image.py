import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu.data import camera, synthetic
from nerf_lidar_tpu.utils import image as imlib


def test_camera_rays_geometry():
    pose = camera.lookat_pose(np.array([3.0, 0, 0]), np.zeros(3))
    rays = camera.camera_rays(pose, 16, 24, focal=20.0)
    assert rays["origins"].shape == (16, 24, 3)
    np.testing.assert_allclose(rays["origins"][0, 0], [3, 0, 0], atol=1e-6)
    # Center pixel looks roughly at the origin.
    c = rays["viewdirs"][8, 12]
    np.testing.assert_allclose(c, [-1, 0, 0], atol=0.1)
    # base_x/base_y are unit and ~orthogonal to the view direction.
    bx = rays["base_x"].reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(bx, axis=-1), 1.0, atol=1e-5)
    # radii scale like 1/focal.
    rays2 = camera.camera_rays(pose, 16, 24, focal=40.0)
    np.testing.assert_allclose(rays2["radii"], rays["radii"] / 2, rtol=1e-2)


def test_transform_poses_pca_normalizes():
    rng = np.random.RandomState(0)
    poses = []
    for i in range(12):
        eye = rng.randn(3) * 50 + np.array([500.0, -200.0, 30.0])
        poses.append(camera.lookat_pose(eye, np.array([500.0, -200.0, 0.0])))
    poses = np.stack(poses)
    new_poses, transform, scale = camera.transform_poses_pca(poses)
    assert scale <= 0.1 + 1e-9
    t = new_poses[:, :3, 3]
    assert np.abs(t).max() <= 1.0 + 1e-5
    # Transform consistency: applying (scale*transform) to old centers gives
    # the new ones.
    old_h = camera.pad_poses(poses)
    mapped = (transform @ old_h)[:, :3, 3]
    np.testing.assert_allclose(mapped, t, atol=1e-4)


def test_synthetic_scene_trace_consistency():
    scene, data, views = synthetic.make_scene_data(num_views=2, height=16,
                                                   width=24, focal=16.0)
    # Depth along rays reprojects onto the surface: retrace from the hit
    # point slightly backed off must give ~0 extra distance for sphere hits.
    assert views["rgb"].shape == (2, 16, 24, 3)
    assert (views["semantic"] == synthetic.SKY_CLASS).any()
    assert (views["depth"] > 0).all()
    # LiDAR rays: depth must equal the analytic distance to surfaces.
    pts = (data.lidar_origins + data.lidar_dirs
           * data.lidar_depth[:, None])
    # All lidar hit points are on a sphere surface or the ground plane.
    on_ground = np.abs(pts[:, 2] - scene.ground_z) < 1e-4
    on_sphere = np.zeros(len(pts), bool)
    for c, r in zip(scene.centers, scene.radii):
        on_sphere |= np.abs(np.linalg.norm(pts - c, axis=-1) - r) < 1e-4
    assert np.all(on_ground | on_sphere)


def test_psnr_and_ssim_basics():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float32)
    assert float(imlib.psnr(img, img)) > 80
    assert abs(float(imlib.ssim(jnp.asarray(img), jnp.asarray(img))) - 1.0) \
        < 1e-5
    noisy = np.clip(img + 0.1 * rng.randn(32, 32, 3), 0, 1).astype(np.float32)
    assert float(imlib.psnr(img, noisy)) < 25
    assert float(imlib.ssim(jnp.asarray(img), jnp.asarray(noisy))) < 0.99


def test_color_correct_fixes_affine_shift():
    rng = np.random.RandomState(1)
    ref = rng.rand(24, 24, 3).astype(np.float32) * 0.6 + 0.2
    img = np.clip(ref * 0.7 + 0.1, 0, 1)
    fixed = np.asarray(imlib.color_correct(img, ref))
    assert np.abs(fixed - ref).mean() < np.abs(img - ref).mean() * 0.2


def test_color_correct_never_hurts_psnr():
    """Regression for the round-4 psnr_cc inversion: a fitted quadratic
    warp can essentially never make PSNR worse. The f32 jnp.lstsq version
    produced psnr_cc 12 dB BELOW raw psnr on a ~360k x 10 system; the
    host-side float64 solve must satisfy psnr_cc >= psnr - 0.1 on a
    realistic-size GLO-style color-shifted pair."""
    rng = np.random.RandomState(2)
    # Smooth-ish "rendering" at eval-like resolution (ill-conditioned
    # normal system territory for f32).
    base = rng.rand(12, 16, 3)
    ref = np.clip(np.kron(base, np.ones((25, 25, 1))) * 0.7 + 0.15
                  + 0.02 * rng.randn(300, 400, 3), 0, 1).astype(np.float32)
    # GLO-style global color shift + mild channel mixing.
    gain = np.array([1.12, 0.95, 0.88], np.float32)
    img = np.clip(ref * gain + np.float32([0.04, -0.03, 0.05]), 0, 1)
    raw_psnr = float(imlib.psnr(img, ref))
    cc = imlib.color_correct(img, ref)
    assert np.all(np.isfinite(cc))
    cc_psnr = float(imlib.psnr(cc, ref))
    assert cc_psnr >= raw_psnr - 0.1, (cc_psnr, raw_psnr)
    # And on this correctable shift it should actually help a lot.
    assert cc_psnr > raw_psnr + 3.0, (cc_psnr, raw_psnr)


def test_undistort_points_inverts_distortion():
    """Newton undistort must invert the OpenCV radial+tangential forward
    model to high precision for realistic coefficients."""
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.6, 0.6, 512)
    y = rng.uniform(-0.4, 0.4, 512)
    k = dict(k1=-0.28, k2=0.07, k3=-0.005, k4=0.0, p1=1e-3, p2=-5e-4)
    r = x * x + y * y
    d = 1.0 + r * (k["k1"] + r * (k["k2"] + r * (k["k3"] + r * k["k4"])))
    xd = d * x + 2 * k["p1"] * x * y + k["p2"] * (r + 2 * x * x)
    yd = d * y + 2 * k["p2"] * x * y + k["p1"] * (r + 2 * y * y)
    xu, yu = camera.undistort_points(xd, yd, **k)
    np.testing.assert_allclose(xu, x, atol=1e-7)
    np.testing.assert_allclose(yu, y, atol=1e-7)


def test_convert_to_ndc_bounds_and_linearity():
    """NDC rays: origins sit on the near plane (z=-1), origin+direction on
    the far plane (z=+1), and on-axis points project inside the cube."""
    h, w, focal = 48, 64, 50.0
    pixtocam = camera.get_pixtocam(focal, w, h)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    rays = camera.pixels_to_rays(x, y, pixtocam, np.eye(4)[:3])
    o, d = camera.convert_to_ndc(rays["origins"].reshape(-1, 3),
                                 rays["directions"].reshape(-1, 3),
                                 pixtocam, near=1.0)
    np.testing.assert_allclose(o[:, 2], -1.0, atol=1e-6)
    np.testing.assert_allclose((o + d)[:, 2], 1.0, atol=1e-6)
    assert np.abs(o[:, :2]).max() <= 1.0 + 1e-5


def test_fisheye_rays_equidistant_angles():
    """Fisheye camtype: plane radius r maps to a ray at angle r from the
    optical axis (equidistant model)."""
    pixtocam = camera.get_pixtocam(100.0, 200, 200)
    x = np.array([100, 130, 160, 190])
    y = np.full_like(x, 100)
    rays = camera.pixels_to_rays(x, y, pixtocam, np.eye(4)[:3],
                                 camtype="fisheye")
    # Optical axis is -z (OpenGL).
    cos_angle = -rays["viewdirs"][:, 2]
    plane_r = np.linalg.norm(
        (np.stack([x + 0.5, y + 0.5, np.ones_like(x)], -1)
         @ pixtocam.T)[:, :2], axis=-1)
    np.testing.assert_allclose(np.arccos(cos_angle), plane_r, atol=1e-5)


def test_pixels_to_rays_rejects_unknown_camtype():
    pixtocam = camera.get_pixtocam(50.0, 64, 48)
    with np.testing.assert_raises(ValueError):
        camera.pixels_to_rays(np.zeros(1, int), np.zeros(1, int),
                              pixtocam, np.eye(4)[:3], camtype="pinhole2")
