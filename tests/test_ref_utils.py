import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu import configs
from nerf_lidar_tpu.data import road_augment
from nerf_lidar_tpu.models.mlp import ZipMLP
from nerf_lidar_tpu.ops import ref_utils


def test_reflect_properties():
    rng = np.random.RandomState(0)
    v = rng.randn(20, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    n = rng.randn(20, 3)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    u = np.asarray(ref_utils.reflect(jnp.asarray(v), jnp.asarray(n)))
    # dot(u, n) == dot(v, n); |u| == |v|.
    np.testing.assert_allclose((u * n).sum(-1), (v * n).sum(-1), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-5)


def test_ide_matches_real_sph_harmonics():
    # With kappa_inv=0 and deg 1, the encoding reduces to first-order
    # spherical harmonics of the direction; check rotation-equivariance of
    # magnitude and the zero-variance case.
    fn = ref_utils.generate_ide_fn(2)
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    enc0 = np.asarray(fn(d, jnp.zeros((3, 1))))
    assert enc0.shape[-1] == 2 * ref_utils.get_ml_array(2).shape[1]
    assert np.isfinite(enc0).all()
    # Attenuation: high kappa_inv (wide vMF) shrinks high-degree terms.
    enc1 = np.asarray(fn(d, jnp.full((3, 1), 10.0)))
    assert np.abs(enc1).sum() < np.abs(enc0).sum()
    # l=1, m=0 term is proportional to z.
    ml = ref_utils.get_ml_array(2)
    i_z = int(np.where((ml[0] == 0) & (ml[1] == 1))[0][0])
    assert abs(enc0[0, i_z]) > abs(enc0[1, i_z]) - 1e-6
    np.testing.assert_allclose(enc0[1, i_z], 0.0, atol=1e-6)


def test_ide_fn_in_mlp_and_reflections():
    grid = configs.GridConfig(level_dim=2, base_resolution=4,
                              desired_resolution=16, log2_hashmap_size=8)
    cfg = configs.MLPConfig(
        grid=grid, bottleneck_width=16, net_width_viewdirs=16,
        use_directional_enc=True, use_reflections=True,
        enable_pred_normals=True, enable_pred_roughness=True,
        use_n_dot_v=True, use_diffuse_color=True, use_specular_tint=True,
        disable_density_normals=True, deg_view=2)
    mlp = ZipMLP(cfg)
    rng = np.random.RandomState(0)
    means = jnp.asarray(rng.rand(4, 6, 3, 3).astype(np.float32) * 2 - 1)
    stds = jnp.asarray(rng.rand(4, 6, 3).astype(np.float32) * 0.01)
    dirs = rng.randn(4, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    params = mlp.init(jax.random.PRNGKey(0), means, stds,
                      viewdirs=jnp.asarray(dirs))
    out = mlp.apply(params, means, stds, viewdirs=jnp.asarray(dirs))
    assert out["rgb"].shape == (4, 6, 3)
    assert out["normals_pred"].shape == (4, 6, 3)
    assert out["roughness"].shape == (4, 6, 1)
    # Unit normals except where the raw gradient is below the normalize eps.
    norms = np.linalg.norm(np.asarray(out["normals_pred"]), axis=-1)
    assert np.all(norms <= 1.0 + 1e-3)
    assert np.median(norms) > 0.99
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_finite_difference_normals_point_away_from_density():
    # Density normals should be unit and finite.
    grid = configs.GridConfig(level_dim=2, base_resolution=4,
                              desired_resolution=16, log2_hashmap_size=8)
    cfg = configs.MLPConfig(grid=grid, bottleneck_width=16,
                            net_width_viewdirs=16,
                            disable_density_normals=False, deg_view=2)
    mlp = ZipMLP(cfg)
    rng = np.random.RandomState(1)
    means = jnp.asarray(rng.rand(4, 5, 3, 3).astype(np.float32) * 0.5)
    stds = jnp.asarray(rng.rand(4, 5, 3).astype(np.float32) * 0.01)
    params = mlp.init(jax.random.PRNGKey(0), means, stds)
    out = mlp.apply(params, means, stds)
    n = np.asarray(out["normals"])
    assert n.shape == (4, 5, 3)
    assert np.isfinite(n).all()
    norms = np.linalg.norm(n, axis=-1)
    assert np.all((norms < 1.0 + 1e-4))


def test_orientation_and_predicted_normal_losses():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.dirichlet(np.ones(8), size=4).astype(np.float32))
    n = rng.randn(4, 8, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rng.randn(4, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    lo = float(ref_utils.orientation_loss(w, jnp.asarray(n), jnp.asarray(v)))
    assert lo >= 0
    # Normals exactly facing the camera: zero orientation loss.
    n_face = np.tile(-v[:, None], (1, 8, 1))
    lo0 = float(ref_utils.orientation_loss(w, jnp.asarray(n_face),
                                           jnp.asarray(v)))
    assert lo0 < 1e-8
    # Identical normals: zero predicted-normal loss.
    lp = float(ref_utils.predicted_normal_loss(w, jnp.asarray(n),
                                               jnp.asarray(n)))
    assert abs(lp) < 1e-5


def test_road_augment_preserves_hit_points():
    rng = np.random.RandomState(3)
    n = 32
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = dict(
        origins=rng.randn(n, 3).astype(np.float32),
        directions=d, viewdirs=d, base_x=d, base_y=d,
        depth=(rng.rand(n).astype(np.float32) * 5 + 1),
        aug_mask=np.zeros(n, np.float32))
    target = batch["origins"] + batch["depth"][:, None] * d
    out = road_augment.batch_perturb(dict(batch), delta=0.1, rng=rng)
    new_target = out["origins"] + out["depth"][:, None] * out["directions"]
    np.testing.assert_allclose(new_target, target, atol=1e-4)
    assert np.abs(out["origins"] - batch["origins"]).max() <= 0.11
