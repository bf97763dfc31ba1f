import jax
import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu.ops import render


def _ray_batch(B=4, S=8):
    rng = np.random.RandomState(0)
    tdist = np.sort(rng.rand(B, S + 1).astype(np.float32) * 5, axis=-1)
    origins = rng.randn(B, 3).astype(np.float32)
    directions = rng.randn(B, 3).astype(np.float32)
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
    # Orthonormal pixel basis.
    up = np.array([0.0, 0.0, 1.0], np.float32)
    bx = np.cross(directions, up)
    bx /= np.linalg.norm(bx, axis=-1, keepdims=True)
    by = np.cross(directions, bx)
    radii = np.full((B, 1), 1e-3, np.float32)
    return (jnp.asarray(tdist), jnp.asarray(origins), jnp.asarray(directions),
            jnp.asarray(bx), jnp.asarray(by), jnp.asarray(radii))


def test_cast_rays_shapes_and_axial_positions():
    tdist, origins, directions, bx, by, radii = _ray_batch()
    means, stds = render.cast_rays(tdist, origins, directions, bx, by, radii,
                                   key=None, n=7, m=3)
    assert means.shape == (4, 8, 7, 3)
    assert stds.shape == (4, 8, 7)
    # Multisample points lie near the ray axis: project back.
    t_axis = np.einsum("bsnc,bc->bsn", np.asarray(means)
                       - np.asarray(origins)[:, None, None], np.asarray(directions))
    t0 = np.asarray(tdist)[..., :-1]
    t1 = np.asarray(tdist)[..., 1:]
    assert np.all(t_axis >= t0[..., None] - 1e-4)
    assert np.all(t_axis <= t1[..., None] + 1e-4)
    # Perpendicular offset is bounded by the spiral radius r*t/2.
    perp = (np.asarray(means) - np.asarray(origins)[:, None, None]
            - t_axis[..., None] * np.asarray(directions)[:, None, None])
    r = np.linalg.norm(perp, axis=-1)
    assert np.all(r <= np.asarray(radii)[..., None] * t_axis / 2 + 1e-5)


def test_compute_alpha_weights_sum_le_one_and_opaque():
    tdist = jnp.linspace(0.0, 1.0, 9)[None].repeat(3, 0)
    dirs = jnp.asarray(np.tile([0.0, 0.0, 1.0], (3, 1)).astype(np.float32))
    density = jnp.asarray(np.random.RandomState(1).rand(3, 8).astype(np.float32))
    w, alpha, trans = render.compute_alpha_weights(density, tdist, dirs)
    assert np.all(np.asarray(w).sum(-1) <= 1.0 + 1e-6)
    w_op, _, _ = render.compute_alpha_weights(density, tdist, dirs,
                                              opaque_background=True)
    np.testing.assert_allclose(np.asarray(w_op).sum(-1), 1.0, rtol=1e-5)


def test_volumetric_rendering_opaque_single_surface():
    # One fully opaque sample at bin k: rgb == that sample's rgb, depth == its
    # midpoint.
    B, S = 2, 8
    tdist = jnp.linspace(1.0, 3.0, S + 1)[None].repeat(B, 0)
    k = 5
    weights = jnp.asarray(np.eye(S, dtype=np.float32)[k][None].repeat(B, 0))
    rgbs = jnp.asarray(np.random.RandomState(2).rand(B, S, 3).astype(np.float32))
    out = render.volumetric_rendering(
        rgbs, weights, tdist, bg_rgbs=jnp.asarray(0.0),
        t_far=jnp.full((B, 1), 3.0), compute_extras=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(rgbs)[:, k], atol=1e-6)
    tm = np.asarray(0.5 * (tdist[..., k] + tdist[..., k + 1]))
    np.testing.assert_allclose(np.asarray(out["depth"]), tm, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["distance_median"]), tm,
                               atol=0.15)


def test_volumetric_rendering_semantic_detached():
    B, S, K = 2, 4, 3
    tdist = jnp.linspace(0.0, 1.0, S + 1)[None].repeat(B, 0)
    density = jnp.ones((B, S)) * 2.0
    dirs = jnp.asarray(np.tile([0.0, 0.0, 1.0], (B, 1)).astype(np.float32))
    sem = jax.nn.softmax(jnp.asarray(
        np.random.RandomState(3).randn(B, S, K).astype(np.float32)))

    def f(dens):
        w, _, _ = render.compute_alpha_weights(dens, tdist, dirs)
        out = render.volumetric_rendering(
            jnp.zeros((B, S, 3)), w, tdist, jnp.asarray(0.0),
            jnp.full((B, 1), 1.0), False, semantic=sem, sem_detach=True)
        return out["semantic"].sum()

    g = jax.grad(f)(density)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
