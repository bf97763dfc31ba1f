import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_lidar_tpu.ops import coord


def test_contract_identity_inside_unit_ball():
    x = jnp.array([[0.1, -0.2, 0.3], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(coord.contract(x), x, atol=1e-6)


def test_contract_inv_contract_roundtrip():
    rng = np.random.RandomState(1)
    x = (rng.randn(100, 3) * 3).astype(np.float32)
    z = coord.contract(jnp.asarray(x))
    # Contraction maps into ball of radius 2.
    assert np.all(np.linalg.norm(np.asarray(z), axis=-1) <= 2.0 + 1e-5)
    x_back = coord.inv_contract(z)
    np.testing.assert_allclose(np.asarray(x_back), x, rtol=1e-4, atol=1e-4)


def test_contract_mean_std_det_matches_autodiff_jacobian():
    rng = np.random.RandomState(2)
    x = (rng.randn(20, 3) * 3).astype(np.float32)
    std = rng.rand(20).astype(np.float32)
    z, new_std = coord.contract_mean_std(jnp.asarray(x), jnp.asarray(std))
    # Oracle: per-point Jacobian determinant via jacfwd.
    J = jax.vmap(jax.jacfwd(coord.contract))(jnp.asarray(x))
    det = jnp.abs(jnp.linalg.det(J))
    want = np.asarray(std * np.asarray(det) ** (1 / 3))
    np.testing.assert_allclose(np.asarray(new_std), want, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(coord.contract(jnp.asarray(x))), atol=1e-6)


@pytest.mark.parametrize("fn,lam", [
    (None, None), ("piecewise", None), ("reciprocal", None),
    ("log", None), ("power_transformation", -1.5),
])
def test_ray_warp_bijection(fn, lam):
    near = jnp.full((10, 1), 0.1)
    far = jnp.full((10, 1), 10.0)
    t_to_s, s_to_t = coord.construct_ray_warps(fn, near, far, lam)
    s = jnp.linspace(0.0, 1.0, 32)[None, :] * jnp.ones((10, 1))
    t = s_to_t(s)
    s_back = t_to_s(t)
    np.testing.assert_allclose(np.asarray(s_back), np.asarray(s),
                               rtol=1e-4, atol=1e-4)
    # Endpoints map to near/far.
    np.testing.assert_allclose(np.asarray(t[:, :1]), np.asarray(near),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t[:, -1:]), np.asarray(far),
                               rtol=1e-3)


def test_pos_enc_shape_and_values():
    x = jnp.zeros((5, 3))
    enc = coord.pos_enc(x, 0, 4, append_identity=True)
    assert enc.shape == (5, 3 + 3 * 4 * 2)
    # sin(0) = 0 and sin(pi/2) = 1 halves.
    np.testing.assert_allclose(np.asarray(enc[:, 3:15]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc[:, 15:]), 1.0, atol=1e-6)


def test_integrated_pos_enc_shrinks_with_variance():
    mean = jnp.ones((4, 3)) * 0.3
    small = coord.integrated_pos_enc(mean, jnp.full((4, 3), 1e-6), 0, 4)
    large = coord.integrated_pos_enc(mean, jnp.full((4, 3), 10.0), 0, 4)
    assert np.all(np.abs(np.asarray(large)) <= np.abs(np.asarray(small)) + 1e-6)


def test_fourier_encode_pooled_matches_full_at_zero_spread():
    # With a degenerate cloud (all n points identical, equal stds) the
    # pooled single-Gaussian IPE equals the per-sample mean exactly; with
    # spread it stays close (Jensen gap bounded by the damp curvature).
    import jax.numpy as jnp

    from nerf_lidar_tpu.ops import fourier

    rng = np.random.RandomState(0)
    freqs = np.asarray(fourier.make_frequency_matrix(7, 32, 4.0, 64.0))
    x = rng.rand(50, 1, 3).astype(np.float32)
    x7 = np.repeat(x, 7, axis=1)
    stds = np.full((50, 7), 0.01, np.float32)
    full = fourier.fourier_encode(jnp.asarray(x7), jnp.asarray(stds),
                                  jnp.asarray(freqs))
    pooled = fourier.fourier_encode_pooled(jnp.asarray(x7),
                                           jnp.asarray(stds),
                                           jnp.asarray(freqs))
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(full),
                               rtol=1e-4, atol=1e-5)

    # Spread cloud: pooled is a valid IPE of the cluster - magnitudes damp
    # at high |f| at least as much as the per-sample mean's cancellation.
    x7s = x7 + rng.randn(*x7.shape).astype(np.float32) * 0.02
    full_s = np.asarray(fourier.fourier_encode(
        jnp.asarray(x7s), jnp.asarray(stds), jnp.asarray(freqs)))
    pooled_s = np.asarray(fourier.fourier_encode_pooled(
        jnp.asarray(x7s), jnp.asarray(stds), jnp.asarray(freqs)))
    assert np.abs(pooled_s - full_s).mean() < 0.08
    # Both must vanish at frequencies far above the cloud scale.
    hi = np.argsort(np.linalg.norm(freqs, axis=0))[-5:]
    assert np.abs(pooled_s[:, hi]).max() < 0.2
