import jax
import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu.ops import stepfun


def test_searchsorted_matches_numpy():
    rng = np.random.RandomState(0)
    a = np.sort(rng.rand(3, 8), axis=-1).astype(np.float32)
    v = rng.rand(3, 16).astype(np.float32)
    lo, hi = stepfun.searchsorted(jnp.asarray(a), jnp.asarray(v))
    lo, hi = np.asarray(lo), np.asarray(hi)
    for i in range(3):
        for j in range(16):
            x = v[i, j]
            if x < a[i, 0]:
                assert lo[i, j] == 0 and hi[i, j] == 0
            elif x >= a[i, -1]:
                assert lo[i, j] == 7 and hi[i, j] == 7
            else:
                assert a[i, lo[i, j]] <= x < a[i, hi[i, j]]
                assert hi[i, j] == lo[i, j] + 1


def test_integrate_weights_endpoints():
    w = jnp.asarray(np.random.RandomState(1).dirichlet(np.ones(8), size=4)
                    .astype(np.float32))
    cw = stepfun.integrate_weights(w)
    assert cw.shape == (4, 9)
    np.testing.assert_allclose(np.asarray(cw[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(cw[:, -1]), 1.0)
    assert np.all(np.diff(np.asarray(cw), axis=-1) >= -1e-6)


def test_invert_cdf_uniform_weights_is_linear():
    t = jnp.linspace(0.0, 1.0, 9)[None].repeat(2, 0)
    logits = jnp.zeros((2, 8))
    u = jnp.linspace(0.0, 0.999, 17)[None].repeat(2, 0)
    out = stepfun.invert_cdf(u, t, logits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(u), atol=1e-3)


def test_sample_deterministic_sorted_and_in_domain():
    t = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)
    logits = jnp.asarray(np.random.RandomState(2).randn(4, 8).astype(np.float32))
    s = stepfun.sample(None, t, logits, 16)
    s = np.asarray(s)
    assert np.all(np.diff(s, axis=-1) >= 0)
    assert s.min() >= 0 and s.max() <= 1


def test_sample_random_sorted():
    key = jax.random.PRNGKey(0)
    t = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)
    logits = jnp.asarray(np.random.RandomState(3).randn(4, 8).astype(np.float32))
    for single_jitter in (True, False):
        s = np.asarray(stepfun.sample(key, t, logits, 16,
                                      single_jitter=single_jitter))
        assert np.all(np.diff(s, axis=-1) >= -1e-6)


def test_sample_intervals_fenceposts():
    key = jax.random.PRNGKey(1)
    t = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)
    logits = jnp.zeros((4, 8))
    si = stepfun.sample_intervals(key, t, logits, 16, single_jitter=True,
                                  domain=(0.0, 1.0))
    si = np.asarray(si)
    assert si.shape == (4, 17)
    assert np.all(np.diff(si, axis=-1) >= -1e-6)
    assert si.min() >= 0 and si.max() <= 1


def test_lossfun_distortion_against_bruteforce():
    rng = np.random.RandomState(4)
    t = np.sort(rng.rand(2, 9), axis=-1).astype(np.float32)
    w = rng.dirichlet(np.ones(8), size=2).astype(np.float32)
    got = np.asarray(stepfun.lossfun_distortion(jnp.asarray(t), jnp.asarray(w)))
    # Brute force double-sum.
    for b in range(2):
        ut = (t[b, 1:] + t[b, :-1]) / 2
        inter = sum(w[b, i] * w[b, j] * abs(ut[i] - ut[j])
                    for i in range(8) for j in range(8))
        intra = np.sum(w[b] ** 2 * (t[b, 1:] - t[b, :-1])) / 3
        assert abs(got[b] - (inter + intra)) < 1e-5


def test_max_dilate_weights_monotone_dilation():
    t = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.asarray(np.eye(8, dtype=np.float32)[3][None])
    td, wd = stepfun.max_dilate_weights(t, w, 0.1, domain=(0.0, 1.0),
                                        renormalize=True)
    # Dilated support strictly contains the original spike bin.
    support = np.asarray(td)[0][np.r_[np.asarray(wd)[0] > 0, False]]
    assert support.min() < float(t[0, 3]) + 1e-6
    assert np.asarray(wd).sum() > 0.99


def test_lossfun_outer_zero_when_enveloped():
    t = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.asarray(np.full((1, 8), 1 / 8, np.float32))
    # Envelope = same histogram: loss must be ~0.
    loss = stepfun.lossfun_outer(t, w, t, w)
    assert float(jnp.sum(loss)) < 1e-6
    # Envelope that misses mass must produce positive loss.
    w_env = jnp.asarray(np.eye(8, dtype=np.float32)[0][None])
    loss2 = stepfun.lossfun_outer(t, w, t, w_env)
    assert float(jnp.sum(loss2)) > 0


def test_blur_stepfun_preserves_mass():
    rng = np.random.RandomState(5)
    x = np.sort(rng.rand(2, 9), axis=-1).astype(np.float32)
    y = rng.rand(2, 8).astype(np.float32)
    xr, yr = stepfun.blur_stepfun(jnp.asarray(x), jnp.asarray(y), 0.01)
    xr, yr = np.asarray(xr), np.asarray(yr)
    assert xr.shape == (2, 18) and yr.shape == (2, 18)
    # Trapezoid mass of the blurred fn ~= original box mass.
    mass_orig = np.sum(y * np.diff(x, axis=-1), axis=-1)
    mass_blur = np.sum(0.5 * (yr[:, 1:] + yr[:, :-1]) * np.diff(xr, axis=-1),
                       axis=-1)
    np.testing.assert_allclose(mass_blur, mass_orig, rtol=1e-3)


def test_weighted_percentile_median_of_symmetric():
    t = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.asarray(np.full((1, 8), 1 / 8, np.float32))
    p = stepfun.weighted_percentile(t, w, [5, 50, 95])
    np.testing.assert_allclose(np.asarray(p)[0, 1], 0.5, atol=1e-3)


def test_resample_conserves_integral():
    rng = np.random.RandomState(6)
    tp = np.sort(rng.rand(2, 9), axis=-1).astype(np.float32)
    tp[:, 0], tp[:, -1] = 0.0, 1.0
    vp = rng.rand(2, 8).astype(np.float32)
    t = np.linspace(0, 1, 17, dtype=np.float32)[None].repeat(2, 0)
    v = stepfun.resample(jnp.asarray(t), jnp.asarray(tp), jnp.asarray(vp))
    np.testing.assert_allclose(np.asarray(v).sum(-1), vp.sum(-1), rtol=1e-4)
