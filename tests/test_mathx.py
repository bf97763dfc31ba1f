import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_lidar_tpu.ops import mathx


def test_erf_approx_close_to_scipy_erf():
    x = np.linspace(-3, 3, 101).astype(np.float32)
    got = np.asarray(mathx.erf_approx(jnp.asarray(x)))
    want = np.asarray(jax.lax.erf(jnp.asarray(x)))
    # The sqrt(1-exp(-4/pi x^2)) approximation is good to ~7e-3.
    assert np.max(np.abs(got - want)) < 1e-2


def test_safe_div_no_nan_forward_or_grad():
    n = jnp.array([1.0, 2.0, 3.0])
    d = jnp.array([2.0, 0.0, -4.0])
    out = mathx.safe_div(n, d)
    np.testing.assert_allclose(out, [0.5, 0.0, -0.75])
    g = jax.grad(lambda dd: mathx.safe_div(n, dd).sum())(d)
    assert np.all(np.isfinite(np.asarray(g)))


def test_safe_exp_value_and_grad_at_large_input():
    x = jnp.array([0.0, 1.0, 200.0])
    y = mathx.safe_exp(x)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(y[:2], np.exp([0.0, 1.0]), rtol=1e-6)
    g = jax.grad(lambda v: mathx.safe_exp(v).sum())(x)
    # Gradient of the clamped region equals exp(88), not 0.
    assert np.asarray(g)[-1] == pytest.approx(np.exp(88.0), rel=1e-5)


def test_learning_rate_decay_endpoints():
    lr0 = mathx.learning_rate_decay(0, 0.01, 0.001, 1000)
    lr1 = mathx.learning_rate_decay(1000, 0.01, 0.001, 1000)
    assert float(lr0) == pytest.approx(0.01, rel=1e-5)
    assert float(lr1) == pytest.approx(0.001, rel=1e-5)
    # Warmup scales the start.
    lr_w = mathx.learning_rate_decay(0, 0.01, 0.001, 1000,
                                     lr_delay_steps=100, lr_delay_mult=0.1)
    assert float(lr_w) == pytest.approx(0.001, rel=1e-5)


def test_sorted_interp_matches_np_interp():
    rng = np.random.RandomState(0)
    xp = np.sort(rng.rand(4, 8), axis=-1).astype(np.float32)
    fp = np.sort(rng.rand(4, 8), axis=-1).astype(np.float32)
    x = np.sort(rng.rand(4, 16), axis=-1).astype(np.float32)
    got = np.asarray(mathx.sorted_interp(
        jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp)))
    for i in range(4):
        want = np.interp(x[i], xp[i], fp[i])
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_sorted_interp_grad_finite_with_duplicate_knots():
    xp = jnp.array([[0.0, 0.5, 0.5, 1.0]])
    fp = jnp.array([[0.0, 1.0, 1.0, 2.0]])
    x = jnp.array([[0.25, 0.5, 0.75]])
    g = jax.grad(lambda f: mathx.sorted_interp(x, xp, f).sum())(fp)
    assert np.all(np.isfinite(np.asarray(g)))
