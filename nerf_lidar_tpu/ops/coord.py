"""Ray-distance warps and the mip-NeRF-360 scene contraction.

TPU-native rewrite of reference internal/coord.py. The Gaussian push-through
(`track_linearize`) uses the closed-form determinant of the contraction
Jacobian (reference coord.py:51-63) instead of autodiff Jacobians, so the
whole thing is a handful of fused elementwise VPU ops.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import mathx

_EPS = float(np.finfo(np.float32).eps)


def contract(x: jax.Array) -> jax.Array:
    """mip-NeRF 360 contraction (Eq. 10 of arxiv.org/abs/2111.12077)."""
    x_mag_sq = jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), _EPS)
    x_mag = jnp.sqrt(x_mag_sq)
    z = jnp.where(x_mag_sq <= 1, x, ((2 * x_mag - 1) / x_mag_sq) * x)
    return z


def inv_contract(z: jax.Array) -> jax.Array:
    """Inverse of contract()."""
    z_mag_sq = jnp.maximum(jnp.sum(z**2, axis=-1, keepdims=True), _EPS)
    x = jnp.where(z_mag_sq <= 1, z, z / (2 * jnp.sqrt(z_mag_sq) - z_mag_sq))
    return x


def contract_mean_std(x: jax.Array, std: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Contract a batch of isotropic Gaussians (mean, scalar std).

    The std is scaled by det(J)^(1/3) of the contraction Jacobian, computed
    in closed form (reference coord.py:51-63): for |x| > 1 the Jacobian of
    ((2|x|-1)/|x|^2) x has det = (1/|x|^2) * (2/|x| - 1/|x|^2)^2.
    """
    x_mag_sq = jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), _EPS)
    x_mag = jnp.sqrt(x_mag_sq)
    mask = x_mag_sq <= 1
    z = jnp.where(mask, x, ((2 * x_mag - 1) / x_mag_sq) * x)
    det = ((1 / x_mag_sq) * (2 / x_mag - 1 / x_mag_sq) ** 2)[..., 0]
    std = jnp.where(mask[..., 0], std, det ** (1.0 / x.shape[-1]) * std)
    return z, std


def track_linearize(fn: str, mean: jax.Array, std: jax.Array):
    """Push isotropic Gaussians through `fn` a la a Kalman filter update."""
    if fn != "contract":
        raise NotImplementedError(fn)
    return contract_mean_std(mean, std)


def power_transformation(x, lam: float):
    """ZipNeRF Eq. 4 power transformation."""
    lam_1 = abs(lam - 1)
    return lam_1 / lam * ((x / lam_1 + 1) ** lam - 1)


def inv_power_transformation(x, lam: float):
    lam_1 = abs(lam - 1)
    return ((x * lam / lam_1 + 1 + _EPS) ** (1 / lam) - 1) * lam_1


def construct_ray_warps(fn, t_near, t_far, lam=None):
    """Bijection between metric distance t and normalized distance s in [0,1].

    Mirrors reference coord.py:121-162. `fn` is one of None, 'piecewise',
    'power_transformation', 'reciprocal', 'log', 'exp', 'sqrt', 'square'.
    Returns (t_to_s, s_to_t).
    """
    if fn is None:
        fn_fwd = lambda x: x
        fn_inv = lambda x: x
    elif fn == "piecewise":
        fn_fwd = lambda x: jnp.where(x < 1, 0.5 * x, 1 - 0.5 / x)
        fn_inv = lambda x: jnp.where(x < 0.5, 2 * x, 0.5 / (1 - x))
    elif fn == "power_transformation":
        fn_fwd = lambda x: power_transformation(x * 2, lam=lam)
        fn_inv = lambda y: inv_power_transformation(y, lam=lam) / 2
    elif fn == "reciprocal":
        fn_fwd = lambda x: 1.0 / x
        fn_inv = lambda x: 1.0 / x
    elif fn == "log":
        fn_fwd = jnp.log
        fn_inv = jnp.exp
    elif fn == "exp":
        fn_fwd = jnp.exp
        fn_inv = jnp.log
    elif fn == "sqrt":
        fn_fwd = jnp.sqrt
        fn_inv = jnp.square
    elif fn == "square":
        fn_fwd = jnp.square
        fn_inv = jnp.sqrt
    else:
        raise NotImplementedError(fn)

    s_near, s_far = fn_fwd(t_near), fn_fwd(t_far)
    t_to_s = lambda t: (fn_fwd(t) - s_near) / (s_far - s_near)
    s_to_t = lambda s: fn_inv(s * s_far + (1 - s) * s_near)
    return t_to_s, s_to_t


def expected_sin(mean, var):
    """E[sin(x)] for x ~ N(mean, var)."""
    return jnp.exp(-0.5 * var) * mathx.safe_sin(mean)


def integrated_pos_enc(mean, var, min_deg: int, max_deg: int):
    """mip-NeRF integrated positional encoding."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = mean.shape[:-1] + (-1,)
    scaled_mean = (mean[..., None, :] * scales[:, None]).reshape(shape)
    scaled_var = (var[..., None, :] * scales[:, None] ** 2).reshape(shape)
    return expected_sin(
        jnp.concatenate([scaled_mean, scaled_mean + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([scaled_var] * 2, axis=-1))


def pos_enc(x, min_deg: int, max_deg: int, append_identity: bool = True):
    """Classic NeRF positional encoding."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = x.shape[:-1] + (-1,)
    scaled_x = (x[..., None, :] * scales[:, None]).reshape(shape)
    four_feat = jnp.sin(
        jnp.concatenate([scaled_x, scaled_x + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, four_feat], axis=-1)
    return four_feat
