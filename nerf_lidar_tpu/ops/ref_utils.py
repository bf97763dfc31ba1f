"""Reflection-direction utilities + integrated directional encoding (IDE).

JAX rewrite of reference internal/ref_utils.py (itself from ref-NeRF): unit
reflection directions, weighted mean angular error, and the von-Mises-Fisher
integrated spherical-harmonic direction encoding (Eqs. 6-8 of
arxiv.org/abs/2112.03907). The complex Vandermonde formulation is expanded
into real/imaginary parts explicitly (TPU has no complex support in the fast
path)."""

from __future__ import annotations

import math as pymath
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def reflect(viewdirs, normals):
    """u = 2 dot(n, v) n - v."""
    return (2.0 * jnp.sum(normals * viewdirs, axis=-1, keepdims=True)
            * normals - viewdirs)


def l2_normalize(x, eps: float = 1e-5):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def compute_weighted_mae(weights, normals, normals_gt):
    """Weighted mean angular error in degrees."""
    eps = 1e-3
    one_eps = 1 - eps
    dots = jnp.clip((normals * normals_gt).sum(-1), -one_eps, one_eps)
    return ((weights * jnp.arccos(dots)).sum() / weights.sum()
            * 180.0 / jnp.pi)


def generalized_binomial_coeff(a, k):
    return np.prod(a - np.arange(k)) / pymath.factorial(k)


def assoc_legendre_coeff(l, m, k):
    """Coefficient of cos^k sin^m in P_l^m(cos theta)."""
    return ((-1) ** m * 2**l * pymath.factorial(l) / pymath.factorial(k)
            / pymath.factorial(l - k - m)
            * generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l))


def sph_harm_coeff(l, m, k):
    return (np.sqrt((2.0 * l + 1.0) * pymath.factorial(l - m)
                    / (4.0 * np.pi * pymath.factorial(l + m)))
            * assoc_legendre_coeff(l, m, k))


def get_ml_array(deg_view: int) -> np.ndarray:
    ml_list = []
    for i in range(deg_view):
        l = 2**i
        for m in range(l + 1):
            ml_list.append((m, l))
    return np.array(ml_list).T


def generate_ide_fn(deg_view: int) -> Callable:
    """Integrated directional encoding fn(xyz [..., 3], kappa_inv [..., 1])
    -> [..., 2 * n_harmonics], real-arithmetic formulation."""
    if deg_view > 5:
        raise ValueError("Only deg_view of at most 5 is numerically stable.")
    ml_array = get_ml_array(deg_view)
    l_max = 2 ** (deg_view - 1)

    mat = np.zeros((l_max + 1, ml_array.shape[1]))
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = sph_harm_coeff(l, m, k)
    mat_j = jnp.asarray(mat, jnp.float32)
    m_arr = jnp.asarray(ml_array[0], jnp.float32)
    l_arr = jnp.asarray(ml_array[1], jnp.float32)
    m_int = ml_array[0].astype(int)

    def ide_fn(xyz, kappa_inv):
        x = xyz[..., 0:1]
        y = xyz[..., 1:2]
        z = xyz[..., 2:3]

        vmz = jnp.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
        # (x + iy)^m expanded via polar form: r^m (cos(m phi) + i sin(m phi)).
        r = jnp.sqrt(jnp.maximum(x**2 + y**2, 1e-20))
        phi = jnp.arctan2(y, x)
        rm = jnp.concatenate([r**m for m in m_int], axis=-1)
        vmxy_re = rm * jnp.cos(m_arr * phi)
        vmxy_im = rm * jnp.sin(m_arr * phi)

        assoc = vmz @ mat_j  # [..., n_harm]
        sigma = 0.5 * l_arr * (l_arr + 1)
        atten = jnp.exp(-sigma * kappa_inv)
        sph_re = vmxy_re * assoc * atten
        sph_im = vmxy_im * assoc * atten
        return jnp.concatenate([sph_re, sph_im], axis=-1)

    return ide_fn


def generate_dir_enc_fn(deg_view: int) -> Callable:
    """Plain spherical-harmonic direction encoding (kappa_inv = 0)."""
    ide_fn = generate_ide_fn(deg_view)

    def dir_enc_fn(xyz):
        return ide_fn(xyz, jnp.zeros_like(xyz[..., :1]))

    return dir_enc_fn


def orientation_loss(weights, normals, viewdirs):
    """Ref-NeRF orientation penalty: normals should not face away from the
    camera (train_utils.py:184-200 inner term)."""
    v = -viewdirs
    n_dot_v = (normals * v[..., None, :]).sum(axis=-1)
    return (weights * jnp.minimum(0.0, n_dot_v) ** 2).sum(axis=-1).mean()


def predicted_normal_loss(weights, normals, normals_pred):
    """Consistency between density normals and predicted normals
    (train_utils.py:224-240 inner term)."""
    return jnp.mean(
        (weights * (1.0 - jnp.sum(normals * normals_pred, axis=-1))).sum(-1))
