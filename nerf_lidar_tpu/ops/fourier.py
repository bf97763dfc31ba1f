"""Matmul-resident spectral position encoding (the TPU-native field).

Hash-grid fields are gather-bound on TPU: v5e table gathers run ~182M
idx/s below 2^17 rows and ~45M above, and the scatter-add backward ~55M
idx/s (experiments/scatter_variants.py, experiments/gather_bench*.py) —
none of which touches the MXU. This encoder replaces the *hashed*
high-resolution levels with random Fourier features: one [N, 3] @ [3, F]
matmul + sin/cos, both forward and backward pure MXU/VPU work with zero
table traffic. Low-frequency structure stays in a small dense (tiled,
direct-indexed) grid whose rows sit below the gather cliff.

Anti-aliasing is analytic: for a Gaussian multisample cloud with std
sigma, E[sin(2 pi f . x)] is damped by exp(-2 pi^2 sigma^2 |f|^2) — the
integrated-positional-encoding identity (mip-NeRF eq. 7; the reference
implements the same identity for diagonal covariances in coord.py
expected_sin). The hash path needs n=7 multisamples *per level* to
approximate this; the spectral path gets it in closed form, so the erf
re-weighting machinery is unnecessary for these features.

Frequencies are fixed (non-trainable) random directions with log-spaced
magnitudes spanning the band the replaced hash levels covered (Fourier
feature networks, Tancik et al. 2020); amplitude shaping is learned by
the first trunk Dense layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_frequency_matrix(key, num_freqs: int, min_res: float,
                          max_res: float) -> jnp.ndarray:
    """[3, F] frequency matrix: random unit directions times log-spaced
    magnitudes in [min_res, max_res] cycles per unit cube."""
    k1, _ = jax.random.split(jax.random.PRNGKey(key) if isinstance(key, int)
                             else key)
    dirs = jax.random.normal(k1, (3, num_freqs))
    dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)
    mags = jnp.exp(jnp.linspace(np.log(min_res), np.log(max_res),
                                num_freqs))
    return (dirs * mags[None, :]).astype(jnp.float32)


def fourier_encode(x01: jax.Array, stds: jax.Array,
                   freqs: jax.Array) -> jax.Array:
    """IPE-damped Fourier features, averaged over the multisample axis.

    x01: [..., n, 3] positions in [0, 1]; stds: [..., n] isotropic Gaussian
    stds in the same units; freqs: [3, F].
    Returns [..., 2F] features (sin || cos), exact expectations under the
    per-sample Gaussians, mean-pooled over n.
    """
    two_pi = 2.0 * jnp.pi
    phase = two_pi * (x01 @ freqs)  # [..., n, F]
    f2 = jnp.sum(freqs * freqs, axis=0)  # [F]
    damp = jnp.exp(-0.5 * (two_pi * stds[..., None]) ** 2 * f2)  # [..., n, F]
    feats = jnp.concatenate(
        [jnp.sin(phase) * damp, jnp.cos(phase) * damp], axis=-1)
    return feats.mean(axis=-2)


def fourier_encode_pooled(x01: jax.Array, stds: jax.Array,
                          freqs: jax.Array) -> jax.Array:
    """Single-Gaussian IPE Fourier features (mip-NeRF eq. 7 proper).

    Collapses the n-point multisample cloud to ONE isotropic Gaussian per
    frustum — mean of means, variance = mean per-sample variance + spread
    of the means — then takes the exact expectation under it:
    E[sin(2 pi f.x)] = sin(2 pi f.mu) exp(-2 pi^2 sigma^2 |f|^2).

    The cloud exists because hash grids cannot integrate analytically
    (ZipNeRF's workaround); a spectral band can, so the n-fold sin/cos +
    phase-matmul work is pure overhead here. 1/n the transcendentals and
    matmul FLOPs of `fourier_encode`; differs from it only by Jensen-gap
    terms of the same order as the multisample approximation itself
    (measured on the oracle scene: equal-step PSNR within noise).

    x01: [..., n, 3]; stds: [..., n]; freqs: [3, F]. Returns [..., 2F].
    """
    two_pi = 2.0 * jnp.pi
    mu = x01.mean(axis=-2)                                   # [..., 3]
    # Isotropic pooled variance: E[sigma_i^2] + per-axis spread of means.
    spread = ((x01 - mu[..., None, :]) ** 2).mean(axis=(-2, -1))
    sigma2 = (stds ** 2).mean(axis=-1) + spread              # [...]
    phase = two_pi * (mu @ freqs)                            # [..., F]
    f2 = jnp.sum(freqs * freqs, axis=0)                      # [F]
    damp = jnp.exp(-0.5 * two_pi ** 2 * sigma2[..., None] * f2)
    return jnp.concatenate([jnp.sin(phase) * damp,
                            jnp.cos(phase) * damp], axis=-1)
