"""Math helpers (TPU-native rewrite of reference internal/math.py semantics).

Reference behaviors reproduced (see /root/reference NeRF_LiDAR/zipnerf/
internal/math.py): approximate erf (math.py:6-8), safe trig (math.py:19-29),
safe_exp with custom large-input gradient (math.py:32-42), log-lerp LR decay
(math.py:45-86), and the O(M*N) masked-extrema `sorted_interp` /
`sorted_interp_quad` (math.py:89-131) which are already TPU-shaped (no
data-dependent control flow, static shapes).

All functions are pure jnp; gradients are NaN-safe via the double-`where`
trick rather than post-hoc nan_to_num.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_TINY = 1e-20


def erf_approx(x: jax.Array) -> jax.Array:
    """sign(x) * sqrt(1 - exp(-4/pi x^2)): cheap erf (reference math.py:6-8)."""
    return jnp.sign(x) * jnp.sqrt(1.0 - jnp.exp(-(4.0 / jnp.pi) * x**2))


def safe_div(n: jax.Array, d: jax.Array) -> jax.Array:
    """n/d with 0 where d == 0, and no NaN in forward or backward."""
    d_ok = d != 0.0
    safe_d = jnp.where(d_ok, d, 1.0)
    return jnp.where(d_ok, n / safe_d, 0.0)


def safe_sqrt(x: jax.Array, eps: float = _TINY) -> jax.Array:
    """sqrt clamped away from 0 so the gradient is finite."""
    return jnp.sqrt(jnp.maximum(x, eps))


def safe_trig_helper(x, fn, t=100.0 * np.pi):
    return fn(jnp.where(jnp.abs(x) < t, x, x % t))


def safe_cos(x: jax.Array) -> jax.Array:
    return safe_trig_helper(x, jnp.cos)


def safe_sin(x: jax.Array) -> jax.Array:
    return safe_trig_helper(x, jnp.sin)


@jax.custom_jvp
def safe_exp(x: jax.Array) -> jax.Array:
    """exp(min(x, 88)) whose gradient stays exp(clamped x) for large inputs."""
    return jnp.exp(jnp.minimum(x, 88.0))


@safe_exp.defjvp
def _safe_exp_jvp(primals, tangents):
    (x,) = primals
    (x_dot,) = tangents
    y = safe_exp(x)
    return y, y * x_dot


def log_lerp(t, v0: float, v1: float):
    """Interpolate log-linearly from v0 (t=0) to v1 (t=1)."""
    if v0 <= 0 or v1 <= 0:
        raise ValueError(f"Interpolants {v0} and {v1} must be positive.")
    lv0, lv1 = np.log(v0), np.log(v1)
    return jnp.exp(jnp.clip(t, 0, 1) * (lv1 - lv0) + lv0)


def learning_rate_decay(step, lr_init, lr_final, max_steps,
                        lr_delay_steps=0, lr_delay_mult=1.0):
    """Log-linear decay with an optional reverse-cosine warmup window.

    jnp version of reference math.py:54-86; works on traced `step` so it can
    live inside a jitted train step (fed to optax via a schedule fn).
    """
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp(step / max_steps, lr_init, lr_final)


def _find_interval(mask: jax.Array, y: jax.Array):
    """Given mask[..., M, N] (x >= y boundaries), bracketing values of y."""
    y0 = jnp.max(jnp.where(mask, y[..., None], y[..., :1, None]), axis=-2)
    y1 = jnp.min(jnp.where(~mask, y[..., None], y[..., -1:, None]), axis=-2)
    return y0, y1


def sorted_interp(x: jax.Array, xp: jax.Array, fp: jax.Array) -> jax.Array:
    """TPU-friendly interp() where xp and fp are sorted along the last axis.

    Matches reference math.py:89-108: a masked max/min over an [..., M, N]
    comparison grid instead of a scan — dense, static-shape work that the VPU
    eats. x: [..., N], xp/fp: [..., M].
    """
    mask = x[..., None, :] >= xp[..., :, None]
    fp0, fp1 = _find_interval(mask, fp)
    xp0, xp1 = _find_interval(mask, xp)
    offset = jnp.clip(safe_div(x - xp0, xp1 - xp0), 0, 1)
    return fp0 + offset * (fp1 - fp0)


def sorted_interp_quad(x, xp, fpdf, fcdf):
    """Quadratic-CDF interp (reference math.py:111-131), used by the
    anti-aliased interlevel loss: integrates a piecewise-linear pdf."""
    mask = x[..., None, :] >= xp[..., :, None]
    fpdf0, fpdf1 = _find_interval(mask, fpdf)
    fcdf0, _ = _find_interval(mask, fcdf)
    xp0, xp1 = _find_interval(mask, xp)
    offset = jnp.clip(safe_div(x - xp0, xp1 - xp0), 0, 1)
    return fcdf0 + (x - xp0) * (fpdf0 + fpdf1 * offset + fpdf0 * (1 - offset)) / 2
