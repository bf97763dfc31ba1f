"""Step-function resampling toolkit (hierarchical sampling backbone).

TPU-native rewrite of reference internal/stepfun.py. Everything here is
dense, static-shape tensor math: the searchsorted / CDF inversion are the
masked-extrema formulation (reference stepfun.py:6-25, math.py:89-108) that
maps to VPU reductions rather than binary-search control flow. Randomness is
threaded explicitly via jax.random keys (`key=None` means deterministic).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import mathx

_EPS = float(np.finfo(np.float32).eps)


def searchsorted(a: jax.Array, v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(idx_lo, idx_hi) s.t. a[idx_lo] <= v < a[idx_hi] (clamped at ends).

    a: [..., M] sorted; v: [..., N]. Dense O(M*N) comparisons.
    """
    i = jnp.arange(a.shape[-1])
    v_ge_a = v[..., None, :] >= a[..., :, None]
    idx_lo = jnp.max(
        jnp.where(v_ge_a, i[:, None], i[:1, None]), axis=-2)
    idx_hi = jnp.min(
        jnp.where(~v_ge_a, i[:, None], i[-1:, None]), axis=-2)
    return idx_lo, idx_hi


def query(tq, t, y, outside_value=0):
    """Look up step function (t, y) at locations tq."""
    idx_lo, idx_hi = searchsorted(t, tq)
    yq = jnp.where(idx_lo == idx_hi, outside_value,
                   jnp.take_along_axis(y, idx_lo, axis=-1))
    return yq


def inner_outer(t0, t1, y1):
    """Inner and outer measures of (t1, y1) on intervals t0."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    idx_lo, idx_hi = searchsorted(t1, t0)
    cy1_lo = jnp.take_along_axis(cy1, idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1, idx_hi, axis=-1)
    y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
    y0_inner = jnp.where(idx_hi[..., :-1] <= idx_lo[..., 1:],
                         cy1_lo[..., 1:] - cy1_hi[..., :-1], 0)
    return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env):
    """Proposal-envelope loss: penalize w exceeding the envelope w_outer."""
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.maximum(w - w_outer, 0) ** 2 / (w + _EPS)


def weight_to_pdf(t, w):
    return w / jnp.maximum(t[..., 1:] - t[..., :-1], _EPS)


def pdf_to_weight(t, p):
    return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
    """Dilate (max-pool) a non-negative step function."""
    t0 = t[..., :-1] - dilation
    t1 = t[..., 1:] + dilation
    t_dilate = jnp.sort(jnp.concatenate([t, t0, t1], axis=-1), axis=-1)
    t_dilate = jnp.clip(t_dilate, *domain)
    w_dilate = jnp.max(
        jnp.where(
            (t0[..., None, :] <= t_dilate[..., None])
            & (t1[..., None, :] > t_dilate[..., None]),
            w[..., None, :], 0),
        axis=-1)[..., :-1]
    return t_dilate, w_dilate


def max_dilate_weights(t, w, dilation, domain=(-jnp.inf, jnp.inf),
                       renormalize=False):
    """Dilate a set of weights (as a PDF) via max-pooling."""
    p = weight_to_pdf(t, w)
    t_dilate, p_dilate = max_dilate(t, p, dilation, domain=domain)
    w_dilate = pdf_to_weight(t_dilate, p_dilate)
    if renormalize:
        w_dilate = w_dilate / jnp.maximum(
            jnp.sum(w_dilate, axis=-1, keepdims=True), _EPS)
    return t_dilate, w_dilate


def integrate_weights(w: jax.Array) -> jax.Array:
    """CDF endpoints of a weight vector that sums to 1: [..., M] -> [..., M+1]."""
    cw = jnp.minimum(1, jnp.cumsum(w[..., :-1], axis=-1))
    shape = cw.shape[:-1] + (1,)
    return jnp.concatenate(
        [jnp.zeros(shape, cw.dtype), cw, jnp.ones(shape, cw.dtype)], axis=-1)


def invert_cdf(u, t, w_logits):
    """Invert the CDF defined by (t, softmax(w_logits)) at points u."""
    w = jax.nn.softmax(w_logits, axis=-1)
    cw = integrate_weights(w)
    return mathx.sorted_interp(u, cw, t)


def sample(key: Optional[jax.Array], t, w_logits, num_samples: int,
           single_jitter: bool = False, deterministic_center: bool = False):
    """Piecewise-constant PDF sampling from a step function.

    key: jax.random key, or None for deterministic linspace sampling.
    t: [..., M+1] sorted bin endpoints; w_logits: [..., M] bin weight logits.
    Returns [..., num_samples].
    """
    if key is None:
        if deterministic_center:
            pad = 1 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - _EPS, num_samples)
        else:
            u = jnp.linspace(0, 1.0 - _EPS, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        # u in [0, 1): strided linspace plus a bounded jitter so samples stay
        # sorted (reference stepfun.py:210-216).
        u_max = _EPS + (1 - _EPS) / num_samples
        max_jitter = (1 - u_max) / (num_samples - 1) - _EPS
        d = 1 if single_jitter else num_samples
        u = (jnp.linspace(0, 1 - u_max, num_samples)
             + jax.random.uniform(key, t.shape[:-1] + (d,)) * max_jitter)
    return invert_cdf(u, t, w_logits)


def sample_intervals(key: Optional[jax.Array], t, w_logits, num_samples: int,
                     single_jitter: bool = False,
                     domain=(-jnp.inf, jnp.inf)):
    """Sample *intervals* (fenceposts) from a step function: [..., S+1]."""
    if num_samples <= 1:
        raise ValueError(f"num_samples must be > 1, is {num_samples}.")
    centers = sample(key, t, w_logits, num_samples, single_jitter,
                     deterministic_center=True)
    mid = (centers[..., 1:] + centers[..., :-1]) / 2
    minval, maxval = domain
    first = jnp.maximum(2 * centers[..., :1] - mid[..., :1], minval)
    last = jnp.minimum(2 * centers[..., -1:] - mid[..., -1:], maxval)
    return jnp.concatenate([first, mid, last], axis=-1)


def lossfun_distortion(t, w):
    """iint w_i w_j |t_i - t_j|: mip-NeRF 360 distortion loss."""
    ut = (t[..., 1:] + t[..., :-1]) / 2
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
    return loss_inter + loss_intra


def weighted_percentile(t, w, ps):
    """Percentiles of a step function; w must sum to 1. ps: list of floats."""
    cw = integrate_weights(w)
    ps_arr = jnp.asarray(ps, dtype=t.dtype) / 100
    ps_b = jnp.broadcast_to(ps_arr, t.shape[:-1] + (len(ps),))
    return mathx.sorted_interp(ps_b, cw, t)


def resample(t, tp, vp, use_avg: bool = False):
    """Resample step function (tp, vp) onto intervals t."""
    if use_avg:
        wp = jnp.diff(tp, axis=-1)
        v_numer = resample(t, tp, vp * wp, use_avg=False)
        v_denom = resample(t, tp, wp, use_avg=False)
        return v_numer / jnp.maximum(v_denom, _EPS)
    acc = jnp.cumsum(vp, axis=-1)
    acc0 = jnp.concatenate([jnp.zeros(acc.shape[:-1] + (1,), acc.dtype), acc],
                           axis=-1)
    acc0_resampled = mathx.sorted_interp(t, tp, acc0)
    return jnp.diff(acc0_resampled, axis=-1)


def blur_stepfun(x, y, r: float):
    """Convolve a step function (x, y) with a box filter of radius r.

    Returns (xr, yr): the blurred piecewise-linear function's knots (2M knots)
    and values, with yr[..., 0] = 0 (reference stepfun.py:425-433). Used by
    the ZipNeRF anti-aliased interlevel loss.
    """
    xr, xr_idx = jax.lax.sort_key_val(
        jnp.concatenate([x - r, x + r], axis=-1),
        jnp.broadcast_to(jnp.arange(2 * x.shape[-1]),
                         x.shape[:-1] + (2 * x.shape[-1],)))
    y1 = (jnp.concatenate([y, jnp.zeros_like(y[..., :1])], axis=-1)
          - jnp.concatenate([jnp.zeros_like(y[..., :1]), y], axis=-1)) / (2 * r)
    y2 = jnp.take_along_axis(
        jnp.concatenate([y1, -y1], axis=-1), xr_idx[..., :-1], axis=-1)
    yr = jnp.maximum(
        jnp.cumsum((xr[..., 1:] - xr[..., :-1]) * jnp.cumsum(y2, axis=-1),
                   axis=-1), 0)
    yr = jnp.concatenate([jnp.zeros_like(yr[..., :1]), yr], axis=-1)
    return xr, yr
