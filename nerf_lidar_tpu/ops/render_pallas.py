"""Pallas TPU kernel: fused alpha-compositing (weights + composites).

Fuses reference render.py:170-284's chain — delta computation, cumulative
transmittance, alpha weights, and the RGB / depth / semantic / intensity /
acc composites — into one VMEM pass per ray block, so none of the [R, S]
intermediates (density_delta, trans, alpha, weights) round-trips HBM.
Numerically identical to ops/render.compute_alpha_weights +
volumetric_rendering's core composites (tested in
tests/test_render_pallas.py); the full-featured path (percentiles, extras)
stays in ops/render.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1.1920929e-07  # float32 eps


def _interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (CPU test mesh)."""
    return jax.default_backend() not in ("tpu",)


def _composite_kernel(density_ref, tdist_ref, dirnorm_ref, rgb_ref, sem_ref,
                      int_ref, rgb_out, depth_out, acc_out, sem_out, int_out,
                      weights_out, *, opaque_background: bool, num_sem: int,
                      bg_value: float):
    density = density_ref[:]           # [R, S]
    tdist = tdist_ref[:]               # [R, S+1]
    dirnorm = dirnorm_ref[:]           # [R, 1]

    t_delta = tdist[:, 1:] - tdist[:, :-1]
    dd = density * t_delta * dirnorm   # [R, S], finite
    if opaque_background:
        dd_alpha = jnp.concatenate(
            [dd[:, :-1], jnp.full_like(dd[:, -1:], jnp.inf)], axis=1)
    else:
        dd_alpha = dd

    alpha = 1.0 - jnp.exp(-dd_alpha)
    # Exclusive cumsum as a strict-upper-triangular matmul (cumsum has no
    # Pallas TPU lowering; an [S, S] triangle on the MXU is free at S<=128).
    # The opaque-background inf stays out: its column weight is always 0 and
    # 0 * inf would poison the matmul.
    s = dd.shape[1]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)).astype(dd.dtype)
    csum_excl = jnp.dot(dd, tri, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(-csum_excl)
    weights = alpha * trans            # [R, S]
    weights_out[:] = weights

    acc = weights.sum(axis=1, keepdims=True)  # [R, 1]
    acc_out[:] = acc

    t_mids = 0.5 * (tdist[:, :-1] + tdist[:, 1:])
    depth_out[:] = ((weights * t_mids).sum(axis=1, keepdims=True)
                    / jnp.maximum(acc, _EPS))

    # rgb: [R, S, 3] composited + constant background on the residual.
    rgb = rgb_ref[:]
    bg_w = jnp.maximum(1.0 - acc, 0.0)
    rgb_out[:] = (weights[..., None] * rgb).sum(axis=1) + bg_w * bg_value

    sem = sem_ref[:]
    sem_out[:] = (weights[..., None] * sem).sum(axis=1)
    int_out[:] = (weights * int_ref[:]).sum(axis=1, keepdims=True)


def fused_composite(density: jax.Array, tdist: jax.Array, dirs: jax.Array,
                    rgb: jax.Array, semantic: Optional[jax.Array] = None,
                    intensity: Optional[jax.Array] = None,
                    opaque_background: bool = True,
                    block_rays: int = 512,
                    bg_value: float = 1.0) -> Dict[str, jax.Array]:
    """density [R, S]; tdist [R, S+1]; dirs [R, 3]; rgb [R, S, 3];
    semantic [R, S, K] or None; intensity [R, S] or None.
    Returns dict(rgb, depth, acc, weights[, semantic][, intensity]).
    Inference-path kernel (weights are returned for downstream use; for
    training use ops/render.py so gradients flow through the reference
    formulation)."""
    r, s = density.shape
    num_sem = semantic.shape[-1] if semantic is not None else 0
    dirnorm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    if semantic is None:
        semantic = jnp.zeros((r, s, 1), density.dtype)
        num_sem_eff = 0
    else:
        num_sem_eff = num_sem
    has_int = intensity is not None
    if intensity is None:
        intensity = jnp.zeros((r, s), density.dtype)

    grid = (pl.cdiv(r, block_rays),)
    bspec = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple([i] + [0] * (len(shape) - 1)),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _composite_kernel, opaque_background=opaque_background,
        num_sem=num_sem_eff, bg_value=bg_value)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=[
            bspec(block_rays, s),
            bspec(block_rays, s + 1),
            bspec(block_rays, 1),
            bspec(block_rays, s, 3),
            bspec(block_rays, s, max(num_sem, 1)),
            bspec(block_rays, s),
        ],
        out_specs=(
            bspec(block_rays, 3),
            bspec(block_rays, 1),
            bspec(block_rays, 1),
            bspec(block_rays, max(num_sem, 1)),
            bspec(block_rays, 1),
            bspec(block_rays, s),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, 3), density.dtype),
            jax.ShapeDtypeStruct((r, 1), density.dtype),
            jax.ShapeDtypeStruct((r, 1), density.dtype),
            jax.ShapeDtypeStruct((r, max(num_sem, 1)), density.dtype),
            jax.ShapeDtypeStruct((r, 1), density.dtype),
            jax.ShapeDtypeStruct((r, s), density.dtype),
        ),
    )(density, tdist, dirnorm, rgb, semantic, intensity)

    rgb_o, depth_o, acc_o, sem_o, int_o, weights_o = outs
    result = dict(rgb=rgb_o, depth=depth_o[:, 0], acc=acc_o[:, 0],
                  weights=weights_o)
    if num_sem_eff > 0:
        result["semantic"] = sem_o
    if has_int:
        result["intensity"] = int_o[:, 0]
    return result
