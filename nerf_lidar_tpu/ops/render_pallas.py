"""Pallas TPU kernel: fused alpha-compositing (weights + composites).

Fuses reference render.py:170-284's chain — delta computation, cumulative
transmittance, alpha weights, and the RGB / depth / semantic / intensity /
acc composites — into one VMEM pass per ray block, so none of the [R, S]
intermediates (density_delta, trans, alpha, weights) round-trips HBM.
Numerically identical to ops/render.compute_alpha_weights +
volumetric_rendering's core composites (tested in
tests/test_render_pallas.py); the full-featured path (percentiles, extras)
stays in ops/render.py.

Layout: per-sample feature channels (rgb / semantic / intensity) are
stacked channel-major as [C, R, S] before entering the kernel. A
[rays, S, C] block would pad its trailing C (3 or 19) to 128 VMEM lanes —
a 6-42x capacity blowup that OOMed the 16 MB VMEM scope at
(block=512, S=32, K=19). Channel-major keeps the lane dimension on S,
which every other block already pays for, and the block size adapts to
the padded VMEM footprint (_pick_block_rays).
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


def _pad_lanes(n: int) -> int:
    return ((n + 127) // 128) * 128


def _pick_block_rays(s: int, c_total: int, request: int = 512) -> int:
    """Largest ray-block whose padded VMEM footprint fits the 16 MB scope.

    Accounts for double-buffered inputs (density, tdist, dirnorm, feat),
    outputs, and ~6 [block, S] f32 temporaries, with every S-trailing
    block lane-padded to a multiple of 128. Budget 9 MB leaves headroom
    for Mosaic's own scratch and the [S, S] triangle."""
    sp = _pad_lanes(s)
    per_ray = 4 * sp * (2 * c_total + 16)
    bk = request
    while bk > 8 and bk * per_ray > 9 * 1024 * 1024:
        bk //= 2
    return max(bk, 8)


def _composite_kernel(density_ref, tdist_ref, dirnorm_ref, feat_ref,
                      comp_out, depth_out, acc_out, weights_out, *,
                      opaque_background: bool, num_rgb: int,
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

    # Per-channel composites; channel c of feat is a [R, S] slab, so each
    # product stays in the S-lane layout (no C-minor padding anywhere).
    bg_w = jnp.maximum(1.0 - acc[:, 0], 0.0)  # [R]
    c_total = feat_ref.shape[0]
    comps = []
    for c in range(c_total):
        comp = (weights * feat_ref[c]).sum(axis=1)  # [R]
        if c < num_rgb:
            # Constant background on the residual transmittance (rgb only).
            comp = comp + bg_w * bg_value
        comps.append(comp)
    comp_out[:] = jnp.stack(comps, axis=0)  # [C, R]


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
    has_int = intensity is not None
    dirnorm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    # Channel-major feature stack: [C, R, S] (see module docstring).
    parts = [rgb]
    if semantic is not None:
        parts.append(semantic)
    if has_int:
        parts.append(intensity[..., None])
    feat = jnp.concatenate(parts, axis=-1).transpose(2, 0, 1)
    c_total = feat.shape[0]

    block_rays = _pick_block_rays(s, c_total, block_rays)
    grid = (pl.cdiv(r, block_rays),)
    bspec = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple([i] + [0] * (len(shape) - 1)),
        memory_space=pltpu.VMEM)
    # Channel-major blocks: full C, gridded rays.
    cspec = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0, i) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _composite_kernel, opaque_background=opaque_background,
        num_rgb=rgb.shape[-1], bg_value=bg_value)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=[
            bspec(block_rays, s),
            bspec(block_rays, s + 1),
            bspec(block_rays, 1),
            cspec(c_total, block_rays, s),
        ],
        out_specs=(
            cspec(c_total, block_rays),
            bspec(block_rays, 1),
            bspec(block_rays, 1),
            bspec(block_rays, s),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_total, r), density.dtype),
            jax.ShapeDtypeStruct((r, 1), density.dtype),
            jax.ShapeDtypeStruct((r, 1), density.dtype),
            jax.ShapeDtypeStruct((r, s), density.dtype),
        ),
    )(density, tdist, dirnorm, feat)

    comp_o, depth_o, acc_o, weights_o = outs
    comp = comp_o.T  # [R, C]
    nc = rgb.shape[-1]
    result = dict(rgb=comp[:, :nc], depth=depth_o[:, 0], acc=acc_o[:, 0],
                  weights=weights_o)
    if num_sem > 0:
        result["semantic"] = comp[:, nc:nc + num_sem]
    if has_int:
        result["intensity"] = comp[:, nc + num_sem]
    return result
