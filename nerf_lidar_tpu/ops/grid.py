"""Multiresolution hash-grid encoder (instant-ngp style), TPU-native.

Functional re-implementation of the reference CUDA gridencoder
(NeRF_LiDAR/zipnerf/gridencoder/src/gridencoder.cu, grid.py) with identical
indexing semantics:

- per level l: scale_l = exp2(l * log2(per_level_scale)) * H - 1,
  positions pos = x01 * scale_l + 0.5 (align_corners=False),
  trilinear interpolation over the 8 corners (gridencoder.cu:141-191);
- tiled (direct) indexing with stride `R_l = ceil(H * s^l) + 1` when
  R_l^3 fits the hashmap, XOR-prime hashing otherwise
  (gridencoder.cu:50-84), final index mod hashmap_size;
- per-level row counts min(2^log2_hashmap_size, R_l^3) rounded up to 8
  (grid.py:127-135) stacked into one [total_rows, C] table so the
  hash-decay loss can segment rows by level.

TPU mapping: hashing + corner-weight math are fused elementwise VPU work;
the 8-corner lookup is a single XLA gather per level; the backward is the
gather transpose — a *deterministic* scatter-add (unlike the reference's
CUDA atomicAdd, gridencoder.cu:248-340). A Pallas kernel with the same
signature lives in ops/grid_pallas.py for the hot path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static description of a multiresolution hash grid (hashable, so it can
    be closed over by jit).

    interp: 'linear' = trilinear over 8 cube corners (reference semantics,
    gridencoder.cu:163-191); 'tetra' = barycentric over the 4 vertices of
    the simplex containing the point (Kuhn triangulation of the cube).
    Gather instructions are the TPU bottleneck (~50M indices/s), so 'tetra'
    halves encode cost; it is continuous and agrees with trilinear at cell
    vertices (PermutoSDF-style simplex interpolation).
    """
    num_levels: int = 10
    level_dim: int = 4
    base_resolution: int = 16
    desired_resolution: int = 8192
    log2_hashmap_size: int = 21
    input_dim: int = 3
    interp: str = "linear"
    # When False, the encode uses a custom VJP whose backward recomputes
    # hash indices + interpolation weights (cheap VPU math) and emits ONLY
    # the deterministic table scatter-add — no gather replay, no saved
    # per-multisample intermediates, and ZERO gradients to positions/stds.
    # Measured on v5e: scatter-add runs ~55M idx/s at <=2^17 rows vs 15.6M
    # at 2^19+, and skipping the remat re-gather removes ~40% of backward.
    # Set True (reference-exact autodiff) whenever position gradients are
    # needed (pose refinement / autograd density normals).
    diff_inputs: bool = True

    @property
    def per_level_scale(self) -> float:
        if self.num_levels <= 1:
            return 1.0
        return float(np.exp2(
            np.log2(self.desired_resolution / self.base_resolution)
            / (self.num_levels - 1)))

    @property
    def scales(self) -> Tuple[float, ...]:
        """Continuous grid scale per level: exp2(l*S)*H - 1."""
        s = self.per_level_scale
        return tuple(
            float(np.exp2(l * np.log2(s)) * self.base_resolution - 1.0)
            for l in range(self.num_levels))

    @property
    def resolutions(self) -> Tuple[int, ...]:
        """Grid side length per level (= reference grid.py resolution,
        align_corners=False): ceil(H * s^l) + 1."""
        s = self.per_level_scale
        return tuple(
            int(np.ceil(self.base_resolution * s**l)) + 1
            for l in range(self.num_levels))

    @property
    def rows_per_level(self) -> Tuple[int, ...]:
        max_rows = 2**self.log2_hashmap_size
        out = []
        for r in self.resolutions:
            n = min(max_rows, r**self.input_dim)
            out.append(int(np.ceil(n / 8) * 8))
        return tuple(out)

    @property
    def offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for n in self.rows_per_level:
            offs.append(offs[-1] + n)
        return tuple(offs)

    @property
    def total_rows(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def is_tiled(self, level: int) -> bool:
        """Direct (tiled) indexing when the full grid fits the hashmap."""
        r = self.resolutions[level]
        return r**self.input_dim <= self.rows_per_level[level]

    def level_ids(self) -> np.ndarray:
        """Level id per table row — the segment ids for the hash-decay loss."""
        ids = np.zeros(self.total_rows, dtype=np.int32)
        for l in range(self.num_levels):
            ids[self.offsets[l]:self.offsets[l + 1]] = l
        return ids

    def grid_sizes(self) -> np.ndarray:
        """Per-level resolutions used by the erf multisample downweighting."""
        return np.asarray(self.resolutions, dtype=np.float32)

    def init_table(self, key: jax.Array, std: float = 1e-4,
                   dtype=jnp.float32) -> jax.Array:
        return jax.random.uniform(
            key, (self.total_rows, self.level_dim), dtype=dtype,
            minval=-std, maxval=std)


# The 8 unit-cube corner offsets.
_CORNERS3 = [[(c >> d) & 1 for d in range(3)] for c in range(8)]


def spec_for(grid_cfg) -> HashGridSpec:
    """The effective table spec for a GridConfig — THE single derivation
    shared by the MLP (table creation/encode) and the losses (level
    segmentation), so they cannot disagree.

    encoder='dense_fourier' keeps only the dense tiled band: levels up to
    fourier_dense_res, with the hashmap sized to hold the finest corner
    lattice so nothing silently hashes (the high-res band lives in
    ops/fourier.py features, not in the table).
    """
    spectral = getattr(grid_cfg, "encoder", "hash") == "dense_fourier"
    desired = (min(grid_cfg.fourier_dense_res, grid_cfg.desired_resolution)
               if spectral else grid_cfg.desired_resolution)
    if spectral:
        num_levels = int(np.log(desired / grid_cfg.base_resolution)
                         / np.log(grid_cfg.level_interval)) + 1
        log2 = max(grid_cfg.log2_hashmap_size,
                   int(np.ceil(np.log2((desired + 2) ** 3))))
    else:
        num_levels = grid_cfg.num_levels
        log2 = grid_cfg.log2_hashmap_size
    return HashGridSpec(
        num_levels=num_levels, level_dim=grid_cfg.level_dim,
        base_resolution=grid_cfg.base_resolution,
        desired_resolution=desired, log2_hashmap_size=log2,
        interp=grid_cfg.interp,
        diff_inputs=grid_cfg.diff_inputs)


def _corner_index(spec: HashGridSpec, level: int, cx, cy, cz) -> jax.Array:
    """Row index within `level` for integer corner coords (each [N])."""
    rows = spec.rows_per_level[level]
    cx = cx.astype(jnp.uint32)
    cy = cy.astype(jnp.uint32)
    cz = cz.astype(jnp.uint32)
    if spec.is_tiled(level):
        r = jnp.uint32(spec.resolutions[level])
        idx = cx + cy * r + cz * r * r
    else:
        idx = (cx * jnp.uint32(_PRIMES[0])
               ^ cy * jnp.uint32(_PRIMES[1])
               ^ cz * jnp.uint32(_PRIMES[2]))
    return (idx % jnp.uint32(rows)).astype(jnp.int32)


def _corner_list(spec: HashGridSpec, level: int, xT: jax.Array):
    """Corner row indices + interpolation weights for positions xT [3, N].

    Returns a list of (idx [N] int32, w [N] f32) pairs — 8 trilinear cube
    corners (gridencoder.cu:141-191 semantics) or the 4 vertices of the Kuhn
    simplex containing the point for interp='tetra' (barycentric weights
    from consecutive gaps of the sorted fractional coords; continuous
    everywhere and equal to trilinear at cell vertices). Shared by the
    forward encode and the custom-VJP backward so the two cannot drift.
    """
    scale = spec.scales[level]
    pos = xT * scale + 0.5  # [3, N]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)
    out = []
    if spec.interp == "tetra":
        fx, fy, fz = frac[0], frac[1], frac[2]
        # Rank of each dim (0 = largest fraction), deterministic tie-break
        # by dimension order.
        rx = ((fy > fx).astype(jnp.int32) + (fz > fx).astype(jnp.int32))
        ry = ((fx >= fy).astype(jnp.int32) + (fz > fy).astype(jnp.int32))
        rz = ((fx >= fz).astype(jnp.int32) + (fy >= fz).astype(jnp.int32))
        ranks = jnp.stack([rx, ry, rz])  # [3, N]
        # Sorted fractions s1 >= s2 >= s3 via min/max (3 elements).
        s1 = jnp.maximum(jnp.maximum(fx, fy), fz)
        s3 = jnp.minimum(jnp.minimum(fx, fy), fz)
        s2 = fx + fy + fz - s1 - s3
        weights = [1.0 - s1, s1 - s2, s2 - s3, s3]
        for k in range(4):
            step = (ranks < k).astype(jnp.int32)  # [3, N]
            idx = _corner_index(spec, level,
                                pos_grid[0] + step[0],
                                pos_grid[1] + step[1],
                                pos_grid[2] + step[2])
            out.append((idx, weights[k]))
    else:
        for cx, cy, cz in _CORNERS3:
            w = ((frac[0] if cx else 1.0 - frac[0])
                 * (frac[1] if cy else 1.0 - frac[1])
                 * (frac[2] if cz else 1.0 - frac[2]))  # [N]
            idx = _corner_index(spec, level,
                                pos_grid[0] + cx,
                                pos_grid[1] + cy,
                                pos_grid[2] + cz)  # [N]
            out.append((idx, w))
    return out


def _encode_levels(table: jax.Array, xT: jax.Array, oob: jax.Array,
                   spec: HashGridSpec, levels=None):
    """Core encode in coordinate-major layout.

    TPU layout note: all large intermediates here are [N]-trailing ([3, N],
    [N], [C, N]) — the big axis sits in the 128-lane dimension, so nothing
    pays the 16-42x lane-padding tax that [N, 8]/[N, 3]-shaped buffers incur
    (the naive corner-last formulation OOMed a v5e chip at batch 4096).

    xT: [3, N] positions in [0, 1]; oob: [N] bool; levels: subset of level
    ids to encode (default all).
    Returns list of per-level features, each [C, N].
    """
    outs = []
    for l in (range(spec.num_levels) if levels is None else levels):
        tbl_t = jax.lax.slice_in_dim(
            table, spec.offsets[l], spec.offsets[l + 1]).T  # [C, rows]
        acc = None
        for idx, w in _corner_list(spec, l, xT):
            feats = jnp.take(tbl_t, idx, axis=1)  # [C, N]
            term = w[None, :] * feats
            acc = term if acc is None else acc + term
        outs.append(jnp.where(oob[None, :], 0.0, acc))
    return outs


# Row count below which the one-hot-matmul scatter beats XLA's native
# scatter on v5e (experiments/scatter_variants.py: ~166M vs ~113M idx/s at
# 4096 rows / 4M indices; the one-hot cost scales linearly in rows, so the
# crossover sits around 8k rows).
_ONEHOT_SCATTER_MAX_ROWS = 8192


def _onehot_scatter_add(idx: jax.Array, vals: jax.Array, rows: int,
                        block: int = 2048) -> jax.Array:
    """MXU-resident scatter-add: accumulate one_hot(idx)^T @ vals blockwise.

    Converts the index-rate-bound scatter into matmuls (XLA keeps the
    [block, rows] one-hot fused on-chip inside the scan). Only sensible for
    small `rows`; deterministic like the native scatter. Out-of-range pad
    indices one-hot to all-zero rows, so tail padding is free.
    """
    n, c = vals.shape
    pad = (-n) % block
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), rows, idx.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, c), vals.dtype)])
    idxb = idx.reshape(-1, block)
    valsb = vals.reshape(-1, block, c)

    def body(acc, inp):
        i, v = inp
        oh = jax.nn.one_hot(i, rows, dtype=v.dtype)  # [block, rows]
        return acc + jnp.einsum("br,bc->rc", oh, v,
                                preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((rows, c), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (idxb, valsb))
    return acc.astype(vals.dtype)


def _scatter_level_grad(spec: HashGridSpec, level: int, xT: jax.Array,
                        vals: jax.Array) -> jax.Array:
    """Table gradient for one level: d_table_l[r] += w_corner * vals[n].

    xT: [3, N] positions; vals: [N, C] per-point cotangents (already masked
    and erf/mean-weighted). Returns [rows_l, C]. All corners are concatenated
    into ONE deterministic scatter-add (XLA pipelines a single big scatter
    better than K chained ones; measured ~55M idx/s at <=2^17 rows on v5e).
    Small (tiled) levels use the one-hot MXU scatter instead.
    """
    corners = _corner_list(spec, level, xT)
    all_idx = jnp.concatenate([idx for idx, _ in corners])
    all_vals = jnp.concatenate([w[:, None] * vals for _, w in corners])
    rows = spec.rows_per_level[level]
    if rows <= _ONEHOT_SCATTER_MAX_ROWS:
        return _onehot_scatter_add(all_idx, all_vals, rows)
    return jnp.zeros((rows, spec.level_dim),
                     vals.dtype).at[all_idx].add(all_vals)


def hash_encode(table: jax.Array, x01: jax.Array,
                spec: HashGridSpec) -> jax.Array:
    """Encode positions with a multiresolution hash grid.

    Args:
      table: [total_rows, level_dim] stacked per-level embeddings.
      x01: [..., 3] positions in [0, 1]; out-of-range inputs encode to 0
        (matching gridencoder.cu:110-135).
      spec: static grid description.

    Returns:
      [..., num_levels * level_dim] features.
    """
    batch_shape = x01.shape[:-1]
    xT = x01.reshape(-1, spec.input_dim).T  # [3, N]
    oob = jnp.any((xT < 0.0) | (xT > 1.0), axis=0)  # [N]
    outs = _encode_levels(table, xT, oob, spec)  # L x [C, N]
    out = jnp.concatenate(outs, axis=0)  # [L*C, N]
    return out.T.reshape(batch_shape + (spec.output_dim,))


def hash_encode_multisample(table: jax.Array, x01: jax.Array, stds: jax.Array,
                            spec: HashGridSpec,
                            coarse_res_cutoff: int = 0) -> jax.Array:
    """Encode n multisample points and reduce with erf downweighting.

    x01: [..., n, 3] in [0,1]; stds: [..., n] isotropic Gaussian stds in the
    same normalized coordinates. Implements the ZipNeRF featurization
    weights = erf(1 / sqrt(8 * std^2 * g_l^2)) and the mean over the n
    multisamples (reference models.py:974-977), fused in coordinate-major
    layout: the [.., n, L*C] intermediate never materializes lane-padded.

    coarse_res_cutoff (TPU-first optimization): levels whose resolution is
    <= the cutoff encode only the multisample *mean* point (1 gather set per
    frustum instead of n). Within a grid cell trilinear interpolation is
    affine, so mean-of-encodings == encoding-of-mean exactly whenever the
    multisample cloud fits one coarse cell — the regime these levels are in
    by construction. Gather instructions are the TPU bottleneck
    (~50M indices/s regardless of row width, measured on v5e), so this
    trades an O(spread/cell) approximation at coarse levels for an n-fold
    gather reduction there. 0 disables (reference-exact).

    Returns ([..., L*C] features, [..., n, L] weights).
    """
    if spec.diff_inputs:
        return _ms_encode_impl(table, x01, stds, spec, coarse_res_cutoff)
    return _ms_encode_nodiff(table, x01, stds, spec, coarse_res_cutoff)


def _ms_encode_impl(table, x01, stds, spec, coarse_res_cutoff):
    grid_sizes = jnp.asarray(spec.grid_sizes())
    batch_shape = x01.shape[:-2]
    n_ms = x01.shape[-2]
    xT = x01.reshape(-1, spec.input_dim).T  # [3, B*n]
    oob = jnp.any((xT < 0.0) | (xT > 1.0), axis=0)
    stds_flat = stds.reshape(-1)  # [B*n]

    coarse = [l for l in range(spec.num_levels)
              if spec.resolutions[l] <= coarse_res_cutoff]
    fine = [l for l in range(spec.num_levels) if l not in coarse]

    feats_by_level: dict = {}
    if fine:
        fine_feats = _encode_levels(table, xT, oob, spec, levels=fine)
        feats_by_level.update(zip(fine, fine_feats))
    if coarse:
        x_mean = x01.reshape(-1, n_ms, spec.input_dim).mean(
            axis=1).T  # [3, B]
        oob_mean = jnp.any((x_mean < 0.0) | (x_mean > 1.0), axis=0)
        coarse_feats = _encode_levels(table, x_mean, oob_mean, spec,
                                      levels=coarse)
        feats_by_level.update(zip(coarse, coarse_feats))

    outs = []
    weights = []
    for l in range(spec.num_levels):
        w_l = jax.lax.erf(
            1.0 / jnp.sqrt(jnp.maximum(
                8.0 * stds_flat**2 * grid_sizes[l] ** 2, 1e-10)))  # [B*n]
        weights.append(w_l)
        feats = feats_by_level[l]
        if l in coarse:
            w_mean = w_l.reshape(-1, n_ms).mean(axis=-1)  # [B]
            outs.append(feats * w_mean[None, :])  # [C, B]
        else:
            weighted = (feats * w_l[None, :]).reshape(
                spec.level_dim, -1, n_ms)  # [C, B, n]
            outs.append(weighted.mean(axis=-1))  # [C, B]
    out = jnp.concatenate(outs, axis=0)  # [L*C, B]
    out = out.T.reshape(batch_shape + (spec.output_dim,))
    w = jnp.stack(weights, axis=-1).reshape(
        batch_shape + (n_ms, spec.num_levels))
    return out, w


# --------------------------------------------------------------------------
# No-input-grad fast path (spec.diff_inputs=False).
#
# The gather's VJP needs only the indices and the upstream cotangent — not
# the gathered values — so when gradients w.r.t. positions/stds are not
# needed (no pose refinement), the backward can skip the gather replay
# entirely: recompute hash indices + interpolation weights (elementwise VPU
# math) and emit one deterministic scatter-add per level. Because custom_vjp
# hides the encode internals from autodiff, the [C, B*n] per-multisample
# features are never saved either, so the surrounding MLP no longer needs
# rematerialization to fit HBM. This replaces the reference's CUDA
# kernel_grid_backward atomicAdd (gridencoder.cu:248-340) with a
# deterministic, XLA-pipelined scatter.
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ms_encode_nodiff(table, x01, stds, spec, coarse_res_cutoff):
    return _ms_encode_impl(table, x01, stds, spec, coarse_res_cutoff)


def _ms_encode_nodiff_fwd(table, x01, stds, spec, coarse_res_cutoff):
    out = _ms_encode_impl(table, x01, stds, spec, coarse_res_cutoff)
    return out, (x01, stds)


def _ms_encode_nodiff_bwd(spec, coarse_res_cutoff, res, cts):
    x01, stds = res
    table_dtype = jnp.float32
    g_feats, _g_weights = cts  # weights depend only on stds: zero-grad here.
    n_ms = x01.shape[-2]
    n_pts = int(np.prod(x01.shape[:-1]))  # B * n
    xT = x01.reshape(-1, spec.input_dim).T  # [3, B*n]
    oob = jnp.any((xT < 0.0) | (xT > 1.0), axis=0)  # [B*n]
    stds_flat = stds.reshape(-1)
    grid_sizes = spec.grid_sizes()

    gf = g_feats.reshape(n_pts // n_ms, spec.output_dim)  # [B, L*C]

    x_mean = None
    oob_mean = None
    grads = []
    for l in range(spec.num_levels):
        C = spec.level_dim
        G_l = gf[:, l * C:(l + 1) * C]  # [B, C]
        w_l = jax.lax.erf(
            1.0 / jnp.sqrt(jnp.maximum(
                8.0 * stds_flat**2 * float(grid_sizes[l]) ** 2, 1e-10)))
        if spec.resolutions[l] <= coarse_res_cutoff:
            # Coarse level: forward encoded the multisample mean point,
            # weighted by the mean erf weight.
            if x_mean is None:
                x_mean = x01.reshape(-1, n_ms, spec.input_dim).mean(axis=1).T
                oob_mean = jnp.any((x_mean < 0.0) | (x_mean > 1.0), axis=0)
            w_mean = w_l.reshape(-1, n_ms).mean(axis=-1)  # [B]
            coeff = jnp.where(oob_mean, 0.0, w_mean)
            vals = G_l * coeff[:, None]  # [B, C]
            grads.append(_scatter_level_grad(spec, l, x_mean,
                                             vals.astype(table_dtype)))
        else:
            # Fine level: every multisample point contributed w_l/n of its
            # interpolated feature.
            coeff = jnp.where(oob, 0.0, w_l / n_ms)  # [B*n]
            vals = (jnp.repeat(G_l, n_ms, axis=0) * coeff[:, None])
            grads.append(_scatter_level_grad(spec, l, xT,
                                             vals.astype(table_dtype)))
    d_table = jnp.concatenate(grads, axis=0)  # [total_rows, C]
    return d_table, jnp.zeros_like(x01), jnp.zeros_like(stds)


_ms_encode_nodiff.defvjp(_ms_encode_nodiff_fwd, _ms_encode_nodiff_bwd)
