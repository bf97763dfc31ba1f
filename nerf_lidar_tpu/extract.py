"""Mesh extraction from a trained field.

Analog of reference zipnerf/extract.py: evaluate the NeRF MLP's density on a
dense lattice in *contracted* space (so resolution concentrates near the
scene core, extract.py:397-400 + configs.py:192-199), run isosurface
extraction (marching tetrahedra here, utils/marching.py), map vertices back
to world via inv_contract, and optionally color vertices by querying the
field's view-independent radiance. Density evaluation batches through one
jitted chunk program on device; the lattice assembly and meshing are host
numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import ModelConfig
from .ops import coord
from .renderer import _pad_to as _pad_rows
from .utils import marching


def density_on_lattice(model, params, resolution: int = 128,
                       mesh_radius: float = 1.0,
                       chunk: int = 65536,
                       std_value: float = 0.0) -> Tuple[np.ndarray,
                                                        np.ndarray]:
    """Evaluate density on a [R, R, R] lattice of contracted coordinates in
    [-mesh_radius, mesh_radius]^3 (contracted space spans [-2, 2]).

    Returns (density grid [R,R,R], lattice coords in contracted space).
    """
    lin = np.linspace(-mesh_radius, mesh_radius, resolution,
                      dtype=np.float32)
    xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
    pts_c = np.stack([xs, ys, zs], -1).reshape(-1, 3)
    # World-space points for the MLP (it contracts internally).
    pts_w = np.asarray(coord.inv_contract(jnp.asarray(pts_c)))

    def density_fn(p, x):
        # x: [N, 3] world points; one multisample with zero std.
        means = x[:, None, None, :]  # [N, 1(n_s), 1(n_ms), 3]
        stds = jnp.full(means.shape[:-1], std_value)
        out = model.apply(
            p, means, stds,
            method=lambda m, mm, ss: m.nerf_mlp.predict_density(mm, ss))
        raw = out[0][:, 0]  # [N, S=1] -> [N]
        return jax.nn.softplus(raw + model.cfg.nerf_mlp.density_bias)

    density_jit = jax.jit(density_fn)
    n = pts_w.shape[0]
    n_pad = -(-n // chunk) * chunk
    pts_pad = np.concatenate(
        [pts_w, np.zeros((n_pad - n, 3), np.float32)], axis=0)
    out = np.empty(n_pad, np.float32)
    for i in range(0, n_pad, chunk):
        out[i:i + chunk] = np.asarray(
            density_jit(params, jnp.asarray(pts_pad[i:i + chunk])))
    grid = out[:n].reshape(resolution, resolution, resolution)
    return grid, pts_c.reshape(resolution, resolution, resolution, 3)


def rgb_at_points(model, params, pts_w: np.ndarray, chunk: int = 32768,
                  viewdir=(0.0, 0.0, -1.0)) -> np.ndarray:
    """Query radiance at points with a fixed view direction (simplified
    vertex coloring; the reference's projection-based coloring,
    extract.py:108-160, needs the full camera set)."""
    vd = np.asarray(viewdir, np.float32)
    vd = vd / np.linalg.norm(vd)

    def rgb_fn(p, x):
        means = x[:, None, None, :]
        stds = jnp.zeros(means.shape[:-1])
        dirs = jnp.broadcast_to(jnp.asarray(vd), (x.shape[0], 3))
        out = model.apply(p, means, stds, viewdirs=dirs,
                          method=lambda m, mm, ss, viewdirs:
                          m.nerf_mlp(mm, ss, viewdirs=viewdirs))
        return out["rgb"][:, 0]

    rgb_jit = jax.jit(rgb_fn)
    n = pts_w.shape[0]
    n_pad = -(-n // chunk) * chunk
    pts_pad = np.concatenate(
        [pts_w.astype(np.float32), np.zeros((n_pad - n, 3), np.float32)])
    out = np.empty((n_pad, 3), np.float32)
    for i in range(0, n_pad, chunk):
        out[i:i + chunk] = np.asarray(
            rgb_jit(params, jnp.asarray(pts_pad[i:i + chunk])))
    return np.clip(out[:n], 0, 1)


def build_visibility_grid(model, params, scene_data, resolution: int = 128,
                          mesh_radius: float = 1.0,
                          weight_thresh: float = 0.005,
                          pixel_stride: int = 8,
                          chunk: int = 8192) -> np.ndarray:
    """Mark contracted-space voxels actually traversed by high-weight ray
    samples from the training views.

    TPU-native analog of the reference's grid_sample-backward trick
    (extract.py:360-391): instead of autograd through grid_sample, the
    trilinear footprint of every sample with weight > weight_thresh is
    scattered directly — the 8 surrounding voxels of each valid point get
    marked. Returns a bool [R, R, R] grid over
    [-mesh_radius, mesh_radius]^3 contracted space.
    """
    from .data import camera as camlib

    def chunk_fn(p, batch):
        _, ray_history = model.apply(p, None, batch, train_frac=1.0)
        last = ray_history[-1]
        t_mid = 0.5 * (last["tdist"][..., :-1] + last["tdist"][..., 1:])
        pts = (batch["origins"][:, None] +
               t_mid[..., None] * batch["directions"][:, None])
        pts_c = coord.contract(pts)  # [-2, 2]^3
        return pts_c, last["weights"]

    fn = jax.jit(chunk_fn)
    grid = np.zeros((resolution,) * 3, bool)
    s = scene_data
    for v in range(s.num_views):
        x, y = np.meshgrid(np.arange(0, s.width, pixel_stride),
                           np.arange(0, s.height, pixel_stride))
        x, y = x.reshape(-1), y.reshape(-1)
        pixtocam = s.pixtocam if s.pixtocam.ndim == 2 else s.pixtocam[v]
        rays = camlib.pixels_to_rays(x, y, pixtocam, s.camtoworlds[v],
                                     distortion_params=s.distortion_params,
                                     camtype=s.camtype,
                                     pixtocam_ndc=s.pixtocam_ndc)
        n = x.shape[0]
        rays["near"] = np.full((n, 1), s.near, np.float32)
        rays["far"] = np.full((n, 1), s.far, np.float32)
        n_pad = -(-n // chunk) * chunk
        rays = {k: _pad_rows(np.asarray(val, np.float32), n_pad)
                for k, val in rays.items()}
        for i in range(0, n_pad, chunk):
            b = {k: jnp.asarray(val[i:i + chunk]) for k, val in rays.items()}
            pts_c, w = jax.device_get(fn(params, b))
            pts = pts_c[w > weight_thresh]
            # Contracted points span [-2, 2]^3 but the grid covers only
            # [-mesh_radius, mesh_radius]^3: points outside the cube must
            # be DISCARDED, not clamped onto border voxels (clamping marks
            # the whole boundary shell visible, defeating the culling).
            pts = pts[np.all(np.abs(pts) <= mesh_radius, axis=-1)]
            if pts.size == 0:
                continue
            # Continuous voxel coords; mark the full trilinear footprint.
            f = (pts + mesh_radius) / (2 * mesh_radius) * (resolution - 1)
            lo = np.floor(f).astype(np.int64)
            for corner in ((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                           (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)):
                q = np.clip(lo + corner, 0, resolution - 1)
                grid[q[:, 0], q[:, 1], q[:, 2]] = True
    return grid


def auto_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (reference extract.py:163-186)."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)
    n = np.zeros_like(verts)
    for i in range(3):
        np.add.at(n, faces[:, i], fn)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(norm > 1e-20, n / np.maximum(norm, 1e-20),
                 np.array([0.0, 0.0, 1.0]))
    return n.astype(np.float32)


def rgb_by_projection(model, params, verts: np.ndarray, faces: np.ndarray,
                      chunk: int = 32768, eps: float = 0.005,
                      seg_len: float = 0.01,
                      num_samples: int = 8) -> np.ndarray:
    """Projection-based vertex coloring (reference extract.py:108-160):
    volume-render a tiny segment entering each vertex along -normal and
    normalize by accumulated alpha. The reference reuses the full model
    with near=0/far=0.01 and num_levels=1; here the equivalent short
    segment is rendered directly through the NeRF MLP (same math, no
    proposal levels needed over a 0.01-unit segment)."""
    from .ops import render as render_ops

    normals = auto_normals(verts, faces)
    viewdirs = -normals
    origins = (verts - eps * viewdirs).astype(np.float32)

    def rgb_fn(p, o, d):
        t = jnp.linspace(0.0, seg_len, num_samples + 1)
        tdist = jnp.broadcast_to(t, (o.shape[0], num_samples + 1))
        t_mid = 0.5 * (tdist[:, :-1] + tdist[:, 1:])
        pts = o[:, None] + t_mid[..., None] * d[:, None]
        means = pts[..., None, :]
        stds = jnp.zeros(means.shape[:-1])
        dirs = d
        out = model.apply(p, means, stds, dirs,
                          method=lambda m, mm, ss, vd:
                          m.nerf_mlp(mm, ss, viewdirs=vd))
        weights, _, _ = render_ops.compute_alpha_weights(
            out["density"], tdist, d)
        acc = weights.sum(-1)
        rgb = (weights[..., None] * out["rgb"]).sum(-2)
        rgb = rgb / jnp.maximum(acc[..., None], 1e-5)
        return jnp.nan_to_num(jnp.clip(rgb, 0.0, 1.0), nan=1.0)

    fn = jax.jit(rgb_fn)
    n = verts.shape[0]
    n_pad = -(-n // chunk) * chunk
    o = _pad_rows(origins, n_pad)
    d = _pad_rows(viewdirs.astype(np.float32), n_pad)
    out = np.empty((n_pad, 3), np.float32)
    for i in range(0, n_pad, chunk):
        out[i:i + chunk] = np.asarray(
            fn(params, jnp.asarray(o[i:i + chunk]),
               jnp.asarray(d[i:i + chunk])))
    return out[:n]


def extract_mesh(model, params, resolution: int = 128,
                 isosurface_threshold: float = 20.0,
                 mesh_radius: float = 1.0, mesh_max_radius: float = 10.0,
                 vertex_color: bool = True,
                 color_mode: str = "projection",
                 visibility_grid: Optional[np.ndarray] = None,
                 out_path: Optional[str] = None,
                 clean: bool = False,
                 decimate_target: int = 0):
    """Full pipeline: density lattice -> visibility culling -> marching
    tetrahedra in contracted space -> inv_contract vertices -> vertex
    colors (projection or fixed-view) -> PLY.

    visibility_grid: optional bool [Rv,Rv,Rv] over the same contracted
    cube (build_visibility_grid); density outside it is zeroed before
    meshing, killing the density-threshold shell artifacts
    (reference extract.py:441-460 current_mask).
    Returns (verts_world [V,3], faces [F,3], colors [V,3] or None).
    """
    grid, _ = density_on_lattice(model, params, resolution, mesh_radius)
    if visibility_grid is not None:
        grid = grid * _sample_mask(visibility_grid, resolution)
    spacing = 2 * mesh_radius / (resolution - 1)
    verts_c, faces = marching.marching_tetrahedra(
        grid, isosurface_threshold,
        origin=(-mesh_radius,) * 3, spacing=(spacing,) * 3)
    verts_c, faces = marching.weld_vertices(verts_c, faces)
    if len(verts_c) == 0:
        return verts_c, faces, None
    verts_w = np.asarray(coord.inv_contract(jnp.asarray(
        verts_c.astype(np.float32))))
    # Drop far-field shell geometry (reference mesh_max_radius clamp).
    keep = np.linalg.norm(verts_w, axis=-1) <= mesh_max_radius
    remap = np.cumsum(keep) - 1
    faces = faces[keep[faces].all(axis=1)]
    faces = remap[faces]
    verts_w = verts_w[keep]
    if clean and len(faces):
        # Reference extract.py clean_mesh ladder (pymeshlab there; numpy
        # here — utils/marching.clean_mesh).
        verts_w, faces = marching.clean_mesh(verts_w, faces)
    if decimate_target > 0 and len(faces) > decimate_target:
        verts_w, faces = marching.decimate_mesh(verts_w, faces,
                                                decimate_target)
    verts_w = np.asarray(verts_w, np.float32)
    colors = None
    if vertex_color and len(verts_w):
        if color_mode == "projection" and len(faces):
            colors = rgb_by_projection(model, params, verts_w, faces)
        else:
            colors = rgb_at_points(model, params, verts_w)
    if out_path and len(verts_w):
        marching.write_ply(out_path, verts_w, faces, colors)
    return verts_w, faces, colors


def _sample_mask(vis: np.ndarray, resolution: int) -> np.ndarray:
    """Nearest-sample a bool visibility grid onto the density lattice."""
    rv = vis.shape[0]
    idx = np.clip(np.round(np.linspace(0, rv - 1, resolution)).astype(
        np.int64), 0, rv - 1)
    return vis[np.ix_(idx, idx, idx)].astype(np.float32)
