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


def extract_mesh(model, params, resolution: int = 128,
                 isosurface_threshold: float = 20.0,
                 mesh_radius: float = 1.0, mesh_max_radius: float = 10.0,
                 vertex_color: bool = True,
                 out_path: Optional[str] = None):
    """Full pipeline: density lattice -> marching tetrahedra in contracted
    space -> inv_contract vertices -> optional vertex colors -> PLY.

    Returns (verts_world [V,3], faces [F,3], colors [V,3] or None).
    """
    grid, _ = density_on_lattice(model, params, resolution, mesh_radius)
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
    colors = rgb_at_points(model, params, verts_w) if (
        vertex_color and len(verts_w)) else None
    if out_path and len(verts_w):
        marching.write_ply(out_path, verts_w, faces, colors)
    return verts_w, faces, colors
