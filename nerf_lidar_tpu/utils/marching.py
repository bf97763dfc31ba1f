"""Isosurface extraction via marching tetrahedra (numpy).

The reference uses skimage.measure.marching_cubes (extract.py:397-400);
skimage isn't in this environment, and the MC lookup tables are 256-entry
transcriptions anyway. Marching tetrahedra splits each cube into 6 tets
whose 16 sign cases reduce to two shapes (1-vs-3 -> one triangle,
2-vs-2 -> two), which we enumerate programmatically — same capability,
simpler and fully testable.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Cube corners (z-minor order) and the 6-tetrahedron decomposition around
# the main diagonal 0-7.
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]], np.int32)


def marching_tetrahedra(values: np.ndarray, level: float,
                        origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0)
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface `values == level` from a dense grid.

    values: [X, Y, Z] scalar field. Returns (vertices [V, 3] in world units
    via origin+spacing, faces [F, 3] int). Vertices are not deduplicated
    across tets (use weld_vertices for a compact mesh).
    """
    vals = np.asarray(values, np.float64)
    nx, ny, nz = vals.shape
    # All cube base indices.
    bx, by, bz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([bx, by, bz], -1).reshape(-1, 3)  # [C, 3]

    # Corner values per cube: [C, 8].
    cidx = base[:, None, :] + _CORNERS[None, :, :]
    cv = vals[cidx[..., 0], cidx[..., 1], cidx[..., 2]]
    # Skip cubes with no crossing.
    crossing = (cv.min(1) < level) & (cv.max(1) > level)
    base, cv, cidx = base[crossing], cv[crossing], cidx[crossing]

    verts_out = []
    spacing = np.asarray(spacing, np.float64)
    origin = np.asarray(origin, np.float64)

    def edge_interp(p0, v0, p1, v1):
        t = (level - v0) / (v1 - v0)
        return p0 + t[:, None] * (p1 - p0)

    for tet in _TETS:
        tv = cv[:, tet]  # [C, 4]
        tp = cidx[:, tet, :].astype(np.float64)  # [C, 4, 3]
        inside = tv > level  # [C, 4]
        n_in = inside.sum(1)

        # Case A: exactly one vertex on one side -> single triangle.
        for flip in (False, True):
            io = ~inside if flip else inside
            one = io.sum(1) == 1
            if not one.any():
                continue
            sel = np.where(one)[0]
            apex = io[sel].argmax(1)
            others = np.array([[j for j in range(4) if j != a]
                               for a in apex])
            p_apex = tp[sel, apex]
            v_apex = tv[sel, apex]
            tri = []
            for k in range(3):
                p_o = tp[sel, others[:, k]]
                v_o = tv[sel, others[:, k]]
                tri.append(edge_interp(p_apex, v_apex, p_o, v_o))
            tri = np.stack(tri, axis=1)  # [S, 3, 3]
            if flip:
                tri = tri[:, ::-1]  # keep consistent winding
            verts_out.append(tri.reshape(-1, 3))

        # Case B: 2-2 split -> quad as two triangles.
        two = n_in == 2
        if two.any():
            sel = np.where(two)[0]
            ins = inside[sel]
            # Identify the two inside (a, b) and two outside (c, d).
            order = np.argsort(~ins, axis=1)  # inside first
            a, b, c, d = order[:, 0], order[:, 1], order[:, 2], order[:, 3]
            g = lambda col: (tp[sel, col], tv[sel, col])
            (pa, va), (pb, vb), (pc, vc), (pd, vd) = g(a), g(b), g(c), g(d)
            e_ac = edge_interp(pa, va, pc, vc)
            e_ad = edge_interp(pa, va, pd, vd)
            e_bc = edge_interp(pb, vb, pc, vc)
            e_bd = edge_interp(pb, vb, pd, vd)
            quad1 = np.stack([e_ac, e_ad, e_bd], axis=1)
            quad2 = np.stack([e_ac, e_bd, e_bc], axis=1)
            verts_out.append(quad1.reshape(-1, 3))
            verts_out.append(quad2.reshape(-1, 3))

    if not verts_out:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_out, axis=0)
    faces = np.arange(len(verts), dtype=np.int64).reshape(-1, 3)
    verts = origin + verts * spacing
    return verts, faces


def weld_vertices(verts: np.ndarray, faces: np.ndarray,
                  decimals: int = 6) -> Tuple[np.ndarray, np.ndarray]:
    """Merge duplicate vertices (quantized) and reindex faces."""
    key = np.round(verts, decimals)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    return uniq, inv[faces]


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray,
              colors: np.ndarray | None = None) -> None:
    """ASCII PLY writer (replaces trimesh/pymeshlab export)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        if colors is not None:
            c8 = np.clip(colors * 255, 0, 255).astype(np.uint8)
            for v, c in zip(verts, c8):
                f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        else:
            for v in verts:
                f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
