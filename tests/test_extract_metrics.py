import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu import configs
from nerf_lidar_tpu.models.model import Model
from nerf_lidar_tpu.utils import marching, pc_metrics


def test_marching_tetrahedra_sphere():
    # Field: distance from center; isosurface at r=0.3 of a unit cube grid.
    n = 33
    lin = np.linspace(-0.5, 0.5, n)
    xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
    field = -np.sqrt(xs**2 + ys**2 + zs**2)  # inside = larger value
    level = -0.3
    verts, faces = marching.marching_tetrahedra(
        field, level, origin=(-0.5,) * 3, spacing=(1 / (n - 1),) * 3)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.3, atol=0.02)
    # Faces index valid vertices.
    assert faces.max() < len(verts)
    # Welding shrinks the vertex count substantially.
    wv, wf = marching.weld_vertices(verts, faces)
    assert len(wv) < len(verts) * 0.6
    r2 = np.linalg.norm(wv, axis=-1)
    np.testing.assert_allclose(r2, 0.3, atol=0.02)


def _sphere_mesh(res=24, r=1.0):
    g = np.linspace(-1.5, 1.5, res)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    vals = r - np.sqrt(x**2 + y**2 + z**2)  # inside > 0
    sp = 3.0 / (res - 1)
    v, f = marching.marching_tetrahedra(vals, 0.0, origin=(-1.5,) * 3,
                                        spacing=(sp,) * 3)
    return marching.weld_vertices(v, f)


def test_clean_mesh_removes_junk_keeps_body():
    """clean_mesh (reference extract.py:187-253 ladder, numpy impl) must
    drop duplicate faces, null faces, unreferenced vertices, and small
    far-away components while keeping the main body."""
    v, f = _sphere_mesh()
    n0 = len(f)
    assert n0 > 100
    # Junk: a tiny isolated triangle far away, a duplicate of face 0
    # (rotated order), a null (degenerate-area) face, an unused vertex.
    # (kept near enough that the 5%-of-bbox-diagonal component rule still
    # keeps the sphere — the threshold is relative to the WHOLE mesh bbox,
    # junk included, exactly like the reference's pml.Percentage)
    extra = np.array([[5, 5, 5], [5.001, 5, 5], [5, 5.001, 5],
                      [6, 6, 6]])
    vj = np.concatenate([v, extra])
    far_tri = [[len(v), len(v) + 1, len(v) + 2]]
    dup = [[f[0][1], f[0][2], f[0][0]]]
    # Null face: three distinct but collinear-duplicate verts — use the
    # same position twice via the close-merge (two verts 1e-9 apart).
    fj = np.concatenate([f, far_tri, dup]).astype(np.int64)
    v2, f2 = marching.clean_mesh(vj, fj, v_pct=1.0, min_f=8, min_d=5.0)
    # Junk gone: no vertex anywhere near the far triangle or orphan.
    assert v2.max() < 10
    # Duplicate face removed; body survives.
    tri_key = np.sort(f2, axis=1)
    assert len(np.unique(tri_key, axis=0)) == len(f2)
    assert len(f2) >= 0.8 * n0
    # Every vertex referenced.
    assert np.unique(f2.reshape(-1)).size == len(v2)


def test_decimate_mesh_hits_target_preserves_extent():
    v, f = _sphere_mesh(res=32)
    target = 120
    assert len(f) > 4 * target
    v2, f2 = marching.decimate_mesh(v, f, target)
    assert 0 < len(f2) <= target
    # Shape extent preserved within a cluster cell.
    np.testing.assert_allclose(np.abs(v2).max(), np.abs(v).max(), atol=0.4)
    # Faces index valid, non-degenerate.
    assert f2.max() < len(v2)
    assert ((f2[:, 0] != f2[:, 1]) & (f2[:, 1] != f2[:, 2])).all()


def test_write_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    colors = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    p = str(tmp_path / "tri.ply")
    marching.write_ply(p, verts, faces, colors)
    text = open(p).read()
    assert "element vertex 3" in text and "element face 1" in text
    assert "255 0 0" in text


def test_miou_perfect_and_known():
    gt = np.array([0, 0, 1, 1, 2, 2, 255])
    pred_perfect = gt.copy()
    out = pc_metrics.eval_miou(pred_perfect, gt, num_classes=3)
    assert out["miou"] == 1.0
    pred = np.array([0, 1, 1, 1, 2, 0, 2])  # ignore_label position ignored
    out = pc_metrics.eval_miou(pred, gt, num_classes=3)
    # class0: tp=1 fp=1 fn=1 -> 1/3; class1: tp=2 fp=1 fn=0 -> 2/3;
    # class2: tp=1 fp=0 fn=1 -> 1/2.
    np.testing.assert_allclose(out["miou"], (1 / 3 + 2 / 3 + 1 / 2) / 3,
                               rtol=1e-6)


def test_chamfer_identity_and_offset():
    rng = np.random.RandomState(0)
    a = rng.randn(500, 3).astype(np.float32)
    out = pc_metrics.chamfer_distance(a, a)
    assert out["chamfer"] < 1e-5
    b = a + np.array([0.1, 0.0, 0.0], np.float32)
    out2 = pc_metrics.chamfer_distance(a, b)
    assert out2["chamfer"] <= 0.1 + 1e-5
    assert out2["chamfer"] > 0.01


def test_visibility_grid_and_culling():
    from nerf_lidar_tpu.data import synthetic
    from nerf_lidar_tpu.extract import build_visibility_grid, extract_mesh
    cfg = configs.tiny_debug().model
    model = Model(cfg)
    _, data, _ = synthetic.make_scene_data(num_views=2, height=16, width=24)
    rng = np.random.RandomState(0)
    d = rng.randn(8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {k: jnp.asarray(v) for k, v in dict(
        origins=np.zeros((8, 3), np.float32), directions=d, viewdirs=d,
        base_x=d, base_y=d, radii=np.full((8, 1), 1e-3, np.float32),
        near=np.full((8, 1), 0.2, np.float32),
        far=np.full((8, 1), 6.0, np.float32)).items()}
    params = model.init(jax.random.PRNGKey(0), None, batch)
    vis = build_visibility_grid(model, params, data, resolution=16,
                                weight_thresh=1e-4, pixel_stride=4,
                                chunk=64)
    assert vis.shape == (16, 16, 16) and vis.dtype == bool
    assert vis.any(), "some voxels must be visible from the cameras"
    assert not vis.all(), "visibility must cull something"
    # An all-False grid must cull the whole mesh.
    verts, faces, _ = extract_mesh(
        model, params, resolution=16, isosurface_threshold=0.4,
        vertex_color=False, visibility_grid=np.zeros((16,) * 3, bool))
    assert len(verts) == 0


def test_projection_vertex_coloring():
    from nerf_lidar_tpu.extract import auto_normals, rgb_by_projection
    cfg = configs.tiny_debug().model
    model = Model(cfg)
    rng = np.random.RandomState(0)
    d = rng.randn(8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {k: jnp.asarray(v) for k, v in dict(
        origins=np.zeros((8, 3), np.float32), directions=d, viewdirs=d,
        base_x=d, base_y=d, radii=np.full((8, 1), 1e-3, np.float32),
        near=np.full((8, 1), 0.2, np.float32),
        far=np.full((8, 1), 6.0, np.float32)).items()}
    params = model.init(jax.random.PRNGKey(0), None, batch)
    # A unit quad: two triangles in the z=0.5 plane.
    verts = np.array([[0, 0, 0.5], [1, 0, 0.5], [1, 1, 0.5], [0, 1, 0.5]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    n = auto_normals(verts, faces)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-5)
    colors = rgb_by_projection(model, params, verts, faces, chunk=4)
    assert colors.shape == (4, 3)
    assert np.isfinite(colors).all()
    assert colors.min() >= 0.0 and colors.max() <= 1.0


def test_extract_mesh_from_tiny_model():
    from nerf_lidar_tpu.extract import extract_mesh
    cfg = configs.tiny_debug().model
    model = Model(cfg)
    rng = np.random.RandomState(0)
    d = rng.randn(8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {k: jnp.asarray(v) for k, v in dict(
        origins=np.zeros((8, 3), np.float32), directions=d, viewdirs=d,
        base_x=d, base_y=d, radii=np.full((8, 1), 1e-3, np.float32),
        near=np.full((8, 1), 0.2, np.float32),
        far=np.full((8, 1), 6.0, np.float32)).items()}
    params = model.init(jax.random.PRNGKey(0), None, batch)
    # A fresh model has near-uniform small density: pick a low threshold so
    # *some* surface exists, or accept an empty mesh — the pipeline must run
    # either way without error.
    verts, faces, colors = extract_mesh(
        model, params, resolution=24, isosurface_threshold=0.4,
        vertex_color=True)
    assert verts.shape[1] == 3 if len(verts) else True
    if len(verts):
        assert colors is not None and colors.shape == (len(verts), 3)
        assert np.isfinite(verts).all()


def test_decimate_mesh_tiny_target_keeps_contract():
    # Bisection that never lands under target must keep coarsening (and
    # warn only when genuinely unreachable) instead of silently returning
    # more than `target` faces.
    rng = np.random.RandomState(0)
    v = rng.rand(400, 3)
    f = rng.randint(0, 400, (900, 3))
    f = f[(f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])]
    v2, f2 = marching.decimate_mesh(v, f, target=4, max_iters=1)
    assert len(f2) <= 4 or len(f2) < len(f)  # contract or best effort
    v3, f3 = marching.decimate_mesh(v, f, target=50)
    assert len(f3) <= 50


def _cube_mesh(n=8, r=1.0):
    """Subdivided axis-aligned cube surface mesh, welded: 6 faces x n x n
    quads x 2 triangles. Every vertex satisfies max(|x|,|y|,|z|) == r."""
    verts, faces = [], []
    lin = np.linspace(-r, r, n + 1)
    for axis in range(3):
        for sign in (-r, r):
            base = len(verts)
            uu, vv = np.meshgrid(lin, lin, indexing="ij")
            pts = np.zeros((n + 1, n + 1, 3))
            pts[..., axis] = sign
            pts[..., (axis + 1) % 3] = uu
            pts[..., (axis + 2) % 3] = vv
            verts.extend(pts.reshape(-1, 3))
            for i in range(n):
                for j in range(n):
                    a = base + i * (n + 1) + j
                    b, c, d = a + 1, a + n + 1, a + n + 2
                    faces += [[a, b, d], [a, d, c]]
    return marching.weld_vertices(np.asarray(verts), np.asarray(faces))


def _cube_deviation(v, r=1.0):
    """Max deviation of vertices from the cube surface |x|_inf == r."""
    return float(np.abs(np.abs(v).max(axis=1) - r).max())


def test_qem_decimate_preserves_sharp_features():
    """QEM edge collapse (default method) must keep decimated vertices ON
    the cube surface — collapse optima lie in the intersection of the
    accumulated face planes — where vertex clustering pulls them to cell
    means. This is exactly why the reference ships pymeshlab's quadric
    collapse (reference extract.py:254-289), not clustering."""
    v, f = _cube_mesh(n=8)
    assert len(f) == 6 * 8 * 8 * 2
    target = 100
    vq, fq = marching.decimate_mesh(v, f, target)
    assert 0 < len(fq) <= target
    assert _cube_deviation(vq) < 1e-6
    # Extent (the corners) survives.
    np.testing.assert_allclose(np.abs(vq).max(), 1.0, atol=1e-6)
    # Valid, non-degenerate, fully-referenced topology.
    assert fq.max() < len(vq)
    assert ((fq[:, 0] != fq[:, 1]) & (fq[:, 1] != fq[:, 2])
            & (fq[:, 0] != fq[:, 2])).all()
    assert np.unique(fq.reshape(-1)).size == len(vq)
    # Clustering at the same target measurably leaves the surface
    # (measured 0.107 at this setting; QEM is exact).
    vc, fc = marching.decimate_mesh(v, f, target, method="cluster")
    assert _cube_deviation(vc) > 0.05


def test_qem_native_matches_python_fallback():
    """The C++ kernel (native/mesh_native.cpp) and the pure-Python
    fallback implement the same algorithm: both must hit the target and
    keep the same surface fidelity on the cube."""
    from nerf_lidar_tpu import native

    # NOTE the regime: at gentle ratios (768 -> 120 faces) QEM vertices
    # stay exactly on the cube. At very aggressive ratios on tiny meshes
    # collapse chains legitimately merge planes of OPPOSITE cube faces
    # and the quadric minimizer moves inside the volume — real pymeshlab
    # does the same — so this property is only asserted here.
    v, f = _cube_mesh(n=8)
    target = 120
    vp, fp, reached_p = marching._qem_decimate_py(v, f, target)
    assert reached_p and 0 < len(fp) <= target
    assert _cube_deviation(vp) < 1e-6
    if not native.mesh_available():
        import pytest
        pytest.skip("no C++ toolchain")
    vn, fn, reached_n = native.qem_decimate(v, f, target)
    assert reached_n and 0 < len(fn) <= target
    assert _cube_deviation(vn) < 1e-6


def test_qem_decimate_sphere_stays_on_surface():
    v, f = _sphere_mesh(res=32)
    target = 200
    v2, f2 = marching.decimate_mesh(v, f, target)
    assert 0 < len(f2) <= target
    r = np.linalg.norm(v2, axis=-1)
    # Coarse polyhedron: verts near the unit sphere (plane-intersection
    # optima sit slightly outside on a convex surface).
    assert r.min() > 0.8 and r.max() < 1.25
