import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_lidar_tpu.ops import grid


def _small_spec():
    return grid.HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                             desired_resolution=32, log2_hashmap_size=8)


def _reference_encode_numpy(table, x01, spec):
    """Straight-line numpy oracle following gridencoder.cu semantics."""
    primes = (1, 2654435761, 805459861)
    N = x01.shape[0]
    out = np.zeros((N, spec.num_levels, spec.level_dim), np.float32)
    for l in range(spec.num_levels):
        scale = spec.scales[l]
        rows = spec.rows_per_level[l]
        tbl = table[spec.offsets[l]:spec.offsets[l + 1]]
        for i in range(N):
            if np.any(x01[i] < 0) or np.any(x01[i] > 1):
                continue
            pos = x01[i] * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            f = pos - pg
            acc = np.zeros(spec.level_dim, np.float32)
            for c in range(8):
                w = 1.0
                cg = np.zeros(3, np.uint64)
                for d in range(3):
                    if (c >> d) & 1:
                        w *= f[d]
                        cg[d] = pg[d] + 1
                    else:
                        w *= 1 - f[d]
                        cg[d] = pg[d]
                if spec.is_tiled(l):
                    r = spec.resolutions[l]
                    idx = int(cg[0] + cg[1] * r + cg[2] * r * r)
                else:
                    idx = int((np.uint32(cg[0]) * np.uint32(primes[0]))
                              ^ (np.uint32(cg[1] * primes[1]))
                              ^ (np.uint32(cg[2] * primes[2])))
                acc += w * tbl[idx % rows]
            out[i, l] = acc
    return out.reshape(N, -1)


def test_spec_offsets_and_tiling():
    spec = _small_spec()
    # Level 0: res 5 -> 125 rows -> rounded to 128; tiled.
    assert spec.resolutions[0] == 5
    assert spec.rows_per_level[0] == 128
    assert spec.is_tiled(0)
    # Last level: res 33 -> 35937 > 256 -> hashed with 256 rows.
    assert not spec.is_tiled(spec.num_levels - 1)
    assert spec.rows_per_level[-1] == 256
    assert spec.total_rows == sum(spec.rows_per_level)


def test_hash_encode_matches_numpy_oracle():
    spec = _small_spec()
    key = jax.random.PRNGKey(0)
    table = spec.init_table(key, std=1.0)
    x = np.random.RandomState(0).rand(32, 3).astype(np.float32)
    got = np.asarray(grid.hash_encode(table, jnp.asarray(x), spec))
    want = _reference_encode_numpy(np.asarray(table), x, spec)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hash_encode_out_of_bounds_zero():
    spec = _small_spec()
    table = spec.init_table(jax.random.PRNGKey(1), std=1.0)
    x = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]])
    out = grid.hash_encode(table, x, spec)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_hash_encode_batch_shape_preserved():
    spec = _small_spec()
    table = spec.init_table(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.rand(2, 5, 7, 3).astype(np.float32))
    out = grid.hash_encode(table, x, spec)
    assert out.shape == (2, 5, 7, spec.output_dim)


def test_hash_encode_grad_is_finite_and_nonzero():
    spec = _small_spec()
    table = spec.init_table(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(1).rand(64, 3).astype(np.float32))

    def loss(tbl):
        return jnp.sum(grid.hash_encode(tbl, x, spec) ** 2)

    g = jax.grad(loss)(table)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0


def test_hash_encode_input_gradient_continuity():
    # Feature should be (piecewise) smooth in x inside a cell: check the jvp
    # matches finite differences.
    spec = _small_spec()
    table = spec.init_table(jax.random.PRNGKey(4), std=1.0)
    x0 = jnp.asarray([[0.331, 0.522, 0.713]])
    v = jnp.asarray([[1.0, 0.0, 0.0]])
    f = lambda x: grid.hash_encode(table, x, spec)
    _, jvp = jax.jvp(f, (x0,), (v,))
    eps = 1e-4
    fd = (f(x0 + eps * v) - f(x0 - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jvp), np.asarray(fd),
                               rtol=1e-2, atol=1e-2)


def test_multisample_erf_downweighting():
    spec = _small_spec()
    table = spec.init_table(jax.random.PRNGKey(5), std=1.0)
    x = jnp.asarray(np.random.RandomState(2).rand(4, 6, 3).astype(np.float32))
    stds_small = jnp.full((4, 6), 1e-6)
    stds_large = jnp.full((4, 6), 10.0)
    f_small, w_small = grid.hash_encode_multisample(table, x, stds_small, spec)
    f_large, w_large = grid.hash_encode_multisample(table, x, stds_large, spec)
    assert f_small.shape == (4, spec.output_dim)
    # Tiny stds -> erf ~ 1; huge stds -> erf ~ 0.
    np.testing.assert_allclose(np.asarray(w_small), 1.0, atol=1e-4)
    assert np.max(np.abs(np.asarray(w_large))) < 0.05
    assert np.max(np.abs(np.asarray(f_large))) < np.max(np.abs(np.asarray(f_small)))


def test_tetra_interp_reproduces_linear_functions():
    # Fill a small tiled level with a linear function of grid coords; both
    # trilinear and barycenter (tetra) interpolation must reproduce it
    # exactly everywhere inside the grid.
    spec_lin = grid.HashGridSpec(num_levels=1, level_dim=2,
                                 base_resolution=4, desired_resolution=4,
                                 log2_hashmap_size=10, interp="linear")
    spec_tet = dataclasses_replace(spec_lin, interp="tetra")
    r = spec_lin.resolutions[0]
    # Table rows are tiled: idx = x + y*r + z*r^2.
    coords = np.stack(np.meshgrid(np.arange(r), np.arange(r), np.arange(r),
                                  indexing="ij"), -1).reshape(-1, 3)
    # tiled index for (x,y,z) = x + y*r + z*r*r -> build accordingly
    table = np.zeros((spec_lin.total_rows, 2), np.float32)
    for x_, y_, z_ in coords:
        idx = x_ + y_ * r + z_ * r * r
        table[idx] = [0.3 * x_ - 0.2 * y_ + 0.5 * z_, 1.0 + 0.1 * y_]
    table = jnp.asarray(table)

    rng = np.random.RandomState(0)
    pts = rng.rand(64, 3).astype(np.float32) * 0.9 + 0.05
    out_lin = np.asarray(grid.hash_encode(table, jnp.asarray(pts), spec_lin))
    out_tet = np.asarray(grid.hash_encode(table, jnp.asarray(pts), spec_tet))
    # Analytic expectation: value at continuous position p*scale + 0.5.
    scale = spec_lin.scales[0]
    cont = pts * scale + 0.5
    want = np.stack([0.3 * cont[:, 0] - 0.2 * cont[:, 1] + 0.5 * cont[:, 2],
                     1.0 + 0.1 * cont[:, 1]], -1)
    np.testing.assert_allclose(out_lin, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_tet, want, rtol=1e-4, atol=1e-5)


def test_tetra_interp_continuous_and_matches_at_vertices():
    spec = grid.HashGridSpec(num_levels=3, level_dim=2, base_resolution=4,
                             desired_resolution=16, log2_hashmap_size=8,
                             interp="tetra")
    table = spec.init_table(jax.random.PRNGKey(0), std=1.0)
    # Continuity across random nearby pairs.
    rng = np.random.RandomState(1)
    a = rng.rand(128, 3).astype(np.float32) * 0.9 + 0.05
    b = a + rng.randn(128, 3).astype(np.float32) * 1e-5
    fa = np.asarray(grid.hash_encode(table, jnp.asarray(a), spec))
    fb = np.asarray(grid.hash_encode(table, jnp.asarray(b), spec))
    assert np.abs(fa - fb).max() < 1e-2


def dataclasses_replace(obj, **kw):
    import dataclasses
    return dataclasses.replace(obj, **kw)


def test_multisample_coarse_cutoff_matches_when_cloud_in_cell():
    # Multisample points clustered well inside one coarse cell: mean-encode
    # must equal full encode exactly (trilinear is affine within a cell).
    spec = _small_spec()
    table = spec.init_table(jax.random.PRNGKey(0), std=1.0)
    rng = np.random.RandomState(0)
    base = rng.rand(16, 1, 3).astype(np.float32) * 0.9 + 0.05
    # Spread 1e-4 << coarsest cell (res 5 -> cell 0.2).
    x = jnp.asarray(base + rng.randn(16, 7, 3).astype(np.float32) * 1e-4)
    stds = jnp.full((16, 7), 1e-5)
    full, _ = grid.hash_encode_multisample(table, x, stds, spec,
                                           coarse_res_cutoff=0)
    fast, _ = grid.hash_encode_multisample(table, x, stds, spec,
                                           coarse_res_cutoff=5)
    # Level 0 (res 5) uses mean-encode in `fast`; the cloud sits in one cell
    # so the first level_dim features must agree to float precision.
    np.testing.assert_allclose(np.asarray(fast[:, :spec.level_dim]),
                               np.asarray(full[:, :spec.level_dim]),
                               rtol=1e-4, atol=1e-5)
    # Finer levels are identical code paths.
    np.testing.assert_allclose(np.asarray(fast[:, spec.level_dim:]),
                               np.asarray(full[:, spec.level_dim:]),
                               rtol=1e-6, atol=1e-7)


def test_multisample_cutoff_all_levels_still_close():
    # With a cutoff covering every level and a realistic small spread, the
    # approximation stays close to the exact encode.
    spec = _small_spec()
    table = spec.init_table(jax.random.PRNGKey(1), std=1.0)
    rng = np.random.RandomState(1)
    base = rng.rand(32, 1, 3).astype(np.float32) * 0.9 + 0.05
    x = jnp.asarray(base + rng.randn(32, 7, 3).astype(np.float32) * 2e-3)
    stds = jnp.full((32, 7), 2e-3)
    full, _ = grid.hash_encode_multisample(table, x, stds, spec, 0)
    fast, _ = grid.hash_encode_multisample(table, x, stds, spec, 10**9)
    err = np.abs(np.asarray(fast) - np.asarray(full))
    scale = np.abs(np.asarray(full)).mean() + 1e-6
    assert err.mean() / scale < 0.05, (err.mean(), scale)


def test_nerf_scale_spec_matches_reference_levels():
    # NerfMLP defaults: base 16 -> 8192, interval 2 => 10 levels
    # (reference models.py:867).
    num = int(np.log(8192 / 16) / np.log(2)) + 1
    spec = grid.HashGridSpec(num_levels=num, level_dim=4, base_resolution=16,
                             desired_resolution=8192, log2_hashmap_size=21)
    assert spec.num_levels == 10
    assert spec.resolutions[0] == 17
    assert spec.resolutions[-1] == 8193
    assert spec.rows_per_level[-1] == 2**21
    assert spec.is_tiled(0) and not spec.is_tiled(9)


@pytest.mark.parametrize("interp", ["linear", "tetra"])
@pytest.mark.parametrize("cutoff", [0, 5])
def test_nodiff_table_grad_matches_autodiff(interp, cutoff):
    # The custom-VJP scatter-only backward (diff_inputs=False) must produce
    # the exact same table gradient as plain autodiff through the encode.
    spec = dataclasses_replace(_small_spec(), interp=interp)
    spec_nd = dataclasses_replace(spec, diff_inputs=False)
    table = spec.init_table(jax.random.PRNGKey(0), std=1.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(16, 7, 3).astype(np.float32) * 1.1 - 0.05)
    stds = jnp.asarray(rng.rand(16, 7).astype(np.float32) * 0.02)
    proj = jnp.asarray(rng.randn(spec.output_dim).astype(np.float32))

    def loss(tbl, sp):
        feats, w = grid.hash_encode_multisample(
            tbl, x, stds, sp, coarse_res_cutoff=cutoff)
        return jnp.sum((feats @ proj) ** 2) + 0.0 * jnp.sum(w)

    g_ref = np.asarray(jax.grad(lambda t: loss(t, spec))(table))
    g_fast = np.asarray(jax.grad(lambda t: loss(t, spec_nd))(table))
    np.testing.assert_allclose(g_fast, g_ref, rtol=1e-4, atol=1e-5)


def test_nodiff_zero_input_grads():
    spec = dataclasses_replace(_small_spec(), diff_inputs=False)
    table = spec.init_table(jax.random.PRNGKey(0), std=1.0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(8, 7, 3).astype(np.float32))
    stds = jnp.asarray(rng.rand(8, 7).astype(np.float32) * 0.02)

    def loss(x_, s_):
        feats, _ = grid.hash_encode_multisample(table, x_, s_, spec)
        return jnp.sum(feats ** 2)

    gx, gs = jax.grad(loss, argnums=(0, 1))(x, stds)
    assert np.abs(np.asarray(gx)).max() == 0.0
    assert np.abs(np.asarray(gs)).max() == 0.0


def test_fourier_encode_ipe_damping():
    """IPE identity: the encoded feature equals the Monte-Carlo expectation
    of sin/cos under the per-sample Gaussian, and large stds kill high
    frequencies (ops/fourier.py)."""
    import jax
    from nerf_lidar_tpu.ops import fourier

    B = fourier.make_frequency_matrix(0, 16, 4.0, 64.0)
    rng = np.random.RandomState(0)
    x = rng.rand(5, 1, 3).astype(np.float32)
    sigma = np.float32(0.03)
    feats = fourier.fourier_encode(
        jnp.asarray(x), jnp.full((5, 1), sigma), B)
    # Monte-Carlo oracle.
    samples = x[:, :, None, :] + sigma * rng.randn(5, 1, 40000, 3)
    phase = 2 * np.pi * (samples @ np.asarray(B))
    mc = np.concatenate([np.sin(phase).mean(2), np.cos(phase).mean(2)],
                        -1)[:, 0]
    np.testing.assert_allclose(np.asarray(feats), mc, atol=0.02)
    # Huge std -> features vanish (band-limit property).
    big = fourier.fourier_encode(jnp.asarray(x), jnp.full((5, 1), 2.0), B)
    assert np.abs(np.asarray(big)).max() < 1e-4


def test_dense_fourier_mlp_trains_and_has_no_hashed_tables():
    """encoder='dense_fourier': the table keeps only tiled rows (below the
    gather cliff), features include the spectral band, and a jitted
    grad step runs."""
    import dataclasses
    import jax
    from nerf_lidar_tpu import configs
    from nerf_lidar_tpu.models.mlp import ZipMLP

    g = configs.GridConfig(level_dim=2, base_resolution=8,
                           desired_resolution=256, level_interval=2,
                           log2_hashmap_size=12, encoder="dense_fourier",
                           fourier_freqs=32, fourier_dense_res=16)
    cfg = dataclasses.replace(configs.tiny_debug().model.nerf_mlp, grid=g,
                              use_semantic=False)
    mlp = ZipMLP(cfg)
    means = jnp.asarray(np.random.RandomState(0).rand(64, 4, 3) * 0.5)
    stds = jnp.full((64, 4), 0.01)
    params = mlp.init(jax.random.PRNGKey(0), means, stds)
    # Dense band only, direct-indexed: the (res+1)^3 corner lattices for
    # res 8 and 16, each padded to a multiple of 8 — the hashmap-size knob
    # must NOT silently hash the dense band.
    pad8 = lambda n: -(-n // 8) * 8
    assert params["params"]["table"].shape[0] == pad8(9**3) + pad8(17**3)

    def loss(p):
        out = mlp.apply(p, means, stds)
        return (out["density"] ** 2).mean()

    g1 = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g1)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert float(np.abs(np.asarray(
        g1["params"]["table"])).max()) > 0.0
