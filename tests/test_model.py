import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_lidar_tpu import configs
from nerf_lidar_tpu.models.model import Model


def _make_batch(R=16, near=0.2, far=6.0, seed=0):
    rng = np.random.RandomState(seed)
    directions = rng.randn(R, 3).astype(np.float32)
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
    up = np.array([0, 0, 1], np.float32)
    bx = np.cross(directions, up)
    bx /= np.linalg.norm(bx, axis=-1, keepdims=True)
    by = np.cross(directions, bx)
    batch = {
        "origins": (rng.randn(R, 3) * 0.1).astype(np.float32),
        "directions": directions,
        "viewdirs": directions,
        "base_x": bx.astype(np.float32),
        "base_y": by.astype(np.float32),
        "radii": np.full((R, 1), 1e-3, np.float32),
        "near": np.full((R, 1), near, np.float32),
        "far": np.full((R, 1), far, np.float32),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def tiny_model():
    cfg = configs.tiny_debug().model
    model = Model(cfg)
    batch = _make_batch()
    params = model.init(jax.random.PRNGKey(0), None, batch)
    return cfg, model, params, batch


def test_forward_shapes(tiny_model):
    cfg, model, params, batch = tiny_model
    renderings, ray_history = model.apply(
        params, jax.random.PRNGKey(1), batch, train_frac=0.5,
        compute_extras=True)
    assert len(renderings) == cfg.num_levels
    R = batch["origins"].shape[0]
    final = renderings[-1]
    assert final["rgb"].shape == (R, 3)
    assert final["depth"].shape == (R,)
    assert final["semantic"].shape == (R, cfg.nerf_mlp.class_num)
    assert final["acc"].shape == (R,)
    assert "distance_median" in final
    # Ray history carries sampling state for losses.
    for h in ray_history:
        assert h["sdist"].shape[-1] == h["weights"].shape[-1] + 1
        assert np.all(np.isfinite(np.asarray(h["weights"])))


def test_forward_deterministic_without_key(tiny_model):
    _, model, params, batch = tiny_model
    r1, _ = model.apply(params, None, batch)
    r2, _ = model.apply(params, None, batch)
    np.testing.assert_array_equal(np.asarray(r1[-1]["rgb"]),
                                  np.asarray(r2[-1]["rgb"]))


def test_depth_in_near_far_range(tiny_model):
    _, model, params, batch = tiny_model
    renderings, _ = model.apply(params, None, batch)
    depth = np.asarray(renderings[-1]["depth"])
    assert np.all(depth >= float(batch["near"][0, 0]) - 1e-4)
    assert np.all(depth <= float(batch["far"][0, 0]) + 1e-4)


def test_semantic_is_probability(tiny_model):
    _, model, params, batch = tiny_model
    renderings, _ = model.apply(params, None, batch)
    sem = np.asarray(renderings[-1]["semantic"])
    # Composite of softmax probs with opaque background: rows sum to ~1.
    np.testing.assert_allclose(sem.sum(-1), 1.0, atol=1e-3)


def test_grads_flow_to_all_mlps(tiny_model):
    cfg, model, params, batch = tiny_model

    def loss_fn(p):
        renderings, ray_history = model.apply(
            p, jax.random.PRNGKey(2), batch, train_frac=0.1)
        loss = ((renderings[-1]["rgb"] - 0.5) ** 2).mean()
        # Touch prop weights through an interlevel-style term.
        for h in ray_history[:-1]:
            loss = loss + 1e-3 * (h["weights"] ** 2).mean()
        return loss

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = {"/".join(str(k) for k in path): float(jnp.abs(g).sum())
               for path, g in flat}
    # NeRF MLP table and prop tables must all receive gradient.
    assert any("nerf_mlp" in k and "table" in k and v > 0
               for k, v in nonzero.items()), nonzero
    assert any("prop_mlps_0" in k and v > 0 for k, v in nonzero.items())
    assert all(np.isfinite(v) for v in nonzero.values())


def test_jit_forward_compiles_and_matches(tiny_model):
    _, model, params, batch = tiny_model
    f = jax.jit(lambda p, b: model.apply(p, None, b)[0][-1]["rgb"])
    out_jit = f(params, batch)
    out_eager = model.apply(params, None, batch)[0][-1]["rgb"]
    np.testing.assert_allclose(np.asarray(out_jit), np.asarray(out_eager),
                               rtol=1e-5, atol=1e-6)


def test_learned_exposure_scaling():
    """RawNeRF exposure: exposure_values scale output colors; learned
    offsets are zero-init (no-op) and anchored at exposure_idx == 0
    (reference models.py:86-91,500-512)."""
    import dataclasses
    cfg = dataclasses.replace(configs.tiny_debug().model,
                              learned_exposure_scaling=True,
                              bg_intensity_range=(0.0, 0.0))
    model = Model(cfg)
    batch = _make_batch()
    R = batch["origins"].shape[0]
    batch["exposure_values"] = jnp.full((R, 3), 0.5)
    batch["exposure_idx"] = jnp.ones((R, 1), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), None, batch)
    assert "exposure_scaling_offsets" in str(jax.tree_util.tree_structure(
        params))

    rend_half, _ = model.apply(params, None, batch)
    b2 = dict(batch, exposure_values=jnp.ones((R, 3)))
    rend_full, _ = model.apply(params, None, b2)
    # Zero-init offsets: halving exposure exactly halves the rgb.
    np.testing.assert_allclose(np.asarray(rend_half[-1]["rgb"]),
                               0.5 * np.asarray(rend_full[-1]["rgb"]),
                               atol=1e-6)
    # Nonzero offsets change idx>0 rays but not idx==0 rays.
    params2 = jax.tree.map(lambda x: x, params)
    flat = params2["params"]["exposure_scaling_offsets"]["embedding"]
    flat = flat.at[1].set(jnp.asarray([0.5, 0.5, 0.5]))
    params2["params"]["exposure_scaling_offsets"]["embedding"] = flat
    rend_off, _ = model.apply(params2, None, batch)
    assert np.abs(np.asarray(rend_off[-1]["rgb"])
                  - np.asarray(rend_half[-1]["rgb"])).max() > 1e-4
    b0 = dict(batch, exposure_idx=jnp.zeros((R, 1), jnp.int32))
    r0a, _ = model.apply(params, None, b0)
    r0b, _ = model.apply(params2, None, b0)
    np.testing.assert_allclose(np.asarray(r0a[-1]["rgb"]),
                               np.asarray(r0b[-1]["rgb"]), atol=1e-7)


@pytest.mark.slow
def test_mxu_config_model_trains():
    """The matmul-resident field preset (nuscenes_single_mxu) must run a
    jitted train step end-to-end: spectral encode, all losses, grads."""
    import dataclasses
    from nerf_lidar_tpu.data import synthetic
    from nerf_lidar_tpu.data.batching import RayBatcher
    from nerf_lidar_tpu.train import train_step

    cfg = configs.nuscenes_single_mxu()
    # Shrink for CPU: tiny sample counts, few frequencies.
    m = cfg.model
    small = lambda mlp: dataclasses.replace(
        mlp, grid=dataclasses.replace(mlp.grid, fourier_freqs=16,
                                      fourier_dense_res=8,
                                      base_resolution=4))
    m = dataclasses.replace(
        m, num_prop_samples=(6,), num_nerf_samples=6, sample_n=2,
        sample_m=1, instance_obj=False, latent_size=0,
        nerf_mlp=small(m.nerf_mlp), prop_mlp=small(m.prop_mlp))
    cfg = dataclasses.replace(cfg, model=m, batch_size=64, patch_size=8,
                              lidar_supervision=True, lidar_batch_ratio=4,
                              pose_refine=False, track_refine=False)
    _, data, _ = synthetic.make_scene_data(num_views=2, height=24,
                                           width=32, focal=20.0,
                                           far=cfg.far, with_lidar=True)
    batcher = RayBatcher(data, cfg.batch_size, cfg.patch_size,
                         lidar_supervision=True, lidar_batch_ratio=4,
                         seed=0)
    model = Model(cfg.model)
    batch = jax.tree.map(jnp.asarray, batcher.next())
    params = model.init(jax.random.PRNGKey(0), None, batch)
    state, tx = train_step.create_train_state(cfg, params)
    step_fn = train_step.make_train_step(
        model, tx, cfg, num_patch_rays=batcher.num_patch_rays)
    l0 = None
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batch, sub, None, None)
        if l0 is None:
            l0 = float(stats["loss"])
    assert np.isfinite(float(stats["loss"]))
    assert float(stats["loss"]) < l0 * 1.5


def test_bf16_compute_policy_close_to_f32_and_trains():
    # Mixed precision (MLPConfig.compute_dtype='bfloat16'): same params
    # (f32 leaves), outputs close to the f32 path, finite f32 grads.
    import dataclasses

    import chex

    cfg = configs.tiny_debug()
    cfg16 = configs.bf16_variant(cfg)
    model32 = Model(cfg.model)
    model16 = Model(cfg16.model)
    batch = _make_batch(R=64)
    params = jax.jit(model32.init)(jax.random.PRNGKey(0), None, batch)
    # Param trees are identical (policy changes compute, not storage).
    p16 = jax.jit(model16.init)(jax.random.PRNGKey(0), None, batch)
    chex.assert_trees_all_equal_shapes_and_dtypes(params, p16)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))

    r32, _ = model32.apply(params, None, batch, train_frac=1.0)
    r16, _ = model16.apply(params, None, batch, train_frac=1.0)
    out32, out16 = r32[-1], r16[-1]
    assert out16["rgb"].dtype == jnp.float32
    np.testing.assert_allclose(out16["rgb"], out32["rgb"], atol=0.06)
    np.testing.assert_allclose(out16["depth"], out32["depth"], atol=0.25)

    def loss(p):
        r, _ = model16.apply(p, None, batch, train_frac=1.0)
        return jnp.mean(r[-1]["rgb"] ** 2) + jnp.mean(r[-1]["depth"])

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
