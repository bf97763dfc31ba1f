import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_lidar_tpu.ops import render, render_pallas


def _inputs(R=512, S=32, K=5, seed=0):
    rng = np.random.RandomState(seed)
    density = rng.rand(R, S).astype(np.float32) * 3
    tdist = np.sort(rng.rand(R, S + 1).astype(np.float32) * 5, axis=-1)
    dirs = rng.randn(R, 3).astype(np.float32)
    rgb = rng.rand(R, S, 3).astype(np.float32)
    sem = rng.rand(R, S, K).astype(np.float32)
    inten = rng.rand(R, S).astype(np.float32)
    return (jnp.asarray(density), jnp.asarray(tdist), jnp.asarray(dirs),
            jnp.asarray(rgb), jnp.asarray(sem), jnp.asarray(inten))


@pytest.mark.parametrize("opaque", [True, False])
def test_fused_composite_matches_reference(opaque):
    density, tdist, dirs, rgb, sem, inten = _inputs()
    out = render_pallas.fused_composite(
        density, tdist, dirs, rgb, sem, inten, opaque_background=opaque)

    w_ref, _, _ = render.compute_alpha_weights(density, tdist, dirs,
                                               opaque_background=opaque)
    ref = render.volumetric_rendering(
        rgb, w_ref, tdist, bg_rgbs=jnp.asarray(1.0),
        t_far=tdist[:, -1:], compute_extras=False, semantic=sem,
        intensity=inten, sem_detach=False)

    np.testing.assert_allclose(np.asarray(out["weights"]),
                               np.asarray(w_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["semantic"]),
                               np.asarray(ref["semantic"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["intensity"]),
                               np.asarray(ref["intensity"]), rtol=1e-4,
                               atol=1e-5)


def test_fused_composite_ragged_rays():
    # Ray count not divisible by the block: padding rays must not corrupt
    # real outputs.
    density, tdist, dirs, rgb, sem, inten = _inputs(R=700)
    out = render_pallas.fused_composite(density, tdist, dirs, rgb, sem,
                                        inten, block_rays=512)
    w_ref, _, _ = render.compute_alpha_weights(density, tdist, dirs,
                                               opaque_background=True)
    np.testing.assert_allclose(np.asarray(out["weights"]),
                               np.asarray(w_ref), rtol=1e-5, atol=1e-6)


def test_tile_lane_gather():
    from nerf_lidar_tpu.ops.grid_pallas import tile_lane_gather
    rng = np.random.RandomState(0)
    tbl = jnp.asarray(rng.rand(8, 128).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 128, (8, 128)).astype(np.int32))
    out = tile_lane_gather(tbl, idx)
    want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.asarray(out), want)


def test_chunk_renderer_fused_path_matches_plain():
    # The fused kernel is ON the inference hot path (ChunkRenderer
    # fused=True -> Model fused_final): full-model render must match the
    # plain compositing path bit-for-bit-ish, including semantics and the
    # constant background.
    import dataclasses

    from nerf_lidar_tpu import configs
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.renderer import ChunkRenderer

    cfg = configs.tiny_debug()
    cfg = dataclasses.replace(cfg, render_chunk_size=256)
    model = Model(cfg.model)
    rng = np.random.RandomState(3)
    n = 300  # not a chunk multiple: exercises padding
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bx = np.cross(d, [0, 0, 1.0]); bx /= np.linalg.norm(bx, -1, keepdims=True)
    rays = dict(
        origins=(rng.randn(n, 3) * 0.05).astype(np.float32),
        directions=d, viewdirs=d, base_x=bx.astype(np.float32),
        base_y=np.cross(d, bx).astype(np.float32),
        radii=np.full((n, 1), 1e-3, np.float32),
        near=np.full((n, 1), 0.2, np.float32),
        far=np.full((n, 1), 8.0, np.float32),
        timestamp=np.zeros(n, np.float32))
    batch = {k: jnp.asarray(v) for k, v in rays.items()}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), None, batch)

    plain = ChunkRenderer(model, cfg, 256, fused=False).render(params, rays)
    fused = ChunkRenderer(model, cfg, 256, fused=True).render(params, rays)
    assert "semantic" in fused
    for k in ("rgb", "depth", "semantic"):
        np.testing.assert_allclose(fused[k], plain[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)


def test_pick_block_rays_fits_vmem():
    # The exact shape that OOMed the 16MB VMEM scope in the round-3 scale
    # run: chunk 16384, S=32, K=19 semantics (+rgb+intensity = C=23).
    from nerf_lidar_tpu.ops.render_pallas import (_pad_lanes,
                                                  _pick_block_rays)
    bk = _pick_block_rays(32, 23, 512)
    assert bk < 512  # must shrink below the old fixed block
    # Footprint bound with the channel-major layout actually fits.
    assert bk * 4 * _pad_lanes(32) * (2 * 23 + 16) <= 9 * 1024 * 1024
    # No-semantics case keeps the full block (perf regression guard).
    assert _pick_block_rays(32, 4, 512) == 512
    assert _pick_block_rays(128, 4, 512) == 512


def test_fused_composite_k19_large_chunk():
    # Numerics at the OOM-repro shape (block adaptation engaged). Smaller
    # R than 16384 to keep interpret mode fast, but > the adapted block.
    density, tdist, dirs, rgb, sem, inten = _inputs(R=600, K=19)
    out = render_pallas.fused_composite(density, tdist, dirs, rgb, sem,
                                        inten, block_rays=512)
    w_ref, _, _ = render.compute_alpha_weights(density, tdist, dirs,
                                               opaque_background=True)
    ref = render.volumetric_rendering(
        rgb, w_ref, tdist, bg_rgbs=jnp.asarray(1.0),
        t_far=tdist[:, -1:], compute_extras=False, semantic=sem,
        intensity=inten, sem_detach=False)
    np.testing.assert_allclose(np.asarray(out["semantic"]),
                               np.asarray(ref["semantic"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-5, atol=1e-5)


def test_render_fused_config_knob():
    # Per-preset measured inference defaults (exp/sweep_bench_r5d.log /
    # exp/chip_session_r5b.log): speed field is working-set-bound (plain
    # XLA + chunk 8800 wins), hash quality field is dispatch-bound
    # (fused + chunk 17600 wins). The config knob only applies on real
    # TPU backends — off-TPU the fused kernel runs in interpret mode
    # (correctness-only), so ChunkRenderer must keep the plain path on
    # this CPU test backend even when the preset asks for fused.
    from nerf_lidar_tpu import configs
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.renderer import ChunkRenderer

    speed = configs.nuscenes_multi_speed()
    assert speed.render_fused is False and speed.render_chunk_size == 8800
    fast = configs.nuscenes_multi_fast()
    assert fast.render_fused is True and fast.render_chunk_size == 17600

    cfg = configs.tiny_debug()  # render_fused=None -> backend auto
    model = Model(cfg.model)
    assert ChunkRenderer(model, cfg, 256).fused is False  # CPU auto
    import dataclasses
    cfg_on = dataclasses.replace(cfg, render_fused=True)
    assert ChunkRenderer(model, cfg_on, 256).fused is False  # CPU ignores
    assert ChunkRenderer(model, cfg_on, 256, fused=True).fused is True

    # Old snapshots (no render_fused key) load with the default.
    import json
    d = json.loads(cfg.to_json())
    del d["render_fused"]
    assert configs.Config.from_dict(d).render_fused is None
