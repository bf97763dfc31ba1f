"""Benchmark: training rays/sec on the flagship TPU field config, one chip.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": R, "full_recipe_rays_per_sec": M}

Benched config: `nuscenes_single_speed` — the matmul-resident spectral
field (dense tiled band below the v5e gather cliff + pooled
single-Gaussian-IPE Fourier features, ops/fourier.py) with the round-4
speed levers: ONE 64-sample proposal level, bf16 matmuls, and a
512-frequency bank (configs.speed_variant). Quality context
(exp/field_shootout/results.json + BASELINE.md round-4): on the 400-step
oracle the speed flagship measures 60.9k rays/s @ 29.55 dB vs the round-3
mxu flagship's 35.4k @ 29.08 — 1.7x the throughput at +0.5 dB. The hash
operating points (reference-exact ~3.4k, fast ~8.8k rays/s) are in
BASELINE.md.

`value` is the reference's own throughput definition (rays/sec =
batch_size x steps/sec, train.py:485) on the single-field training
config. `full_recipe_rays_per_sec` is the same metric with the WHOLE
product recipe on: dynamic objects, 32x32 patches, LiDAR supervision,
road augmentation, pose+track refinement — so the headline and the
shipped config are measured side by side.

Baseline context: the reference publishes no numbers; `vs_baseline` is
against a 60k rays/s reference-class-GPU operating point until a measured
PyTorch baseline lands.

Timing note: this tunneled TPU backend's block_until_ready returns before
execution completes, so the loop is bounded by fetching the final loss
value, which depends on the whole step chain.
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 60_000.0
SMOKE = bool(os.environ.get("NL_BENCH_SMOKE"))  # tiny CPU wiring check


def _time_steps(step_fn, state, batches, key, n_steps, tracks=None,
                track_mask=None):
    key, sub = jax.random.split(key)
    state, stats = step_fn(state, batches[0], sub, tracks, track_mask)
    float(jax.device_get(stats["loss"]))  # compile + warm
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batches[i % len(batches)], sub,
                               tracks, track_mask)
    float(jax.device_get(stats["loss"]))
    return time.perf_counter() - t0


def bench_headline(cfg_mod, batch_size, n_steps):
    """Single-field training config (the reference's train throughput)."""
    from nerf_lidar_tpu.data import synthetic
    from nerf_lidar_tpu.data.batching import RayBatcher
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.train import train_step

    cfg = cfg_mod
    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=cfg.far,
                                           with_lidar=False)
    batcher = RayBatcher(data, cfg.batch_size, 1, seed=0)
    model = Model(cfg.model)
    batches = [jax.tree.map(jnp.asarray, batcher.next()) for _ in range(8)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), None, batches[0])
    state, tx = train_step.create_train_state(cfg, params)
    step_fn = train_step.make_train_step(model, tx, cfg)
    dt = _time_steps(step_fn, state, batches, jax.random.PRNGKey(1), n_steps)
    return batch_size * n_steps / dt


def enable_refinement_grads(cfg):
    """diff_inputs=True on every grid: the only trainable form of
    pose/track refinement (see configs.Config.validate)."""
    m = cfg.model

    def flip(mlp):
        return dataclasses.replace(
            mlp, grid=dataclasses.replace(mlp.grid, diff_inputs=True))

    return dataclasses.replace(cfg, model=dataclasses.replace(
        m, nerf_mlp=flip(m.nerf_mlp), prop_mlp=flip(m.prop_mlp),
        obj_mlp=flip(m.obj_mlp)))


def bench_full_recipe(base_cfg, batch_size, n_steps):
    """The shipped config: objects + patches + LiDAR + road-aug +
    pose/track refinement (mirrors cli.cmd_train wiring)."""
    from nerf_lidar_tpu.data import synthetic
    from nerf_lidar_tpu.data.batching import RayBatcher
    from nerf_lidar_tpu.models import posenet as pn
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.train import train_step

    patch = 8 if SMOKE else 32
    cfg = dataclasses.replace(
        base_cfg, batch_size=batch_size, patch_size=patch,
        lidar_supervision=True, lidar_batch_ratio=4, aug_road=True,
        aug_delta=0.1, pose_refine=True, track_refine=True,
        learn_R=True, learn_t=True,
        model=dataclasses.replace(base_cfg.model, instance_obj=True,
                                  num_objects=2))
    # Pose/track refinement needs position gradients through the encodes
    # (Config.validate rejects diff_inputs=False + refinement): flip every
    # grid to the autodiff path, exactly as a real refinement run must.
    cfg = enable_refinement_grads(cfg)
    cfg.validate()
    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=cfg.far,
                                           with_lidar=True)
    batcher = RayBatcher(data, cfg.batch_size, cfg.patch_size,
                         lidar_supervision=True,
                         lidar_batch_ratio=cfg.lidar_batch_ratio,
                         aug_road=True, aug_delta=cfg.aug_delta, seed=0,
                         mask_moving=not cfg.model.instance_obj)
    T = 3
    tracks = np.zeros((2, T, 9), np.float32)
    tracks[:, :, 1] = 2.0
    tracks[:, :, 4:7] = 1.0
    tracks[:, :, -2] = np.arange(T)
    tracks_j = jnp.asarray(tracks)
    track_mask = jnp.asarray([True, True])

    model = Model(cfg.model)
    batches = [jax.tree.map(jnp.asarray, batcher.next()) for _ in range(8)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), None, batches[0],
                                 tracks=tracks_j, track_mask=track_mask)
    posenet = pn.LearnPose(num_cams=data.num_views, num_lidars=1,
                           t_ratio=cfg.t_ratio, learn_R=True, learn_t=True)
    pn_params = posenet.init(jax.random.PRNGKey(1), jnp.zeros(1, jnp.int32))
    tracknet = pn.TrackOpt(num_objects=2, num_timestamps=T)
    tn_params = tracknet.init(jax.random.PRNGKey(2), tracks_j)
    state, tx = train_step.create_train_state(cfg, params, pn_params,
                                              tn_params)
    step_fn = train_step.make_train_step(
        model, tx, cfg, num_patch_rays=batcher.num_patch_rays,
        posenet_model=posenet, tracknet_model=tracknet)
    dt = _time_steps(step_fn, state, batches, jax.random.PRNGKey(3),
                     n_steps, tracks_j, track_mask)
    # Rays actually rendered per step: batch + road-aug + lidar extras
    # (batcher.total_rays), not the nominal batch_size — the headline
    # config's total_rays == batch_size, so the two rates stay comparable.
    return batcher.total_rays * n_steps / dt


def main():
    from nerf_lidar_tpu.utils import compile_cache
    compile_cache.enable()
    from nerf_lidar_tpu import configs

    # Per-chip batch: the reference's 1-GPU debug operating point
    # (train_nusc.sh:24-26); its multi-GPU batch 16384 is global across 8
    # ranks. rays/sec reported here is per chip.
    batch_size = 256 if SMOKE else 4096
    n_steps = 3 if SMOKE else 30
    if SMOKE:
        base = configs.tiny_debug()
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, obj_mlp=dataclasses.replace(
                base.model.obj_mlp, class_num=5, class_type=3,
                bottleneck_width=16, net_width_viewdirs=16,
                grid=configs.GridConfig(level_dim=2, base_resolution=4,
                                        desired_resolution=16,
                                        log2_hashmap_size=8))))
    else:
        base = configs.nuscenes_single_speed()
    cfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model, instance_obj=False),
        batch_size=batch_size, patch_size=1, lidar_supervision=False,
        pose_refine=False, track_refine=False)

    rays_per_sec = bench_headline(cfg, batch_size, n_steps)
    full = bench_full_recipe(base, batch_size, n_steps)
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "full_recipe_rays_per_sec": round(full, 1),
    }))


if __name__ == "__main__":
    main()
