"""Component-ladder profile of the full-recipe train step (ROADMAP r5 #4).

The round-4 bench records 60.6k rays/s stripped vs 14.7k full-recipe.
This script measures the step at each rung of the ladder — adding ONE
recipe component at a time on top of the stripped flagship — so the gap
decomposes into per-component costs instead of guesses.

Writes exp/profile_recipe/results.json: one entry per variant with
rays/s (batcher.total_rays-normalized, same as bench.py) and s/step.

Reading the numbers (ADVICE r4): components that ADD rays (lidar +1024,
roadaug +1024) keep rays/s ~flat while s_per_step rises — their
wall-clock cost must be read from s_per_step, not rays/s. Every variant
config passes Config.validate(): the pose/track rungs flip the grids to
diff_inputs=True (the only trainable form of refinement), so those rungs
pay the REAL dense-band position-gradient replay the round-4 version of
this script skipped.

Round-5 rungs: 'objects' uses the default compacted obj eval
(ModelConfig.obj_sample_frac); 'objects_dense' is the round-4 dense
evaluation (obj_sample_frac=0) kept as the regression reference.

Run solo on the chip (chip-exclusive rule, verify skill).
"""

import dataclasses
import json
import os
import sys
import time

# Must precede any nerf_lidar_tpu import: `python exp/profile_recipe.py`
# puts exp/ (not the repo root) on sys.path (r5c watcher ran it that way
# and died on ModuleNotFoundError).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "profile_recipe")
BATCH = 4096
STEPS = 30


def build_and_time(name, cfg, with_lidar, with_objects, with_posenet,
                   n_steps=STEPS):
    from nerf_lidar_tpu.data import synthetic
    from nerf_lidar_tpu.data.batching import RayBatcher
    from nerf_lidar_tpu.models import posenet as pn
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.train import train_step

    cfg.validate()
    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=cfg.far,
                                           with_lidar=with_lidar)
    batcher = RayBatcher(data, cfg.batch_size, cfg.patch_size,
                         lidar_supervision=cfg.lidar_supervision,
                         lidar_batch_ratio=cfg.lidar_batch_ratio,
                         aug_road=cfg.aug_road, aug_delta=cfg.aug_delta,
                         seed=0,
                         mask_moving=not cfg.model.instance_obj)
    tracks_j = track_mask = None
    if with_objects:
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
    pn_params = tn_params = posenet = tracknet = None
    if with_posenet:
        posenet = pn.LearnPose(num_cams=data.num_views, num_lidars=1,
                               t_ratio=cfg.t_ratio, learn_R=True,
                               learn_t=True)
        pn_params = posenet.init(jax.random.PRNGKey(1),
                                 jnp.zeros(1, jnp.int32))
    if with_objects and cfg.track_refine:
        tracknet = pn.TrackOpt(num_objects=2, num_timestamps=3)
        tn_params = tracknet.init(jax.random.PRNGKey(2), tracks_j)
    if not cfg.track_refine:
        tracknet = tn_params = None
    state, tx = train_step.create_train_state(cfg, params, pn_params,
                                              tn_params)
    step_fn = train_step.make_train_step(
        model, tx, cfg, num_patch_rays=batcher.num_patch_rays,
        posenet_model=posenet, tracknet_model=tracknet)

    key = jax.random.PRNGKey(3)
    key, sub = jax.random.split(key)
    t_c0 = time.perf_counter()
    state, stats = step_fn(state, batches[0], sub, tracks_j, track_mask)
    float(jax.device_get(stats["loss"]))  # compile + warm
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batches[i % len(batches)], sub,
                               tracks_j, track_mask)
    float(jax.device_get(stats["loss"]))
    dt = time.perf_counter() - t0
    res = {
        "variant": name,
        "total_rays": int(batcher.total_rays),
        "s_per_step": round(dt / n_steps, 4),
        "rays_per_sec": round(batcher.total_rays * n_steps / dt, 1),
        "compile_plus_warm_s": round(compile_s, 1),
    }
    if "obj_overflow" in stats:
        # Compaction-budget tripwire: >0 means the measured config dropped
        # intersecting samples back to the field prediction this step.
        res["obj_overflow_last_step"] = int(jax.device_get(
            stats["obj_overflow"]))
    print(json.dumps(res), flush=True)
    return res


def main():
    from nerf_lidar_tpu.utils import compile_cache
    compile_cache.enable()
    from nerf_lidar_tpu import configs

    base = configs.nuscenes_single_speed()

    def stripped(b):
        return dataclasses.replace(
            b, model=dataclasses.replace(b.model, instance_obj=False),
            batch_size=BATCH, patch_size=1, lidar_supervision=False,
            aug_road=False,
            pose_refine=False, track_refine=False)

    A = stripped(base)
    variants = []

    from bench import enable_refinement_grads

    # A: stripped headline (bench.py's `value` config)
    variants.append(("stripped", A, False, False, False))
    # B: + dynamic objects only (compacted obj eval, the default)
    B = dataclasses.replace(A, model=dataclasses.replace(
        A.model, instance_obj=True, num_objects=2))
    variants.append(("objects", B, False, True, False))
    # B': + dynamic objects, round-4 dense evaluation (regression ref)
    Bd = dataclasses.replace(A, model=dataclasses.replace(
        A.model, instance_obj=True, num_objects=2, obj_sample_frac=0.0))
    variants.append(("objects_dense", Bd, False, True, False))
    # B2: objects with the obj grid's input-grad replay disabled (the
    # default diff_inputs=True is only NEEDED under track/pose refinement;
    # validate() accepts False here). Isolates the replay share of B.
    B2 = dataclasses.replace(B, model=dataclasses.replace(
        B.model, obj_mlp=dataclasses.replace(
            B.model.obj_mlp, grid=dataclasses.replace(
                B.model.obj_mlp.grid, diff_inputs=False))))
    variants.append(("objects_nodiff", B2, False, True, False))
    # B3: objects on the spectral obj field (configs.spectral_obj_variant)
    # — isolates the hashed-table share of B (gathers + scatter backward).
    B3 = configs.spectral_obj_variant(B)
    variants.append(("objects_spectral", B3, False, True, False))
    # B4: + track refinement on top of objects (obj grid diff_inputs=True
    # is the only gradient requirement — the main field keeps its
    # scatter-only fast path; configs.Config.validate accepts this).
    B4 = dataclasses.replace(B, track_refine=True)
    variants.append(("trackrefine", B4, False, True, False))
    # C: + 32x32 patches only
    C = dataclasses.replace(A, patch_size=32)
    variants.append(("patches", C, False, False, False))
    # D: + LiDAR supervision only
    D = dataclasses.replace(A, lidar_supervision=True, lidar_batch_ratio=4)
    variants.append(("lidar", D, True, False, False))
    # E: + road augmentation only
    E = dataclasses.replace(A, aug_road=True, aug_delta=0.1)
    variants.append(("roadaug", E, False, False, False))
    # F: + pose refinement only (diff_inputs=True — the trainable form)
    F = enable_refinement_grads(dataclasses.replace(
        A, pose_refine=True, learn_R=True, learn_t=True))
    variants.append(("poserefine", F, False, False, True))
    # G: full recipe (bench.py's full_recipe config)
    G = enable_refinement_grads(dataclasses.replace(
        A, patch_size=32, lidar_supervision=True, lidar_batch_ratio=4,
        aug_road=True, aug_delta=0.1, pose_refine=True, track_refine=True,
        learn_R=True, learn_t=True,
        model=dataclasses.replace(A.model, instance_obj=True,
                                  num_objects=2)))
    variants.append(("full", G, True, True, True))
    # G': full recipe with the spectral obj field — the candidate
    # flagship full-recipe config if quality holds (exp/obj_field_quality).
    Gs = configs.spectral_obj_variant(G)
    variants.append(("full_spectralobj", Gs, True, True, True))

    os.makedirs(OUT, exist_ok=True)
    results = []
    for name, cfg, wl, wo, wp in variants:
        results.append(build_and_time(name, cfg, wl, wo, wp))
        with open(os.path.join(OUT, "results.json"), "w") as f:
            json.dump(results, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
