"""Sweep the compacted-obj budget (configs.obj_sample_frac) on the chip.

The round-5 `objects` rung (37.1k rays/s) still pays 1.63x stripped with
frac=0.125, while the measured intersection stats (exp/profile_recipe/
obj_frac.json: synth f_ray*f_seg ~ 0.019, nusc ~ 0.0001) say the budget
has huge headroom. This sweep measures, per frac:

- rays/s on the `objects` rung and the `full` recipe rung (the two
  numbers the budget moves), timed exactly like exp/profile_recipe.py;
- max obj_hit_frac over a 30-step stat pass (the new train stat: the
  binding per-level utilization, i.e. the data-driven budget floor);
- obj_overflow over the same pass (tripwire: >0 means samples dropped).

Output: exp/profile_recipe/obj_budget_sweep.json. Run solo on the chip.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "profile_recipe")
# 0.125 (the default) is already measured in results.json; sweep the
# halving candidates.
FRACS = [0.0625, 0.03125]


def measure_hit_frac(cfg, with_lidar, with_objects, with_posenet,
                     n_steps=30):
    """Short stat pass: max obj_hit_frac / obj_overflow over n_steps."""
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
                         seed=0, mask_moving=not cfg.model.instance_obj)
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
    if cfg.track_refine:
        tracknet = pn.TrackOpt(num_objects=2, num_timestamps=3)
        tn_params = tracknet.init(jax.random.PRNGKey(2), tracks_j)
    state, tx = train_step.create_train_state(cfg, params, pn_params,
                                              tn_params)
    step_fn = train_step.make_train_step(
        model, tx, cfg, num_patch_rays=batcher.num_patch_rays,
        posenet_model=posenet, tracknet_model=tracknet)
    key = jax.random.PRNGKey(3)
    max_frac, max_over = 0.0, 0
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batches[i % len(batches)], sub,
                               tracks_j, track_mask)
        if "obj_hit_frac" in stats:
            max_frac = max(max_frac, float(jax.device_get(
                stats["obj_hit_frac"])))
        if "obj_overflow" in stats:
            max_over = max(max_over, int(jax.device_get(
                stats["obj_overflow"])))
    return max_frac, max_over


def main():
    from nerf_lidar_tpu.utils import compile_cache
    compile_cache.enable()
    from nerf_lidar_tpu import configs
    import profile_recipe as pr
    from bench import enable_refinement_grads

    base = configs.nuscenes_single_speed()
    A = dataclasses.replace(
        base, model=dataclasses.replace(base.model, instance_obj=False),
        batch_size=pr.BATCH, patch_size=1, lidar_supervision=False,
        aug_road=False, pose_refine=False, track_refine=False)

    results = []
    for frac in FRACS:
        B = dataclasses.replace(A, model=dataclasses.replace(
            A.model, instance_obj=True, num_objects=2,
            obj_sample_frac=frac))
        r = pr.build_and_time(f"objects_f{frac}", B, False, True, False)
        mf, mo = measure_hit_frac(B, False, True, False)
        r.update(frac=frac, max_obj_hit_frac=round(mf, 5),
                 max_obj_overflow=mo)
        results.append(r)
        G = enable_refinement_grads(dataclasses.replace(
            A, patch_size=32, lidar_supervision=True, lidar_batch_ratio=4,
            aug_road=True, aug_delta=0.1, pose_refine=True,
            track_refine=True, learn_R=True, learn_t=True,
            model=dataclasses.replace(A.model, instance_obj=True,
                                      num_objects=2, obj_sample_frac=frac)))
        r = pr.build_and_time(f"full_f{frac}", G, True, True, True)
        r.update(frac=frac)
        results.append(r)
        with open(os.path.join(OUT, "obj_budget_sweep.json"), "w") as f:
            json.dump(results, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
