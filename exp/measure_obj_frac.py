"""Measure how sparse the object-box intersection set really is, to size
the compaction budget (configs.obj_sample_frac) from data instead of a
guess.

Two statistics over many real training batches, per batch:

- f_ray: fraction of rays whose [near, far] segment intersects ANY valid
  box (slab test). This upper-bounds the needed budget even in the
  absurd worst case where EVERY sample of a hitting ray lies inside the
  box, so budget >= max(f_ray) is always sufficient.
- f_seg: mean over hitting rays of the in-box segment length / ray
  segment length — how much of a hitting ray is actually inside, i.e.
  the expected in-box SAMPLE fraction under uniform-in-t sampling.
  (Resampling concentrates samples near surfaces, which sit on box
  boundaries, so the realistic per-level fraction lies between
  f_ray*f_seg and f_ray.)

Runs host-side numpy + CPU jax only (safe beside a chip run). Scenes:
the bench/profile synthetic setup (what bench.py full_recipe measures)
and exp/data/nusc_scale (what the at-scale runs train on).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_BATCHES = 200


def ray_frac(batch, tracks, track_mask):
    """(f_ray, f_seg) for one batch, numpy slab test in world space."""
    from nerf_lidar_tpu.models import objects as objlib
    import jax.numpy as jnp

    pose = np.asarray(objlib.get_pose(
        jnp.asarray(batch["timestamp"]), jnp.asarray(tracks)))  # [R, N, F]
    o = batch["origins"][:, None, :]
    d = batch["directions"][:, None, :]
    center, theta, wlh = pose[..., :3], pose[..., 3], pose[..., 4:7]
    c, s = np.cos(theta), np.sin(theta)
    # world -> unit-box frame, exactly objects.world2object (rotate_z by
    # +theta, scale by inverse half-extents); directions stay UNNORMALIZED
    # so slab t-values share the ray's own t parameterization (near/far).
    rel = o - center
    ox = c * rel[..., 0] - s * rel[..., 1]
    oy = s * rel[..., 0] + c * rel[..., 1]
    oz = rel[..., 2]
    dx = c * d[..., 0] - s * d[..., 1]
    dy = s * d[..., 0] + c * d[..., 1]
    dz = np.broadcast_to(d[..., 2], dx.shape)
    inv_half = 1.0 / (wlh / 2.0 + 1e-9)
    bo = np.stack([ox, oy, oz], -1) * inv_half
    bd = np.stack([dx, dy, dz], -1) * inv_half
    # slab test against |x|<1
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (-1.0 - bo) / bd
        t2 = (1.0 - bo) / bd
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    near = batch["near"][:, 0:1]
    far = batch["far"][:, 0:1]
    lo = np.maximum(tmin, near)
    hi = np.minimum(tmax, far)
    valid = np.all(wlh > 0, -1) & np.asarray(track_mask)[None, :]
    seg = np.clip(hi - lo, 0, None) * valid
    hit = (seg > 0).any(-1)
    f_ray = hit.mean()
    span = (far - near)[:, 0]
    f_seg = float((seg.sum(-1)[hit] / span[hit]).mean()) if hit.any() else 0.0
    return float(f_ray), f_seg


def run_synth():
    """The bench.py/profile_recipe full-recipe object setup."""
    from nerf_lidar_tpu.data import synthetic
    from nerf_lidar_tpu.data.batching import RayBatcher

    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=12.0,
                                           with_lidar=True)
    batcher = RayBatcher(data, 4096, 32, lidar_supervision=True,
                         aug_road=True, seed=0, mask_moving=False)
    T = 3
    tracks = np.zeros((2, T, 9), np.float32)
    tracks[:, :, 1] = 2.0
    tracks[:, :, 4:7] = 1.0
    tracks[:, :, -2] = np.arange(T)
    return batcher, tracks, np.array([True, True])


def run_scale():
    from nerf_lidar_tpu import cli, configs

    args = type("A", (), {"config": "nuscenes_multi_fast",
                          "data_dir": "exp/data/nusc_scale",
                          "exp_name": "frac_probe", "set": []})()
    cfg = cli.build_config(args)
    scene = cli.load_scene_for(cfg, "train")
    from nerf_lidar_tpu.data.batching import RayBatcher
    batcher = RayBatcher(scene.data, 4096, cfg.patch_size,
                         lidar_supervision=cfg.lidar_supervision,
                         lidar_batch_ratio=cfg.lidar_batch_ratio,
                         aug_road=cfg.aug_road, aug_delta=cfg.aug_delta,
                         seed=0, mask_moving=not cfg.model.instance_obj)
    return batcher, np.asarray(scene.tracks), np.asarray(scene.track_mask)


def main():
    out = {}
    for name, mk in (("synth_bench", run_synth), ("nusc_scale", run_scale)):
        batcher, tracks, mask = mk()
        f_rays, f_segs = [], []
        for _ in range(N_BATCHES):
            b = batcher.next()
            fr, fs = ray_frac(b, tracks, mask)
            f_rays.append(fr)
            f_segs.append(fs)
        f = np.array(f_rays)
        out[name] = {
            "batches": N_BATCHES,
            "f_ray_mean": round(float(f.mean()), 4),
            "f_ray_p99": round(float(np.percentile(f, 99)), 4),
            "f_ray_max": round(float(f.max()), 4),
            "f_seg_mean": round(float(np.mean(f_segs)), 4),
        }
        print(name, json.dumps(out[name]), flush=True)
    os.makedirs("exp/profile_recipe", exist_ok=True)
    json.dump(out, open("exp/profile_recipe/obj_frac.json", "w"), indent=1)


if __name__ == "__main__":
    main()
