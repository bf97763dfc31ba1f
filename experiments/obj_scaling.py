"""Measure dynamic-object compositing overhead at N_obj=16 (VERDICT item 5).

Times the tiny-config jitted train step on the real chip with 0 vs 16
padded object tracks. Round-1's compositor evaluated one MLP per slot in
an unrolled Python loop; the round-2 compositor evaluates the shared obj
MLP once over all slots via a vmapped padded layout, so the target is
<= 1.5x step time at N_obj=16. Timing bounded by value fetches (this
backend's block_until_ready returns early).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_lidar_tpu.utils import compile_cache

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nerf_lidar_tpu import configs  # noqa: E402
from nerf_lidar_tpu.data import synthetic  # noqa: E402
from nerf_lidar_tpu.data.batching import RayBatcher  # noqa: E402
from nerf_lidar_tpu.models.model import Model  # noqa: E402
from nerf_lidar_tpu.train import train_step  # noqa: E402

BATCH = 1024
STEPS = 30


def run(n_obj: int) -> dict:
    cfg = configs.tiny_debug()
    obj_grid = configs.GridConfig(level_dim=2, base_resolution=4,
                                  desired_resolution=16,
                                  log2_hashmap_size=8)
    mcfg = dataclasses.replace(
        cfg.model, instance_obj=n_obj > 0, num_objects=n_obj, latent_size=8,
        obj_mlp=dataclasses.replace(cfg.model.obj_mlp, grid=obj_grid,
                                    latent_size=8, class_num=5,
                                    class_type=3))
    cfg = dataclasses.replace(cfg, model=mcfg, batch_size=BATCH,
                              patch_size=1, lidar_supervision=False,
                              pose_refine=False, track_refine=False)
    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=cfg.far,
                                           with_lidar=False)
    batcher = RayBatcher(data, cfg.batch_size, 1, seed=0)
    model = Model(cfg.model)
    batch = jax.tree.map(jnp.asarray, batcher.next())
    tracks = track_mask = None
    if n_obj:
        t = np.zeros((n_obj, 3, 9), np.float32)
        t[:, :, 0] = np.linspace(0.5, 4.0, n_obj)[:, None]
        t[:, :, 4:7] = 0.4
        t[:, :, -2] = np.arange(3)
        tracks = jnp.asarray(t)
        track_mask = jnp.ones(n_obj, bool)
        batch = dict(batch, timestamp=jnp.ones(BATCH) * 1.0)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), None, batch,
                                 tracks=tracks, track_mask=track_mask)
    state, tx = train_step.create_train_state(cfg, params)
    step_fn = train_step.make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    state, stats = step_fn(state, batch, key, tracks, track_mask)
    float(jax.device_get(stats["loss"]))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batch, sub, tracks, track_mask)
    float(jax.device_get(stats["loss"]))
    dt = (time.perf_counter() - t0) / STEPS
    return {"n_obj": n_obj, "step_ms": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1)}


def main():
    r0 = run(0)
    r16 = run(16)
    ratio = r16["step_ms"] / r0["step_ms"]
    out = {"n_obj_0": r0, "n_obj_16": r16, "ratio": round(ratio, 2)}
    os.makedirs("exp/obj_scaling", exist_ok=True)
    with open("exp/obj_scaling/results.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
