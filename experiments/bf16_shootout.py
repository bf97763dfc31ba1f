"""bf16 vs f32 compute-policy throughput on the mxu flagship (one chip).

Ratios measured back-to-back in one process; absolute numbers may be
contended (the at-scale run can share the chip). Timing discipline per
ROADMAP: bound by fetching a chain-dependent value."""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from nerf_lidar_tpu.utils import compile_cache
compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu import configs
from nerf_lidar_tpu.data import synthetic
from nerf_lidar_tpu.data.batching import RayBatcher
from nerf_lidar_tpu.models.model import Model
from nerf_lidar_tpu.train import train_step


def bench_cfg(cfg, batches, n_steps=20):
    model = Model(cfg.model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), None, batches[0])
    state, tx = train_step.create_train_state(cfg, params)
    step_fn = train_step.make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    state, stats = step_fn(state, batches[0], sub, None, None)
    float(jax.device_get(stats["loss"]))  # compile + warm
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batches[i % len(batches)], sub,
                               None, None)
    loss = float(jax.device_get(stats["loss"]))
    dt = time.perf_counter() - t0
    return cfg.batch_size * n_steps / dt, loss


def main():
    batch_size = 4096
    base = configs.nuscenes_single_mxu()
    base = dataclasses.replace(
        base, model=dataclasses.replace(base.model, instance_obj=False),
        batch_size=batch_size, patch_size=1, lidar_supervision=False,
        pose_refine=False, track_refine=False)
    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=base.far,
                                           with_lidar=False)
    batcher = RayBatcher(data, batch_size, 1, seed=0)
    batches = [jax.tree.map(jnp.asarray, batcher.next()) for _ in range(8)]

    out = {}
    for name, cfg in [("f32", base), ("bf16", configs.bf16_variant(base))]:
        rps, loss = bench_cfg(cfg, batches)
        out[name] = dict(rays_per_sec=round(rps, 1), loss=round(loss, 5))
        print(json.dumps({name: out[name]}), flush=True)
    out["bf16_speedup"] = round(out["bf16"]["rays_per_sec"]
                                / out["f32"]["rays_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
