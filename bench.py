"""Benchmark: training rays/sec on the flagship TPU field config, one chip.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": R}

Benched config: `nuscenes_single_mxu` — the matmul-resident field (dense
tiled band below the v5e gather cliff + IPE-damped Fourier features,
ops/fourier.py). Quality context (BASELINE.md): +4.4 dB over the hash
fast config at equal wall clock on the oracle harness; 1-2 dB behind at
equal steps on the at-scale scene. The hash operating points
(reference-exact ~3.4k, fast ~7.2k rays/s) are recorded in BASELINE.md.

Baseline context: the reference publishes no numbers; its train throughput
metric is rays/sec = batch_size x steps/sec (reference train.py:485,527,554).
`vs_baseline` is against a 60k rays/s reference-class-GPU operating point
until a measured PyTorch baseline lands.

Timing note: this tunneled TPU backend's block_until_ready returns before
execution completes, so the loop is bounded by fetching the final loss
value, which depends on the whole step chain.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 60_000.0


def main():
    from nerf_lidar_tpu.utils import compile_cache
    compile_cache.enable()
    from nerf_lidar_tpu import configs
    from nerf_lidar_tpu.data import synthetic
    from nerf_lidar_tpu.data.batching import RayBatcher
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.train import train_step

    # Per-chip batch: the reference's 1-GPU debug operating point
    # (train_nusc.sh:24-26); its multi-GPU batch 16384 is global across 8
    # ranks. rays/sec reported here is per chip.
    batch_size = 4096
    cfg = configs.nuscenes_single_mxu()
    mcfg = dataclasses.replace(cfg.model, instance_obj=False)
    cfg = dataclasses.replace(cfg, model=mcfg, batch_size=batch_size,
                              patch_size=1, lidar_supervision=False,
                              pose_refine=False, track_refine=False)

    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=cfg.far,
                                           with_lidar=False)
    batcher = RayBatcher(data, cfg.batch_size, 1, seed=0)
    model = Model(cfg.model)
    batch = jax.tree.map(jnp.asarray, batcher.next())
    params = model.init(jax.random.PRNGKey(0), None, batch)
    state, tx = train_step.create_train_state(cfg, params)
    step_fn = train_step.make_train_step(model, tx, cfg)

    key = jax.random.PRNGKey(1)
    # Pre-generate host batches so input pipeline is excluded from timing.
    batches = [jax.tree.map(jnp.asarray, batcher.next()) for _ in range(8)]

    # Warmup/compile. NOTE: fetch the value (device_get) rather than
    # block_until_ready — on the tunneled TPU backend block_until_ready
    # returns before execution finishes, which silently benchmarks dispatch.
    key, sub = jax.random.split(key)
    state, stats = step_fn(state, batches[0], sub, None, None)
    float(jax.device_get(stats["loss"]))

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batches[i % len(batches)], sub, None,
                               None)
    # The final loss depends on the whole step chain; fetching it bounds the
    # wall time of all n_steps.
    float(jax.device_get(stats["loss"]))
    dt = time.perf_counter() - t0

    rays_per_sec = batch_size * n_steps / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
