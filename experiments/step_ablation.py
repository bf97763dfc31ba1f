"""Step-time decomposition for the mxu flagship: time the train step with
individual components disabled to locate the remaining cost (60k rays/s
target hunt). Contended ratios are fine; run solo for records.

Variants (batch 4096 unless noted):
  full          - the bench.py config
  bf16          - + compute_dtype=bfloat16
  pooled        - + fourier_pooled (single-Gaussian IPE)
  pooled_bf16   - both
  no_aux_loss   - interlevel/distortion/hash_decay mults = 0
  n1            - sample_n=1 (no multisample cloud anywhere)
  no_props      - proposal levels off (32 nerf samples only; lower bound)
  b8192/b16384  - batch-size scaling (b16384 = the reference's multi-GPU
                  global batch on ONE chip)
"""
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


def base_cfg(batch_size=4096):
    cfg = configs.nuscenes_single_mxu()
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, instance_obj=False),
        batch_size=batch_size, patch_size=1, lidar_supervision=False,
        pose_refine=False, track_refine=False)


def pooled(cfg):
    m = cfg.model
    f = lambda mlp: dataclasses.replace(
        mlp, grid=dataclasses.replace(mlp.grid, fourier_pooled=True))
    return dataclasses.replace(cfg, model=dataclasses.replace(
        m, nerf_mlp=f(m.nerf_mlp), prop_mlp=f(m.prop_mlp)))


def bench(cfg, n_steps=20):
    # One timing discipline for the whole repo: bench._time_steps bounds
    # execution by a chain-dependent device_get (block_until_ready returns
    # early on this tunneled backend — BASELINE.md).
    from bench import _time_steps
    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=cfg.far,
                                           with_lidar=False)
    batcher = RayBatcher(data, cfg.batch_size, 1, seed=0)
    batches = [jax.tree.map(jnp.asarray, batcher.next()) for _ in range(4)]
    model = Model(cfg.model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), None, batches[0])
    state, tx = train_step.create_train_state(cfg, params)
    step_fn = train_step.make_train_step(model, tx, cfg)
    dt = _time_steps(step_fn, state, batches, jax.random.PRNGKey(1), n_steps)
    return cfg.batch_size * n_steps / dt


def main():
    variants = {}
    cfg = base_cfg()
    variants["full"] = cfg
    variants["bf16"] = configs.bf16_variant(cfg)
    variants["pooled"] = pooled(cfg)
    variants["pooled_bf16"] = configs.bf16_variant(pooled(cfg))
    variants["no_aux_loss"] = dataclasses.replace(
        cfg, anti_interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
        hash_decay_mults=0.0)
    variants["n1"] = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, sample_n=1, sample_m=1))
    variants["no_props"] = dataclasses.replace(
        cfg, anti_interlevel_loss_mult=0.0,
        model=dataclasses.replace(cfg.model, num_prop_samples=(),
                                  prop_desired_grid_size=()))
    variants["b8192"] = base_cfg(8192)
    variants["b16384"] = base_cfg(16384)
    variants["pooled_b8192"] = pooled(base_cfg(8192))
    variants["pooled_b16384"] = pooled(base_cfg(16384))
    variants["remat_off"] = pooled(dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=False)))
    # Proposal-budget variants (reference uses (64, 64) + 32).
    variants["prop1_64"] = pooled(dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_prop_samples=(64,),
                                       prop_desired_grid_size=(2048,))))
    variants["prop1_96"] = pooled(dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_prop_samples=(96,),
                                       prop_desired_grid_size=(2048,))))
    variants["prop_3232"] = pooled(dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       num_prop_samples=(32, 32))))
    # Round-3 flagship composition: prop1_64 is the quality-neutral winner
    # (60.8k rays/s, -0.11 dB at 400 steps); stack the orthogonal levers.
    prop1 = dataclasses.replace(cfg.model, num_prop_samples=(64,),
                                prop_desired_grid_size=(2048,))
    variants["prop1_64_nremat"] = pooled(dataclasses.replace(
        cfg, model=dataclasses.replace(prop1, remat=False)))
    variants["prop1_64_bf16"] = configs.bf16_variant(pooled(
        dataclasses.replace(cfg, model=prop1)))
    variants["prop1_64_b8192"] = pooled(dataclasses.replace(
        base_cfg(8192), model=dataclasses.replace(
            base_cfg(8192).model, num_prop_samples=(64,),
            prop_desired_grid_size=(2048,))))
    variants["prop1_64_nremat_b8192"] = pooled(dataclasses.replace(
        base_cfg(8192), model=dataclasses.replace(
            base_cfg(8192).model, num_prop_samples=(64,),
            prop_desired_grid_size=(2048,), remat=False)))
    # Dense-band cost: shrink the tiled grid to one 16^3 level (keeps the
    # code path; isolates the gather share of the step).
    def small_dense(mlp):
        return dataclasses.replace(mlp, grid=dataclasses.replace(
            mlp.grid, fourier_dense_res=16, fourier_pooled=True))
    variants["tiny_dense"] = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, nerf_mlp=small_dense(cfg.model.nerf_mlp),
            prop_mlp=small_dense(cfg.model.prop_mlp)))

    todo = sys.argv[1:] or list(variants)
    out = {}
    for name in todo:
        try:
            rps = bench(variants[name])
            out[name] = round(rps, 1)
            print(json.dumps({name: out[name]}), flush=True)
        except Exception as e:
            out[name] = f"ERROR: {type(e).__name__}: {e}"
            print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
