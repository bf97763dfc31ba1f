"""Sweep-render throughput: seconds per 32x1100 LiDAR sweep, one chip.

The BASELINE north star is <1 s/sweep on a v5e-8; round 1 measured
1.38 s/sweep single-chip on the hash fast config. This times the
checkpointed field named on the command line (default: the mxu flagship)
rendering full sweeps through lidar/render's path, bounded by value
fetches (block_until_ready lies on this backend).

Usage: python experiments/sweep_bench.py [config] [exp_name]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_lidar_tpu.utils import compile_cache

compile_cache.enable()

import jax  # noqa: E402
import numpy as np  # noqa: E402

CONFIG = sys.argv[1] if len(sys.argv) > 1 else "nuscenes_single_mxu"
EXP = sys.argv[2] if len(sys.argv) > 2 else "scale_mxu"
# "fresh": bench from a fresh init when no checkpoint survives. Sweep
# throughput is weight-independent (static shapes, identical compute), so
# this keeps configs benchable after their training checkpoints age out
# (round 4's scale_speed endpoint was not retained).
FRESH = "fresh" in sys.argv[3:]


def main():
    from nerf_lidar_tpu import cli
    from nerf_lidar_tpu.models.model import Model
    from nerf_lidar_tpu.renderer import ChunkRenderer
    from nerf_lidar_tpu.lidar import render as lrender
    from nerf_lidar_tpu.lidar import sensor as sensorlib

    args = type("A", (), {"config": CONFIG, "data_dir": "exp/data/nusc_scale",
                          "exp_name": EXP,
                          "set": ["sensor_num=6", "render_chunk_size=8800"]})()
    cfg = cli.build_config(args)
    scene = cli.load_scene_for(cfg, "lidar")
    data = scene.data
    import dataclasses
    model = Model(dataclasses.replace(cfg.model, instance_obj=False))
    params, step = cli._restore_model_params(cfg, model, data,
                                              allow_fresh=FRESH)

    l2g0 = scene.lidar["lidar2globals"][0] if scene.lidar else np.eye(4)
    sweeps, _ = sensorlib.simulated_sweeps(
        np.array([0.0, 0.0, 1.8]), np.array([8.0, 0.0, 1.8]), l2g0,
        scene.frame, num_sweeps=4)

    result = {"metric": "sweep_render_s", "config": CONFIG,
              "step": int(step), "rays_per_sweep": 32 * 1100}
    if FRESH:
        result["fresh_init"] = True
    # fused=True: the Pallas fused-composite inference path (the shipped
    # default on TPU); fused=False: the plain XLA compositing chain;
    # "bf16": fused + bfloat16 MLP compute (params stay the restored f32 —
    # MLPConfig.compute_dtype casts activations/matmuls only).
    from nerf_lidar_tpu import configs as cfglib
    bf16_model = Model(dataclasses.replace(
        cfglib.bf16_variant(cfg).model, instance_obj=False))
    for fused in (True, False, "bf16"):
        mdl = bf16_model if fused == "bf16" else model
        renderer = ChunkRenderer(mdl, cfg, cfg.render_chunk_size,
                                 fused=bool(fused))
        out = lrender.render_sweep(renderer, params, sweeps[0], data.near,
                                   data.far, scene.frame)  # warm + compile
        float(np.asarray(out["depth"]).sum())
        t0 = time.perf_counter()
        last = None
        for sw in sweeps:
            last = lrender.render_sweep(renderer, params, sw, data.near,
                                        data.far, scene.frame)
        float(np.asarray(last["depth"]).sum())
        dt = (time.perf_counter() - t0) / len(sweeps)
        key = {True: "value", False: "value_plain",
               "bf16": "value_bf16"}[fused]
        result[key] = round(dt, 3)
        result[key.replace("value", "sweeps_per_sec")] = round(1 / dt, 3)
    result["fused_speedup"] = round(result["value_plain"] / result["value"],
                                    3)
    result["bf16_speedup"] = round(result["value"] / result["value_bf16"], 3)

    # Compute-vs-transfer decomposition (VERDICT r4 weak #6): the same
    # fused sweep with ONLY a scalar fetched — every chunk's outputs are
    # reduced on-device to one float the timing fetch depends on, so the
    # tunnel pays 4 bytes instead of the full point/semantic payload. The
    # difference vs `value` is the host-transfer share a non-tunneled
    # production host would (mostly) not pay.
    import jax.numpy as jnp
    renderer = ChunkRenderer(model, cfg, cfg.render_chunk_size, fused=True)

    def sweep_scalar(sw):
        rays = sw.ray_batch(data.near, data.far)
        n = rays["origins"].shape[0]
        step = cfg.render_chunk_size
        n_pad = (n + step - 1) // step * step
        from nerf_lidar_tpu.renderer import _pad_to
        rays_p = {k: _pad_to(np.asarray(v), n_pad) for k, v in rays.items()}
        acc = jnp.zeros(())
        for i in range(0, n_pad, step):
            chunk = {k: jnp.asarray(v[i:i + step])
                     for k, v in rays_p.items()}
            out = renderer._apply(params, chunk, None, None)
            acc = acc + sum(jnp.sum(v) for v in out.values())
        return acc

    float(sweep_scalar(sweeps[0]))  # warm
    t0 = time.perf_counter()
    accs = [sweep_scalar(sw) for sw in sweeps]
    float(sum(accs))
    dt = (time.perf_counter() - t0) / len(sweeps)
    result["value_compute_only"] = round(dt, 3)
    result["transfer_share_s"] = round(result["value"] - dt, 3)

    # Chunk-size ladder on the fused full path: fewer dispatches per sweep
    # vs per-chunk working-set growth — answers whether the single-chip
    # floor is dispatch- or compute-bound.
    for chunk in (17600, 35200):
        try:
            r2 = ChunkRenderer(model, cfg, chunk, fused=True)
            out = lrender.render_sweep(r2, params, sweeps[0], data.near,
                                       data.far, scene.frame)
            float(np.asarray(out["depth"]).sum())
            t0 = time.perf_counter()
            for sw in sweeps:
                last = lrender.render_sweep(r2, params, sw, data.near,
                                            data.far, scene.frame)
            float(np.asarray(last["depth"]).sum())
            result[f"value_chunk{chunk}"] = round(
                (time.perf_counter() - t0) / len(sweeps), 3)
        except Exception as e:  # noqa: BLE001 (OOM at big chunks is data)
            result[f"value_chunk{chunk}"] = f"failed: {type(e).__name__}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
