"""Field shootout: hash fast config vs matmul-resident (dense+Fourier).

Trains each field on the synthetic oracle scene (the round-1 Pareto
harness: 400 steps, batch 2048, 4 views at 64x96) and reports train PSNR
plus steady-state rays/s, timed by chain-dependent value fetches (this
backend's block_until_ready returns early; see BASELINE.md).

Writes exp/field_shootout/results.json.
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

STEPS = 400
BATCH = 2048
OUT = "exp/field_shootout"


def run(name: str, cfg: configs.Config, steps: int = STEPS) -> dict:
    mcfg = dataclasses.replace(cfg.model, instance_obj=False)
    cfg = dataclasses.replace(cfg, model=mcfg, batch_size=BATCH,
                              patch_size=1, lidar_supervision=False,
                              pose_refine=False, track_refine=False)
    _, data, _ = synthetic.make_scene_data(num_views=4, height=64, width=96,
                                           focal=64.0, far=cfg.far,
                                           with_lidar=False)
    batcher = RayBatcher(data, cfg.batch_size, 1, seed=0)
    model = Model(cfg.model)
    batches = [jax.tree.map(jnp.asarray, batcher.next()) for _ in range(8)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), None, batches[0])
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    state, tx = train_step.create_train_state(cfg, params)
    step_fn = train_step.make_train_step(model, tx, cfg)

    key = jax.random.PRNGKey(1)
    psnr = None
    t0 = None
    timed_steps = 0
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batches[i % 8], sub, None, None)
        if i == 99:
            # Fetch -> everything up to here done; start the clock.
            float(jax.device_get(stats["loss"]))
            t0 = time.perf_counter()
            timed_steps = 0
        elif i > 99:
            timed_steps += 1
    psnr = float(jax.device_get(stats["psnr"]))
    dt = time.perf_counter() - t0
    rays_s = BATCH * timed_steps / dt
    res = {"steps": steps, "psnr_400": round(psnr, 2), "rays_per_sec": round(rays_s, 1),
           "params": n_params, "steps_timed": timed_steps}
    print(f"{name:10s} psnr@400={psnr:.2f} rays/s={rays_s:,.0f} "
          f"params={n_params/1e6:.1f}M")
    return res


def main():
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "results.json")
    results = json.load(open(path)) if os.path.exists(path) else {}
    def mxu_big():
        """Capacity-bumped spectral variant: MXU capacity is nearly free,
        so widen the trunk and the frequency bank to chase the hash
        field's equal-step quality."""
        cfg = configs.nuscenes_single_mxu()
        m = cfg.model
        nerf = dataclasses.replace(
            m.nerf_mlp, complex_decoder=True,
            grid=dataclasses.replace(m.nerf_mlp.grid, fourier_freqs=512,
                                     level_dim=32))
        prop = dataclasses.replace(
            m.prop_mlp,
            grid=dataclasses.replace(m.prop_mlp.grid, fourier_freqs=192))
        return dataclasses.replace(
            cfg, model=dataclasses.replace(m, nerf_mlp=nerf, prop_mlp=prop))

    def set_pooled(cfg, value=True):
        """fourier_pooled on/off for every spectral band."""
        m = cfg.model
        pool = lambda mlp: dataclasses.replace(
            mlp, grid=dataclasses.replace(mlp.grid, fourier_pooled=value))
        return dataclasses.replace(
            cfg, model=dataclasses.replace(m, nerf_mlp=pool(m.nerf_mlp),
                                           prop_mlp=pool(m.prop_mlp)))

    # NOTE: fourier_pooled became the mxu default after mxu_pooled beat
    # mxu by +30% rays/s at +0.2 dB — 'mxu' now means pooled; the archived
    # results.json rows 'mxu'/'mxu_ewc' predate the flip (= mxu_unpooled).
    mxu_pooled = lambda: set_pooled(configs.nuscenes_single_mxu())
    mxu_unpooled = lambda: set_pooled(configs.nuscenes_single_mxu(), False)
    mxu_bf16 = lambda: configs.bf16_variant(configs.nuscenes_single_mxu())
    mxu_pb = lambda: configs.bf16_variant(set_pooled(
        configs.nuscenes_single_mxu()))

    def props(n_samples, grids):
        cfg = configs.nuscenes_single_mxu()
        return dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, num_prop_samples=n_samples,
                prop_desired_grid_size=grids))

    mxu_prop1_64 = lambda: props((64,), (2048,))
    mxu_prop1_96 = lambda: props((96,), (2048,))
    mxu_prop_3232 = lambda: props((32, 32), (512, 2048))
    # Combined speed candidates: single prop level + bf16 compute — the
    # prospective flagship if quality holds (bench.py headline switch).
    mxu_speed = lambda: configs.bf16_variant(props((64,), (2048,)))
    mxu_speed96 = lambda: configs.bf16_variant(props((96,), (2048,)))

    def freqs(n):
        cfg = configs.nuscenes_single_mxu()
        m = cfg.model
        nerf = dataclasses.replace(
            m.nerf_mlp,
            grid=dataclasses.replace(m.nerf_mlp.grid, fourier_freqs=n))
        return dataclasses.replace(
            cfg, model=dataclasses.replace(m, nerf_mlp=nerf))

    # Pooling cut the encode cost ~7x: a wider frequency bank is nearly
    # free now (the trunk's first Dense grows, the view branch doesn't).
    mxu_f512 = lambda: freqs(512)
    mxu_f512_p3232 = lambda: dataclasses.replace(
        freqs(512), model=dataclasses.replace(
            freqs(512).model, num_prop_samples=(32, 32)))
    # f512 is ~free at mxu speed (+0.35 dB); stack it on the speed levers.
    mxu_speed_f512 = lambda: configs.bf16_variant(dataclasses.replace(
        freqs(512), model=dataclasses.replace(
            freqs(512).model, num_prop_samples=(64,),
            prop_desired_grid_size=(2048,))))
    # The named round-4 flagship preset, benched as shipped.
    speed = lambda: configs.nuscenes_single_speed()

    todo = sys.argv[1:] or ["fast", "mxu"]
    # mxu_ewc: equal WALL CLOCK with fast's 400 steps — the spectral field
    # steps ~3.2x faster, so it gets ~3.2x the steps in the same budget.
    for name, make, steps in [
            ("fast", configs.nuscenes_single_fast, STEPS),
            ("mxu", configs.nuscenes_single_mxu, STEPS),
            ("mxu_big", mxu_big, STEPS),
            ("mxu_pooled", mxu_pooled, STEPS),
            ("mxu_unpooled", mxu_unpooled, STEPS),
            ("mxu_bf16", mxu_bf16, STEPS),
            ("mxu_pooled_bf16", mxu_pb, STEPS),
            ("mxu_prop1_64", mxu_prop1_64, STEPS),
            ("mxu_prop1_96", mxu_prop1_96, STEPS),
            ("mxu_prop_3232", mxu_prop_3232, STEPS),
            ("mxu_speed", mxu_speed, STEPS),
            ("mxu_speed96", mxu_speed96, STEPS),
            ("mxu_f512", mxu_f512, STEPS),
            ("mxu_f512_p3232", mxu_f512_p3232, STEPS),
            ("mxu_speed_f512", mxu_speed_f512, STEPS),
            ("speed", speed, STEPS),
            ("mxu_ewc", configs.nuscenes_single_mxu, 1265)]:
        if name in todo:
            results[name] = run(name, make(), steps)
            with open(path, "w") as f:
                json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
