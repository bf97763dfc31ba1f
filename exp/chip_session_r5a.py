"""Round-5a chip session (ONE process, chip exclusive):

  1. verify drive: the full CLI pipeline on the REAL chip — train 300
     steps on a tiny scene -> render replay sweeps -> raydrop feature
     assembly -> U-Net train -> drop + SemanticKITTI export WITH the new
     mask-quality summary (iou/precision/recall/range MAE).
  2. profile_recipe: the component ladder, now with the compacted obj
     eval ('objects') vs the round-4 dense eval ('objects_dense') and
     valid (diff_inputs=True) refinement rungs.
  3. bench.py main(): headline + full-recipe JSON line.

Usage: timeout 10800 python exp/chip_session_r5a.py > exp/chip_session_r5a.log 2>&1
"""
import json
import os
import sys
import time
import traceback

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")

from nerf_lidar_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()


def fence(name):
    def deco(fn):
        def run():
            print(f"==== {name} ====", flush=True)
            t0 = time.time()
            try:
                fn()
                print(f"==== {name} OK in {time.time() - t0:.0f}s ====",
                      flush=True)
            except Exception:
                traceback.print_exc()
                print(f"==== {name} FAILED ====", flush=True)
        return run
    return deco


@fence("verify_pipeline")
def s1():
    import numpy as np
    from nerf_lidar_tpu import cli
    from nerf_lidar_tpu.data import synth_nusc
    from nerf_lidar_tpu.lidar import export as export_lib

    root = "exp/verify_r5/scene"
    if not os.path.exists(root):
        synth_nusc.write_scene_dir(root, num_frames=4, sensor_num=2,
                                   height=48, width=64,
                                   lidar_points_per_beam=96)
    # The validator must pass on the layout the drive trains on.
    cli.main(["validate_scene", root, "--sensor_num", "2"])

    TINY_OBJ = ["--set", "model.obj_mlp.grid.log2_hashmap_size=8",
                "--set", "model.obj_mlp.grid.desired_resolution=16",
                "--set", "model.obj_mlp.grid.base_resolution=4",
                "--set", "model.obj_mlp.bottleneck_width=16",
                "--set", "model.obj_mlp.net_width_viewdirs=16",
                "--set", "model.obj_mlp.class_num=5",
                "--set", "model.obj_mlp.class_type=3"]
    common = ["--config", "tiny_debug", "--data_dir", root,
              "--exp_name", "verify_r5/run",
              "--set", "model.instance_obj=true", *TINY_OBJ]
    t0 = time.time()
    cli.main(["train", *common, "--steps", "300",
              "--set", "batch_size=1024", "--set", "max_steps=300",
              "--set", "checkpoint_every=300", "--set", "patch_size=1",
              "--set", "train_render_every=0",
              "--set", "lidar_supervision=true"])
    print(f"TRAIN OK in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    cli.main(["render_lidar", *common, "--mode", "replay",
              "--num_sweeps", "2"])
    sweep_dir = "exp/verify_r5/run/lidar_replay"
    pts = np.load(os.path.join(sweep_dir, "points_0000.npy"))
    assert pts.shape == (32 * 1100, 3), pts.shape
    print(f"RENDER_LIDAR OK: {pts.shape} in {time.time() - t0:.0f}s",
          flush=True)

    cli.main(["raydrop_features", "--pair", f"{root}:{sweep_dir}",
              "--out", "exp/verify_r5/feats.npy", "--width", "128"])
    cli.main(["raydrop_train", "--features", "exp/verify_r5/feats.npy",
              "--exp_name", "verify_r5/rd", "--epochs", "1",
              "--batch_size", "1", "--no_vgg"])
    ck = [f for f in os.listdir("exp/verify_r5/rd")
          if f.endswith(".ckpt")][0]
    cli.main(["raydrop_drop", "--ckpt", f"exp/verify_r5/rd/{ck}",
              "--simulation_path", sweep_dir,
              "--out", "exp/verify_r5/kitti", "--width", "128",
              "--place_car", "--features", "exp/verify_r5/feats.npy"])
    b = export_lib.read_bin("exp/verify_r5/kitti/velodyne/000000.bin")
    lab = export_lib.read_label("exp/verify_r5/kitti/labels/000000.label")
    assert b.shape[0] == lab.shape[0] > 0
    summary = json.load(open("exp/verify_r5/kitti/summary.json"))
    for k in ("iou", "precision", "recall", "range_mae_gt",
              "points_per_sweep"):
        assert k in summary, summary
    print("PIPELINE VERIFY OK", flush=True)


@fence("profile_recipe")
def s2():
    sys.path.insert(0, "exp")
    import profile_recipe
    profile_recipe.main()


@fence("bench")
def s3():
    import bench
    bench.main()


if __name__ == "__main__":
    s1()
    s2()
    s3()
    print("SESSION DONE", flush=True)
