"""Round-5e verify drive: the full CLI pipeline on the REAL TPU chip,
including the new dynamic-object LiDAR path + raydrop_features assembly."""
import os, sys, time
import numpy as np
os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
from nerf_lidar_tpu import cli
from nerf_lidar_tpu.data import synth_nusc
from nerf_lidar_tpu.lidar import export as export_lib

root = "exp/verify_r5e/scene"
if not os.path.exists(root):
    synth_nusc.write_scene_dir(root, num_frames=4, sensor_num=2,
                               height=48, width=64, lidar_points_per_beam=96)

TINY_OBJ = ["--set", "model.obj_mlp.grid.log2_hashmap_size=8",
            "--set", "model.obj_mlp.grid.desired_resolution=16",
            "--set", "model.obj_mlp.grid.base_resolution=4",
            "--set", "model.obj_mlp.bottleneck_width=16",
            "--set", "model.obj_mlp.net_width_viewdirs=16",
            "--set", "model.obj_mlp.class_num=5",
            "--set", "model.obj_mlp.class_type=3"]
common = ["--config", "tiny_debug", "--data_dir", root,
          "--exp_name", "verify_r5e/run", "--set", "model.instance_obj=true",
          *TINY_OBJ]
t0 = time.time()
cli.main(["train", *common, "--steps", "300", "--set", "batch_size=1024",
          "--set", "max_steps=300", "--set", "checkpoint_every=300",
          "--set", "patch_size=1", "--set", "train_render_every=0",
          "--set", "lidar_supervision=true"])
print(f"TRAIN OK in {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
cli.main(["render_lidar", *common, "--mode", "replay", "--num_sweeps", "2"])
sweep_dir = "exp/verify_r5e/run/lidar_replay"
pts = np.load(os.path.join(sweep_dir, "points_0000.npy"))
assert pts.shape == (32 * 1100, 3), pts.shape
print(f"RENDER_LIDAR OK: {pts.shape} in {time.time()-t0:.0f}s", flush=True)

cli.main(["raydrop_features", "--pair", f"{root}:{sweep_dir}",
          "--out", "exp/verify_r5e/feats.npy", "--width", "128"])
cli.main(["raydrop_train", "--features", "exp/verify_r5e/feats.npy",
          "--exp_name", "verify_r5e/rd", "--epochs", "1",
          "--batch_size", "1", "--no_vgg"])
ck = [f for f in os.listdir("exp/verify_r5e/rd") if f.endswith(".ckpt")][0]
cli.main(["raydrop_drop", "--ckpt", f"exp/verify_r5e/rd/{ck}",
          "--simulation_path", sweep_dir, "--out", "exp/verify_r5e/kitti",
          "--width", "128", "--place_car"])
b = export_lib.read_bin("exp/verify_r5e/kitti/velodyne/000000.bin")
lab = export_lib.read_label("exp/verify_r5e/kitti/labels/000000.label")
assert b.shape[0] == lab.shape[0] > 0
assert os.path.exists("exp/verify_r5e/kitti/ego2globals.npy")
print("PIPELINE VERIFY OK", flush=True)
