"""Round-4 post-training chip session, batched into ONE process (the
per-process first-fetch warmup is 80-420 s; see .claude/skills/verify).

Run SOLO after the scale_speed 25k run exits:
    timeout 10800 python exp/chip_session_r4.py > exp/chip_session_r4.log 2>&1

Order (VERDICT r3 "next round" item 1 — the proof-at-scale artifacts):
  1. scale_speed endpoint artifacts: eval table, lidar_eval JSON, replay
     sweeps with the dynamic vehicle, removal-mode sweeps.
  2. SemanticKITTI export from the replay sweeps (raydrop feature ->
     train -> drop), closing the full product loop at the 25k checkpoint.
  3. sweep_bench: sweeps/sec on the trained flagship field.
  4. check_dynamic_sweeps artifact validation (CPU).
Each stage is fenced; a failure logs and moves on.
"""
import json
import os
import sys
import traceback

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from nerf_lidar_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()


def fence(name):
    def deco(fn):
        def run():
            print(f"==== {name} ====", flush=True)
            try:
                fn()
                print(f"==== {name} OK ====", flush=True)
            except Exception:
                traceback.print_exc()
                print(f"==== {name} FAILED ====", flush=True)
        return run
    return deco


C = ["--config_json", "exp/scale_speed/config.json"]


@fence("eval_25k")
def s1():
    from nerf_lidar_tpu import cli
    cli.main(["eval", *C])


@fence("lidar_eval_25k")
def s2():
    from nerf_lidar_tpu import cli
    cli.main(["lidar_eval", *C])


@fence("render_lidar_replay")
def s3():
    from nerf_lidar_tpu import cli
    cli.main(["render_lidar", *C, "--mode", "replay", "--num_sweeps", "6"])


@fence("render_lidar_removal")
def s4():
    from nerf_lidar_tpu import cli
    cli.main(["render_lidar", *C, "--mode", "replay", "--obj_mode",
              "removal", "--num_sweeps", "2"])


@fence("raydrop_and_export")
def s5():
    from nerf_lidar_tpu import cli
    sweep_dir = "exp/scale_speed/lidar_replay"
    cli.main(["raydrop_features", "--pair",
              f"exp/data/nusc_scale:{sweep_dir}",
              "--out", "exp/scale_speed/raydrop_feats.npy"])
    cli.main(["raydrop_train", "--features",
              "exp/scale_speed/raydrop_feats.npy",
              "--exp_name", "scale_speed/rd", "--epochs", "40",
              "--batch_size", "2"])
    ck = sorted(f for f in os.listdir("exp/scale_speed/rd")
                if f.endswith(".ckpt"))[-1]
    cli.main(["raydrop_drop", "--ckpt", f"exp/scale_speed/rd/{ck}",
              "--simulation_path", sweep_dir,
              "--out", "exp/scale_speed/kitti", "--place_car"])
    from nerf_lidar_tpu.lidar import export as export_lib
    b = export_lib.read_bin("exp/scale_speed/kitti/velodyne/000000.bin")
    lab = export_lib.read_label("exp/scale_speed/kitti/labels/000000.label")
    assert b.shape[0] == lab.shape[0] > 0, (b.shape, lab.shape)
    print(f"KITTI export: {b.shape[0]} points/sweep", flush=True)


@fence("sweep_bench")
def s6():
    sys.argv = ["sweep_bench.py", "nuscenes_multi_speed", "scale_speed"]
    import sweep_bench
    sweep_bench.main()


@fence("check_dynamic_sweeps")
def s7():
    import subprocess
    subprocess.run([sys.executable, "exp/check_dynamic_sweeps.py",
                    "exp/scale_speed"], check=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["s1", "s2", "s3", "s4", "s5", "s6", "s7"]
    for name, s in [("s1", s1), ("s2", s2), ("s3", s3), ("s4", s4),
                    ("s5", s5), ("s6", s6), ("s7", s7)]:
        if name in stages:
            s()
    print("CHIP SESSION DONE", flush=True)
