"""Round-5b endpoint chip session (ONE process, chip exclusive; run after
the scale_r5q babysitter exits):

  1. eval at scale_r5q's last checkpoint — the FIRST at-scale endpoint
     with the fixed float64 color_correct (the round-4 f32 solve read
     psnr_cc 12 dB LOW); asserts psnr_cc >= psnr - 0.1 (VERDICT r4 #2).
  2. lidar_eval (depth MAE / Chamfer / mIoU vs real returns).
  3. replay sweeps (feeds the raydrop loop + dynamic checks).
  4. removal-mode sweeps.
  5. sweep_bench with the new compute-vs-transfer decomposition
     (VERDICT r4 #6), on the endpoint checkpoint.
  6. check_dynamic_sweeps.
  7. dense-GT raydrop loop with the new mask-quality metrics
     (iou/precision/recall/range MAE, VERDICT r4 #3) — summary lands in
     exp/scale_r5q/kitti_dense/summary.json.
  8. driver entry() forward check.

Usage: timeout 9000 python exp/chip_session_r5b.py > exp/chip_session_r5b.log 2>&1
       (or with explicit stage names: ... r5b.py s1 s2 s5)
"""
import json
import os
import sys
import time
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


C = ["--config_json", "exp/scale_r5q/config.json"]


@fence("r5q_eval")
def s1():
    from nerf_lidar_tpu import cli
    cli.main(["eval", *C])
    evals = sorted(f for f in os.listdir("exp/scale_r5q/eval")
                   if f.startswith("metrics_"))
    m = json.load(open(f"exp/scale_r5q/eval/{evals[-1]}"))
    print("endpoint eval:", json.dumps(m), flush=True)
    assert m["psnr_cc"] >= m["psnr"] - 0.1, (m["psnr_cc"], m["psnr"])


@fence("r5q_lidar_eval")
def s2():
    from nerf_lidar_tpu import cli
    cli.main(["lidar_eval", *C])


@fence("r5q_render_lidar_replay")
def s3():
    from nerf_lidar_tpu import cli
    cli.main(["render_lidar", *C, "--mode", "replay", "--num_sweeps", "6"])


@fence("r5q_render_lidar_removal")
def s4():
    from nerf_lidar_tpu import cli
    cli.main(["render_lidar", *C, "--mode", "replay", "--obj_mode",
              "removal", "--num_sweeps", "2"])


@fence("r5q_sweep_bench")
def s5():
    # nuscenes_multi_fast has the identical model subtree to scale_r5q's
    # snapshot (fast_variant of the nuscenes_multi recipe).
    sys.argv = ["sweep_bench.py", "nuscenes_multi_fast", "scale_r5q"]
    import sweep_bench
    sweep_bench.main()


@fence("check_dynamic_sweeps")
def s6():
    import subprocess
    subprocess.run([sys.executable, "exp/check_dynamic_sweeps.py",
                    "exp/scale_r5q"], check=True)


@fence("raydrop_dense_gt")
def s7():
    # Dense-GT pairing (r4c lesson: sparse GT collapses the net to base
    # rate). NEW this round: raydrop_train persists metrics.json and
    # raydrop_drop --features writes iou/precision/recall/range-MAE into
    # the export summary.
    from nerf_lidar_tpu import cli
    sweep_dir = "exp/scale_r5q/lidar_replay"
    feats = "exp/scale_r5q/raydrop_feats_dense.npy"
    if not os.path.exists(feats):
        cli.main(["raydrop_features", "--pair",
                  f"exp/data/nusc_scale_dense:{sweep_dir}", "--out", feats])
    cli.main(["raydrop_train", "--features", feats,
              "--exp_name", "scale_r5q/rd_dense", "--epochs", "60",
              "--batch_size", "2"])
    ck = sorted(f for f in os.listdir("exp/scale_r5q/rd_dense")
                if f.endswith(".ckpt"))[-1]
    cli.main(["raydrop_drop", "--ckpt", f"exp/scale_r5q/rd_dense/{ck}",
              "--simulation_path", sweep_dir,
              "--out", "exp/scale_r5q/kitti_dense", "--place_car",
              "--features", feats])
    from nerf_lidar_tpu.lidar import export as export_lib
    b = export_lib.read_bin("exp/scale_r5q/kitti_dense/velodyne/000000.bin")
    lab = export_lib.read_label(
        "exp/scale_r5q/kitti_dense/labels/000000.label")
    assert b.shape[0] == lab.shape[0] > 0, (b.shape, lab.shape)
    summary = json.load(open("exp/scale_r5q/kitti_dense/summary.json"))
    print("KITTI dense summary:", json.dumps(summary), flush=True)
    for k in ("iou", "precision", "recall", "points_per_sweep"):
        assert k in summary, summary


@fence("driver_entry_check")
def s8():
    import importlib.util as u
    spec = u.spec_from_file_location("ge", "/root/repo/__graft_entry__.py")
    m = u.module_from_spec(spec)
    spec.loader.exec_module(m)
    import jax
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    print("entry() output leaf:", leaf.shape, float(leaf.sum()), flush=True)


if __name__ == "__main__":
    table = {f"s{i}": s for i, s in
             enumerate((s1, s2, s3, s4, s5, s6, s7, s8), 1)}
    stages = sys.argv[1:] or list(table)
    for name in stages:  # argv order = execution order (tight chip windows)
        table[name]()
    print("==== SESSION DONE ====", flush=True)
