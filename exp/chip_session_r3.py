"""Round-3 post-training chip session, batched into ONE process (the
per-process first-fetch warmup is 80-420 s; see .claude/skills/verify).

Run SOLO after the scale_mxu 25k run exits:
    timeout 10800 python exp/chip_session_r3.py > exp/chip_session_r3.log 2>&1

Order:
  1. scale_mxu endpoint artifacts: eval table, lidar_eval, replay sweeps
     with the dynamic vehicle, removal-mode sweeps (VERDICT item 3).
  2. step_ablation: step-time decomposition incl. prop-budget variants.
  3. field_shootout: quality check of the prop/freq screening variants.
  4. sweep_bench: fused-kernel sweep render (new channel-major layout).
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


C = ["--config_json", "exp/scale_mxu/config.json"]


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
    cli.main(["render_lidar", *C, "--mode", "replay", "--num_sweeps", "4"])


@fence("render_lidar_removal")
def s4():
    from nerf_lidar_tpu import cli
    # Fresh dir: replay above wrote more sweeps into lidar_replay; the
    # removal render writes lidar_replay_removal (obj_mode suffix).
    cli.main(["render_lidar", *C, "--mode", "replay", "--obj_mode",
              "removal", "--num_sweeps", "2"])


@fence("step_ablation")
def s5():
    sys.argv = ["step_ablation.py"]  # all variants
    import step_ablation
    step_ablation.main()


@fence("field_shootout")
def s6():
    sys.argv = ["field_shootout.py", "mxu_prop1_64", "mxu_prop1_96",
                "mxu_prop_3232", "mxu_f512", "mxu_f512_p3232",
                "mxu_speed", "mxu_speed96"]
    import field_shootout
    field_shootout.main()


@fence("sweep_bench")
def s7():
    # sweep_bench reads CONFIG/EXP from sys.argv at import time.
    sys.argv = ["sweep_bench.py", "nuscenes_single_mxu", "scale_mxu"]
    import sweep_bench
    sweep_bench.main()


@fence("bf16_shootout")
def s7b():
    sys.argv = ["bf16_shootout.py"]
    import bf16_shootout
    bf16_shootout.main()


@fence("check_dynamic_sweeps")
def s8():
    # CPU-only artifact validation: vehicles present in replay sweeps,
    # absent in removal-mode sweeps (exp/check_dynamic_sweeps.py).
    import subprocess
    subprocess.run([sys.executable, "exp/check_dynamic_sweeps.py",
                    "exp/scale_mxu"], check=True)


if __name__ == "__main__":
    for s in (s1, s2, s3, s4, s5, s6, s7, s7b, s8):
        s()
    print("CHIP SESSION DONE", flush=True)
