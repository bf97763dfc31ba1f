"""Regenerate the at-scale synthetic nuScenes-layout datasets.

exp/ data does NOT survive container swaps between rounds (only small
scripts/JSONs are git-tracked), but the writer is deterministic in its
seed, so the scenes that every BASELINE.md table was measured on can be
reproduced bit-identically:

  exp/data/nusc_scale        16 frames x 6 cams, 450x800, 14-sphere
                             corridor + 1 dynamic vehicle, 32-beam LiDAR
                             at 256 GT points/beam (the training scene
                             for scale_fast/scale_mxu/scale_speed/
                             scale_parity).
  exp/data/nusc_scale_dense  identical geometry/poses/images, 1100 GT
                             points/beam — the dense-GT twin used for
                             ray-drop training (sparse GT collapses the
                             drop net to base rate; see
                             exp/chip_session_r4b.py).

CPU-only (numpy oracle tracing); ~10-20 min for both on the 1-CPU VM.
Usage: python exp/gen_scale_data.py [--only nusc_scale|nusc_scale_dense]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from nerf_lidar_tpu.data import synth_nusc  # noqa: E402

SCENES = {
    "nusc_scale": dict(num_frames=16, sensor_num=6, height=450, width=800,
                       seed=0, lidar_points_per_beam=256,
                       write_normals=True),
    "nusc_scale_dense": dict(num_frames=16, sensor_num=6, height=450,
                             width=800, seed=0,
                             lidar_points_per_beam=1100,
                             write_normals=False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, choices=sorted(SCENES))
    args = ap.parse_args()
    for name, kw in SCENES.items():
        if args.only and name != args.only:
            continue
        root = os.path.join("exp/data", name)
        if os.path.exists(os.path.join(root, "poses_bounds.npy")):
            print(f"{name}: already present at {root}, skipping")
            continue
        t0 = time.time()
        synth_nusc.write_scene_dir(root, **kw)
        print(f"{name}: written to {root} in {time.time() - t0:.0f} s")


if __name__ == "__main__":
    main()
