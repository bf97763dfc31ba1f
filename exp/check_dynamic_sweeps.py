"""Validate dynamic vehicles in rendered LiDAR sweeps at scale.

VERDICT round-2 item 1's done-criterion, applied to the 25k scale_fast
endpoint artifacts: for each replay sweep, count rendered points inside
every valid object bbox interpolated at that sweep's timestamp (scene
frame, reference obj_utils.py:431-473 2-NN interpolation); assert the
replay sweeps contain in-box points that FOLLOW the moving box, and the
removal-mode sweeps do not.

CPU-only (numpy + the scene loader); safe to run next to a chip session.

Usage: python exp/check_dynamic_sweeps.py [exp/scale_fast]
"""
import json
import os
import sys

import numpy as np

CAR_CLASS = 13

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")  # env var is hijacked on axon

from nerf_lidar_tpu import cli, configs  # noqa: E402


def interp_pose(t, tracks):
    """numpy 2-NN interpolation of [N,T,F] tracks at scalar time t."""
    ttimes = tracks[:, :, -2]  # [N, T]
    order = np.argsort(np.abs(ttimes - t), axis=-1)[:, :2]  # [N, 2]
    take = lambda i: np.take_along_axis(
        tracks, order[:, i][:, None, None].repeat(tracks.shape[-1], -1),
        axis=1)[:, 0]
    info1, info2 = take(0), take(1)
    t1, t2 = info1[:, -2], info2[:, -2]
    w1 = np.clip(np.abs(t - t2) / (np.abs(t1 - t2) + 1e-9), 0, 1)
    return w1[:, None] * info1 + (1 - w1)[:, None] * info2


def in_box_counts(pts_scene, pose, pad=1.15):
    """Fraction of points inside each box (slightly inflated)."""
    out = []
    for row in pose:
        c, th, wlh = row[:3], row[3], row[4:7]
        if np.any(wlh <= 0):
            out.append(0)
            continue
        p = pts_scene - c
        ca, sa = np.cos(-th), np.sin(-th)
        q = np.stack([ca * p[:, 0] - sa * p[:, 1],
                      sa * p[:, 0] + ca * p[:, 1], p[:, 2]], -1)
        out.append(int(np.sum(np.all(np.abs(q) < pad * wlh / 2, -1))))
    return out


def sweep_stats(exp, sub, scene, ts):
    d = os.path.join(exp, sub)
    files = sorted(f for f in os.listdir(d)
                   if f.startswith("points_") and f.endswith(".npy")
                   and "semantic" not in f and "rgb" not in f)
    tracks = np.asarray(scene.tracks)
    rows = []
    for i, f in enumerate(files):
        pts = np.load(os.path.join(d, f))
        pts_scene = scene.frame.world_to_scene_points(pts)
        t = float(ts[i]) if ts is not None and i < len(ts) else float(i)
        pose = interp_pose(t, tracks)
        counts = in_box_counts(pts_scene, pose)
        # Car-class points inside the union of boxes: the static field's
        # unconstrained density where the car drove (moving-masked pixels
        # never supervise it) can leave non-car floaters in the box volume
        # in removal mode, so the class label is the discriminative signal.
        sem_path = os.path.join(d, f.replace("points_", "points_semantic_"))
        car_in_box = None
        if os.path.exists(sem_path):
            cls = np.load(sem_path).argmax(-1)
            union = np.zeros(len(pts_scene), bool)
            for row in pose:
                c, th, wlh = row[:3], row[3], row[4:7]
                if np.any(wlh <= 0):
                    continue
                p = pts_scene - c
                ca, sa = np.cos(-th), np.sin(-th)
                q = np.stack([ca * p[:, 0] - sa * p[:, 1],
                              sa * p[:, 0] + ca * p[:, 1], p[:, 2]], -1)
                union |= np.all(np.abs(q) < 1.15 * wlh / 2, -1)
            car_in_box = int(np.sum(union & (cls == CAR_CLASS)))
        rows.append({"sweep": i, "t": round(t, 4), "in_box": counts,
                     "car_in_box": car_in_box,
                     "centers": [[float(v) for v in np.round(r[:3], 2)]
                                 for r in pose]})
    return rows


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "exp/scale_fast"
    cfg = configs.Config.from_dict(
        json.load(open(os.path.join(exp, "config.json"))))
    scene = cli.load_scene_for(cfg, "lidar")
    ts = (scene.lidar or {}).get("sweep_timestamps")
    report = {}
    for sub in ("lidar_replay", "lidar_replay_removal"):
        if os.path.isdir(os.path.join(exp, sub)):
            report[sub] = sweep_stats(exp, sub, scene, ts)
    print(json.dumps(report, indent=1))

    rep = report.get("lidar_replay")
    if rep:
        per_sweep = [max(r["in_box"]) for r in rep]
        assert all(c > 50 for c in per_sweep), \
            f"replay sweeps missing vehicle points: {per_sweep}"
        print(f"OK replay: per-sweep max in-box points {per_sweep}")
    rem = report.get("lidar_replay_removal")
    if rep and rem and rep[0]["car_in_box"] is not None:
        # Car-CLASS points in the box volume: present while replaying,
        # gone when the track is removed (static-field floaters in the
        # unsupervised moving-object region keep other classes).
        rep_car = np.mean([r["car_in_box"] for r in rep[: len(rem)]])
        rem_car = np.mean([r["car_in_box"] for r in rem])
        assert rep_car > 50, f"replay car-class points missing: {rep_car}"
        assert rem_car < 0.2 * rep_car, (rep_car, rem_car)
        print(f"OK removal: car-in-box {rem_car:.0f} vs replay "
              f"{rep_car:.0f}")


if __name__ == "__main__":
    main()
