"""SemanticKITTI-format export: velodyne/######.bin + labels/######.label.

Rewrite of the writer in drop_simulation_rays.py:14-22,312-332: .bin holds
[x, y, z, intensity] float32 rows (KITTI convention), .label uint32 class
ids. Plus sensor metadata (lidar2egos / ego2globals) alongside.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def write_bin_label(out_dir: str, index: int, points: np.ndarray,
                    labels: Optional[np.ndarray] = None,
                    intensity: Optional[np.ndarray] = None) -> str:
    """points: [N, 3] sensor-frame; labels: [N] ints; intensity: [N]."""
    vel_dir = os.path.join(out_dir, "velodyne")
    os.makedirs(vel_dir, exist_ok=True)
    n = points.shape[0]
    if intensity is None:
        intensity = np.zeros(n, np.float32)
    arr = np.concatenate([points.astype(np.float32),
                          intensity.reshape(-1, 1).astype(np.float32)],
                         axis=1)
    bin_path = os.path.join(vel_dir, f"{index:06d}.bin")
    arr.astype(np.float32).tofile(bin_path)
    if labels is not None:
        lab_dir = os.path.join(out_dir, "labels")
        os.makedirs(lab_dir, exist_ok=True)
        labels.astype(np.uint32).tofile(
            os.path.join(lab_dir, f"{index:06d}.label"))
    return bin_path


def read_bin(path: str, dims: int = 4) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32).reshape(-1, dims)


def read_label(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.uint32)


def write_sensor_metadata(out_dir: str, lidar2egos: np.ndarray,
                          ego2globals: np.ndarray) -> None:
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "lidar2egos.npy"), lidar2egos)
    np.save(os.path.join(out_dir, "ego2globals.npy"), ego2globals)
