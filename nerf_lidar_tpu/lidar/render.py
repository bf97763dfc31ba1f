"""LiDAR sweep rendering: the product-defining path.

Analog of reference render_lidar.py:42-165: renders each 32x1100-ray sweep
through the trained field and exports the `points_####.npy` trio (world
points unscaled, 19-class semantic probability vectors, RGB). The chunked
renderer reuses the shared ChunkRenderer (same pad/shard machinery as image
rendering).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..renderer import ChunkRenderer
from .sensor import Sweep
from .transforms import SceneFrame


def render_sweep(renderer: ChunkRenderer, params, sweep: Sweep,
                 near: float, far: float, frame: SceneFrame,
                 tracks=None, track_mask=None) -> Dict[str, np.ndarray]:
    """Render one sweep. Returns dict with:
      points: [N, 3] world-frame hit points (scene depth back-projected and
        unscaled, render_lidar.py:142-156),
      depth: [N] scene-frame expected termination distance,
      semantic: [N, K] class probabilities (if the model has the head),
      rgb: [N, 3], intensity: [N] (if enabled), acc: [N].
    """
    rays = sweep.ray_batch(near, far)
    out = renderer.render(params, rays, tracks, track_mask)
    depth = out["depth"]
    pts_scene = sweep.origins + depth[:, None] * sweep.directions
    pts_world = frame.scene_to_world_points(pts_scene)
    result = dict(points=pts_world.astype(np.float32),
                  depth=depth.astype(np.float32),
                  rgb=out["rgb"].astype(np.float32))
    if "semantic" in out:
        result["semantic"] = out["semantic"].astype(np.float32)
    if "intensity" in out:
        result["intensity"] = out["intensity"].astype(np.float32)
    if "acc" in out:
        result["acc"] = out["acc"].astype(np.float32)
    return result


def render_sweeps_to_dir(renderer: ChunkRenderer, params,
                         sweeps: List[Sweep], near: float, far: float,
                         frame: SceneFrame, out_dir: str,
                         tracks=None, track_mask=None) -> List[str]:
    """Render sweeps and persist the reference's on-disk interface:
    points_####.npy / points_semantic_####.npy / points_rgb_####.npy
    (render_lidar.py:157-165). Returns written point-file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for idx, sweep in enumerate(sweeps):
        out = render_sweep(renderer, params, sweep, near, far, frame,
                           tracks, track_mask)
        p = os.path.join(out_dir, f"points_{idx:04d}.npy")
        np.save(p, out["points"])
        if "semantic" in out:
            np.save(os.path.join(out_dir, f"points_semantic_{idx:04d}.npy"),
                    out["semantic"])
        np.save(os.path.join(out_dir, f"points_rgb_{idx:04d}.npy"),
                out["rgb"])
        paths.append(p)
    return paths
