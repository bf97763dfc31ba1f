"""Visualization suite (reference internal/vis.py rewrite, numpy+matplotlib).

Colormapped depth, accumulation mattes, the 19-class semantic color map
(vis.py:156-161), normal shading, and `visualize_suite` panels for eval-time
rendering dumps.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

NUM_CLASSES = 19


def def_color_map(num_class: int = NUM_CLASSES) -> np.ndarray:
    """Deterministic distinct colors: i * (256^3 // K) split into RGB bytes
    (reference vis.py:157-161)."""
    s = 256**3 // num_class
    return np.array([[(i * s) // (256**2), ((i * s) // 256) % 256,
                      (i * s) % 256] for i in range(num_class)])


COLOR_MAP = def_color_map()


def _turbo(x: np.ndarray) -> np.ndarray:
    """Turbo colormap via matplotlib (available in this env)."""
    from matplotlib import cm
    return np.asarray(cm.get_cmap("turbo")(np.clip(x, 0, 1)))[..., :3]


def visualize_depth(depth: np.ndarray, near: Optional[float] = None,
                    far: Optional[float] = None) -> np.ndarray:
    """Log-curved turbo depth visualization -> uint8-range float [H, W, 3]
    (reference vis.py:163-177)."""
    eps = np.finfo(np.float32).eps
    curve = lambda x: -np.log(np.asarray(x, np.float64) + eps)
    near = (near if near is not None else float(depth.min())) - eps
    far = (far if far is not None else float(depth.max())) + eps
    cn, cf, cd = curve(near), curve(far), curve(depth)
    norm = np.nan_to_num(
        np.clip((cd - min(cn, cf)) / abs(cf - cn), 0, 1))
    return np.clip(np.nan_to_num(_turbo(norm)), 0.0, 1.0) * 255


def visualize_semantic(labels_or_probs: np.ndarray) -> np.ndarray:
    """Class labels or probability vectors -> RGB [H, W, 3] in [0, 1]."""
    labels = (labels_or_probs.argmax(-1)
              if labels_or_probs.ndim == 3 else labels_or_probs)
    labels = np.clip(labels, 0, NUM_CLASSES - 1).astype(int)
    return COLOR_MAP[labels] / 255.0


def visualize_normals(normals: np.ndarray,
                      acc: Optional[np.ndarray] = None) -> np.ndarray:
    """[-1,1] normals -> [0,1] RGB, matte by accumulation."""
    vis = (normals + 1.0) / 2.0
    if acc is not None:
        vis = vis * acc[..., None] + (1 - acc[..., None])
    return np.clip(vis, 0, 1)


def visualize_suite(rendering: Dict[str, np.ndarray],
                    near: Optional[float] = None,
                    far: Optional[float] = None) -> Dict[str, np.ndarray]:
    """Panels for one rendered view: color/depth/acc/semantic/normals
    (reference vis.py:179-278, trimmed to the panels the eval loop dumps)."""
    out = {"color": np.clip(rendering["rgb"], 0, 1)}
    if "depth" in rendering:
        out["depth"] = visualize_depth(rendering["depth"], near, far) / 255.0
    if "acc" in rendering:
        out["acc"] = np.clip(rendering["acc"], 0, 1)[..., None].repeat(3, -1)
    if "semantic" in rendering:
        out["semantic"] = visualize_semantic(rendering["semantic"])
    if "normals" in rendering:
        out["normals"] = visualize_normals(rendering["normals"],
                                           rendering.get("acc"))
    return out


def save_panels(panels: Dict[str, np.ndarray], out_dir: str, idx: int):
    import imageio.v2 as imageio
    import os
    os.makedirs(out_dir, exist_ok=True)
    for name, img in panels.items():
        imageio.imwrite(os.path.join(out_dir, f"{name}_{idx:03d}.png"),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
