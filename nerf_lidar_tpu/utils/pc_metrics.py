"""Point-cloud and semantic-segmentation metrics.

- per-class IoU / mIoU for LiDAR semantics (the reference defers to an
  external `miou_cal.eval_miou` module that is not in its repo,
  internal/lidar_utils.py:954-959 — re-implemented here from the standard
  confusion-matrix definition);
- Chamfer distance between point clouds (the BASELINE.md parity metric),
  computed in blocks on device so 35k-point sweeps fit comfortably.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: np.ndarray, gt: np.ndarray, num_classes: int,
                     ignore_label: int = 255) -> np.ndarray:
    valid = gt != ignore_label
    pred = pred[valid].astype(np.int64)
    gt = gt[valid].astype(np.int64)
    idx = gt * num_classes + pred
    cm = np.bincount(idx, minlength=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def iou_from_confusion(cm: np.ndarray) -> Tuple[np.ndarray, float]:
    """Per-class IoU (NaN for absent classes) and mIoU over present ones."""
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = tp + fp + fn
    iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
    miou = float(np.nanmean(iou)) if np.isfinite(iou).any() else float("nan")
    return iou, miou


def eval_miou(pred: np.ndarray, gt: np.ndarray, num_classes: int = 19,
              ignore_label: int = 255,
              class_names: Optional[list] = None) -> Dict:
    cm = confusion_matrix(pred, gt, num_classes, ignore_label)
    iou, miou = iou_from_confusion(cm)
    out = {"miou": miou}
    for i, v in enumerate(iou):
        name = class_names[i] if class_names else f"class_{i}"
        if np.isfinite(v):
            out[f"iou_{name}"] = float(v)
    return out


def _min_dists_sq(a: jax.Array, b: jax.Array, block: int = 4096) -> jax.Array:
    """Min squared distance from each point of a [N,3] to the set b [M,3]."""
    def body(i, acc):
        blk = jax.lax.dynamic_slice_in_dim(a_pad, i * block, block)
        d = ((blk[:, None, :] - b[None, :, :]) ** 2).sum(-1)  # [block, M]
        return acc.at[i].set(d.min(axis=1))

    n = a.shape[0]
    n_blocks = -(-n // block)
    a_pad = jnp.concatenate(
        [a, jnp.broadcast_to(a[-1:], (n_blocks * block - n, 3))], axis=0)
    acc = jnp.zeros((n_blocks, block), a.dtype)
    acc = jax.lax.fori_loop(0, n_blocks, body, acc)
    return acc.reshape(-1)[:n]


@jax.jit
def _chamfer_jit(a: jax.Array, b: jax.Array):
    d_ab = _min_dists_sq(a, b)
    d_ba = _min_dists_sq(b, a)
    return jnp.sqrt(d_ab).mean(), jnp.sqrt(d_ba).mean()


def chamfer_distance(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    """Symmetric Chamfer (mean nearest-neighbor distance each way)."""
    a = jnp.asarray(np.asarray(a, np.float32))
    b = jnp.asarray(np.asarray(b, np.float32))
    d_ab, d_ba = _chamfer_jit(a, b)
    d_ab, d_ba = float(d_ab), float(d_ba)
    return {"chamfer": 0.5 * (d_ab + d_ba), "chamfer_a_to_b": d_ab,
            "chamfer_b_to_a": d_ba}
