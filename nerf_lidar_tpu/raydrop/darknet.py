"""Darknet-53 (rangenet) multi-scale feature loss for range images.

TPU-native rebuild of NeRF_Lidar_code/src/model/darknet.py:10-244 +
FeatureLoss (:205-244), flag-gated in the ray-drop trainer exactly like the
reference's `feature_loss` knob (ray_drop_train.py:116-122). Differences
from the reference that are deliberate TPU choices:

- NHWC layout (TPU conv layout) instead of NCHW;
- downsampling strides act only on the azimuth (width) axis — same as the
  reference's `stride=[1, s]` trick that keeps the 32-beam height — so all
  six feature maps stay MXU-friendly [N, 32, W/2^k, C];
- BatchNorm runs with frozen (init or converted) running stats: the loss
  network is never trained here, only evaluated.

The reference loads rangenet weights from a hard-coded local path that is
not in its repo; we accept a converted .npz (`load_torch_darknet_npz`) and
otherwise run with fixed random filters (same policy as raydrop/vgg.py —
random multi-scale conv features are a usable perceptual metric, and the
plumbing/ablation interface is identical once real weights exist).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..lidar import range_image as ri

# Residual-block counts per encoder stage (darknet.py:40-43, layers=53).
_BLOCKS_53 = (1, 2, 8, 8, 4)
_STAGE_CH = ((32, 64), (64, 128), (128, 256), (256, 512), (512, 1024))
# Multi-scale MSE weights (darknet.py:225-226: [1/16,1/16,1/8,1/4,1/2,1]/2).
_WEIGHTS = (1 / 32, 1 / 32, 1 / 16, 1 / 8, 1 / 4, 1 / 2)
# SemanticKITTI HDL-64 sensor stats [range, x, y, z]
# (darknet53-1024px_noremission.yaml img_means/img_stds).
_MEANS = np.array([12.12, 10.88, 0.23, -1.04], np.float32)
_STDS = np.array([12.32, 11.47, 6.91, 0.86], np.float32)


class _Residual(nn.Module):
    """1x1-reduce + 3x3 residual block (darknet.py BasicBlock)."""
    planes: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        r = x
        x = nn.Conv(self.planes[0], (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(self.planes[1], (3, 3), padding="SAME",
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.leaky_relu(x, 0.1)
        return x + r


class DarknetBackbone(nn.Module):
    """Darknet-53 encoder returning the 6-level feature pyramid
    (darknet.py:158-196 forward with return_features=True)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        x = nn.Conv(32, (3, 3), padding="SAME", use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.leaky_relu(x, 0.1)
        feats.append(x)
        for si, (planes, blocks) in enumerate(zip(_STAGE_CH, _BLOCKS_53)):
            # Width-only downsample (reference stride=[1, 2]).
            x = nn.Conv(planes[1], (3, 3), strides=(1, 2), padding="SAME",
                        use_bias=False, name=f"enc{si}_down")(x)
            x = nn.BatchNorm(use_running_average=True,
                             name=f"enc{si}_bn")(x)
            x = nn.leaky_relu(x, 0.1)
            for bi in range(blocks):
                x = _Residual(planes, name=f"enc{si}_res{bi}")(x)
            feats.append(x)
        return feats


def init_darknet(key: jax.Array, h: int = 32, w: int = 1024):
    model = DarknetBackbone()
    params = model.init(key, jnp.zeros((1, h, w, 4)))
    return model, params


def load_torch_darknet_npz(path: str):
    """Convert a rangenet darknet-53 backbone state_dict saved as .npz
    (torch names, OIHW conv kernels) into the flax params/batch_stats tree.

    Expected torch names: conv1/bn1 and enc{1..5}.{conv,bn} +
    enc{k}.residual_{i}.{conv1,bn1,conv2,bn2} (darknet.py:106-149)."""
    raw = np.load(path)

    def conv(name):
        return {"kernel": jnp.asarray(
            raw[f"{name}.weight"].transpose(2, 3, 1, 0))}

    def bn(name):
        return ({"scale": jnp.asarray(raw[f"{name}.weight"]),
                 "bias": jnp.asarray(raw[f"{name}.bias"])},
                {"mean": jnp.asarray(raw[f"{name}.running_mean"]),
                 "var": jnp.asarray(raw[f"{name}.running_var"])})

    params, stats = {}, {}
    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = bn("bn1")
    for si in range(5):
        t = f"enc{si + 1}"
        params[f"enc{si}_down"] = conv(f"{t}.conv")
        params[f"enc{si}_bn"], stats[f"enc{si}_bn"] = bn(f"{t}.bn")
        for bi in range(_BLOCKS_53[si]):
            r = f"{t}.residual_{bi}"
            sub_p, sub_s = {}, {}
            for j, flax_name in ((1, "Conv_0"), (2, "Conv_1")):
                sub_p[flax_name] = conv(f"{r}.conv{j}")
            for j, flax_name in ((1, "BatchNorm_0"), (2, "BatchNorm_1")):
                sub_p[flax_name], sub_s[flax_name] = bn(f"{r}.bn{j}")
            params[f"enc{si}_res{bi}"] = sub_p
            stats[f"enc{si}_res{bi}"] = sub_s
    return {"params": params, "batch_stats": stats}


def _pixel_dirs(h: int, w: int) -> np.ndarray:
    """Unit ray direction at every range-image pixel center — the inverse
    of lidar/range_image.py:70-77's (yaw, pitch) projection."""
    px = (np.arange(w, dtype=np.float32) + 0.5) / w
    py = (np.arange(h, dtype=np.float32) + 0.5) / h
    yaw = -(2.0 * px - 1.0) * np.pi  # [W]
    fov_up = ri.FOV_UP_DEG / 180.0 * np.pi
    fov_down = ri.FOV_DOWN_DEG / 180.0 * np.pi
    fov = abs(fov_down) + abs(fov_up)
    pitch = (1.0 - py) * fov - abs(fov_down)  # [H]
    cp = np.cos(pitch)[:, None]
    return np.stack([cp * np.cos(yaw)[None],
                     cp * np.sin(yaw)[None],
                     np.broadcast_to(np.sin(pitch)[:, None], (h, w))],
                    axis=-1).astype(np.float32)


def feature_loss(model: DarknetBackbone, dk_params, sim_range: jax.Array,
                 gt_range: jax.Array, mask: jax.Array) -> jax.Array:
    """Multi-scale darknet feature MSE (darknet.py FeatureLoss.forward).

    sim_range/gt_range: [N, H, W] log2-normalized ranges; mask: [N, H, W]
    keep-probability applied to the sim input (the Gumbel-hard mask in the
    trainer). xyz channels are reconstructed from the metric range on the
    pixel-center ray grid; gt features are stop-gradient'ed.
    """
    n, h, w = sim_range.shape
    dirs = jnp.asarray(_pixel_dirs(h, w))  # [H, W, 3]

    def stack(r_norm):
        r_metric = jnp.exp2(r_norm * ri.RANGE_LOG_NORM) - 1.0
        xyz = r_metric[..., None] * dirs[None]
        return jnp.concatenate([r_norm[..., None], xyz], axis=-1)

    x = stack(sim_range) * mask[..., None]
    y = stack(gt_range)
    x = (x - _MEANS) / _STDS
    y = (y - _MEANS) / _STDS
    fx = model.apply(dk_params, x)
    fy = model.apply(dk_params, y)
    loss = 0.0
    for wgt, a, b in zip(_WEIGHTS, fx, fy):
        loss = loss + wgt * ((a - jax.lax.stop_gradient(b)) ** 2).mean()
    return loss
