"""U-Net ray-drop network, flax/NHWC.

Same topology as the reference's classic 4-down/4-up U-Net
(NeRF_Lidar_code/src/unet/unet_model.py:6-47, unet_parts.py:8-77):
DoubleConv(3x3 conv -> BN -> ReLU, twice), max-pool downs, transposed-conv
ups with skip concatenation, 1x1 output head; n_channels=6 -> 2 logits,
optional sigmoid range-regression head. NHWC keeps XLA's TPU conv layouts
happy; BatchNorm uses flax's running-stats pattern (mutable "batch_stats").
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DoubleConv(nn.Module):
    out_ch: int
    mid_ch: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_ch or self.out_ch
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class Down(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_ch)(x, train)


class Up(nn.Module):
    out_ch: int
    bilinear: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        if self.bilinear:
            h, w = x1.shape[1] * 2, x1.shape[2] * 2
            x1 = jax.image.resize(x1, (x1.shape[0], h, w, x1.shape[3]),
                                  "bilinear")
            x1 = DoubleConv(self.out_ch, mid_ch=x1.shape[-1] // 2)(x1, train)
            up = x1
        else:
            up = nn.ConvTranspose(x1.shape[-1] // 2, (2, 2),
                                  strides=(2, 2))(x1)
        # Pad to match the skip connection (odd sizes).
        dh = x2.shape[1] - up.shape[1]
        dw = x2.shape[2] - up.shape[2]
        up = jnp.pad(up, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, up], axis=-1)
        return DoubleConv(self.out_ch)(x, train)


class UNet(nn.Module):
    """in: [N, H, W, n_channels]; out: [N, H, W, n_classes] logits
    (+ optional [N, H, W, 1] sigmoid range)."""
    n_channels: int = 6
    n_classes: int = 2
    bilinear: bool = False
    regression: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64)(x, train)
        x2 = Down(128)(x1, train)
        x3 = Down(256)(x2, train)
        x4 = Down(512)(x3, train)
        x5 = Down(1024 // factor)(x4, train)
        y = Up(512 // factor, self.bilinear)(x5, x4, train)
        y = Up(256 // factor, self.bilinear)(y, x3, train)
        y = Up(128 // factor, self.bilinear)(y, x2, train)
        y = Up(64, self.bilinear)(y, x1, train)
        logits = nn.Conv(self.n_classes, (1, 1))(y)
        if not self.regression:
            return logits
        reg = nn.sigmoid(nn.Conv(1, (1, 1))(y))
        return logits, reg
