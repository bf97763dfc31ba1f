"""VGG19-slice perceptual loss for range images.

Architecture-faithful port of the reference's VGG19 relu1_1..relu4_1 feature
pyramid (NeRF_Lidar_code/src/model/VGG.py:7-70), as a flax module over NHWC.
Weights: the reference pulls torchvision's ImageNet-pretrained VGG19; in the
zero-egress TPU environment we (a) accept a converted weight file when
available (`load_torch_vgg19_npz`), and (b) default to fixed random filters
— random multi-scale convolutional features are a known-good perceptual
metric for low-level structure, and the loss interface is identical.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG19 feature config up to relu4_1: (out_channels, pool_before) per conv.
_SLICES = [
    [(64, False)],                         # slice1: conv1_1 -> relu1_1
    [(64, False), (128, True)],            # slice2: conv1_2, pool, conv2_1
    [(128, False), (256, True)],           # slice3: conv2_2, pool, conv3_1
    [(256, False), (256, False), (256, False), (512, True)],  # slice4
]
_WEIGHTS = [1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]


class Vgg19Features(nn.Module):
    """Returns the 4 feature maps [relu1_1, relu2_1, relu3_1, relu4_1]."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        outs = []
        for si, convs in enumerate(_SLICES):
            for ci, (ch, pool_before) in enumerate(convs):
                if pool_before:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"s{si}_c{ci}")(x)
                x = nn.relu(x)
            outs.append(x)
        return outs


def init_vgg(key: jax.Array, h: int = 32, w: int = 1024):
    model = Vgg19Features()
    params = model.init(key, jnp.zeros((1, h, w, 3)))
    return model, params


def load_torch_vgg19_npz(path: str):
    """Load converted torchvision VGG19 weights from an .npz of
    {features.<idx>.weight/bias} arrays (OIHW). Returns a flax params tree
    for Vgg19Features."""
    raw = np.load(path)
    # torchvision feature indices of the convs we use, in order.
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16]
    names = []
    for si, convs in enumerate(_SLICES):
        for ci, _ in enumerate(convs):
            names.append(f"s{si}_c{ci}")
    params = {}
    for name, idx in zip(names, conv_idx):
        w = raw[f"features.{idx}.weight"]  # [O, I, kh, kw]
        b = raw[f"features.{idx}.bias"]
        params[name] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "bias": jnp.asarray(b)}
    return {"params": params}


def vgg_loss_map(model: Vgg19Features, vgg_params, x: jax.Array,
                 y: jax.Array) -> jax.Array:
    """Per-pixel multi-scale L1 feature distance (VGG.py:16-38).

    x, y: [N, H, W] single-channel range images (broadcast to 3ch).
    Returns [N, H, W] loss map; y's features are stop-gradient'ed.
    """
    n, h, w = x.shape
    x3 = jnp.broadcast_to(x[..., None], (n, h, w, 3))
    y3 = jnp.broadcast_to(y[..., None], (n, h, w, 3))
    fx = model.apply(vgg_params, x3)
    fy = model.apply(vgg_params, y3)
    loss = jnp.zeros((n, h, w))
    for i in range(len(fx) - 1):
        a, b = fx[i], jax.lax.stop_gradient(fy[i])
        if i > 0:
            a = jax.image.resize(a, (n, h, w, a.shape[-1]), "bilinear")
            b = jax.image.resize(b, (n, h, w, b.shape[-1]), "bilinear")
        loss = loss + _WEIGHTS[i] * jnp.abs(a - b).mean(-1)
    return loss
