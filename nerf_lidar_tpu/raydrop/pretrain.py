"""Self-supervised pretraining of the VGG feature pyramid on range images.

The reference's perceptual loss uses torchvision's ImageNet-pretrained VGG19
(NeRF_Lidar_code/src/model/VGG.py:7-70). This environment has no network
egress, so ImageNet weights are unobtainable; instead we pretrain the same
Vgg19Features encoder ON RANGE IMAGES with a masked-reconstruction
objective (corrupt → encode → decode → L1 to clean), which yields features
tuned to LiDAR range statistics rather than natural images. The resulting
params drop into the identical loss interface (vgg.vgg_loss_map) and can be
saved/loaded as an .npz next to the torch-converted format.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import vgg as vgg_lib


class _Decoder(nn.Module):
    """Reconstruct the clean range image from the 4-level feature pyramid."""

    @nn.compact
    def __call__(self, feats, h: int, w: int) -> jax.Array:
        ups = []
        for i, f in enumerate(feats):
            n = f.shape[0]
            f = nn.Conv(32, (1, 1), name=f"lat{i}")(f)
            ups.append(jax.image.resize(f, (n, h, w, 32), "bilinear"))
        x = nn.relu(jnp.concatenate(ups, axis=-1))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="mix")(x))
        return nn.Conv(1, (1, 1), name="out")(x)[..., 0]


def _corrupt(key, img: jax.Array, n_holes: int = 6, hole_h: int = 8,
             hole_w: int = 96, noise: float = 0.02) -> jax.Array:
    """Random rectangular dropouts + Gaussian noise on [N, H, W] ranges."""
    n, h, w = img.shape
    kh, kw, kn = jax.random.split(key, 3)
    ys = jax.random.randint(kh, (n, n_holes), 0, max(h - hole_h, 1))
    xs = jax.random.randint(kw, (n, n_holes), 0, max(w - hole_w, 1))
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    in_hole = ((yy >= ys[:, None, None, :]) & (yy < ys[:, None, None, :] + hole_h)
               & (xx >= xs[:, None, None, :]) & (xx < xs[:, None, None, :] + hole_w))
    keep = ~in_hole.any(-1)
    return jnp.where(keep, img + noise * jax.random.normal(kn, img.shape),
                     0.0)


def pretrain_vgg(range_images: np.ndarray, steps: int = 300,
                 batch_size: int = 4, lr: float = 1e-3, seed: int = 0
                 ) -> Tuple[Dict, Dict]:
    """Train Vgg19Features on [N, H, W] normalized range images.

    Returns (vgg_params usable with vgg.vgg_loss_map, history dict).
    """
    imgs = jnp.asarray(range_images, jnp.float32)
    n, h, w = imgs.shape
    enc = vgg_lib.Vgg19Features()
    dec = _Decoder()
    key = jax.random.PRNGKey(seed)
    key, k1, k2 = jax.random.split(key, 3)
    enc_params = enc.init(k1, jnp.zeros((1, h, w, 3)))
    feats0 = enc.apply(enc_params, jnp.zeros((1, h, w, 3)))
    dec_params = dec.init(k2, feats0, h, w)
    params = {"enc": enc_params, "dec": dec_params}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, clean, key):
        x = _corrupt(key, clean)
        x3 = jnp.repeat(x[..., None], 3, axis=-1)
        feats = enc.apply(p["enc"], x3)
        rec = dec.apply(p["dec"], feats, h, w)
        return jnp.abs(rec - clean).mean()

    @jax.jit
    def step(params, opt_state, key):
        key, kb, kc = jax.random.split(key, 3)
        sel = jax.random.randint(kb, (batch_size,), 0, n)
        clean = imgs[sel]
        loss, grads = jax.value_and_grad(loss_fn)(params, clean, kc)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key, loss

    hist = []
    for i in range(steps):
        params, opt_state, key, loss = step(params, opt_state, key)
        if (i + 1) % 50 == 0 or i == 0:
            hist.append((i + 1, float(loss)))
    return params["enc"], {"loss": hist}


def save_vgg_npz(path: str, vgg_params) -> None:
    """Save Vgg19Features params as a flat flax-layout .npz."""
    flat = {}
    for name, leaf in vgg_params["params"].items():
        flat[f"{name}.kernel"] = np.asarray(leaf["kernel"])
        flat[f"{name}.bias"] = np.asarray(leaf["bias"])
    np.savez(path, **flat)


def load_vgg_npz(path: str):
    """Load Vgg19Features params saved by save_vgg_npz."""
    raw = np.load(path)
    params = {}
    for k in raw.files:
        name, _, kind = k.rpartition(".")
        params.setdefault(name, {})[kind] = jnp.asarray(raw[k])
    return {"params": params}
