"""Chunked full-frame / full-sweep rendering.

TPU-native analog of reference models.py:1379-1507 (`render_image`): rays
are padded to a multiple of (chunk_size x device_count) and streamed through
one jitted chunk program; with a mesh, each chunk is batch-sharded over the
`data` axis and XLA's output sharding does the gather that the reference
implements manually with accelerate.gather (models.py:1425-1457).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)


class ChunkRenderer:
    """Compile-once chunked renderer over ray pytrees."""

    def __init__(self, model, config, chunk_size: int = 16384, mesh=None,
                 compute_extras: bool = False, fused=None):
        self.model = model
        self.config = config
        self.chunk = chunk_size
        self.mesh = mesh
        self.compute_extras = compute_extras
        # Final-level compositing via the Pallas fused kernel
        # (ops/render_pallas.py): saves the [R, S] weights/trans HBM
        # round-trips on the inference hot path. Auto: the config's
        # measured per-preset choice (configs.Config.render_fused),
        # else on for real TPU backends, off elsewhere (the
        # interpret-mode fallback is for correctness tests, not
        # speed). Pass True/False to force.
        if fused is None and jax.default_backend() == "tpu":
            fused = getattr(config, "render_fused", None)
        if fused is None:
            fused = jax.default_backend() == "tpu"
        self.fused = bool(fused) and not compute_extras

        def apply_fn(params, batch, tracks, track_mask):
            renderings, _ = model.apply(
                params, None, batch, train_frac=1.0,
                compute_extras=compute_extras, tracks=tracks,
                track_mask=track_mask, fused_final=self.fused)
            out = renderings[-1]
            keep = {k: v for k, v in out.items()
                    if isinstance(v, jax.Array) and not k.startswith("ray_")}
            return keep

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P("data"))
            self._apply = jax.jit(apply_fn,
                                  in_shardings=(rep, shard, rep, rep),
                                  out_shardings=shard)
        else:
            self._apply = jax.jit(apply_fn)

    def render(self, params, rays: Dict[str, np.ndarray],
               tracks=None, track_mask=None) -> Dict[str, np.ndarray]:
        """rays: dict of [N, ...] numpy arrays (ray fields only)."""
        n = rays["origins"].shape[0]
        n_dev = 1 if self.mesh is None else self.mesh.size
        step = max(self.chunk // n_dev * n_dev, n_dev)
        n_pad = (n + step - 1) // step * step
        rays_p = {k: _pad_to(np.asarray(v), n_pad) for k, v in rays.items()}

        # Dispatch ahead of the fetch: jax dispatch is async, so chunk
        # i+1..i+W's compute overlaps chunk i's host transfer. On the
        # tunneled single-chip backend the fetch is ~25 MB/s —
        # serializing it after each chunk (the round-4 code) added
        # 0.2-0.4 s/sweep of pure transfer wait (exp/sweep_decomp
        # round-5 measurement). A bounded window (not dispatch-ALL)
        # caps on-device output residency at W+1 chunks: a factor-1
        # 1600x900 extras render is ~160 chunks of outputs, which
        # dispatch-all would leave resident in HBM simultaneously.
        window = 8
        outs, pending = [], []
        for i in range(0, n_pad, step):
            chunk = {k: jnp.asarray(v[i:i + step])
                     for k, v in rays_p.items()}
            pending.append(self._apply(params, chunk, tracks, track_mask))
            if len(pending) > window:
                outs.append(jax.device_get(pending.pop(0)))
        outs.extend(jax.device_get(pending))
        merged = {k: np.concatenate([o[k] for o in outs], axis=0)[:n]
                  for k in outs[0]}
        return merged


def render_view(renderer: ChunkRenderer, params, rays_hw: Dict[str, Any],
                tracks=None, track_mask=None) -> Dict[str, np.ndarray]:
    """Render a full [H, W] ray grid; returns [H, W, ...] images."""
    h, w = rays_hw["origins"].shape[:2]
    flat = {k: np.asarray(v).reshape((h * w,) + np.asarray(v).shape[2:])
            for k, v in rays_hw.items()}
    out = renderer.render(params, flat, tracks, track_mask)
    return {k: v.reshape((h, w) + v.shape[1:]) for k, v in out.items()}
