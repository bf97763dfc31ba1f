"""Learnable pose and track refinement.

JAX rewrite of reference internal/posenet_v2.py: `LearnPose` holds per-image
(+ per-LiDAR) so(3) axis-angle + translation deltas applied to ray origins /
directions / pixel bases inside the step-gated refinement window
(train.py:199-243); `TrackOpt` holds per-(object, timestamp) yaw and
translation deltas added to the raw track tensor (train.py:244-268).

Both are flax modules over zero-initialized parameter pytrees; the window
gating and their separate LR schedules live in train/train_step.py as masked
optax transforms (the TPU-native fold of the reference's three optimizers).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def vec2skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrices."""
    zero = jnp.zeros_like(v[..., :1])
    r0 = jnp.concatenate([zero, -v[..., 2:3], v[..., 1:2]], axis=-1)
    r1 = jnp.concatenate([v[..., 2:3], zero, -v[..., 0:1]], axis=-1)
    r2 = jnp.concatenate([-v[..., 1:2], v[..., 0:1], zero], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def so3_exp(r: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3] (Rodrigues).

    Uses sqrt(|r|^2 + eps) rather than jnp.linalg.norm: the norm's gradient
    at r = 0 is NaN in JAX (torch defines it as 0), and pose deltas are
    zero-initialized — a hard norm would freeze rotation learning forever
    (the NaN scrub would zero the gradient every step)."""
    skew = vec2skew(r)
    norm = jnp.sqrt(jnp.sum(r**2, axis=-1) + 1e-15)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), skew.shape)
    return (eye + (jnp.sin(norm) / norm) * skew
            + ((1 - jnp.cos(norm)) / norm**2) * (skew @ skew))


class LearnPose(nn.Module):
    """Per-camera-image (+ per-LiDAR-frame) learnable pose deltas.

    learn_R/learn_t (reference configs.py:160-161, posenet_v2.py) gate
    whether the rotation/translation deltas take effect — a disabled
    component is pinned to identity/zero via stop_gradient-free masking
    (the params exist either way, so checkpoints stay
    structure-compatible across settings)."""
    num_cams: int
    num_lidars: int = 0
    t_ratio: float = 0.25  # damping on translation (configs.py:152)
    learn_R: bool = True
    learn_t: bool = True

    def setup(self):
        n = self.num_cams + self.num_lidars
        self.r = self.param("r", nn.initializers.zeros, (n, 3))
        self.t = self.param("t", nn.initializers.zeros, (n, 3))

    def __call__(self, cam_id: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """cam_id: [N] int. Returns (R [N, 3, 3], t [N, 3])."""
        r = self.r[cam_id] if self.learn_R else \
            jnp.zeros_like(self.r[cam_id])
        t = (self.t[cam_id] * self.t_ratio if self.learn_t
             else jnp.zeros_like(self.t[cam_id]))
        return so3_exp(r), t


def apply_pose_refinement(R: jax.Array, t: jax.Array,
                          batch: Dict[str, jax.Array]
                          ) -> Dict[str, jax.Array]:
    """Rotate/translate a ray batch by per-ray deltas (train.py:199-243).

    R: [N, 3, 3], t: [N, 3]. origins += t; direction-like fields are
    row-rotated (v' = sum_j v_j R[:, j, :], the reference's
    `(v.reshape(-1,1,3) * R).sum(-1)` at train.py:218-219).
    """
    out = dict(batch)
    out["origins"] = batch["origins"] + t
    for key in ("directions", "viewdirs", "base_x", "base_y"):
        if key in batch:
            out[key] = jnp.einsum("ni,nij->nj", batch[key], R)
    if "normals" in batch:
        out["normals"] = jnp.einsum("ni,nij->nj", batch["normals"], R)
    return out


class TrackOpt(nn.Module):
    """Learnable per-(object, timestamp) yaw + translation deltas."""
    num_objects: int
    num_timestamps: int

    def setup(self):
        self.opt_r = self.param("opt_r", nn.initializers.zeros,
                                (self.num_objects, self.num_timestamps, 1))
        self.opt_t = self.param("opt_t", nn.initializers.zeros,
                                (self.num_objects, self.num_timestamps, 3))

    def __call__(self, raw_tracks: jax.Array) -> jax.Array:
        """raw_tracks: [N_obj, T, F] (layout of models/objects.py). Returns
        refined tracks: center += opt_t, theta_z += opt_r
        (train.py:251-256)."""
        track = raw_tracks
        track = track.at[:, :, :3].add(self.opt_t)
        track = track.at[:, :, 3:4].add(self.opt_r)
        return track
