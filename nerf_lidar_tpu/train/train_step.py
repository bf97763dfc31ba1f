"""The jitted, data-parallel train step.

TPU-native replacement for the reference's accelerate/DDP loop
(train.py:174-471): instead of NCCL allreduce after backward, parameters are
replicated and the ray batch is sharded along a 1-D `data` mesh axis; XLA
inserts the gradient psum over ICI automatically from the sharding
annotations.

The reference's three optimizers with step-windowed schedules (main /
posenet / tracknet, train.py:188-268) fold into one optax multi-transform
over a combined params tree {model, posenet?, tracknet?}: pose/track deltas
are *always* applied (they start at zero) and their learning rates are
gated to zero outside their windows — numerically identical to the
reference's apply-inside-window / freeze-after-window control flow, but a
single static XLA program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..configs import Config
from ..models import posenet as posenet_lib
from ..ops import mathx
from . import losses as losses_lib


def lr_schedule(config: Config):
    """Log-lerp decay with reverse-cosine warmup (configs.py:85-91)."""
    def fn(step):
        return mathx.learning_rate_decay(
            step, config.lr_init, config.lr_final, config.max_steps,
            config.lr_delay_steps, config.lr_delay_mult)
    return fn


def posenet_schedule(config: Config):
    """Posenet LR: live only in (start_step, end_step) (train.py:200-243)."""
    def fn(step):
        lr = mathx.learning_rate_decay(
            step - config.start_step, config.pn_lr_init, config.pn_lr_final,
            config.end_step - config.start_step,
            config.lr_delay_steps, config.lr_delay_mult)
        gate = ((step > config.start_step) & (step < config.end_step))
        return lr * gate
    return fn


def tracknet_schedule(config: Config):
    """Tracknet LR: live in (track_start_opt, +5000) (train.py:244-268)."""
    def fn(step):
        start = config.track_start_opt
        lr = mathx.learning_rate_decay(
            step - start, config.tn_lr_init, config.tn_lr_final,
            config.max_steps - start,
            config.lr_delay_steps, config.lr_delay_mult)
        gate = ((step > start) & (step < start + 5000))
        return lr * gate
    return fn


def _adam(config: Config, schedule) -> optax.GradientTransformation:
    tx = optax.adam(learning_rate=schedule, b1=config.adam_beta1,
                    b2=config.adam_beta2, eps=config.adam_eps)
    chain = [tx]
    if config.grad_max_val > 0:
        chain.insert(0, optax.clip(config.grad_max_val))
    if config.grad_max_norm > 0:
        chain.insert(0, optax.clip_by_global_norm(config.grad_max_norm))
    return optax.chain(*chain)


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Multi-transform: one adam per param group."""
    groups = {"model": _adam(config, lr_schedule(config))}
    if config.pose_refine:
        groups["posenet"] = _adam(config, posenet_schedule(config))
    if config.track_refine:
        groups["tracknet"] = _adam(config, tracknet_schedule(config))
    if len(groups) == 1:
        return groups["model"]

    def label_fn(params):
        return {k: k for k in params}

    return optax.multi_transform(groups, label_fn)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any  # {"model": ..., ["posenet": ...], ["tracknet": ...]}
    opt_state: Any


def create_train_state(config: Config, model_params,
                       posenet_params=None, tracknet_params=None
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    multi = config.pose_refine or config.track_refine
    if multi:
        params = {"model": model_params}
        if config.pose_refine:
            assert posenet_params is not None
            params["posenet"] = posenet_params
        if config.track_refine:
            assert tracknet_params is not None
            params["tracknet"] = tracknet_params
    else:
        params = model_params
    tx = make_optimizer(config)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      opt_state=tx.init(params)), tx


def _scrub_nan(tree):
    """Grad NaN scrub (train_utils.py:251-253)."""
    return jax.tree.map(lambda g: jnp.nan_to_num(g), tree)


def train_step_fn(model, tx, config: Config, num_patch_rays: int,
                  posenet_model, tracknet_model,
                  state: TrainState,
                  batch: Dict[str, jax.Array], key: jax.Array,
                  tracks: Optional[jax.Array] = None,
                  track_mask: Optional[jax.Array] = None):
    """One optimization step. Pure function of (state, batch, key)."""
    step = state.step
    train_frac = jnp.clip((step - 1) / (config.max_steps - 1), 0, 1)
    multi = config.pose_refine or config.track_refine

    def loss_fn(params):
        model_params = params["model"] if multi else params
        b = batch
        cur_tracks = tracks
        if config.pose_refine and posenet_model is not None:
            R, t = posenet_model.apply(params["posenet"],
                                       b["cam_idx"][..., 0])
            b = posenet_lib.apply_pose_refinement(R, t, b)
        if config.track_refine and tracknet_model is not None \
                and tracks is not None:
            cur_tracks = tracknet_model.apply(params["tracknet"], tracks)
        renderings, ray_history = model.apply(
            model_params, key, b, train_frac=train_frac,
            compute_extras=False, zero_glo=config.model.num_glo_features == 0,
            train=True, tracks=cur_tracks, track_mask=track_mask)
        losses = losses_lib.compute_losses(
            model_params, b, renderings, ray_history, config, step,
            num_patch_rays=num_patch_rays)
        return losses_lib.total_loss(losses), losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    grads = _scrub_nan(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=step + 1, params=params,
                              opt_state=opt_state)
    stats = {k: v for k, v in losses.items()}
    stats["loss"] = loss
    stats["psnr"] = -10.0 * jnp.log10(jnp.maximum(losses["_mses"][-1], 1e-10))
    if "_obj_overflow" in losses:
        stats["obj_overflow"] = losses["_obj_overflow"]
    if "_obj_hit_frac" in losses:
        stats["obj_hit_frac"] = losses["_obj_hit_frac"]
    return new_state, stats


def make_train_step(model, tx, config: Config, mesh=None, donate=True,
                    num_patch_rays: int = 0, posenet_model=None,
                    tracknet_model=None):
    """Build the jitted train step; if `mesh` is given, shard the batch along
    the leading axis of the `data` mesh axis and replicate state."""
    fn = functools.partial(train_step_fn, model, tx, config, num_patch_rays,
                           posenet_model, tracknet_model)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(replicated, batch_sharded, replicated, replicated,
                      replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else ())
