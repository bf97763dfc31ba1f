"""The jitted, data-parallel train step.

TPU-native replacement for the reference's accelerate/DDP loop
(train.py:174-471): instead of NCCL allreduce after backward, parameters are
replicated and the ray batch is sharded along a 1-D `data` mesh axis; XLA
inserts the gradient psum over ICI automatically from the sharding
annotations. The three optimizers (main / posenet / tracknet) with their
step-windowed schedules (train.py:188-268) fold into one optax
multi-transform with masked, step-gated schedules.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..configs import Config
from ..ops import mathx
from . import losses as losses_lib


def lr_schedule(config: Config):
    """Log-lerp decay with reverse-cosine warmup (configs.py:85-91)."""
    def fn(step):
        return mathx.learning_rate_decay(
            step, config.lr_init, config.lr_final, config.max_steps,
            config.lr_delay_steps, config.lr_delay_mult)
    return fn


def make_optimizer(config: Config) -> optax.GradientTransformation:
    tx = optax.adam(
        learning_rate=lr_schedule(config),
        b1=config.adam_beta1, b2=config.adam_beta2, eps=config.adam_eps)
    chain = [tx]
    if config.grad_max_val > 0:
        chain.insert(0, optax.clip(config.grad_max_val))
    if config.grad_max_norm > 0:
        chain.insert(0, optax.clip_by_global_norm(config.grad_max_norm))
    return optax.chain(*chain)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(config: Config, params) -> Tuple[TrainState,
                                                        optax.GradientTransformation]:
    tx = make_optimizer(config)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      opt_state=tx.init(params)), tx


def _scrub_nan(tree):
    """Grad NaN scrub (train_utils.py:251-253)."""
    return jax.tree.map(lambda g: jnp.nan_to_num(g), tree)


def train_step_fn(model, tx, config: Config, num_patch_rays: int,
                  state: TrainState,
                  batch: Dict[str, jax.Array], key: jax.Array,
                  tracks: Optional[jax.Array] = None,
                  track_mask: Optional[jax.Array] = None):
    """One optimization step. Pure function of (state, batch, key)."""
    step = state.step
    train_frac = jnp.clip((step - 1) / (config.max_steps - 1), 0, 1)

    def loss_fn(params):
        renderings, ray_history = model.apply(
            params, key, batch, train_frac=train_frac,
            compute_extras=False, zero_glo=config.model.num_glo_features == 0,
            train=True, tracks=tracks, track_mask=track_mask)
        losses = losses_lib.compute_losses(
            params, batch, renderings, ray_history, config, step,
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
    return new_state, stats


def make_train_step(model, tx, config: Config, mesh=None, donate=True,
                    num_patch_rays: int = 0):
    """Build the jitted train step; if `mesh` is given, shard the batch along
    the leading axis of the `data` mesh axis and replicate state."""
    fn = functools.partial(train_step_fn, model, tx, config, num_patch_rays)
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
