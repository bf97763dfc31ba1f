"""Loss stack, mirroring reference train_utils.py + the in-loop losses of
train.py:283-453, rewritten mask-based (no data-dependent boolean indexing:
every loss is a masked mean over static shapes, which is the TPU-native form
of the reference's `tensor[mask]` reductions).

Batch mask conventions (produced by data/batching.py):
  rgb_mask:   1 where the RGB charb loss applies (train.py:310,324)
  depth_mask: 1 where depth supervision applies (train.py:312,319)
  sem_mask:   1 where the semantic NLL applies (train.py:314,320)
  lidar_mask: 1 on rays that came from real LiDAR returns
  patch_mask: 1 on the patch-structured prefix of the batch
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops import grid as gridlib
from ..ops import mathx, ref_utils, stepfun


def _masked_mean(x, mask):
    mask = mask.astype(x.dtype)
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def masked_quantile(x, mask, q: float):
    """Quantile of x over mask==1 entries, static-shape (sort + traced index).

    Replaces the reference's torch.quantile over boolean-indexed values
    (train.py:338)."""
    big = jnp.finfo(x.dtype).max
    vals = jnp.where(mask, x, big)
    svals = jnp.sort(vals.reshape(-1))
    n_valid = mask.sum().astype(jnp.int32)
    idx = jnp.clip((q * (n_valid.astype(jnp.float32) - 1)).astype(jnp.int32),
                   0, svals.shape[0] - 1)
    return jax.lax.dynamic_index_in_dim(svals, idx, keepdims=False)


def data_loss(batch, renderings, config: Config):
    """Charbonnier / MSE / rawnerf photometric loss (train_utils.py:55-117).

    Per-ray-per-channel `lossmult` (e.g. the Bayer mosaic mask on raw
    captures, reference datasets.py:739-741) composes with the ray-level
    rgb_mask."""
    lossmult = batch["rgb_mask"][..., None].astype(jnp.float32)
    lossmult = jnp.broadcast_to(lossmult, batch["rgb"][..., :3].shape)
    if "lossmult" in batch:
        lossmult = lossmult * batch["lossmult"]

    losses: List[jax.Array] = []
    mses: List[jax.Array] = []
    for rendering in renderings:
        resid_sq = (rendering["rgb"] - batch["rgb"][..., :3]) ** 2
        denom = jnp.maximum(lossmult.sum(), 1.0)
        mses.append((lossmult * resid_sq).sum() / denom)
        if config.data_loss_type == "mse":
            dl = resid_sq
        elif config.data_loss_type == "charb":
            dl = jnp.sqrt(resid_sq + config.charb_padding**2)
        elif config.data_loss_type == "rawnerf":
            # Clip the render against 1 (sensor overexposure) and reweight
            # by the gradient of the log tonemapping curve so dark linear-
            # HDR regions are not drowned out (train_utils.py:80-87).
            rgb_clip = jnp.minimum(rendering["rgb"], 1.0)
            resid_sq_clip = (rgb_clip - batch["rgb"][..., :3]) ** 2
            scaling_grad = 1.0 / (1e-3 + jax.lax.stop_gradient(rgb_clip))
            dl = resid_sq_clip * scaling_grad**2
        else:
            raise NotImplementedError(config.data_loss_type)
        losses.append((lossmult * dl).sum() / denom)

    loss = (config.data_coarse_loss_mult * sum(losses[:-1])
            + config.data_loss_mult * losses[-1])
    return loss, jnp.stack(mses)


def depth_loss(batch, renderings, config: Config, step):
    """log-L1 depth loss with 0.9-quantile outlier gating and the
    pose-refine-aware weight schedule (train.py:330-340)."""
    mask = batch["depth_mask"]
    dep_dist = renderings[-1]["depth"] - batch["depth"]
    abs_dist = jnp.abs(dep_dist)
    thresh = masked_quantile(abs_dist, mask, 0.9)
    gated = mask & (abs_dist < thresh)
    loss = _masked_mean(jnp.log(abs_dist + 1.0), gated)

    step = jnp.asarray(step, jnp.float32)
    if config.pose_refine:
        in_window = ((step > config.start_step)
                     & (step < int(0.6 * config.end_step)))
        lam = jnp.where(in_window, 0.0,
                        jnp.where(step > config.end_step, 0.4, 0.1))
    else:
        lam = jnp.where(step > config.end_step, 0.4, 0.1)
    return config.depth_loss_mult * lam * loss


def semantic_loss(batch, renderings, config: Config, step):
    """NLL over composited class probabilities (train.py:400-411)."""
    mask = batch["sem_mask"]
    sem = renderings[-1]["semantic"]
    labels = batch["semantic"].astype(jnp.int32)
    labels_safe = jnp.clip(labels, 0, sem.shape[-1] - 1)
    logp = jnp.log(jnp.take_along_axis(
        sem, labels_safe[..., None], axis=-1)[..., 0] + 1e-6)
    loss = -_masked_mean(logp, mask)
    step = jnp.asarray(step, jnp.float32)
    # Schedule from reference train.py:400-411, expressed as fractions of
    # semantic_loss_mult (default 0.05 -> the reference's 0.01/0.04).
    lo, hi = 0.2 * config.semantic_loss_mult, 0.8 * config.semantic_loss_mult
    if config.pose_refine:
        in_window = ((step > config.start_step)
                     & (step < int(0.6 * config.end_step)))
        lam = jnp.where(in_window, 0.0,
                        jnp.where(step > config.end_step, hi, lo))
    else:
        lam = jnp.where(step > config.end_step, hi, lo)
    return lam * loss


def intensity_loss(batch, renderings, config: Config):
    """MSE on LiDAR-return intensity (train.py:412-418)."""
    pred = renderings[-1]["intensity"].reshape(-1)
    target = batch["intensity"].reshape(-1)
    mask = batch["lidar_mask"].reshape(-1) == 1
    return 0.1 * config.intensity_loss_mult * _masked_mean(
        (pred - target) ** 2, mask)


def anti_interlevel_loss(ray_history, config: Config):
    """ZipNeRF anti-aliased interlevel loss (train_utils.py:134-172)."""
    last = ray_history[-1]
    c = jax.lax.stop_gradient(last["sdist"])
    w = jax.lax.stop_gradient(last["weights"])
    w_normalize = jnp.minimum(w / (c[..., 1:] - c[..., :-1] + 1e-12), 10.0)
    loss_total = 0.0
    for i, ray_results in enumerate(ray_history[:-1]):
        cp = ray_results["sdist"]
        wp = ray_results["weights"]
        c_, w_ = stepfun.blur_stepfun(c, w_normalize, config.pulse_width[i])
        area = 0.5 * (w_[..., 1:] + w_[..., :-1]) * (c_[..., 1:] - c_[..., :-1])
        cdf = jnp.concatenate(
            [jnp.zeros_like(area[..., :1]), jnp.cumsum(area, axis=-1)],
            axis=-1)
        cdf_interp = mathx.sorted_interp_quad(cp, c_, w_, cdf)
        w_s = jnp.diff(cdf_interp, axis=-1)
        per = jnp.maximum(w_s - wp, 0) ** 2 / (wp + 1e-5)
        if "obj_mask" in ray_results:
            # obj_mask: [R, S, N_obj] slot-intersection flags; exclude
            # object-covered samples from the proposal-supervision mean.
            keep = ~ray_results["obj_mask"].any(-1)  # [R, S]
            loss = _masked_mean(per, keep)
        else:
            loss = per.mean()
        loss_total = loss_total + loss
    return config.anti_interlevel_loss_mult * loss_total


def distortion_loss(ray_history, config: Config):
    last = ray_history[-1]
    return config.distortion_loss_mult * stepfun.lossfun_distortion(
        last["sdist"], last["weights"]).mean()


def orientation_loss(batch, ray_history, config: Config):
    """Ref-NeRF orientation loss over levels (train_utils.py:184-200)."""
    total = 0.0
    n_levels = len(ray_history)
    for i, rr in enumerate(ray_history):
        n = rr.get(config.orientation_loss_target)
        if n is None:
            continue
        loss = ref_utils.orientation_loss(rr["weights"], n,
                                          batch["viewdirs"])
        mult = (config.orientation_coarse_loss_mult if i < n_levels - 1
                else config.orientation_loss_mult)
        total = total + mult * loss
    return total


def predicted_normal_loss(ray_history, config: Config):
    """Predicted-vs-density normal consistency (train_utils.py:224-240)."""
    total = 0.0
    n_levels = len(ray_history)
    for i, rr in enumerate(ray_history):
        if rr.get("normals") is None or rr.get("normals_pred") is None:
            continue
        loss = ref_utils.predicted_normal_loss(
            rr["weights"], jax.lax.stop_gradient(rr["normals"]),
            rr["normals_pred"])
        mult = (config.predicted_normal_coarse_loss_mult if i < n_levels - 1
                else config.predicted_normal_loss_mult)
        total = total + mult * loss
    return total


def normal_supervision_loss(batch, renderings, config: Config):
    """Pseudo-normal supervision: L1 + (1 - cos) on non-sky rays
    (train.py:358-363)."""
    if "normals" not in renderings[-1] or "normals" not in batch:
        return jnp.asarray(0.0)
    mask = batch["rgb_mask"] & (batch["semantic"] != 10)
    pred = renderings[-1]["normals"]
    pseudo = batch["normals"]
    per_ray = (jnp.abs(pred - pseudo).sum(-1)
               + (1 - jnp.sum(pred * pseudo, axis=-1)))
    return 0.1 * _masked_mean(per_ray, mask)


def hash_decay_loss(params, config: Config):
    """Per-level mean of squared hash embeddings, summed over encoders
    (train_utils.py:203-221). Uses jax.ops.segment_sum (deterministic)
    instead of torch_scatter.segment_coo."""
    mcfg = config.model
    p = params["params"] if "params" in params else params

    def one(table, grid_cfg):
        # spec_for handles encoder='dense_fourier' (dense-band-only table).
        spec = gridlib.spec_for(grid_cfg)
        seg = jnp.asarray(spec.level_ids())
        sums = jax.ops.segment_sum(table**2, seg,
                                   num_segments=spec.num_levels)
        counts = jnp.asarray(spec.rows_per_level, jnp.float32)[:, None]
        return (sums / counts).mean()

    loss = one(p["nerf_mlp"]["table"], mcfg.nerf_mlp.grid)
    for i in range(len(mcfg.num_prop_samples)):
        loss = loss + one(p[f"prop_mlps_{i}"]["table"],
                          mcfg.prop_mlp_for_level(i).grid)
    if mcfg.instance_obj and mcfg.num_objects > 0 and not config.obj_nodecay:
        if mcfg.obj_class_ids:
            # Per-class obj MLPs are registered as obj_mlp_cls{k}
            # (models/model.py setup), one table per distinct class.
            for k in sorted(set(mcfg.obj_class_ids)):
                loss = loss + one(p[f"obj_mlp_cls{int(k)}"]["table"],
                                  mcfg.obj_mlp.grid)
        else:
            loss = loss + one(p["obj_mlp"]["table"], mcfg.obj_mlp.grid)
    return config.hash_decay_mults * loss


def latent_reg(params, config: Config):
    """L2 regularizer on per-object latents (train_utils.py:456-470)."""
    p = params["params"] if "params" in params else params
    if "obj_latents" not in p:
        return jnp.asarray(0.0)
    lat = p["obj_latents"]
    return config.latent_reg * (lat**2).mean()


def edge_aware_smoothness(rgb, disp, mask):
    """Edge-aware first-order smoothness over [P, ps, ps(, C)] patches
    (train_utils.py:330-368), masked-mean form."""
    mean_disp = disp.mean(axis=(1, 2), keepdims=True)
    disp = disp / (mean_disp + 1e-7)
    gx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    gy = jnp.abs(disp[:, :-1, :] - disp[:, 1:, :])
    if gx.ndim == 4:  # channelled quantity (semantic): sum channels
        gx = gx.sum(-1)
        gy = gy.sum(-1)
    rx = jnp.abs(rgb[:, :, :-1] - rgb[:, :, 1:]).mean(-1)
    ry = jnp.abs(rgb[:, :-1, :] - rgb[:, 1:, :]).mean(-1)
    mx = mask[:, :, :-1] * mask[:, :, 1:]
    my = mask[:, :-1, :] * mask[:, 1:, :]
    sx = _masked_mean(gx * jnp.exp(-rx), mx)
    sy = _masked_mean(gy * jnp.exp(-ry), my)
    return sx + sy


def smoothness_losses(batch, renderings, config: Config,
                      num_patch_rays: int = 0):
    """Patch-structured depth/semantic smoothness (train.py:366-392).

    `num_patch_rays` is a static int: the first num_patch_rays rays of the
    batch are [P, ps, ps] row-major patches (see data/batching.py).
    """
    ps = config.patch_size
    if ps <= 1 or num_patch_rays <= 0 or "loss_mask" not in batch:
        return {}
    P = num_patch_rays // (ps * ps)
    shape = (P, ps, ps)
    sl = slice(0, P * ps * ps)
    mask_patch = (batch["loss_mask"][sl].reshape(shape)).astype(jnp.float32)
    dep = renderings[-1]["depth"][sl].reshape(shape + (1,))[..., 0]
    rgb = batch["rgb"][sl].reshape(shape + (-1,))
    out = {"d_smo": 0.01 * edge_aware_smoothness(rgb, dep, mask_patch)}
    if config.model.use_semantic:
        sem = renderings[-1]["semantic"][sl].reshape(shape + (-1,))
        out["s_smo"] = 0.01 * edge_aware_smoothness(rgb, sem, mask_patch)
    return out


def compute_losses(params, batch, renderings, ray_history,
                   config: Config, step,
                   num_patch_rays: int = 0) -> Dict[str, jax.Array]:
    """Assemble the full loss dict (analog of train.py:283-453)."""
    losses: Dict[str, jax.Array] = {}
    dl, mses = data_loss(batch, renderings, config)
    losses["data"] = dl
    losses["_mses"] = mses  # carried for PSNR stats, stripped before sum
    if "obj_overflow" in renderings[-1]:
        # Compacted-obj budget overflow count (objects.py) — a train stat
        # (underscore: excluded from the loss sum), surfaced by train_step.
        losses["_obj_overflow"] = renderings[-1]["obj_overflow"]
    if "obj_hit_frac" in renderings[-1]:
        losses["_obj_hit_frac"] = renderings[-1]["obj_hit_frac"]

    if config.depth_loss and "depth" in batch:
        losses["depth"] = depth_loss(batch, renderings, config, step)
    if config.model.use_semantic and "semantic" in batch:
        losses["sem"] = semantic_loss(batch, renderings, config, step)
    if config.model.use_intensity and "intensity" in batch:
        losses["int"] = intensity_loss(batch, renderings, config)
    if config.anti_interlevel_loss_mult > 0:
        losses["interlevel"] = anti_interlevel_loss(ray_history, config)
    if config.distortion_loss_mult > 0:
        losses["distortion"] = distortion_loss(ray_history, config)
    if config.hash_decay_mults > 0:
        losses["hash_decay"] = hash_decay_loss(params, config)
    if (config.orientation_loss_mult > 0
            or config.orientation_coarse_loss_mult > 0):
        losses["orientation"] = orientation_loss(batch, ray_history, config)
    if (config.predicted_normal_loss_mult > 0
            or config.predicted_normal_coarse_loss_mult > 0):
        losses["predicted_normals"] = predicted_normal_loss(ray_history,
                                                            config)
    if config.normal_supervision and "normals" in batch:
        losses["normals"] = normal_supervision_loss(batch, renderings,
                                                    config)
    if config.model.latent_size > 0:
        losses["latent_reg"] = latent_reg(params, config)
    if config.model.symmetrize and "loss_sym" in renderings[-1]:
        # Symmetry constraint, active after sym_start steps
        # (reference train.py:433-434; step is traced, so the gate is a
        # where, not Python control flow).
        step_f = jnp.asarray(step, jnp.float32)
        losses["sym"] = jnp.where(
            step_f > config.sym_start,
            config.sym_loss * renderings[-1]["loss_sym"], 0.0)
    losses.update(smoothness_losses(batch, renderings, config,
                                    num_patch_rays=num_patch_rays))
    return losses


def total_loss(losses: Dict[str, jax.Array]) -> jax.Array:
    return sum(v for k, v in losses.items() if not k.startswith("_"))
