"""The ZipNeRF MLP family (NerfMLP / PropMLP / ObjMLP) as one flax module.

TPU-native re-design of reference internal/models.py:796-1277. One
`ZipMLP` module is parameterized by an `MLPConfig` block (the analog of the
reference's gin-configured class attributes). The pipeline per call:

  contract Gaussians (coord.track_linearize, models.py:968-973)
  -> hash-grid encode n multisamples + erf downweight + mean
     (models.py:974-977, fused in ops.grid.hash_encode_multisample)
  -> scale featurization (models.py:980-989)
  -> density trunk -> bottleneck (models.py:996-1004)
  -> semantic / intensity heads (models.py:1124-1143)
  -> view-dependent RGB branch with posenc dirs, GLO affine, skip
     (models.py:1144-1234).

All matmuls are MXU-shaped [B*S, W] GEMMs; nothing here has data-dependent
shapes. Densities for all samples of all rays are evaluated in one batch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import MLPConfig
from ..ops import coord, ref_utils
from ..ops import fourier as fourierlib
from ..ops import grid as gridlib


def _l2_normalize(x, eps: float = 1e-5):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _per_sample_vec(v, like):
    """Broadcast a per-ray [..., 3] vector to per-sample [..., S, 3]."""
    if v.ndim == like.ndim:
        return jnp.broadcast_to(v, like.shape[:-1] + (v.shape[-1],))
    return jnp.broadcast_to(v[..., None, :], like.shape[:-1] + (v.shape[-1],))


class ZipMLP(nn.Module):
    cfg: MLPConfig

    def setup(self):
        c = self.cfg
        # Mixed-precision policy: matmuls + activations in compute_dtype
        # (params stay f32); encode, raw density, and every head's final
        # nonlinearity stay f32 (see configs.MLPConfig.compute_dtype).
        dt = (jnp.bfloat16 if c.compute_dtype == "bfloat16"
              else jnp.float32)
        # 'dense_fourier': the grid keeps only the dense tiled band (rows
        # below the v5e gather cliff); the hashed high-res band becomes
        # MXU-resident Fourier features (ops/fourier.py).
        spectral = c.grid.encoder == "dense_fourier"
        self.spec = gridlib.spec_for(c.grid)
        self.table = self.param(
            "table",
            lambda key: self.spec.init_table(key, std=1e-4))
        self._fourier_B = None
        if spectral:
            self._fourier_B = fourierlib.make_frequency_matrix(
                7, c.grid.fourier_freqs,
                float(self.spec.desired_resolution),
                float(c.grid.desired_resolution))

        last_dim = self.spec.output_dim
        if spectral:
            last_dim += 2 * c.grid.fourier_freqs
        if c.scale_featurization:
            last_dim += self.spec.num_levels
        if c.latent_size > 0:
            last_dim += c.latent_size // 2 if c.split_latent else c.latent_size

        width_out = 1 if c.disable_rgb else c.bottleneck_width
        if c.obj_mode:
            trunk_widths = (32,)
        elif c.complex_decoder:
            trunk_widths = (128, 128, 128)
        else:
            trunk_widths = (64,)
        layers = []
        for w in trunk_widths:
            layers.append(nn.Dense(w, dtype=dt))
        layers.append(nn.Dense(
            width_out, dtype=dt,
            bias_init=(nn.initializers.constant(0.1) if c.density_init
                       else nn.initializers.zeros)))
        self.density_layers = layers

        if c.enable_pred_normals:
            self.normal_layer = nn.Dense(3, dtype=dt)

        if not c.disable_rgb:
            if c.num_glo_features > 0:
                glo = []
                for _ in range(c.net_depth_glo - 1):
                    glo.append(nn.Dense(c.net_width_glo, dtype=dt))
                glo.append(nn.Dense(c.bottleneck_width * 2, dtype=dt))
                self.glo_layers = glo

            if c.use_diffuse_color:
                self.diffuse_layer = nn.Dense(c.num_rgb_channels, dtype=dt)
            if c.use_specular_tint:
                self.specular_layer = nn.Dense(3, dtype=dt)
            if c.enable_pred_roughness:
                self.roughness_layer = nn.Dense(1, dtype=dt)

            kaiming = nn.initializers.kaiming_uniform()
            self.view_layers = [
                nn.Dense(c.net_width_viewdirs, kernel_init=kaiming, dtype=dt)
                for _ in range(c.net_depth_viewdirs)]
            self.rgb_layer = nn.Dense(c.num_rgb_channels, dtype=dt)

            if c.use_semantic and not c.no_sem_layer and not c.fixed_semantic:
                self.sem_layers = [nn.Dense(64, dtype=dt),
                   nn.Dense(c.class_num, dtype=dt)]
            if c.use_intensity:
                self.intensity_layers = [nn.Dense(64, dtype=dt),
                         nn.Dense(1, dtype=dt)]

        if self.cfg.use_directional_enc:
            self._ide_fn = ref_utils.generate_ide_fn(self.cfg.deg_view)
        else:
            self._ide_fn = None

    def _dir_enc(self, viewdirs, roughness=None):
        """Direction encoding: IDE (models.py:856-858) or posenc
        (models.py:861-866)."""
        if self._ide_fn is not None:
            if roughness is None:
                roughness = jnp.zeros_like(viewdirs[..., :1])
            return self._ide_fn(viewdirs, roughness)
        return coord.pos_enc(viewdirs, min_deg=0, max_deg=self.cfg.deg_view,
                             append_identity=True)

    def _encode(self, means, stds):
        """Contract + hash-encode + erf-downweight the multisample cloud.

        means: [..., n, 3] world coords; stds: [..., n].
        Returns features [..., F] and erf weights [..., n, L].
        """
        c = self.cfg
        if c.warp_fn is not None:
            means, stds = coord.track_linearize(c.warp_fn, means, stds)
            bound = 2.0  # contraction lands in [-2, 2]
            means = means / bound
            stds = stds / bound
        # Map [-1, 1] -> [0, 1] for the grid (reference grid.py:162).
        x01 = (means + 1.0) / 2.0
        if c.re_weights:
            feats, weights = gridlib.hash_encode_multisample(
                self.table, x01, stds, self.spec,
                coarse_res_cutoff=c.ms_coarse_res_cutoff)
        else:
            # No erf downweighting (obj MLPs, reference models.py:978-979):
            # plain mean over the multisample axis.
            raw = gridlib.hash_encode(self.table, x01, self.spec)
            feats = raw.mean(axis=-2)
            weights = jnp.ones(stds.shape + (self.spec.num_levels,))
        if self._fourier_B is not None:
            enc = (fourierlib.fourier_encode_pooled
                   if c.grid.fourier_pooled else fourierlib.fourier_encode)
            feats = jnp.concatenate(
                [feats, enc(x01, stds, self._fourier_B)], axis=-1)
        if c.scale_featurization:
            # Mean squared embedding per level, detached
            # (reference models.py:980-989).
            vl2mean = jax.lax.stop_gradient(
                jax.ops.segment_sum(
                    (self.table**2).sum(-1),
                    jnp.asarray(self.spec.level_ids()),
                    num_segments=self.spec.num_levels)
                / jnp.asarray(self.spec.rows_per_level, jnp.float32))
            featurized_w = ((2 * weights.mean(axis=-2) - 1)
                            * jnp.sqrt(1e-8 + vl2mean))
            feats = jnp.concatenate([feats, featurized_w], axis=-1)
        return feats, weights

    def predict_density(self, means, stds, latent=None, key=None):
        """Density trunk. Returns (raw_density [...], bottleneck x [..., W])."""
        c = self.cfg
        feats, _ = self._encode(means, stds)
        if latent is not None:
            lat = (latent[..., : c.latent_size // 2]
                   if c.split_latent else latent)
            feats = jnp.concatenate([feats, lat], axis=-1)
        x = feats
        for i, layer in enumerate(self.density_layers):
            x = layer(x)
            if i != len(self.density_layers) - 1:
                x = nn.relu(x)
        # Raw density leaves the mixed-precision domain here: softplus +
        # compositing run f32 (bf16 exp/cumsum visibly biases weights).
        raw_density = x[..., 0].astype(jnp.float32)
        if key is not None and c.density_noise > 0:
            raw_density = raw_density + c.density_noise * jax.random.normal(
                key, raw_density.shape)
        return raw_density, x

    def __call__(self, means, stds, viewdirs=None, latent=None, glo_vec=None,
                 key: Optional[jax.Array] = None):
        """Evaluate the MLP on multisampled Gaussians.

        means: [..., S, n, 3], stds: [..., S, n], viewdirs: [..., 3].
        Returns dict with density [..., S], rgb [..., S, 3], semantic
        [..., S, K] or None, intensity [..., S, 1] or None, normals None
        (density normals disabled for nuScenes configs, models.py:30-34 gin).
        """
        c = self.cfg
        noise_key = None
        if key is not None and c.density_noise > 0:
            key, noise_key = jax.random.split(key)
        raw_density, x = self.predict_density(
            means, stds, latent=latent, key=noise_key)
        density = jax.nn.softplus(raw_density + c.density_bias)

        normals = None
        if not c.disable_density_normals:
            normals = self._finite_difference_normals(means, stds)

        out = dict(density=density, rgb=None, semantic=None, intensity=None,
                   normals=normals, normals_pred=None, roughness=None,
                   raw_grad_density=None, grad_pred=None)

        if c.enable_pred_normals:
            grad_pred = self.normal_layer(x).astype(jnp.float32)
            out["grad_pred"] = grad_pred
            out["normals_pred"] = -_l2_normalize(grad_pred)
        normals_to_use = (out["normals_pred"]
                          if c.enable_pred_normals else normals)

        if c.disable_rgb:
            out["rgb"] = jnp.zeros(density.shape + (3,), density.dtype)
            return out

        # Semantic head (reference models.py:1124-1137).
        if c.use_semantic:
            if c.fixed_semantic:
                sem = jnp.zeros(x.shape[:-1] + (c.class_num,),
                                jnp.float32)
                if c.class_type != 255:
                    sem = sem.at[..., c.class_type].set(1.0)
                sem = jax.lax.stop_gradient(sem)
            else:
                if c.no_sem_layer:
                    sem = x[..., 1:1 + c.class_num]  # v4: in-density channels
                else:
                    h = nn.relu(self.sem_layers[0](x))
                    sem = self.sem_layers[1](h)  # v3: separate head
                sem = jax.nn.softmax(sem.astype(jnp.float32), axis=-1)
            out["semantic"] = sem

        if c.use_intensity:
            h = nn.relu(self.intensity_layers[0](x))
            out["intensity"] = self.intensity_layers[1](h).astype(jnp.float32)

        bottleneck = x
        if key is not None and c.bottleneck_noise > 0:
            key, sub = jax.random.split(key)
            bottleneck = bottleneck + c.bottleneck_noise * jax.random.normal(
                sub, bottleneck.shape)

        if glo_vec is not None and c.num_glo_features > 0:
            g = glo_vec
            for i, layer in enumerate(self.glo_layers):
                g = layer(g)
                if i != len(self.glo_layers) - 1:
                    g = nn.relu(g)
            g = jnp.broadcast_to(g[..., None, :],
                                 bottleneck.shape[:-1] + g.shape[-1:])
            scale, shift = jnp.split(g, 2, axis=-1)
            bottleneck = bottleneck * jnp.exp(scale) + shift

        def _per_sample(v):
            """Broadcast a per-ray [..., D] field to per-sample [..., S, D]
            (no-op when the caller already supplies per-sample values, as the
            dynamic-object path does)."""
            if v.ndim == bottleneck.ndim:
                return jnp.broadcast_to(v, bottleneck.shape[:-1]
                                        + (v.shape[-1],))
            return jnp.broadcast_to(v[..., None, :],
                                    bottleneck.shape[:-1] + (v.shape[-1],))

        raw_rgb_diffuse = None
        tint = None
        roughness = None
        if c.use_diffuse_color:
            raw_rgb_diffuse = self.diffuse_layer(x)
        if c.use_specular_tint:
            tint = jax.nn.sigmoid(self.specular_layer(x))
        if c.enable_pred_roughness:
            roughness = jax.nn.softplus(
                self.roughness_layer(x) + c.roughness_bias)
            out["roughness"] = roughness

        parts = [bottleneck]
        if viewdirs is not None:
            if c.use_reflections:
                # Reflect about the per-sample normals; viewdirs flipped to
                # point toward the camera (models.py:1180-1187).
                refdirs = ref_utils.reflect(
                    -_per_sample_vec(viewdirs, bottleneck), normals_to_use)
                parts.append(self._dir_enc(refdirs, roughness))
            else:
                dir_enc = self._dir_enc(
                    viewdirs[..., None, :] if (roughness is not None
                                               and self._ide_fn is not None)
                    else viewdirs,
                    roughness)
                parts.append(_per_sample(dir_enc))
            if c.use_n_dot_v:
                dotprod = jnp.sum(
                    normals_to_use * _per_sample_vec(viewdirs, bottleneck),
                    axis=-1, keepdims=True)
                parts.append(dotprod)
        if c.split_latent and latent is not None:
            parts.append(_per_sample(latent[..., c.latent_size // 2:]))
        h = jnp.concatenate(parts, axis=-1)

        inputs = h
        for i, layer in enumerate(self.view_layers):
            h = nn.relu(layer(h))
            if i == c.skip_layer_dir:
                h = jnp.concatenate([h, inputs], axis=-1)

        rgb = jax.nn.sigmoid(
            c.rgb_premultiplier * self.rgb_layer(h).astype(jnp.float32)
            + c.rgb_bias)
        if c.use_diffuse_color:
            # Combine diffuse + specular and tone map (models.py:1238-1248).
            diffuse_linear = jax.nn.sigmoid(raw_rgb_diffuse - np.log(3.0))
            specular_linear = (tint * rgb if c.use_specular_tint
                               else 0.5 * rgb)
            from ..utils.image import linear_to_srgb
            rgb = jnp.clip(linear_to_srgb(specular_linear + diffuse_linear),
                           0.0, 1.0)
        rgb = rgb * (1 + 2 * c.rgb_padding) - c.rgb_padding
        out["rgb"] = rgb
        return out

    def _finite_difference_normals(self, means, stds):
        """Density normals by central differences over the multisample means
        (reference models.py:1018-1034 numerical branch), normalized and
        NaN-scrubbed."""
        eps = self.cfg.normal_eps
        grads = []
        for d in range(3):
            offs = jnp.zeros((3,)).at[d].set(eps)
            pos, _ = self.predict_density(
                jnp.clip(means + offs, -1e6, 1e6), stds)
            neg, _ = self.predict_density(
                jnp.clip(means - offs, -1e6, 1e6), stds)
            grads.append(0.5 * (pos - neg) / eps)
        normal = -jnp.stack(grads, axis=-1)
        return jnp.nan_to_num(_l2_normalize(normal))

    def hash_levels(self) -> int:
        return self.cfg.grid.num_levels
