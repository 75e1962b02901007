"""First-frame image editing pipelines (AnyV2V stage one, SURVEY.md §2.4).

- :class:`InstructPix2PixPipeline` — SD1.5 instruct-pix2pix (and MagicBrush,
  same architecture/recipe with different weights). Reference:
  ``black_box_image_edit/instructpix2pix.py:44-53`` (100 steps,
  guidance_scale 7.5, image_guidance_scale 1.5, EulerAncestral) wrapping
  diffusers ``StableDiffusionInstructPix2PixPipeline``:
  - 3-row CFG batch; text rows [prompt, negative, negative]; conditioning
    image-latent rows [img, img, zeros]; eps = uncond
    + s_txt (text - image) + s_img (image - uncond);
  - the conditioning image latent is the VAE posterior MODE and is NOT
    multiplied by the scaling factor (diffusers ip2p convention);
  - the noisy latent IS scaled normally and Euler-scaled per step.
- :class:`CosXLEditPipeline` — SDXL 8-channel instruct edit with the EDM
  Euler schedule (sigma 0.002-120, v-prediction). Reference:
  ``black_box_image_edit/cosxl_edit.py:20-58``, ``cosxl/custom_pipeline.py:117``
  (1024^2, 20 steps, cfg 7, image cfg 1.5, resize back to source size).

Both drivers are single jitted ``lax.scan`` programs; the per-step ancestral
noise comes from a folded-in PRNG key so the whole loop stays one compile.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.clip import CLIPTextModel
from ..models.unet_sd import SDUNet
from ..models.vae import AutoencoderKL
from ..schedulers import DiffusionSchedule
from ..schedulers.euler import (
    edm_grid,
    edm_scale_model_input,
    edm_step_v,
    euler_ancestral_grid,
    euler_ancestral_step,
    euler_scale_model_input,
)


@dataclasses.dataclass
class InstructPix2PixPipeline:
    """Params keys: ``unet / vae / text``."""

    unet: SDUNet
    vae: AutoencoderKL
    text_encoder: Optional[CLIPTextModel]
    schedule: DiffusionSchedule
    params: Dict[str, Any]

    @cached_property
    def _encode_mode(self):
        @jax.jit
        def fn(params, image01):
            """[N, H, W, 3] in [0,1] -> UNSCALED posterior mode [N, h, w, 4]."""
            moments = self.vae.apply(params["vae"], image01 * 2.0 - 1.0,
                                     method="encode_moments")
            mean, _ = jnp.split(moments, 2, axis=-1)
            return mean.astype(jnp.float32)

        return fn

    @cached_property
    def _decode(self):
        @jax.jit
        def fn(params, latents):
            z = latents / self.vae.config.scaling_factor
            img = self.vae.apply(params["vae"], z, method="decode")
            return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

        return fn

    def encode_text(self, input_ids: jax.Array) -> jax.Array:
        hidden, _ = self.text_encoder.apply(self.params["text"], input_ids)
        return hidden

    @cached_property
    def _edit_scan(self):
        @jax.jit
        def fn(params, init_latent, image_latent, text_embeds3, sigmas, noises,
               cfg_txt, cfg_img):
            n_steps = sigmas.shape[0] - 1
            # rows: [text(full), image-only, uncond]
            img_rows = jnp.concatenate(
                [image_latent, image_latent, jnp.zeros_like(image_latent)], axis=0)

            def body(x, step):
                i, noise = step
                sigma = sigmas[i]
                scaled = euler_scale_model_input(x, sigma)
                inp3 = jnp.tile(scaled, (3, 1, 1, 1))
                inp3 = jnp.concatenate([inp3, img_rows], axis=-1)  # 8 channels
                # discrete timestep for the UNet: interpolated grid value
                t = _sigma_to_t(self.schedule, sigma)
                eps3 = self.unet.apply(
                    params["unet"], sample=inp3, timestep=jnp.tile(t, (3,)),
                    encoder_hidden_states=text_embeds3,
                ).astype(jnp.float32)
                e_txt, e_img, e_unc = jnp.split(eps3, 3, axis=0)
                eps = e_unc + cfg_txt * (e_txt - e_img) + cfg_img * (e_img - e_unc)
                x = euler_ancestral_step(x, eps, sigma, sigmas[i + 1], noise)
                return x, None

            steps = (jnp.arange(n_steps), noises)
            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32), steps)
            return out

        return fn

    def edit(
        self,
        image01: jax.Array,          # [H, W, 3] in [0, 1]
        text_embeds3: jax.Array,     # [3, S, D]: [prompt, negative, negative]
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
        image_guidance_scale: float = 1.5,
        seed: int = 42,
    ) -> jax.Array:
        """Returns the edited image [H, W, 3] in [0, 1]."""
        grid = euler_ancestral_grid(self.schedule, num_inference_steps)
        img_lat = self._encode_mode(self.params, image01[None])
        key = jax.random.PRNGKey(seed)
        k_init, k_steps = jax.random.split(key)
        init = (jax.random.normal(k_init, img_lat.shape, jnp.float32)
                * grid.init_noise_sigma)
        noises = jax.random.normal(
            k_steps, (num_inference_steps, *img_lat.shape), jnp.float32)
        out = self._edit_scan(
            self.params, init, img_lat, text_embeds3,
            jnp.asarray(grid.sigmas), noises,
            jnp.float32(guidance_scale), jnp.float32(image_guidance_scale),
        )
        return self._decode(self.params, out)[0]


def _sigma_to_t(schedule: DiffusionSchedule, sigma: jax.Array) -> jax.Array:
    """Invert sigma = sqrt((1-abar)/abar) to a (fractional) train timestep by
    interpolation — what diffusers' Euler schedulers feed the UNet."""
    abar = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
    sigmas_full = jnp.sqrt((1.0 - abar) / abar)
    log_s = jnp.log(jnp.maximum(sigmas_full, 1e-20))
    target = jnp.log(jnp.maximum(sigma, 1e-20))
    # sigmas_full is increasing in t
    idx = jnp.clip(jnp.searchsorted(log_s, target), 1, log_s.shape[0] - 1)
    lo, hi = log_s[idx - 1], log_s[idx]
    w = jnp.clip((target - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)
    return (idx - 1 + w).astype(jnp.float32)


@dataclasses.dataclass
class CosXLEditPipeline:
    """SDXL instruct edit on the EDM v-prediction schedule. Params keys:
    ``unet / vae`` (+ text embeds supplied precomputed: SDXL dual-encoder
    embeddings [3, S, 2048], pooled [3, 1280])."""

    unet: SDUNet
    vae: AutoencoderKL
    schedule: DiffusionSchedule          # unused by EDM; kept for interface
    params: Dict[str, Any]
    sigma_min: float = 0.002
    sigma_max: float = 120.0

    @cached_property
    def _encode_mode(self):
        @jax.jit
        def fn(params, image01):
            moments = self.vae.apply(params["vae"], image01 * 2.0 - 1.0,
                                     method="encode_moments")
            mean, _ = jnp.split(moments, 2, axis=-1)
            return mean.astype(jnp.float32)

        return fn

    @cached_property
    def _decode(self):
        @jax.jit
        def fn(params, latents):
            z = latents / self.vae.config.scaling_factor
            img = self.vae.apply(params["vae"], z, method="decode")
            return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

        return fn

    @cached_property
    def _edit_scan(self):
        @jax.jit
        def fn(params, init_latent, image_latent, text_embeds3, pooled3,
               time_ids3, sigmas, cfg_txt, cfg_img):
            n_steps = sigmas.shape[0] - 1
            img_rows = jnp.concatenate(
                [image_latent, image_latent, jnp.zeros_like(image_latent)], axis=0)

            def body(x, i):
                sigma = sigmas[i]
                scaled = edm_scale_model_input(x, sigma)
                inp3 = jnp.tile(scaled, (3, 1, 1, 1))
                inp3 = jnp.concatenate([inp3, img_rows], axis=-1)
                t = 0.25 * jnp.log(sigma)   # EDM precondition_noise
                v3 = self.unet.apply(
                    params["unet"], sample=inp3, timestep=jnp.tile(t, (3,)),
                    encoder_hidden_states=text_embeds3,
                    added_text_embeds=pooled3, added_time_ids=time_ids3,
                ).astype(jnp.float32)
                v_txt, v_img, v_unc = jnp.split(v3, 3, axis=0)
                v = v_unc + cfg_txt * (v_txt - v_img) + cfg_img * (v_img - v_unc)
                x = edm_step_v(x, v, sigma, sigmas[i + 1])
                return x, None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32),
                                  jnp.arange(n_steps))
            return out

        return fn

    def edit(
        self,
        image01: jax.Array,          # [H, W, 3] (1024^2 in the reference)
        text_embeds3: jax.Array,     # [3, S, 2048]
        pooled3: jax.Array,          # [3, 1280]
        num_inference_steps: int = 20,
        guidance_scale: float = 7.0,
        image_guidance_scale: float = 1.5,
        seed: int = 42,
    ) -> jax.Array:
        grid = edm_grid(num_inference_steps, self.sigma_min, self.sigma_max)
        img_lat = self._encode_mode(self.params, image01[None])
        H, W = image01.shape[:2]
        # SDXL micro-conditioning: original size, crop (0,0), target size
        time_ids = jnp.asarray([[H, W, 0, 0, H, W]], jnp.float32)
        time_ids3 = jnp.tile(time_ids, (3, 1))
        init = (jax.random.normal(jax.random.PRNGKey(seed), img_lat.shape,
                                  jnp.float32) * grid.init_noise_sigma)
        out = self._edit_scan(
            self.params, init, img_lat, text_embeds3, pooled3, time_ids3,
            jnp.asarray(grid.sigmas),
            jnp.float32(guidance_scale), jnp.float32(image_guidance_scale),
        )
        return self._decode(self.params, out)[0]
