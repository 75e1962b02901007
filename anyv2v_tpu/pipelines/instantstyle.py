"""InstantStyle first-frame editor: SDXL + canny ControlNet + IP-Adapter
restricted to a style-only target block.

Reference ``black_box_image_edit/instantstyle.py``:
- canny 50/200 of the SOURCE frame as the ControlNet condition (:47-50);
- IP-Adapter-XL with target_blocks=["up_blocks.0.attentions.1"] — style
  injection only (:27-32); image tokens come from an ImageProjModel
  (``ip_adapter/ip_adapter.py:28``: Linear -> reshape to num_tokens x dim ->
  LayerNorm) on the style image's CLIP embedding, with a zero-embedding
  unconditional row (``ip_adapter.py:176+``);
- generation: SDXL text-to-image, EulerDiscrete 30 steps, cfg 5, ip scale 1.0,
  controlnet_conditioning_scale 0.6 (:53-66).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.controlnet import ControlNet
from ..models.unet_sd import SDUNet
from ..models.vae import AutoencoderKL
from ..schedulers import DiffusionSchedule
from ..schedulers.euler import (
    euler_discrete_grid,
    euler_discrete_step,
    euler_scale_model_input,
)
from .image_edit import _sigma_to_t


class ImageProjModel(nn.Module):
    """IP-Adapter image projection (``ip_adapter/ip_adapter.py:28``):
    clip_embed [B, D_clip] -> [B, num_tokens, cross_dim] -> LayerNorm."""

    cross_attention_dim: int
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        b = image_embeds.shape[0]
        x = nn.Dense(self.cross_attention_dim * self.num_tokens, dtype=self.dtype,
                     name="proj")(image_embeds.astype(self.dtype))
        x = x.reshape(b, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)


class MLPProjModel(nn.Module):
    """IP-Adapter-FULL image projection (``ip_adapter/ip_adapter.py:48-64``):
    per-patch MLP Linear -> GELU -> Linear -> LayerNorm over the CLIP
    penultimate hidden states; token count = patch count (no pooling)."""

    cross_attention_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_tokens: jax.Array) -> jax.Array:
        """[B, S_img, D_clip] -> [B, S_img, cross_dim]."""
        d_clip = image_tokens.shape[-1]
        x = nn.Dense(d_clip, dtype=self.dtype, name="proj_0")(
            image_tokens.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.cross_attention_dim, dtype=self.dtype,
                     name="proj_2")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="proj_3")(x).astype(self.dtype)


def ip_image_embeds(vision_encoder, vision_params, proj_module, proj_params,
                    image_clip: jax.Array, variant: str = "xl"):
    """(cond, uncond) IP tokens for every reference adapter variant.

    Reference ``get_image_embeds`` per class (``ip_adapter/ip_adapter.py``):
    - base / xl (:155-169): pooled CLIP projection -> ImageProjModel; the
      uncond row projects a ZERO clip embedding;
    - plus / plus-xl (:346-358, :388-400): PENULTIMATE hidden states
      (``hidden_states[-2]``) -> Resampler; uncond runs a ZERO IMAGE
      through the encoder (not a zero embedding);
    - full (:360-369): penultimate hidden states -> MLPProjModel, uncond
      as in plus.

    ``image_clip``: CLIP-normalized [B, H, W, 3].
    """
    if variant in ("base", "xl"):
        _, pooled = vision_encoder.apply(vision_params, image_clip)
        cond = proj_module.apply(proj_params, pooled)
        unc = proj_module.apply(proj_params, jnp.zeros_like(pooled))
        return cond, unc
    if variant not in ("plus", "plus-xl", "full"):
        raise ValueError(f"unknown IP-Adapter variant {variant!r}")
    hidden, _ = vision_encoder.apply(vision_params, image_clip,
                                     penultimate=True)
    hidden0, _ = vision_encoder.apply(vision_params,
                                      jnp.zeros_like(image_clip),
                                      penultimate=True)
    return (proj_module.apply(proj_params, hidden),
            proj_module.apply(proj_params, hidden0))


def canny_map(image01: np.ndarray, low: int = 50, high: int = 200) -> np.ndarray:
    """cv2.Canny of an RGB [H, W, 3] image in [0,1] -> 3-channel [0,1]
    (reference instantstyle.py:47-50)."""
    import cv2

    u8 = (np.clip(np.asarray(image01), 0, 1) * 255).astype(np.uint8)
    edges = cv2.Canny(cv2.cvtColor(u8, cv2.COLOR_RGB2BGR), low, high)
    return np.repeat(edges[..., None], 3, axis=-1).astype(np.float32) / 255.0


@dataclasses.dataclass
class InstantStylePipeline:
    """Params keys: ``unet / vae / controlnet / image_proj``. Text/image
    embeddings are supplied precomputed (SDXL dual encoders + CLIP-vision)."""

    unet: SDUNet
    controlnet: ControlNet
    vae: AutoencoderKL
    image_proj: ImageProjModel
    schedule: DiffusionSchedule
    params: Dict[str, Any]

    @cached_property
    def _decode(self):
        @jax.jit
        def fn(params, latents):
            z = latents / self.vae.config.scaling_factor
            img = self.vae.apply(params["vae"], z, method="decode")
            return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

        return fn

    @cached_property
    def _generate_scan(self):
        @jax.jit
        def fn(params, init_latent, text2, pooled2, time_ids2, ip_tokens2,
               cond_image, sigmas, cfg, cn_scale, ip_scale):
            n_steps = sigmas.shape[0] - 1
            cond2 = jnp.tile(cond_image[None], (2, 1, 1, 1))

            def body(x, i):
                sigma = sigmas[i]
                scaled = euler_scale_model_input(x, sigma)
                inp2 = jnp.tile(scaled, (2, 1, 1, 1))
                t = _sigma_to_t(self.schedule, sigma)
                t2 = jnp.tile(t, (2,))
                down, mid = self.controlnet.apply(
                    params["controlnet"], sample=inp2, timestep=t2,
                    encoder_hidden_states=text2, controlnet_cond=cond2,
                    conditioning_scale=cn_scale,
                    added_text_embeds=pooled2, added_time_ids=time_ids2,
                )
                eps2 = self.unet.apply(
                    params["unet"], sample=inp2, timestep=t2,
                    encoder_hidden_states=text2,
                    added_text_embeds=pooled2, added_time_ids=time_ids2,
                    ip_tokens=ip_tokens2, ip_scale=ip_scale,
                    down_block_residuals=down, mid_block_residual=mid,
                ).astype(jnp.float32)
                e_unc, e_txt = jnp.split(eps2, 2, axis=0)
                eps = e_unc + cfg * (e_txt - e_unc)
                x = euler_discrete_step(x, eps, sigma, sigmas[i + 1])
                return x, None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32),
                                  jnp.arange(n_steps))
            return out

        return fn

    def edit_with_style(
        self,
        content01: jax.Array,        # [H, W, 3] source frame (canny control)
        style_clip_embed: jax.Array,  # [1, D_clip] style image CLIP embedding
        text_embeds2: jax.Array,     # [2, S, 2048]: [uncond, prompt]
        pooled2: jax.Array,          # [2, 1280]
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        ip_scale: float = 1.0,
        controlnet_conditioning_scale: float = 0.6,
        seed: int = 42,
    ) -> jax.Array:
        """Style-transfers the frame; returns [H, W, 3] in [0, 1]."""
        H, W = content01.shape[:2]
        h, w = H // 8, W // 8
        cond = jnp.asarray(canny_map(np.asarray(content01)))

        # ip tokens rows: [uncond (zero clip embed), style]
        ip_cond = self.image_proj.apply(self.params["image_proj"], style_clip_embed)
        ip_unc = self.image_proj.apply(self.params["image_proj"],
                                       jnp.zeros_like(style_clip_embed))
        ip_tokens2 = jnp.concatenate([ip_unc, ip_cond], axis=0)

        time_ids = jnp.asarray([[H, W, 0, 0, H, W]], jnp.float32)
        grid = euler_discrete_grid(self.schedule, num_inference_steps)
        init = (jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, 4),
                                  jnp.float32) * grid.init_noise_sigma)
        out = self._generate_scan(
            self.params, init, text_embeds2, pooled2,
            jnp.tile(time_ids, (2, 1)), ip_tokens2, cond,
            jnp.asarray(grid.sigmas), jnp.float32(guidance_scale),
            jnp.float32(controlnet_conditioning_scale), float(ip_scale),
        )
        return self._decode(self.params, out)[0]


class Resampler(nn.Module):
    """Perceiver resampler for IP-Adapter-Plus variants
    (``ip_adapter/resampler.py:81-147``): learned latents cross-attend to the
    CLIP patch sequence through ``depth`` blocks of (attention over
    concat([image_tokens, latents]) + feed-forward), then project out.

    InstantStyle itself uses the base IPAdapterXL (pooled embed ->
    ImageProjModel); this covers the Plus variants of the reference's
    adapter zoo."""

    dim: int = 1024
    depth: int = 4
    heads: int = 12
    head_dim: int = 64
    num_queries: int = 16
    embedding_dim: int = 1280      # CLIP vision hidden size
    output_dim: int = 2048         # cross_attention_dim
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_tokens: jax.Array) -> jax.Array:
        """[B, S_img, embedding_dim] -> [B, num_queries, output_dim]."""
        b = image_tokens.shape[0]
        inner = self.heads * self.head_dim
        latents = self.param("latents", nn.initializers.normal(1.0 / self.dim**0.5),
                             (self.num_queries, self.dim))
        x = jnp.tile(latents[None], (b, 1, 1)).astype(self.dtype)
        tokens = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(
            image_tokens.astype(self.dtype))
        for i in range(self.depth):
            ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name=f"layers_{i}_norm1")(tokens).astype(self.dtype)
            ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name=f"layers_{i}_norm2")(x).astype(self.dtype)
            kv = jnp.concatenate([ln1, ln2], axis=1)  # reference: kv = [x, latents]
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_to_q")(ln2)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_to_kv_k")(kv)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_to_kv_v")(kv)
            from ..ops.attention import multi_head_attention

            attn = multi_head_attention(q, k, v, heads=self.heads)
            x = x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                             name=f"layers_{i}_to_out")(attn)
            lnf = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name=f"layers_{i}_ff_norm")(x).astype(self.dtype)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_ff_in")(lnf)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                             name=f"layers_{i}_ff_out")(h)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_out")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="norm_out")(x).astype(self.dtype)
