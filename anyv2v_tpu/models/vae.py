"""AutoencoderKL (SD-family VAE) in flax, channels-last, frame-parallel.

Rebuilds the diffusers ``AutoencoderKL`` all three reference backbones load
from their HF checkpoints (SURVEY.md §2.9 item 4). The reference encodes and
decodes video *frame by frame in Python loops*
(``pipeline_i2vgen_xl.py:565-592`` encode, ``:443-456`` chunked decode,
``pipeline_video_editing.py:358-361`` per-frame decode); here frames are just
a batch axis — vmapped compute, shardable over the mesh's frame axis — so
tiling/slicing/chunk knobs are subsumed.

Standard SD VAE config: 128-base channels, multipliers (1,2,4,4), 2 layers
per block, mid-block self-attention, 4-channel diagonal-Gaussian latent,
spatial downscale 8 (``vae_scale_factor = 2**(len(block_out_channels)-1)``,
reference ``pipeline_i2vgen_xl.py:176``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Attention, Downsample2D, ResnetBlock2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.bfloat16


class _MidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock2D(self.channels, groups=self.groups, eps=1e-6, dtype=self.dtype, name="resnet_0")(x)
        # single-head self-attention over pixels (diffusers VAE mid attention)
        b, h, w, c = x.shape
        hnorm = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="attn_norm")(x)
        tokens = hnorm.reshape(b, h * w, c).astype(self.dtype)
        attn = Attention(heads=1, head_dim=c, out_dim=c, qkv_bias=True, dtype=self.dtype,
                         name="attn")(tokens)
        x = x + attn.reshape(b, h, w, c)
        x = ResnetBlock2D(self.channels, groups=self.groups, eps=1e-6, dtype=self.dtype, name="resnet_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt, name="conv_in")(
            x.astype(dt)
        )
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, eps=1e-6, dtype=dt,
                                  name=f"down_{i}_resnet_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample pads (0,1,0,1), not symmetric
                x = Downsample2D(ch, dtype=dt, asymmetric_pad=True,
                                 name=f"down_{i}_downsample")(x)
        x = _MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups, dt, name="mid")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(dt)
        # 2*latent: mean and logvar of the diagonal gaussian
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)
        x = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=dt, name="quant_conv")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        rev = tuple(reversed(cfg.block_out_channels))  # (512, 512, 256, 128)
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=dt, name="post_quant_conv")(z.astype(dt))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        x = _MidBlock(rev[0], cfg.norm_num_groups, dt, name="mid")(x)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, eps=1e-6, dtype=dt,
                                  name=f"up_{i}_resnet_{j}")(x)
            if i < len(rev) - 1:
                x = Upsample2D(ch, dtype=dt, name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(dt)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """encode: [N, H, W, 3] -> moments [N, H/8, W/8, 8]; decode the reverse.

    ``N`` is any flat batch (video frames fold in); scaling by
    ``config.scaling_factor`` is the caller's job, matching the reference
    pipelines which multiply/divide explicitly."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)

    def encode_moments(self, images: jax.Array) -> jax.Array:
        return self.encoder(images)

    def decode(self, latents: jax.Array) -> jax.Array:
        return self.decoder(latents)

    def __call__(self, images: jax.Array, sample_key: Optional[jax.Array] = None):
        moments = self.encode_moments(images)
        z = sample_from_moments(moments, sample_key)
        return self.decode(z)


def sample_from_moments(moments: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
    """Diagonal-gaussian sample (or mode when key is None).

    The reference samples at encode time (``.latent_dist.sample()``,
    ``pipeline_i2vgen_xl.py:540``); deterministic mode is what inversion wants
    for reproducibility and is the default here.
    """
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    return mean + (std * jax.random.normal(key, mean.shape, jnp.float32)).astype(mean.dtype)
