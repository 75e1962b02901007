"""CLIP text and vision encoders in flax (HF-compatible).

The reference consumes CLIP through transformers (`CLIPTextModel` for prompt
embeds — ``pipeline_i2vgen_xl.py:224`` ``encode_prompt``; and
``CLIPVisionModelWithProjection`` for the i2vgen-xl conditioning-image
embedding — ``:411`` ``_encode_image``). Rebuilt here with the exact HF
computation graph so torch checkpoints convert 1:1 (golden-tested against
transformers with random weights in ``tests/test_clip.py``).

Text encoder uses a causal mask and pools at the EOS position; vision encoder
is a ViT with class token and pre/post layernorm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"       # "quick_gelu" for OpenAI ViT-L models
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    hidden_act: str = "gelu"
    projection_dim: int = 1024
    dtype: jnp.dtype = jnp.float32


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class _CLIPAttention(nn.Module):
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool) -> jax.Array:
        b, s, d = x.shape
        dh = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, self.heads, dh)
        k = k.reshape(b, s, self.heads, dh)
        v = v.reshape(b, s, self.heads, dh)
        out = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
        out = out.reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class _CLIPLayer(nn.Module):
    heads: int
    intermediate_size: int
    hidden_act: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x).astype(self.dtype)
        x = x + _CLIPAttention(self.heads, self.dtype, name="self_attn")(h, causal)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, pooled, projected?) like HF.

    Pooling takes the hidden state at the EOS position (HF pools at
    ``input_ids == eos_token_id`` argmax; we use the first EOS occurrence)."""

    config: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 penultimate: bool = False) -> Tuple[jax.Array, jax.Array]:
        """``penultimate=True`` returns the hidden state BEFORE the last layer
        (HF ``hidden_states[-2]``, no final layer norm) as the first output —
        what SDXL's dual text encoders feed the UNet (clip_skip semantics).
        The pooled/projected output always comes from the full stack."""
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = tok + pos[None, :s].astype(cfg.dtype)
        hidden_penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                hidden_penultimate = x
            x = _CLIPLayer(cfg.num_heads, cfg.intermediate_size, cfg.hidden_act,
                           cfg.dtype, name=f"layers_{i}")(x, causal=True)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x).astype(cfg.dtype)

        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                              name="text_projection")(pooled)
        hidden = hidden_penultimate if penultimate else x
        return hidden, pooled


class CLIPVisionModel(nn.Module):
    """Returns (last_hidden_state, image_embeds) — ``image_embeds`` is the
    post-layernormed class token through ``visual_projection``, i.e. HF's
    ``CLIPVisionModelWithProjection().image_embeds``. Input is channels-last
    [B, H, W, 3], already CLIP-normalized."""

    config: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixel_values: jax.Array,
                 penultimate: bool = False) -> Tuple[jax.Array, jax.Array]:
        """``penultimate=True`` returns the hidden state BEFORE the last
        layer (HF ``hidden_states[-2]``, no final norm) as the first output
        — what the IP-Adapter Plus/Full variants feed their projection
        (``ip_adapter/ip_adapter.py:352``). ``image_embeds`` always comes
        from the full stack."""
        cfg = self.config
        b = pixel_values.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            use_bias=False,
            dtype=cfg.dtype,
            name="patch_embedding",
        )(pixel_values.astype(cfg.dtype))
        patches = patches.reshape(b, n_patches, cfg.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)).astype(cfg.dtype), patches], axis=1)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_patches + 1, cfg.hidden_size),
        )
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layrnorm")(x).astype(cfg.dtype)
        hidden_penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                hidden_penultimate = x
            x = _CLIPLayer(cfg.num_heads, cfg.intermediate_size, cfg.hidden_act,
                           cfg.dtype, name=f"layers_{i}")(x, causal=False)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_layernorm")(
            x[:, 0]
        ).astype(cfg.dtype)
        image_embeds = nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                                name="visual_projection")(pooled)
        return (hidden_penultimate if penultimate else x), image_embeds


# CLIP image preprocessing constants (transformers CLIPImageProcessor)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_clip_image(images01: jax.Array) -> jax.Array:
    """[N, 224, 224, 3] in [0, 1] -> CLIP-normalized."""
    return (images01 - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
