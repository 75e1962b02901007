"""Pipeline construction from config: model sizes, params sources.

The reference builds pipelines with HF ``from_pretrained`` downloads
(``run_group_ddim_inversion.py:82-87``). This environment has no network, so
params come from one of:

- ``init: random`` — seeded random init at the configured architecture
  (smoke tests, benchmarks, demo runs without weights);
- ``init: <path>.npz`` — a converted checkpoint saved by
  ``save_params`` / ``load_params`` below;
- torch/safetensors checkpoints via :mod:`anyv2v_tpu.utils.convert` (CLIP
  conversion is complete; UNet/VAE converters land with real-weight support).
"""

from __future__ import annotations

import io as _io
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextConfig, CLIPTextModel, CLIPVisionConfig, CLIPVisionModel
from ..models.unet_i2vgen import I2VGenUNet, I2VGenUNetConfig
from ..models.vae import AutoencoderKL, VAEConfig
from ..pipelines.i2vgen import I2VGenPipeline
from ..schedulers import make_schedule


# i2vgen-xl production architecture (ali-vilab/i2vgen-xl)
I2VGEN_XL = dict(
    unet=I2VGenUNetConfig(),
    vae=VAEConfig(),
    text=CLIPTextConfig(),
    vision=CLIPVisionConfig(),
)

# small-but-structured config for smoke runs / CI (x8 VAE, full block zoo)
I2VGEN_TINY = dict(
    unet=I2VGenUNetConfig(
        block_out_channels=(16, 32, 32, 32),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=8,
        norm_num_groups=8,
        num_image_context_tokens=2,
        pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
        pnp_conv_target=(1, 1),
    ),
    vae=VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                  norm_num_groups=8),
    text=CLIPTextConfig(vocab_size=49408, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, projection_dim=None),
    vision=CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                            num_heads=4, image_size=224, patch_size=32,
                            projection_dim=32),
)

ARCHS = {"i2vgen-xl": I2VGEN_XL, "i2vgen-tiny": I2VGEN_TINY}


def _override_dtype(cfg, dtype):
    import dataclasses

    return dataclasses.replace(cfg, dtype=dtype)


def build_i2vgen_pipeline(
    arch: str = "i2vgen-xl",
    init: str = "random",
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    sample_hw: Tuple[int, int] = (512, 512),
    num_frames: int = 16,
    scheduler_kwargs: Dict[str, Any] | None = None,
) -> I2VGenPipeline:
    spec = ARCHS[arch]
    unet_cfg = _override_dtype(spec["unet"], dtype)
    vae_cfg = _override_dtype(spec["vae"], dtype)
    text_cfg = spec["text"]
    vision_cfg = spec["vision"]

    unet = I2VGenUNet(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(text_cfg)
    vision = CLIPVisionModel(vision_cfg)

    if init == "random":
        params = _random_params(unet, vae, text, vision, text_cfg, vision_cfg,
                                seed, sample_hw, num_frames)
    elif os.path.exists(init):
        params = load_params(init)
    else:
        raise ValueError(f"unknown init: {init}")

    schedule = make_schedule(**(scheduler_kwargs or {}))
    return I2VGenPipeline(
        unet=unet, vae=vae, text_encoder=text, vision_encoder=vision,
        schedule=schedule, params=params,
    )


def _random_params(unet, vae, text, vision, text_cfg, vision_cfg, seed,
                   sample_hw, num_frames):
    h, w = sample_hw[0] // 8, sample_hw[1] // 8
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # tiny shapes are enough to materialize params (shape-polymorphic apply)
    f = min(num_frames, 2)
    unet_args = dict(
        sample=jnp.zeros((1, f, 16, 16, 4)),
        timestep=jnp.int32(0),
        encoder_hidden_states=jnp.zeros((1, 4, text_cfg.hidden_size
                                         if text_cfg.projection_dim is None
                                         else text_cfg.hidden_size)),
        fps=jnp.int32(8),
        image_latents=jnp.zeros((1, f, 16, 16, 4)),
        image_embeddings=jnp.zeros((1, 1, vision_cfg.projection_dim)),
    )
    return {
        "unet": unet.init(k1, **unet_args),
        "vae": vae.init(k2, jnp.zeros((1, 64, 64, 3))),
        "text": text.init(k3, jnp.zeros((1, 4), jnp.int32)),
        "vision": vision.init(
            k4, jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3))
        ),
    }


def save_params(path: str, params) -> None:
    """Flat-key npz save of a params tree."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params(path: str):
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for name in data.files:
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[name])
    return tree
