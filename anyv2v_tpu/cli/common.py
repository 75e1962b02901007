"""Shared CLI plumbing: pipeline construction from config, prompt/image
encoding, logging setup — factored out of the two phase drivers (the
reference duplicates this per backbone tree)."""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # every CLI surface re-jits the same scan programs

from ..models.clip import preprocess_clip_image
from ..pipelines.i2vgen import I2VGenPipeline
from ..utils import io as vio
from ..utils.model_zoo import build_i2vgen_pipeline
from ..utils.tokenizer import CLIPTokenizer

logger = logging.getLogger("anyv2v_tpu")


def setup_logging(debug: bool) -> None:
    logging.basicConfig(
        level=logging.DEBUG if debug else logging.INFO,
        format="%(asctime)s - %(levelname)s - [%(funcName)s] - %(message)s",
    )


def build_pipeline_from_config(cfg) -> Tuple[I2VGenPipeline, Optional[CLIPTokenizer]]:
    model = cfg.get("model", {})
    arch = model.get("arch", "i2vgen-xl")
    init = model.get("init", "random")
    dtype = jnp.bfloat16 if model.get("dtype", "bfloat16") == "bfloat16" else jnp.float32
    pipe = build_i2vgen_pipeline(
        arch=arch, init=init, seed=int(cfg.get("seed", 0)), dtype=dtype,
        sample_hw=tuple(cfg.image_size), num_frames=int(cfg.n_frames),
        scheduler_kwargs=dict(model.get("scheduler", {})),
    )
    tok_path = model.get("tokenizer_path")
    tokenizer = None
    if tok_path:
        tokenizer = CLIPTokenizer(
            os.path.join(tok_path, "vocab.json"), os.path.join(tok_path, "merges.txt"),
            max_length=pipe.text_encoder.config.max_position_embeddings,
        )
    return pipe, tokenizer


def encode_prompt(pipe: I2VGenPipeline, tokenizer, prompt: str) -> jnp.ndarray:
    """Prompt -> last_hidden_state. Without a tokenizer (random-weight smoke
    runs), token ids are zeros — documented, deterministic placeholder."""
    n = pipe.text_encoder.config.max_position_embeddings
    if tokenizer is None:
        ids = np.zeros((1, n), np.int64)
    else:
        ids = tokenizer([prompt])
    return pipe.encode_text(jnp.asarray(ids))


def encode_clip_image(pipe: I2VGenPipeline, img: Image.Image, width: int) -> jnp.ndarray:
    """Reference image-embedding preprocessing (``pipeline_i2vgen_xl.py:1051-1055``):
    center-crop to (width, width), bilinear-resize to the CLIP input size,
    normalize, encode."""
    size = pipe.vision_encoder.config.image_size
    cropped = vio.center_crop_wide(img, (width, width))
    resized = vio.resize_bilinear(cropped, (size, size))
    arr = vio.image_to_array01(resized)[None]
    return pipe.encode_image_clip(jnp.asarray(preprocess_clip_image(arr)))


def load_frames_for_config(cfg) -> list:
    """Frames from video_frames_path, else convert video_path
    (``run_group_ddim_inversion.py:127-139``)."""
    size = (int(cfg.image_size[0]), int(cfg.image_size[1]))
    n = int(cfg.n_frames)
    frames_path = cfg.get("video_frames_path", "ReplaceMe")
    if frames_path and frames_path != "ReplaceMe" and os.path.isdir(frames_path):
        return vio.load_video_frames(frames_path, n, size)
    video_path = cfg.get("video_path", "ReplaceMe")
    if video_path and video_path != "ReplaceMe" and os.path.exists(video_path):
        out_dir = os.path.join(cfg.output_dir, "frames")
        vio.convert_video_to_frames(video_path, out_dir, size)
        return vio.load_video_frames(out_dir, n, size)
    raise FileNotFoundError(
        f"neither video_frames_path ({frames_path}) nor video_path ({video_path}) exists"
    )


# canonical implementations live in utils.metrics; re-exported for the CLIs
from ..utils.metrics import psnr  # noqa: E402,F401
