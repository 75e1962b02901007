"""First-frame editing CLI — parity with the reference ``edit_image.py``.

Reference surface (``/root/reference/edit_image.py:66-148``):
    python -m anyv2v_tpu.cli.edit_image --model {magicbrush,instructpix2pix,cosxl}
        --video_path V | --dict_file J --input_dir D
        [--output_dir O] [--prompt P] [--force_512] [--seed N]
        [--negative_prompt S]

Behavior parity:
- edits ONLY the first frame of the video; saves ``<output_dir>/<prompt>.png``;
- skip-if-exists unless --overwrite;
- default negative prompt matches the reference (:81);
- --dict_file batch mode: {"video.mp4": [{"image_model": ..., "instruction":
  ...}, ...]} with per-entry model selection (:85-123).

Framework additions (offline environment): --arch selects a registered
architecture ('-tiny' for CI), --init loads a converted ``.npz`` checkpoint,
--tokenizer_path points at a CLIP vocab/merges pair (without it, prompt ids
are zeros — random-weight smoke only). Video decode uses imageio (moviepy is
not in the image).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np
from PIL import Image

logger = logging.getLogger("anyv2v_tpu.edit_image")

DEFAULT_NEGATIVE = ("worst quality, normal quality, low quality, low res, "
                    "blurry, watermark, jpeg artifacts")


def read_first_frame(video_path: str) -> Image.Image:
    """First frame of an mp4 (OpenCV — no ffmpeg binary in this image),
    gif/png (imageio/PIL), or a %05d.png frames dir."""
    if os.path.isdir(video_path):
        frames = sorted(f for f in os.listdir(video_path) if f.endswith(".png"))
        if not frames:
            raise FileNotFoundError(f"no frames in {video_path}")
        return Image.open(os.path.join(video_path, frames[0])).convert("RGB")
    if video_path.endswith((".png", ".jpg", ".jpeg", ".gif")):
        return Image.open(video_path).convert("RGB")
    import cv2

    cap = cv2.VideoCapture(video_path)
    ok, frame = cap.read()
    cap.release()
    if not ok:
        raise IOError(f"could not read first frame of {video_path}")
    return Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))


def build_model(model_name: str, arch_suffix: str, init: str, seed: int):
    from ..utils.model_zoo import build_image_edit_pipeline

    arch = model_name + arch_suffix
    return build_image_edit_pipeline(arch, init=init, seed=seed)


def _encode_prompt_rows(pipe, tokenizer, prompt: str, negative: str):
    import jax.numpy as jnp

    n = pipe.text_encoder.config.max_position_embeddings
    if tokenizer is None:
        ids = np.zeros((2, n), np.int64)
    else:
        ids = tokenizer([prompt, negative])
    hidden = pipe.encode_text(jnp.asarray(ids))
    # rows [prompt, negative, negative] (diffusers ip2p CFG layout)
    return jnp.concatenate([hidden[:1], hidden[1:2], hidden[1:2]], axis=0)


def infer_video(model, video_path: str, output_dir: str, prompt: str,
                tokenizer=None, force_512: bool = False, seed: int = 42,
                negative_prompt: str = "", overwrite: bool = False,
                num_inference_steps: int = 100) -> str:
    """Reference ``edit_image.infer_video`` (:10-64): first frame only."""
    import jax.numpy as jnp

    os.makedirs(output_dir, exist_ok=True)
    result_path = os.path.join(output_dir, prompt + ".png")
    if os.path.exists(result_path) and not overwrite:
        logger.info("Result already exists: %s", result_path)
        return result_path

    pil = read_first_frame(video_path)
    orig_size = pil.size
    if force_512:
        pil = pil.resize((512, 512), Image.LANCZOS)
    image01 = jnp.asarray(np.asarray(pil, np.float32) / 255.0)

    from ..pipelines.image_edit import CosXLEditPipeline

    if isinstance(model, CosXLEditPipeline):
        # SDXL dual-encoder embeds: without loaded encoders, zeros (smoke)
        D = model.unet.config.cross_attention_dim
        pooled_dim = (model.unet.config.projection_class_embeddings_input_dim
                      - 6 * model.unet.config.addition_time_embed_dim)
        text3 = jnp.zeros((3, 77, D), jnp.float32)
        pooled3 = jnp.zeros((3, pooled_dim), jnp.float32)
        out = model.edit(image01, text3, pooled3, seed=seed,
                         num_inference_steps=min(num_inference_steps, 20),
                         guidance_scale=7.0)
    else:
        text3 = _encode_prompt_rows(model, tokenizer, prompt, negative_prompt)
        out = model.edit(image01, text3, num_inference_steps=num_inference_steps,
                         guidance_scale=7.5, image_guidance_scale=1.5, seed=seed)

    result = Image.fromarray((np.asarray(out) * 255).astype(np.uint8))
    if force_512:
        result = result.resize(orig_size, Image.LANCZOS)
    result.save(result_path)
    logger.info("Processed and saved the first frame: %s", result_path)
    return result_path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="First-frame image editing")
    parser.add_argument("--model", type=str, default="instructpix2pix",
                        choices=["magicbrush", "instructpix2pix", "cosxl"])
    parser.add_argument("--video_path", type=str, default=None)
    parser.add_argument("--input_dir", type=str, default="./demo/")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--prompt", type=str,
                        default="turn the man into darth vader")
    parser.add_argument("--force_512", action="store_true")
    parser.add_argument("--dict_file", type=str, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--negative_prompt", type=str, default=None)
    parser.add_argument("--overwrite", action="store_true")
    # framework additions
    parser.add_argument("--arch_suffix", type=str, default="",
                        help="'-tiny' selects the CI architecture")
    parser.add_argument("--init", type=str, default="random",
                        help="'random' or path to a converted .npz checkpoint")
    parser.add_argument("--tokenizer_path", type=str, default=None)
    parser.add_argument("--num_inference_steps", type=int, default=100)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    negative = (DEFAULT_NEGATIVE if args.negative_prompt is None
                else args.negative_prompt)

    tokenizer = None
    if args.tokenizer_path:
        from ..utils.tokenizer import CLIPTokenizer

        tokenizer = CLIPTokenizer(
            os.path.join(args.tokenizer_path, "vocab.json"),
            os.path.join(args.tokenizer_path, "merges.txt"))

    if args.dict_file:
        with open(args.dict_file) as f:
            folders_info = json.load(f)
        for video_name, video_infos in folders_info.items():
            video_path = os.path.join(args.input_dir, video_name)
            for info in video_infos:
                model_name = info.get("image_model", args.model)
                prompt = info.get("instruction") or info.get("target_caption")
                if prompt is None:
                    continue
                model = build_model(model_name, args.arch_suffix, args.init,
                                    args.seed)
                out_dir = args.output_dir or os.path.dirname(video_path)
                infer_video(model, video_path, out_dir, prompt, tokenizer,
                            args.force_512, args.seed, negative,
                            args.overwrite, args.num_inference_steps)
    else:
        model = build_model(args.model, args.arch_suffix, args.init, args.seed)
        out_dir = args.output_dir or os.path.dirname(args.video_path)
        infer_video(model, args.video_path, out_dir, args.prompt, tokenizer,
                    args.force_512, args.seed, negative, args.overwrite,
                    args.num_inference_steps)


if __name__ == "__main__":
    main()


def infer_video_style(model, video_path: str, output_dir: str,
                      style_image_path: str, prompt: str = "masterpiece, best quality, high quality",
                      style_clip_embed=None, text_embeds2=None, pooled2=None,
                      seed: int = 42, overwrite: bool = False,
                      num_inference_steps: int = 30) -> str:
    """First-frame style transfer (reference ``black_box_image_edit/utils.py
    :142-173`` infer_video_style): canny of the source first frame controls
    structure, the style image's CLIP embedding drives the IP-Adapter.

    Without loaded encoders (offline smoke), embeddings default to zeros;
    real runs pass precomputed SDXL/CLIP-vision embeddings."""
    import jax.numpy as jnp

    os.makedirs(output_dir, exist_ok=True)
    result_path = os.path.join(output_dir, prompt + ".png")
    if os.path.exists(result_path) and not overwrite:
        logger.info("Result already exists: %s", result_path)
        return result_path

    first = read_first_frame(video_path)
    content01 = jnp.asarray(np.asarray(first, np.float32) / 255.0)
    D = model.unet.config.cross_attention_dim
    pd = (model.unet.config.projection_class_embeddings_input_dim
          - 6 * model.unet.config.addition_time_embed_dim)
    clip_dim = model.params["image_proj"]["params"]["proj"]["kernel"].shape[0]
    if style_clip_embed is None:
        style_clip_embed = jnp.zeros((1, clip_dim))
    if text_embeds2 is None:
        text_embeds2 = jnp.zeros((2, 77, D))
    if pooled2 is None:
        pooled2 = jnp.zeros((2, pd))
    out = model.edit_with_style(content01, style_clip_embed, text_embeds2,
                                pooled2, num_inference_steps=num_inference_steps,
                                seed=seed)
    Image.fromarray((np.asarray(out) * 255).astype(np.uint8)).save(result_path)
    logger.info("Processed and saved the styled first frame: %s", result_path)
    return result_path
