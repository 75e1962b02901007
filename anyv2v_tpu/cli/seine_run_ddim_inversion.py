"""SEINE DDIM inversion driver — CLI surface of the reference's
``seine/run_ddim_inversion.py`` (:61-329): single YAML config + dotlist
overrides, 500-step inversion with latents saved on a 250-step sub-grid,
masked-video (first1) conditioning, always-on reconstruction pass, and
``inversion_prompts.yaml`` + ``config.yaml`` provenance files (:320-329).

Usage:
    python -m anyv2v_tpu.cli.seine_run_ddim_inversion \
        --config configs/seine/ddim_inversion.yaml exp_name=run1 ...
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from ..utils import io as vio
from ..utils.config import from_dotlist, load_yaml, merge, resolve, to_yaml
from ..utils.model_zoo import build_seine_pipeline
from ..utils.tokenizer import CLIPTokenizer
from .common import load_frames_for_config, psnr, setup_logging

logger = logging.getLogger("anyv2v_tpu.seine.inversion")


def build_pipeline(cfg):
    model = cfg.get("model", {})
    dtype = jnp.bfloat16 if model.get("dtype", "bfloat16") == "bfloat16" else jnp.float32
    scheduler = dict(model.get("scheduler", {}))
    # reference schedule knobs live at the config top level
    # (seine/configs/ddim_inversion.yaml:26-28)
    for k in ("beta_start", "beta_end", "beta_schedule"):
        if k in cfg:
            scheduler[k] = cfg[k]
    pipe = build_seine_pipeline(
        arch=model.get("arch", "seine"), init=model.get("init", "random"),
        seed=int(cfg.get("seed", 1)), dtype=dtype, scheduler_kwargs=scheduler,
    )
    tok_path = model.get("tokenizer_path")
    tokenizer = None
    if tok_path:
        tokenizer = CLIPTokenizer(
            os.path.join(tok_path, "vocab.json"), os.path.join(tok_path, "merges.txt"),
            max_length=pipe.text_encoder.config.max_position_embeddings,
        )
    return pipe, tokenizer


def encode_prompt(pipe, tokenizer, prompt: str):
    n = pipe.text_encoder.config.max_position_embeddings
    ids = np.zeros((1, n), np.int64) if tokenizer is None else tokenizer([prompt])
    return pipe.encode_text(jnp.asarray(ids))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/seine/ddim_inversion.yaml")
    parser.add_argument("optional_args", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = load_yaml(args.config)
    if args.optional_args:
        cfg = merge(cfg, from_dotlist(args.optional_args))
    cfg = resolve(cfg)
    setup_logging(bool(cfg.get("debug", False)))

    pipe, tokenizer = build_pipeline(cfg)
    # reference key names: src_video_path / n_frame_to_invert
    if "video_path" not in cfg and "src_video_path" in cfg:
        cfg["video_path"] = cfg["src_video_path"]
    if "n_frames" not in cfg:
        cfg["n_frames"] = cfg.get("n_frame_to_invert", 16)
    frames = load_frames_for_config(cfg)
    n_frames = int(cfg.get("n_frame_to_invert", len(frames)))
    frames = frames[:n_frames]
    frames01 = vio.frames_to_array01(frames)

    latents = pipe.encode_video(jnp.asarray(frames01))
    mask, masked = pipe.build_masked_inputs(jnp.asarray(frames01[0]), n_frames)
    prompt = cfg.get("inversion_prompt", "")
    text = encode_prompt(pipe, tokenizer, prompt)

    chunk = cfg.get("chunk_steps", None)  # scan-dispatch segment length
    traj, traj_ts = pipe.invert(
        latents, mask, masked, text,
        num_inversion_steps=int(cfg.n_steps),
        num_save_steps=int(cfg.get("n_save_steps", 250)),
        chunk_steps=int(chunk) if chunk is not None else None,
    )
    out_dir = cfg.output_dir
    vio.save_ddim_trajectory(out_dir, np.asarray(traj), traj_ts)
    logger.info("saved %d/%d-step trajectory to %s", len(traj_ts),
                int(cfg.n_steps), out_dir)

    # provenance files (reference run_ddim_inversion.py:320-329)
    with open(os.path.join(out_dir, "inversion_prompts.yaml"), "w") as f:
        f.write(to_yaml({"inversion_prompt": prompt}))
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        f.write(to_yaml(dict(cfg)))

    # reconstruction (the reference always resamples, :278-288)
    if bool(cfg.get("enable_recon", True)):
        from ..pipelines.seine import SeinePnPConfig

        text3 = jnp.concatenate([text, text, text])
        # the recon grid must lie inside the save grid: 50 steps over the
        # 250-step save grid in the reference; generally a divisor of
        # n_save_steps
        n_save = int(cfg.get("n_save_steps", 250))
        n_recon = 50 if n_save % 50 == 0 else n_save
        out = pipe.sample_with_pnp(
            traj, traj_ts, text3, mask, masked, masked,
            num_inference_steps=n_recon,
            cfg_scale=1.0, sampler="ddim",
            pnp=SeinePnPConfig(0.0, 0.0, 0.0, 0.0),  # plain resample
        )
        video = np.asarray(pipe.decode_latents(out))
        vio.save_video(video, os.path.join(out_dir, "ddim_reconstruction.mp4"), fps=8)
        source = np.asarray(pipe.decode_latents(latents))
        p = psnr(video, source)
        logger.info("reconstruction PSNR vs source decode: %.2f dB", p)
        min_psnr = cfg.get("min_psnr", None)
        if min_psnr is not None and p < float(min_psnr):
            raise RuntimeError(
                f"reconstruction PSNR {p:.2f} dB below the min_psnr gate "
                f"{float(min_psnr):.2f} dB")


if __name__ == "__main__":
    main()
