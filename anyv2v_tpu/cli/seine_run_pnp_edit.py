"""SEINE PnP editing driver — CLI surface of the reference's
``seine/run_pnp_edit.py`` (:45-419): single YAML + dotlist; loads the saved
inversion trajectory, builds masked-video conditioning from the EDITED first
frame for the edit branches and the SOURCE first frame for the injection
branch (:174-219), DDPM sampler with the cache looked up at t+1 (:180),
cfg_scale 4, four PnP threshold families incl. cross-attention (:221-254).

Usage:
    python -m anyv2v_tpu.cli.seine_run_pnp_edit \
        --config configs/seine/pnp_edit.yaml prompt="a cat" ...
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..pipelines.seine import SeinePnPConfig
from ..utils import io as vio
from ..utils.config import from_dotlist, load_yaml, merge, resolve
from .common import load_frames_for_config, setup_logging
from .seine_run_ddim_inversion import build_pipeline, encode_prompt

logger = logging.getLogger("anyv2v_tpu.seine.pnp_edit")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/seine/pnp_edit.yaml")
    parser.add_argument("optional_args", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = load_yaml(args.config)
    if args.optional_args:
        cfg = merge(cfg, from_dotlist(args.optional_args))
    cfg = resolve(cfg)
    setup_logging(bool(cfg.get("debug", False)))

    pipe, tokenizer = build_pipeline(cfg)

    if "video_path" not in cfg and "src_video_path" in cfg:
        cfg["video_path"] = cfg["src_video_path"]
    n_frames = int(cfg.get("n_frames", 16))
    cfg.setdefault("n_frames", n_frames)
    frames = load_frames_for_config(cfg)[:n_frames]
    frames01 = vio.frames_to_array01(frames)
    size = (int(cfg.image_size[0]), int(cfg.image_size[1]))

    edited = Image.open(cfg.edited_first_frame_path).convert("RGB").resize(
        size, Image.LANCZOS)
    edited01 = np.asarray(edited, np.float32) / 255.0

    # trajectory from the inversion phase (resolves the run dir like the
    # reference globs the max-nframes run, :143-160 — here the dir is direct)
    traj, traj_ts = vio.load_ddim_trajectory(cfg.ddim_inversion_dir)
    traj = jnp.asarray(traj)

    mask, masked_src = pipe.build_masked_inputs(jnp.asarray(frames01[0]), n_frames)
    _, masked_edit = pipe.build_masked_inputs(jnp.asarray(edited01), n_frames)

    # text rows [inv, cond, uncond] (run_pnp_edit.py:319-323)
    inv_prompt = cfg.get("inversion_prompt", "")
    text_inv = encode_prompt(pipe, tokenizer, inv_prompt)
    text_cond = encode_prompt(pipe, tokenizer, cfg.get("prompt", ""))
    text_unc = encode_prompt(pipe, tokenizer, cfg.get("negative_prompt", ""))
    text_all = jnp.concatenate([text_inv, text_cond, text_unc])

    pnp = SeinePnPConfig(
        conv=float(cfg.get("pnp_f_t", 0.2)),
        spatial=float(cfg.get("pnp_spatial_attn_t", 0.2)),
        temporal=float(cfg.get("pnp_temp_attn_t", 0.5)),
        cross=float(cfg.get("pnp_cross_attn_t", 0.0)),
    ) if bool(cfg.get("enable_pnp", True)) else SeinePnPConfig(0, 0, 0, 0)

    out = pipe.sample_with_pnp(
        traj, traj_ts, text_all, mask, masked_edit, masked_src,
        num_inference_steps=int(cfg.get("n_steps", 50)),
        cfg_scale=float(cfg.get("cfg_scale", 4.0)),
        sampler=str(cfg.get("sample_method", "ddpm")),
        pnp=pnp,
        key=jax.random.PRNGKey(int(cfg.get("seed", 1))),
    )
    video = np.asarray(pipe.decode_latents(out))
    out_dir = cfg.output_dir
    os.makedirs(out_dir, exist_ok=True)
    vio.save_video(video, os.path.join(out_dir, "edited_video.mp4"), fps=8)
    vio.save_video(video, os.path.join(out_dir, "edited_video.gif"), fps=8)
    vio.save_frames(video, os.path.join(out_dir, "frames"))
    logger.info("saved edited video to %s", out_dir)


if __name__ == "__main__":
    main()
