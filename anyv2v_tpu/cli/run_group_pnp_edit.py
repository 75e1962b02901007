"""Batch PnP editing driver — CLI surface of the reference's
``i2vgen-xl/run_group_pnp_edit.py``: loads the inverted-latent cache, blends
with fresh noise by ``random_ratio`` (:124-126), assembles the 3-way CFG
conditioning, runs the jitted PnP sampling scan, and saves mp4/gif/pngs with
the config-derived dirname (:154-184).

Usage:
    python -m anyv2v_tpu.cli.run_group_pnp_edit \
        --template_config configs/group_pnp_edit/template.yaml \
        --configs_json   configs/group_pnp_edit/group_config.json
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..pipelines.i2vgen import PnPConfig
from ..utils import io as vio
from ..utils.config import load_group_configs, load_yaml
from .common import (
    build_pipeline_from_config,
    encode_clip_image,
    encode_prompt,
    load_frames_for_config,
    setup_logging,
)

logger = logging.getLogger("anyv2v_tpu.pnp_edit")


def edit_one(pipe, tokenizer, cfg):
    n_frames = int(cfg.n_frames)
    n_steps = int(cfg.n_steps)
    t_idx = int(cfg.ddim_init_latents_t_idx)

    frames = load_frames_for_config(cfg)
    src_1st = frames[0]
    edited_1st = Image.open(cfg.edited_first_frame_path).convert("RGB")
    if edited_1st.size != src_1st.size:
        edited_1st = vio.center_crop_wide(edited_1st, src_1st.size)

    traj_np, inv_ts = vio.load_ddim_trajectory(cfg.ddim_latents_path)
    traj = jnp.asarray(traj_np)

    # conditioning rows (reference pipeline_i2vgen_xl.py:1040-1094):
    # text: [ddim_inv_prompt, negative, edit]; image: [src, edited, edited]
    text_all = jnp.concatenate([
        encode_prompt(pipe, tokenizer, cfg.get("ddim_inv_prompt", "")),
        encode_prompt(pipe, tokenizer, cfg.get("editing_negative_prompt", "")),
        encode_prompt(pipe, tokenizer, cfg.editing_prompt),
    ])
    img_lat_src = pipe.prepare_image_latents(
        jnp.asarray(vio.image_to_array01(src_1st)), n_frames)
    img_lat_edit = pipe.prepare_image_latents(
        jnp.asarray(vio.image_to_array01(edited_1st)), n_frames)
    img_lat_all = jnp.concatenate([img_lat_src, img_lat_edit, img_lat_edit])
    width = int(cfg.image_size[0])
    img_emb_src = encode_clip_image(pipe, src_1st, width)
    img_emb_edit = encode_clip_image(pipe, edited_1st, width)
    img_emb_all = jnp.concatenate([img_emb_src, img_emb_edit, img_emb_edit])

    # init latent: cached at timesteps[t_idx], optionally blended with noise
    from ..schedulers import sampling_timesteps

    start_t = int(sampling_timesteps(pipe.schedule, n_steps)[t_idx])
    row = int(np.where(inv_ts == start_t)[0][0])
    init_latent = traj[row].astype(jnp.float32)
    r = float(cfg.get("random_ratio", 0.0))
    if r > 0.0:
        noise = jax.random.normal(jax.random.PRNGKey(int(cfg.get("seed", 0))),
                                  init_latent.shape, jnp.float32)
        init_latent = r * noise + (1.0 - r) * init_latent  # reference :124-126

    out_latents = pipe.sample_with_pnp(
        traj, inv_ts,
        text_embeds_all=text_all,
        image_latents_all=img_lat_all,
        image_embeds_all=img_emb_all,
        num_inference_steps=n_steps,
        t_idx=t_idx,
        guidance_scale=float(cfg.cfg),
        pnp=PnPConfig(
            conv=float(cfg.get("pnp_f_t", 0.2)),
            spatial=float(cfg.get("pnp_spatial_attn_t", 0.2)),
            temporal=float(cfg.get("pnp_temp_attn_t", 0.5)),
        ),
        fps=int(cfg.get("target_fps", 8)),
        init_latent=init_latent,
    )
    video = np.asarray(pipe.decode_latents(out_latents))

    os.makedirs(cfg.output_dir, exist_ok=True)
    stem = (
        f"cfg_{cfg.cfg}_steps_{n_steps}_tidx_{t_idx}"
        f"_pnpf_{cfg.get('pnp_f_t', 0.2)}_pnps_{cfg.get('pnp_spatial_attn_t', 0.2)}"
        f"_pnpt_{cfg.get('pnp_temp_attn_t', 0.5)}"
    )
    fps = int(cfg.get("target_fps", 8))
    vio.save_video(video, os.path.join(cfg.output_dir, stem + ".mp4"), fps=fps)
    vio.save_video(video, os.path.join(cfg.output_dir, stem + ".gif"), fps=fps)
    vio.save_frames(video, os.path.join(cfg.output_dir, stem + "_frames"))
    logger.info("saved edited video to %s/%s.mp4", cfg.output_dir, stem)
    return video


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--template_config", type=str,
                        default="configs/group_pnp_edit/template.yaml")
    parser.add_argument("--configs_json", type=str,
                        default="configs/group_pnp_edit/group_config.json")
    args = parser.parse_args(argv)

    template = load_yaml(args.template_config)
    setup_logging(bool(template.get("debug", False)))
    configs = load_group_configs(args.template_config, args.configs_json)
    logger.info("loaded %d active configs", len(configs))

    pipe = tokenizer = None
    for cfg in configs:
        # config-sanity scan (reference run_group_pnp_edit.py:90-93 logs
        # ReplaceMe placeholders but *continues* due to a loop-scoped
        # `continue` bug; we abort the entry as clearly intended — for the
        # keys that are actually required. video_path/video_frames_path are
        # alternatives: only one must be set.
        required = ["video_name", "edited_video_name", "editing_prompt",
                    "edited_first_frame_path"]
        bad = [k for k in required if cfg.get(k) == "ReplaceMe"]
        if (cfg.get("video_path") == "ReplaceMe"
                and cfg.get("video_frames_path") == "ReplaceMe"):
            bad.append("video_path|video_frames_path")
        if bad:
            logger.error("skipping entry with unresolved placeholders: %s", bad)
            continue
        if pipe is None:
            pipe, tokenizer = build_pipeline_from_config(cfg)
        edit_one(pipe, tokenizer, cfg)


if __name__ == "__main__":
    main()
