"""ConsistI2V PnP editing driver — CLI surface of the reference's
``consisti2v/run_pnp_edit.py``: single YAML + dotlist, dual text/image CFG
(cfg_txt 35, cfg_img 1.0 defaults), blend_ratio noise mixing, pnp thresholds
0.2/0.2/0.5 (``configs/pipeline_512/pnp_edit.yaml``).

Usage:
    python -m anyv2v_tpu.cli.consisti2v_run_pnp_edit \
        --config configs/consisti2v/pnp_edit.yaml editing_prompt="..." ...
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..pipelines.consisti2v import guidance_mode
from ..pipelines.i2vgen import PnPConfig
from ..utils import io as vio
from ..utils.config import from_dotlist, load_yaml, merge, resolve
from .common import load_frames_for_config, setup_logging
from .consisti2v_run_ddim_inversion import build_pipeline, encode_prompt

logger = logging.getLogger("anyv2v_tpu.consisti2v.pnp_edit")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/consisti2v/pnp_edit.yaml")
    parser.add_argument("optional_args", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = load_yaml(args.config)
    if args.optional_args:
        cfg = merge(cfg, from_dotlist(args.optional_args))
    cfg = resolve(cfg)
    setup_logging(bool(cfg.get("debug", False)))

    pipe, tokenizer = build_pipeline(cfg)
    frames = load_frames_for_config(cfg)
    src_1st = frames[0]
    edited_1st = Image.open(cfg.edited_first_frame_path).convert("RGB")
    if edited_1st.size != src_1st.size:
        edited_1st = vio.center_crop_wide(edited_1st, src_1st.size)

    traj_np, inv_ts = vio.load_ddim_trajectory(cfg.ddim_latents_path)
    traj = jnp.asarray(traj_np)

    cfg_txt = float(cfg.get("cfg_txt", 35.0))
    cfg_img = float(cfg.get("cfg_img", 1.0))
    mode = guidance_mode(cfg_txt, cfg_img)

    # text rows (reference pipeline_video_editing.py:1332-1347):
    # None: [inv, text]; "text": [inv, uncond, text];
    # "both": [inv, uncond, uncond, text]
    inv_p = encode_prompt(pipe, tokenizer, cfg.get("ddim_inv_prompt", ""))
    text_p = encode_prompt(pipe, tokenizer, cfg.editing_prompt)
    neg_p = encode_prompt(pipe, tokenizer, cfg.get("editing_negative_prompt", ""))
    if mode is None:
        text_all = jnp.concatenate([inv_p, text_p])
    elif mode == "text":
        text_all = jnp.concatenate([inv_p, neg_p, text_p])
    else:
        text_all = jnp.concatenate([inv_p, neg_p, neg_p, text_p])

    src_ff = pipe.encode_video(jnp.asarray(vio.frames_to_array01([src_1st])))
    edited_ff = pipe.encode_video(jnp.asarray(vio.frames_to_array01([edited_1st])))

    n_steps = int(cfg.n_steps)
    t_idx = int(cfg.ddim_init_latents_t_idx)

    init_latent = None
    r = float(cfg.get("blend_ratio", 0.0))
    if r > 0.0:
        from ..schedulers import sampling_timesteps

        start_t = int(sampling_timesteps(pipe.schedule, n_steps)[t_idx])
        row = int(np.where(inv_ts == start_t)[0][0])
        base = jnp.asarray(traj[row][:, 1:], jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(int(cfg.get("seed", 0))),
                                  base.shape, jnp.float32)
        init_latent = r * noise + (1.0 - r) * base

    out = pipe.sample_with_pnp(
        traj, inv_ts, text_all,
        edited_ff_latent=edited_ff, src_ff_latent=src_ff,
        num_inference_steps=n_steps, t_idx=t_idx,
        cfg_txt=cfg_txt, cfg_img=cfg_img,
        pnp=PnPConfig(
            conv=float(cfg.get("pnp_f_t", 0.2)),
            spatial=float(cfg.get("pnp_spatial_attn_t", 0.2)),
            temporal=float(cfg.get("pnp_temp_attn_t", 0.5)),
        ),
        frame_stride=int(cfg.get("frame_stride", 3)),
        init_latent=init_latent,
    )
    video = np.asarray(pipe.decode_latents(out))
    os.makedirs(cfg.output_dir, exist_ok=True)
    stem = f"cfgtxt_{cfg_txt}_cfgimg_{cfg_img}_steps_{n_steps}_tidx_{t_idx}"
    vio.save_video(video, os.path.join(cfg.output_dir, stem + ".mp4"), fps=10)
    vio.save_video(video, os.path.join(cfg.output_dir, stem + ".gif"), fps=10)
    vio.save_frames(video, os.path.join(cfg.output_dir, stem + "_frames"))
    logger.info("saved edited video to %s/%s.mp4", cfg.output_dir, stem)


if __name__ == "__main__":
    main()
