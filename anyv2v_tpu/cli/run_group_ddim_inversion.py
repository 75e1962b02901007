"""Batch DDIM inversion driver — CLI surface of the reference's
``i2vgen-xl/run_group_ddim_inversion.py``: template YAML + group JSON, per-
entry skip-if-exists, static-video / null-image ablations, optional DDIM
reconstruction sanity pass (here with a PSNR report — the reference only
eyeballs the mp4, ``:157-192``).

Usage:
    python -m anyv2v_tpu.cli.run_group_ddim_inversion \
        --template_config configs/group_ddim_inversion/template.yaml \
        --configs_json   configs/group_ddim_inversion/group_config.json
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from ..utils import io as vio
from ..utils.config import load_group_configs, load_yaml
from .common import (
    build_pipeline_from_config,
    encode_clip_image,
    encode_prompt,
    load_frames_for_config,
    psnr,
    setup_logging,
)

logger = logging.getLogger("anyv2v_tpu.inversion")


def ddim_inversion(pipe, tokenizer, cfg, frames):
    """One entry: encode -> invert -> persist (reference ``ddim_inversion``,
    ``run_group_ddim_inversion.py:29-55``)."""
    inv = cfg.inverse_config
    frames01 = vio.frames_to_array01(frames)

    if inv.get("inverse_static_video", False):
        # ablation: invert a frozen video (reference :143-146)
        frames01 = np.repeat(frames01[:1], len(frames01), axis=0)

    first_frame = frames[0]
    if inv.get("null_image_inversion", False):
        # ablation: black conditioning frame (reference :147-150)
        from PIL import Image

        first_frame = Image.new("RGB", frames[0].size, (0, 0, 0))

    latents = pipe.encode_video(jnp.asarray(frames01))
    text = encode_prompt(pipe, tokenizer, inv.get("prompt", ""))
    img_lat = pipe.prepare_image_latents(
        jnp.asarray(vio.image_to_array01(first_frame)), int(cfg.n_frames)
    )
    img_emb = encode_clip_image(pipe, first_frame, int(cfg.image_size[0]))

    chunk = inv.get("chunk_steps", None)  # scan-dispatch segment length
    traj, inv_ts = pipe.invert(
        latents, text, img_lat, img_emb,
        num_inversion_steps=int(inv.n_steps), fps=int(inv.get("target_fps", 8)),
        chunk_steps=int(chunk) if chunk is not None else None,
        # "host": keep the full grid in host RAM (long-video route — a 128f
        # 500-point fp32 grid exceeds one chip's HBM); editing gathers only
        # the sampling-grid rows back to device
        traj_store=str(inv.get("traj_store", "device")),
    )
    vio.save_ddim_trajectory(inv.output_dir, np.asarray(traj), inv_ts)
    logger.info("saved %d-step trajectory to %s", len(inv_ts), inv.output_dir)
    return latents, traj, inv_ts, text, img_lat, img_emb


def ddim_reconstruction(pipe, tokenizer, cfg, latents, traj, inv_ts, img_lat, img_emb):
    """Optional recon sanity pass (reference :159-192) + PSNR gates."""
    rc = cfg.recon_config
    t_idx = int(rc.get("ddim_init_latents_t_idx", 0))
    from ..schedulers import sampling_timesteps

    ts = sampling_timesteps(pipe.schedule, int(rc.n_steps))
    start_t = int(ts[t_idx])
    row = int(np.where(inv_ts == start_t)[0][0])

    cfg_scale = float(rc.get("cfg", 9.0))
    text_cond = encode_prompt(pipe, tokenizer, rc.get("prompt", ""))
    if cfg_scale > 1.0:  # batch rows [neg, cond]; single row otherwise
        text_neg = encode_prompt(pipe, tokenizer, rc.get("negative_prompt", ""))
        text_all = jnp.concatenate([text_neg, text_cond])
        n_rows = 2
    else:
        text_all = text_cond
        n_rows = 1
    recon_latents = pipe.sample(
        traj[row],
        text_embeds_all=text_all,
        image_latents_all=jnp.tile(img_lat, (n_rows, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (n_rows, 1, 1)),
        num_inference_steps=int(rc.n_steps),
        t_idx=t_idx,
        guidance_scale=cfg_scale,
        fps=int(rc.get("target_fps", 8)),
    )
    video = pipe.decode_latents(recon_latents)
    out = os.path.join(cfg.output_dir, "ddim_reconstruction.mp4")
    vio.save_video(np.asarray(video), out, fps=int(rc.get("target_fps", 8)))
    source = pipe.decode_latents(latents)
    from ..utils.metrics import video_report

    report = video_report(np.asarray(video), np.asarray(source))
    logger.info(
        "reconstruction vs source decode: PSNR %.2f dB, SSIM %.4f, temporal "
        "consistency PSNR %.2f / SSIM %.4f -> %s",
        report["psnr"], report["ssim"], report["psnr_t"], report["ssim_t"], out)
    # enforced oracle (SURVEY §4-1: the BASELINE parity metric); opt-in via
    # recon_config.min_psnr so the reference config surface stays untouched
    min_psnr = rc.get("min_psnr", None)
    if min_psnr is not None and report["psnr"] < float(min_psnr):
        raise RuntimeError(
            f"reconstruction PSNR {report['psnr']:.2f} dB below the "
            f"min_psnr gate {float(min_psnr):.2f} dB")
    return report["psnr"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--template_config", type=str,
                        default="configs/group_ddim_inversion/template.yaml")
    parser.add_argument("--configs_json", type=str,
                        default="configs/group_ddim_inversion/group_config.json")
    args = parser.parse_args(argv)

    template = load_yaml(args.template_config)
    setup_logging(bool(template.get("debug", False)))
    configs = load_group_configs(args.template_config, args.configs_json)
    logger.info("loaded %d active configs", len(configs))

    pipe = tokenizer = None
    for cfg in configs:
        out_dir = cfg.inverse_config.output_dir
        if os.path.exists(os.path.join(out_dir, "ddim_trajectory.npz")) and not cfg.get(
            "force_recompute_latents", False
        ):
            logger.info("skip %s: latents exist (force_recompute_latents to redo)",
                        cfg.video_name)
            continue
        if pipe is None:
            pipe, tokenizer = build_pipeline_from_config(cfg)
        frames = load_frames_for_config(cfg)
        latents, traj, inv_ts, text, img_lat, img_emb = ddim_inversion(
            pipe, tokenizer, cfg, frames
        )
        if cfg.get("recon_config", {}).get("enable_recon", False):
            ddim_reconstruction(pipe, tokenizer, cfg, latents, traj, inv_ts,
                                img_lat, img_emb)


if __name__ == "__main__":
    main()
