"""ConsistI2V DDIM inversion driver — CLI surface of the reference's
``consisti2v/run_ddim_inversion.py``: single YAML config + dotlist overrides
(``:142-149``), cfg_txt = cfg_img = 1.0, frame_stride 3, 500 steps
(``configs/pipeline_512/ddim_inversion_512.yaml:24-31``), optional
reconstruction with gif/mp4 outputs.

Usage:
    python -m anyv2v_tpu.cli.consisti2v_run_ddim_inversion \
        --config configs/consisti2v/ddim_inversion.yaml video_name=square ...
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from ..utils import io as vio
from ..utils.config import from_dotlist, load_yaml, merge, resolve
from ..utils.model_zoo import build_consisti2v_pipeline
from ..utils.tokenizer import CLIPTokenizer
from .common import load_frames_for_config, psnr, setup_logging

logger = logging.getLogger("anyv2v_tpu.consisti2v.inversion")


def build_pipeline(cfg):
    model = cfg.get("model", {})
    dtype = jnp.bfloat16 if model.get("dtype", "bfloat16") == "bfloat16" else jnp.float32
    pipe = build_consisti2v_pipeline(
        arch=model.get("arch", "consisti2v"), init=model.get("init", "random"),
        seed=int(cfg.get("seed", 0)), dtype=dtype,
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


def encode_prompt(pipe, tokenizer, prompt: str):
    n = pipe.text_encoder.config.max_position_embeddings
    ids = np.zeros((1, n), np.int64) if tokenizer is None else tokenizer([prompt])
    return pipe.encode_text(jnp.asarray(ids))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/consisti2v/ddim_inversion.yaml")
    parser.add_argument("optional_args", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = load_yaml(args.config)
    if args.optional_args:
        cfg = merge(cfg, from_dotlist(args.optional_args))
    cfg = resolve(cfg)
    setup_logging(bool(cfg.get("debug", False)))

    pipe, tokenizer = build_pipeline(cfg)
    frames = load_frames_for_config(cfg)
    frames01 = vio.frames_to_array01(frames)
    inv = cfg.inverse_config

    latents = pipe.encode_video(jnp.asarray(frames01))
    text = encode_prompt(pipe, tokenizer, inv.get("prompt", ""))
    chunk = inv.get("chunk_steps", None)  # scan-dispatch segment length
    traj, inv_ts = pipe.invert(
        latents, text,
        num_inversion_steps=int(inv.n_steps),
        frame_stride=int(inv.get("frame_stride", 3)),
        chunk_steps=int(chunk) if chunk is not None else None,
    )
    vio.save_ddim_trajectory(inv.output_dir, np.asarray(traj), inv_ts)
    logger.info("saved %d-step trajectory to %s", len(inv_ts), inv.output_dir)

    rc = cfg.get("recon_config")
    if rc and rc.get("enable_recon", True):
        from ..pipelines.consisti2v import guidance_mode

        t_idx = int(rc.get("ddim_init_latents_t_idx", 0))
        cfg_txt = float(rc.get("cfg_txt", 1.0))
        cfg_img = float(rc.get("cfg_img", 1.0))
        mode = guidance_mode(cfg_txt, cfg_img)
        cond = encode_prompt(pipe, tokenizer, rc.get("prompt", ""))
        neg = encode_prompt(pipe, tokenizer, rc.get("negative_prompt", ""))
        if mode is None:
            text_all = cond
        elif mode == "text":
            text_all = jnp.concatenate([neg, cond])
        else:
            text_all = jnp.concatenate([neg, neg, cond])
        # plain generation (reference __call__ recon, run_ddim_inversion.py:
        # 121-137) seeded from the cached inverted latent at timesteps[t_idx]
        from ..schedulers import sampling_timesteps

        ts = sampling_timesteps(pipe.schedule, int(rc.n_steps))
        t_to_row = {int(t): i for i, t in enumerate(inv_ts)}
        # cache row = [clean frame0 | inverted frames 1..]; frame 0 feeds the
        # image-uncond row (only used when cfg_img > 1)
        init_latent = traj[t_to_row[int(ts[t_idx])]]
        out = pipe.sample(
            first_frame_latent=latents[:, :1],
            text_embeds_all=text_all,
            num_frames=int(cfg.n_frames),
            num_inference_steps=int(rc.n_steps),
            cfg_txt=cfg_txt, cfg_img=cfg_img,
            frame_stride=int(rc.get("frame_stride", 3)),
            noise_sampling_method=str(rc.get("noise_sampling_method", "vanilla")),
            noise_alpha=float(rc.get("noise_alpha", 1.0)),
            use_frameinit=bool(rc.get("use_frameinit", False)),
            frameinit_noise_level=int(rc.get("frameinit_noise_level", 999)),
            init_latent=init_latent,
            t_idx=t_idx,
        )
        video = np.asarray(pipe.decode_latents(out))
        os.makedirs(cfg.output_dir, exist_ok=True)
        vio.save_video(video, os.path.join(cfg.output_dir, "ddim_reconstruction.mp4"),
                       fps=10)
        vio.save_video(video, os.path.join(cfg.output_dir, "ddim_reconstruction.gif"),
                       fps=10)
        source = np.asarray(pipe.decode_latents(latents))
        p = psnr(video, source)
        logger.info("reconstruction PSNR vs source decode: %.2f dB", p)
        min_psnr = rc.get("min_psnr", None)
        if min_psnr is not None and p < float(min_psnr):
            raise RuntimeError(
                f"reconstruction PSNR {p:.2f} dB below the min_psnr gate "
                f"{float(min_psnr):.2f} dB")


if __name__ == "__main__":
    main()
