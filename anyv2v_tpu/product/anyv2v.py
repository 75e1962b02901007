"""In-process AnyV2V: the engine behind the gradio demos and the predictor.

Rebuilds ``gradio_demo.py:79-222`` (``AnyV2V_I2VGenXL.perform_anyv2v``):
inversion + PnP editing in one process with a per-run temp dir, i2vgen-xl
backbone, defaults inversion 500 steps / 50 sampling steps / cfg 9 / t_idx 0 /
pnp 0.2/0.2/0.5 (``gradio_demo.py:365-379``).

TPU-first: both phases are the jitted scans from
:class:`anyv2v_tpu.pipelines.i2vgen.I2VGenPipeline`; the latent "filesystem
bus" stays in HBM within a run (the trajectory array), and is optionally
persisted for the two-phase CLI workflow.
"""

from __future__ import annotations

import logging
import os
import shutil
import tempfile
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
from PIL import Image

logger = logging.getLogger("anyv2v_tpu.product")


@dataclass
class AnyV2VRunner:
    """Holds a built pipeline so repeated edits skip re-initialization (the
    reference re-loads the HF pipeline per click, ``gradio_demo.py:96-100`` —
    an acknowledged inefficiency we do not reproduce)."""

    arch: str = "i2vgen-xl"
    init: str = "random"
    dtype: str = "bfloat16"
    seed: int = 42
    tokenizer_path: Optional[str] = None
    mesh: object = None
    _pipe: object = field(default=None, repr=False)
    _tokenizer: object = field(default=None, repr=False)

    def pipeline(self, image_size=(512, 512), n_frames=16):
        if self._pipe is None:
            import jax.numpy as jnp

            from ..utils.model_zoo import build_i2vgen_pipeline

            self._pipe = build_i2vgen_pipeline(
                arch=self.arch, init=self.init,
                dtype=jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32,
                sample_hw=tuple(image_size), num_frames=n_frames,
                seed=self.seed, mesh=self.mesh,
            )
            if self.tokenizer_path:
                from ..utils.tokenizer import CLIPTokenizer

                self._tokenizer = CLIPTokenizer(
                    os.path.join(self.tokenizer_path, "vocab.json"),
                    os.path.join(self.tokenizer_path, "merges.txt"),
                )
        return self._pipe

    def _encode_prompt(self, pipe, prompt: str):
        import jax.numpy as jnp

        n = pipe.text_encoder.config.max_position_embeddings
        if self._tokenizer is None:
            ids = np.zeros((1, n), np.int64)
        else:
            ids = self._tokenizer([prompt])
        return pipe.encode_text(jnp.asarray(ids))

    def perform_anyv2v(
        self,
        video_path: str,
        video_prompt: str,
        video_negative_prompt: str,
        edited_first_frame_path: str,
        conv_inj: float = 0.2,
        spatial_inj: float = 0.2,
        temp_inj: float = 0.5,
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        ddim_init_latents_t_idx: int = 0,
        ddim_inversion_steps: int = 500,
        seed: int = 42,
        random_ratio: float = 0.0,
        target_fps: int = 8,
        out_dir: Optional[str] = None,
        save_latents: bool = False,
    ) -> str:
        """Full two-stage AnyV2V in one call; returns the edited video path."""
        import jax
        import jax.numpy as jnp

        from ..cli.common import encode_clip_image
        from ..pipelines.i2vgen import PnPConfig
        from ..utils import io as vio

        tmp_dir = out_dir or os.path.join(tempfile.gettempdir(), "AnyV2V")
        if os.path.exists(tmp_dir) and out_dir is None:
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)

        # -- read source frames (any count; shapes stay static per size) ----
        from ..cli.edit_image import read_first_frame  # shares the decoder

        if os.path.isdir(video_path):
            names = sorted(f for f in os.listdir(video_path) if f.endswith(".png"))
            frames = [Image.open(os.path.join(video_path, n)).convert("RGB")
                      for n in names]
        else:
            from ..utils.video_prep import _read_video

            arr, _ = _read_video(video_path)
            frames = [Image.fromarray(f) for f in arr]
        image_size = frames[0].size
        n_frames = len(frames)

        pipe = self.pipeline(image_size=image_size, n_frames=n_frames)
        frames01 = np.stack([np.asarray(f, np.float32) / 255.0 for f in frames])

        ddim_init_latents_t_idx = min(ddim_init_latents_t_idx,
                                      num_inference_steps - 1)

        # -- Step 1: DDIM inversion (gradio_demo.py:140-147) ----------------
        first_frame = frames[0]
        latents = pipe.encode_video(jnp.asarray(frames01))
        inv_text = self._encode_prompt(pipe, "")
        img_lat = pipe.prepare_image_latents(jnp.asarray(frames01[0]), n_frames)
        img_emb = encode_clip_image(pipe, first_frame, image_size[0])
        traj, inv_ts = pipe.invert(latents, inv_text, img_lat, img_emb,
                                   num_inversion_steps=ddim_inversion_steps,
                                   fps=target_fps)
        if save_latents:
            vio.save_ddim_trajectory(os.path.join(tmp_dir, "ddim_latents"),
                                     np.asarray(traj), inv_ts)

        # -- Step 2: PnP editing (gradio_demo.py:155-203) -------------------
        edited = Image.open(edited_first_frame_path).convert("RGB").resize(
            image_size, Image.LANCZOS)
        edited01 = np.asarray(edited, np.float32) / 255.0
        edited_lat = pipe.prepare_image_latents(jnp.asarray(edited01), n_frames)
        edited_emb = encode_clip_image(pipe, edited, image_size[0])

        text_edit = self._encode_prompt(pipe, video_prompt)
        text_neg = self._encode_prompt(pipe, video_negative_prompt)
        text_all = jnp.concatenate([inv_text, text_neg, text_edit])
        img_lat_all = jnp.concatenate([img_lat, edited_lat, edited_lat])
        img_emb_all = jnp.concatenate([img_emb, edited_emb, edited_emb])

        # blend with random noise by random_ratio (gradio_demo.py:168-175)
        from ..schedulers import sampling_timesteps

        ts = sampling_timesteps(pipe.schedule, num_inference_steps)
        t_to_row = {int(t): i for i, t in enumerate(inv_ts)}
        init = traj[t_to_row[int(ts[ddim_init_latents_t_idx])]]
        if random_ratio > 0.0:
            rnd = jax.random.normal(jax.random.PRNGKey(seed), init.shape,
                                    jnp.float32)
            init = rnd * random_ratio + init * (1.0 - random_ratio)

        out = pipe.sample_with_pnp(
            traj, inv_ts, text_all, img_lat_all, img_emb_all,
            num_inference_steps=num_inference_steps,
            t_idx=ddim_init_latents_t_idx,
            guidance_scale=guidance_scale,
            pnp=PnPConfig(conv_inj, spatial_inj, temp_inj),
            fps=target_fps,
            init_latent=init,
        )
        video = np.asarray(pipe.decode_latents(out))
        output_path = os.path.join(tmp_dir, "edited_video.mp4")
        vio.save_video(video, output_path, fps=target_fps)
        logger.info("edited video saved to %s", output_path)
        return output_path


def perform_anyv2v(**kwargs) -> str:
    """Functional one-shot wrapper (builds a fresh runner)."""
    runner_keys = {"arch", "init", "dtype", "seed", "tokenizer_path"}
    runner = AnyV2VRunner(**{k: v for k, v in kwargs.items() if k in runner_keys})
    return runner.perform_anyv2v(
        **{k: v for k, v in kwargs.items() if k not in runner_keys})
