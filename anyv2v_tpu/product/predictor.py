"""Replicate-style prediction service (reference ``predict.py`` + ``cog.yaml``).

The reference Cog predictor (``predict.py:43+``) chains: first-frame edit
(InstructPix2Pix) -> AnyV2V (inversion + PnP edit) with exposed knobs
(pnp_f_t / pnp_spatial_attn_t / pnp_temp_attn_t defaulting to 1.0,
``predict.py:107-121``). Weight prefetch from replicate.delivery (:29-40)
maps to converted-checkpoint paths here (no network in this environment).
"""

from __future__ import annotations

import logging
import os
import tempfile
import time
from typing import Optional

logger = logging.getLogger("anyv2v_tpu.predictor")


class Predictor:
    """setup() once, predict() per request — the Cog interface."""

    def setup(
        self,
        arch: str = "i2vgen-xl",
        init: str = "random",
        image_edit_arch: str = "instructpix2pix",
        image_edit_init: str = "random",
        tokenizer_path: Optional[str] = None,
    ) -> None:
        t0 = time.time()
        from .anyv2v import AnyV2VRunner
        from ..utils.model_zoo import build_image_edit_pipeline

        self.runner = AnyV2VRunner(arch=arch, init=init,
                                   tokenizer_path=tokenizer_path)
        self.image_editor = build_image_edit_pipeline(image_edit_arch,
                                                      init=image_edit_init)
        self.tokenizer = None
        if tokenizer_path:
            from ..utils.tokenizer import CLIPTokenizer

            self.tokenizer = CLIPTokenizer(
                os.path.join(tokenizer_path, "vocab.json"),
                os.path.join(tokenizer_path, "merges.txt"))
        logger.info("setup took %.1f s", time.time() - t0)

    def predict(
        self,
        video_path: str,
        instruct_prompt: str,
        video_prompt: str,
        video_negative_prompt: str = ("worst quality, normal quality, low "
                                      "quality, low res, blurry, watermark, "
                                      "jpeg artifacts"),
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        # reference predict.py:107-121 exposes these at 1.0
        pnp_f_t: float = 1.0,
        pnp_spatial_attn_t: float = 1.0,
        pnp_temp_attn_t: float = 1.0,
        ddim_init_latents_t_idx: int = 0,
        ddim_inversion_steps: int = 500,
        image_edit_steps: int = 100,
        seed: int = 42,
        out_dir: Optional[str] = None,
    ) -> str:
        """Returns the path of the edited video."""
        import numpy as np
        import jax.numpy as jnp
        from PIL import Image

        from ..cli.edit_image import read_first_frame, _encode_prompt_rows

        t0 = time.time()
        out_dir = out_dir or tempfile.mkdtemp(prefix="anyv2v_predict_")
        os.makedirs(out_dir, exist_ok=True)

        # Stage 1: first-frame edit
        first = read_first_frame(video_path)
        image01 = jnp.asarray(np.asarray(first, np.float32) / 255.0)
        text3 = _encode_prompt_rows(self.image_editor, self.tokenizer,
                                    instruct_prompt, video_negative_prompt)
        edited = self.image_editor.edit(image01, text3,
                                        num_inference_steps=image_edit_steps,
                                        seed=seed)
        edited_path = os.path.join(out_dir, "edited_first_frame.png")
        Image.fromarray((np.asarray(edited) * 255).astype(np.uint8)).save(edited_path)
        logger.info("first-frame edit done at %.1f s", time.time() - t0)

        # Stage 2: AnyV2V
        result = self.runner.perform_anyv2v(
            video_path=video_path,
            video_prompt=video_prompt,
            video_negative_prompt=video_negative_prompt,
            edited_first_frame_path=edited_path,
            conv_inj=pnp_f_t, spatial_inj=pnp_spatial_attn_t,
            temp_inj=pnp_temp_attn_t,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            ddim_init_latents_t_idx=ddim_init_latents_t_idx,
            ddim_inversion_steps=ddim_inversion_steps,
            seed=seed, out_dir=out_dir,
        )
        logger.info("predict finished in %.1f s", time.time() - t0)
        return result
