"""Gradio demo builders (reference ``gradio_demo.py`` / ``gradio_demo_style.py``
/ ``gradio_demo_cosxl.py``): three-stage UI — preprocess video, edit first
frame, run AnyV2V — wired to the in-process runner.

gradio is not installed in this image; ``build_demo`` imports it lazily and
raises a clear error otherwise. ``run_headless`` drives the same three-stage
flow without a UI (used by tests and the demo CLIs' ``--headless`` mode).

Defaults mirror ``gradio_demo.py:365-379``: inversion 500 steps, 50 sampling
steps, cfg 9, t_idx 0, pnp sliders 0.2 / 0.2 / 0.5. The style variant
(``gradio_demo_style.py``) supports up to 128 frames (reference README:182).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("anyv2v_tpu.gradio")

DEFAULTS = dict(
    ddim_inversion_steps=500,
    num_inference_steps=50,
    guidance_scale=9.0,
    ddim_init_latents_t_idx=0,
    conv_inj=0.2,
    spatial_inj=0.2,
    temp_inj=0.5,
    seed=42,
)

# editor per demo variant (reference: gradio_demo / _style / _cosxl)
EDITOR_FOR_VARIANT = {
    "instructpix2pix": "instructpix2pix",
    "style": "instantstyle",
    "cosxl": "cosxl",
}


def run_headless(
    video_path: str,
    prompt: str,
    instruct_prompt: str,
    variant: str = "instructpix2pix",
    negative_prompt: str = "",
    out_dir: Optional[str] = None,
    preprocess: Optional[dict] = None,
    runner_kwargs: Optional[dict] = None,
    editor_kwargs: Optional[dict] = None,
    editor: Optional[str] = None,
    **overrides,
) -> str:
    """The three gradio stages without a UI. Returns the edited video path."""
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from ..cli.edit_image import _encode_prompt_rows, read_first_frame
    from ..utils.model_zoo import build_image_edit_pipeline
    from ..utils.video_prep import crop_and_resize_video
    from .anyv2v import AnyV2VRunner

    out_dir = out_dir or os.path.join(os.path.dirname(video_path), "anyv2v_out")
    os.makedirs(out_dir, exist_ok=True)

    # Stage 1: preprocess (btn_preprocess_video_fn, gradio_demo.py:240-256)
    if preprocess:
        video_path = crop_and_resize_video(
            video_path, os.path.join(out_dir, "preprocessed"), **preprocess
        ) or video_path

    # Stage 2: first-frame edit (btn image edit, :259-275)
    editor_name = editor or EDITOR_FOR_VARIANT.get(variant, variant)
    editor = build_image_edit_pipeline(editor_name, **(editor_kwargs or {}))
    first = read_first_frame(video_path)
    image01 = jnp.asarray(np.asarray(first, np.float32) / 255.0)
    from ..pipelines.image_edit import CosXLEditPipeline

    steps = overrides.pop("image_edit_steps", 20)
    if isinstance(editor, CosXLEditPipeline):
        D = editor.unet.config.cross_attention_dim
        pd = (editor.unet.config.projection_class_embeddings_input_dim
              - 6 * editor.unet.config.addition_time_embed_dim)
        edited = editor.edit(image01, jnp.zeros((3, 77, D)), jnp.zeros((3, pd)),
                             num_inference_steps=min(steps, 20))
    elif hasattr(editor, "edit_with_style"):
        # style embeds: zeros without loaded encoders (smoke); the style
        # image is supplied via editor_kwargs-threaded embeds in real runs
        D = editor.unet.config.cross_attention_dim
        pd = (editor.unet.config.projection_class_embeddings_input_dim
              - 6 * editor.unet.config.addition_time_embed_dim)
        clip_dim = editor.params["image_proj"]["params"]["proj"]["kernel"].shape[0]
        edited = editor.edit_with_style(
            image01, jnp.zeros((1, clip_dim)), jnp.zeros((2, 77, D)),
            jnp.zeros((2, pd)), num_inference_steps=min(steps, 30))
    else:
        text3 = _encode_prompt_rows(editor, None, instruct_prompt, negative_prompt)
        edited = editor.edit(image01, text3, num_inference_steps=steps)
    edited_path = os.path.join(out_dir, "edited_first_frame.png")
    Image.fromarray((np.asarray(edited) * 255).astype(np.uint8)).save(edited_path)

    # Stage 3: AnyV2V (btn_infer_fn, :278)
    runner = AnyV2VRunner(**(runner_kwargs or {}))
    params = {**DEFAULTS, **overrides}
    return runner.perform_anyv2v(
        video_path=video_path,
        video_prompt=prompt,
        video_negative_prompt=negative_prompt,
        edited_first_frame_path=edited_path,
        out_dir=out_dir,
        **params,
    )


def build_demo(variant: str = "instructpix2pix", runner_kwargs: Optional[dict] = None):
    """Construct the gradio Blocks app (requires gradio)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this image; use run_headless() or the "
            "CLI --headless mode for the same flow"
        ) from e

    max_frames = 128 if variant == "style" else 16  # README:182 long-video UI

    with gr.Blocks(title=f"AnyV2V ({variant})") as demo:
        gr.Markdown(f"# AnyV2V — TPU ({variant})")
        with gr.Row():
            video_in = gr.Video(label="Source video")
            video_out = gr.Video(label="Edited video")
        prompt = gr.Textbox(label="Video prompt")
        instruct = gr.Textbox(label="First-frame edit instruction")
        negative = gr.Textbox(label="Negative prompt", value="")
        with gr.Accordion("Advanced", open=False):
            steps = gr.Slider(1, 100, value=DEFAULTS["num_inference_steps"],
                              step=1, label="Sampling steps")
            cfg = gr.Slider(1.0, 20.0, value=DEFAULTS["guidance_scale"],
                            label="Guidance scale")
            t_idx = gr.Slider(0, 10, value=DEFAULTS["ddim_init_latents_t_idx"],
                              step=1, label="ddim_init_latents_t_idx")
            conv = gr.Slider(0.0, 1.0, value=DEFAULTS["conv_inj"], label="pnp_f_t")
            spat = gr.Slider(0.0, 1.0, value=DEFAULTS["spatial_inj"],
                             label="pnp_spatial_attn_t")
            temp = gr.Slider(0.0, 1.0, value=DEFAULTS["temp_inj"],
                             label="pnp_temp_attn_t")
            seed = gr.Number(value=DEFAULTS["seed"], label="Seed", precision=0)
        btn = gr.Button("Run AnyV2V")

        def _run(video, p, ip, np_, st, cf, ti, cj, sj, tj, sd):
            return run_headless(
                video, p, ip, variant=variant, negative_prompt=np_,
                num_inference_steps=int(st), guidance_scale=float(cf),
                ddim_init_latents_t_idx=int(ti), conv_inj=float(cj),
                spatial_inj=float(sj), temp_inj=float(tj), seed=int(sd),
                runner_kwargs=runner_kwargs,
            )

        btn.click(_run,
                  inputs=[video_in, prompt, instruct, negative, steps, cfg,
                          t_idx, conv, spat, temp, seed],
                  outputs=[video_out])
        gr.Markdown(f"Max length: {max_frames} frames.")
    return demo
