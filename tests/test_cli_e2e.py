"""End-to-end CLI test: the full two-phase AnyV2V workflow (invert -> edit)
through the public config-driven drivers on a synthetic video with the tiny
architecture and random weights — the framework analogue of the reference's
demo workflow (SURVEY.md §3.1/§3.2)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from anyv2v_tpu.cli import run_group_ddim_inversion, run_group_pnp_edit


def _make_demo_video(frames_dir, n_frames=4, size=64):
    """Moving bright square on a gradient background."""
    os.makedirs(frames_dir, exist_ok=True)
    for i in range(n_frames):
        img = np.zeros((size, size, 3), np.uint8)
        img[:, :, 2] = np.linspace(40, 200, size, dtype=np.uint8)[None, :]
        x = 8 + i * 6
        img[20:36, x : x + 12, 0] = 230
        img[20:36, x : x + 12, 1] = 180
        Image.fromarray(img).save(os.path.join(frames_dir, f"{i:05d}.png"))


INV_TEMPLATE = """
seed: 8888
debug: False
model:
  arch: "i2vgen-tiny"
  init: "random"
  dtype: "float32"
  tokenizer_path: null
  scheduler: {{}}
data_dir: "{data_dir}"
model_name: "i2vgen-xl"
exp_name: "${{video_name}}"
output_dir: "${{data_dir}}/inversions/${{model_name}}/${{exp_name}}"
image_size: [64, 64]
video_name: "ReplaceMe"
video_path: "ReplaceMe"
video_frames_path: "ReplaceMe"
n_frames: 4
inverse_config:
  image_size: ${{image_size}}
  n_frames: ${{n_frames}}
  cfg: 1.0
  target_fps: 8
  prompt: ""
  n_steps: 20
  output_dir: "${{output_dir}}/ddim_latents"
  inverse_static_video: False
  null_image_inversion: False
recon_config:
  enable_recon: True
  image_size: ${{image_size}}
  n_frames: ${{n_frames}}
  cfg: 1.0
  target_fps: 8
  prompt: ""
  negative_prompt: ""
  n_steps: 10
  ddim_init_latents_t_idx: 0
  ddim_latents_path: "${{inverse_config.output_dir}}"
"""

EDIT_TEMPLATE = """
seed: 8888
debug: False
model:
  arch: "i2vgen-tiny"
  init: "random"
  dtype: "float32"
  tokenizer_path: null
  scheduler: {{}}
data_dir: "{data_dir}"
model_name: "i2vgen-xl"
task_name: "Prompt-Based-Editing"
edited_video_name: "ReplaceMe"
output_dir: "${{data_dir}}/Results/${{task_name}}/${{model_name}}/${{video_name}}/${{edited_video_name}}/"
image_size: [64, 64]
video_name: "ReplaceMe"
video_path: "ReplaceMe"
video_frames_path: "ReplaceMe"
edited_first_frame_path: "ReplaceMe"
ddim_latents_path: "${{data_dir}}/inversions/${{model_name}}/${{video_name}}/ddim_latents"
n_frames: 4
cfg: 9.0
target_fps: 8
editing_prompt: "a red square"
editing_negative_prompt: ""
n_steps: 10
ddim_init_latents_t_idx: 1
ddim_inv_prompt: ""
random_ratio: 0.0
pnp_f_t: 0.2
pnp_spatial_attn_t: 0.2
pnp_temp_attn_t: 0.5
"""


@pytest.mark.slow
def test_full_two_phase_workflow(tmp_path):
    data_dir = str(tmp_path)
    frames_dir = os.path.join(data_dir, "demo", "square", "frames")
    _make_demo_video(frames_dir)

    # edited first frame: recolor the square
    img = np.asarray(Image.open(os.path.join(frames_dir, "00000.png"))).copy()
    mask = img[:, :, 0] > 200
    img[mask] = [40, 220, 60]
    edited_path = os.path.join(data_dir, "edited_1st.png")
    Image.fromarray(img).save(edited_path)

    # --- phase 1: inversion ------------------------------------------------
    inv_tmpl = tmp_path / "inv_template.yaml"
    inv_tmpl.write_text(INV_TEMPLATE.format(data_dir=data_dir))
    inv_json = tmp_path / "inv_group.json"
    json.dump(
        [{"video_name": "square", "video_frames_path": frames_dir}],
        inv_json.open("w"),
    )
    run_group_ddim_inversion.main(
        ["--template_config", str(inv_tmpl), "--configs_json", str(inv_json)]
    )
    latents_dir = os.path.join(data_dir, "inversions", "i2vgen-xl", "square",
                               "ddim_latents")
    assert os.path.exists(os.path.join(latents_dir, "ddim_trajectory.npz"))
    assert os.path.exists(os.path.join(latents_dir, "ddim_latents_951.npy"))
    recon = os.path.join(data_dir, "inversions", "i2vgen-xl", "square",
                         "ddim_reconstruction.mp4")
    assert os.path.exists(recon)

    # skip-if-exists branch
    run_group_ddim_inversion.main(
        ["--template_config", str(inv_tmpl), "--configs_json", str(inv_json)]
    )

    # --- phase 2: PnP edit ---------------------------------------------------
    edit_tmpl = tmp_path / "edit_template.yaml"
    edit_tmpl.write_text(EDIT_TEMPLATE.format(data_dir=data_dir))
    edit_json = tmp_path / "edit_group.json"
    json.dump(
        [{
            "video_name": "square",
            "video_frames_path": frames_dir,
            "edited_video_name": "green_square",
            "edited_first_frame_path": edited_path,
        }],
        edit_json.open("w"),
    )
    run_group_pnp_edit.main(
        ["--template_config", str(edit_tmpl), "--configs_json", str(edit_json)]
    )
    out_dir = os.path.join(data_dir, "Results", "Prompt-Based-Editing",
                           "i2vgen-xl", "square", "green_square")
    mp4s = [f for f in os.listdir(out_dir) if f.endswith(".mp4")]
    assert len(mp4s) == 1
    frames_out = [d for d in os.listdir(out_dir) if d.endswith("_frames")]
    assert frames_out
    n_pngs = len(os.listdir(os.path.join(out_dir, frames_out[0])))
    assert n_pngs == 4
