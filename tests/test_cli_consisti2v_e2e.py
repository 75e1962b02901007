"""End-to-end ConsistI2V CLI test: single-YAML + dotlist surface
(invert -> dual-CFG PnP edit) on a synthetic video, tiny arch, random
weights."""

import os

import numpy as np
import pytest
from PIL import Image

from anyv2v_tpu.cli import consisti2v_run_ddim_inversion, consisti2v_run_pnp_edit
from tests.test_cli_e2e import _make_demo_video

INV_YAML = """
seed: 8888
debug: False
model:
  arch: "consisti2v-tiny"
  init: "random"
  dtype: "float32"
  tokenizer_path: null
  scheduler: {{}}
exp_name: "${{video_name}}"
output_dir: "{data_dir}/ddim_inversion/${{exp_name}}"
image_size: [64, 64]
data_dir: "{data_dir}"
video_name: "square"
video_path: "ReplaceMe"
video_frames_path: "{frames_dir}"
n_frames: 4
inverse_config:
  image_size: ${{image_size}}
  n_frames: ${{n_frames}}
  cfg_txt: 1.0
  cfg_img: 1.0
  frame_stride: 3
  prompt: ""
  n_steps: 20
  output_dir: "{data_dir}/outputs/${{exp_name}}"
recon_config:
  enable_recon: True
  n_frames: ${{n_frames}}
  cfg_txt: 1.0
  cfg_img: 1.0
  frame_stride: 3
  prompt: ""
  n_steps: 10
  ddim_init_latents_t_idx: 0
"""

EDIT_YAML = """
seed: 8888
debug: False
model:
  arch: "consisti2v-tiny"
  init: "random"
  dtype: "float32"
  tokenizer_path: null
  scheduler: {{}}
exp_name: "${{video_name}}"
output_dir: "{data_dir}/anyv2v_results/${{exp_name}}"
image_size: [64, 64]
data_dir: "{data_dir}"
video_name: "square"
video_path: "ReplaceMe"
video_frames_path: "{frames_dir}"
edited_first_frame_path: "{edited_path}"
n_frames: 4
cfg_txt: 35
cfg_img: 1.0
frame_stride: 3
editing_prompt: "a green square"
editing_negative_prompt: ""
n_steps: 10
ddim_init_latents_t_idx: 1
ddim_inv_prompt: ""
ddim_latents_path: "{data_dir}/outputs/square"
pnp_f_t: 0.2
pnp_spatial_attn_t: 0.2
pnp_temp_attn_t: 0.5
blend_ratio: 0.0
"""


@pytest.mark.slow
def test_consisti2v_two_phase_workflow(tmp_path):
    data_dir = str(tmp_path)
    frames_dir = os.path.join(data_dir, "frames")
    _make_demo_video(frames_dir)
    img = np.asarray(Image.open(os.path.join(frames_dir, "00000.png"))).copy()
    img[img[:, :, 0] > 200] = [40, 220, 60]
    edited_path = os.path.join(data_dir, "edited.png")
    Image.fromarray(img).save(edited_path)

    inv_cfg = tmp_path / "inv.yaml"
    inv_cfg.write_text(INV_YAML.format(data_dir=data_dir, frames_dir=frames_dir))
    consisti2v_run_ddim_inversion.main(["--config", str(inv_cfg)])
    assert os.path.exists(os.path.join(data_dir, "outputs", "square",
                                       "ddim_trajectory.npz"))
    assert os.path.exists(os.path.join(data_dir, "ddim_inversion", "square",
                                       "ddim_reconstruction.mp4"))

    edit_cfg = tmp_path / "edit.yaml"
    edit_cfg.write_text(EDIT_YAML.format(data_dir=data_dir, frames_dir=frames_dir,
                                         edited_path=edited_path))
    # exercise the dotlist override surface too
    consisti2v_run_pnp_edit.main(["--config", str(edit_cfg), "cfg_txt=7.5"])
    out_dir = os.path.join(data_dir, "anyv2v_results", "square")
    mp4s = [f for f in os.listdir(out_dir) if f.endswith(".mp4")]
    assert mp4s and "cfgtxt_7.5" in mp4s[0]
