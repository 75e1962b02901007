"""End-to-end AnyV2V walkthrough — the reference ``i2vgen-xl/demo.ipynb`` as a
script (cells: first-frame edit -> inline inversion config -> ddim_inversion
-> init_pnp + sample_with_pnp).

Run on tiny architectures with random weights (no checkpoints in this
environment); swap ``ARCH``/``INIT`` for converted checkpoints for real use:

    python examples/demo_walkthrough.py [workdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARCH = os.environ.get("DEMO_ARCH", "i2vgen-tiny")       # "i2vgen-xl" for real
EDITOR = os.environ.get("DEMO_EDITOR", "instructpix2pix-tiny")
INIT = os.environ.get("DEMO_INIT", "random")            # or /path/to/ckpt.npz


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "demo_out"
    os.makedirs(workdir, exist_ok=True)

    # --- cell 1: a source video (synthetic here; demo.ipynb loads demo/) ----
    from anyv2v_tpu.utils.io import save_video

    rng = np.random.RandomState(0)
    size = 64 if "tiny" in ARCH else 512
    frames01 = rng.rand(4 if "tiny" in ARCH else 16, size, size, 3).astype(np.float32)
    video_path = os.path.join(workdir, "source.mp4")
    save_video(frames01, video_path, fps=8)
    print("source video:", video_path)

    # --- cell 2: first-frame edit (InstructPix2Pix, demo.ipynb cell 4) -----
    import jax.numpy as jnp
    from PIL import Image

    from anyv2v_tpu.utils.model_zoo import build_image_edit_pipeline

    editor = build_image_edit_pipeline(EDITOR, init=INIT)
    image01 = jnp.asarray(frames01[0])
    D = editor.unet.config.cross_attention_dim
    text3 = jnp.zeros((3, 8, D))  # tokenizer-less smoke; see cli.edit_image
    edited = editor.edit(image01, text3, num_inference_steps=3, seed=42)
    edited_path = os.path.join(workdir, "edited_first_frame.png")
    Image.fromarray((np.asarray(edited) * 255).astype(np.uint8)).save(edited_path)
    print("edited first frame:", edited_path)

    # --- cells 9-13: inversion + PnP edit in one call ------------------------
    from anyv2v_tpu.product import AnyV2VRunner

    runner = AnyV2VRunner(arch=ARCH, init=INIT,
                          dtype="float32" if "tiny" in ARCH else "bfloat16")
    out = runner.perform_anyv2v(
        video_path=video_path,
        video_prompt="a stylized video",
        video_negative_prompt="",
        edited_first_frame_path=edited_path,
        ddim_inversion_steps=10 if "tiny" in ARCH else 500,
        num_inference_steps=5 if "tiny" in ARCH else 50,
        guidance_scale=9.0,
        conv_inj=0.2, spatial_inj=0.2, temp_inj=0.5,
        out_dir=workdir,
    )
    print("edited video:", out)


if __name__ == "__main__":
    main()
