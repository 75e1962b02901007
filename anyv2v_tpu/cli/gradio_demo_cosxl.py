"""AnyV2V gradio demo entry point — variant "cosxl" (reference `gradio_demo_cosxl.py`).

Launches the web UI when gradio is available; `--headless` runs the same
three-stage flow (preprocess -> first-frame edit -> AnyV2V) from the command
line (gradio is not installed in the CI image).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--headless", action="store_true")
    parser.add_argument("--web", action="store_true",
                        help="stdlib http.server UI (no gradio needed)")
    parser.add_argument("--tiny", action="store_true",
                        help="random tiny-shape pipelines (with --web)")
    parser.add_argument("--video_path", type=str, default=None)
    parser.add_argument("--prompt", type=str, default="")
    parser.add_argument("--instruct_prompt", type=str, default="")
    parser.add_argument("--negative_prompt", type=str, default="")
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--arch", type=str, default="i2vgen-xl")
    parser.add_argument("--init", type=str, default="random")
    parser.add_argument("--editor_arch_suffix", type=str, default="")
    parser.add_argument("--num_inference_steps", type=int, default=50)
    parser.add_argument("--ddim_inversion_steps", type=int, default=500)
    parser.add_argument("--server_port", type=int, default=7860)
    args = parser.parse_args(argv)

    from ..product import gradio_app

    if args.headless:
        out = gradio_app.run_headless(
            args.video_path, args.prompt, args.instruct_prompt,
            variant="cosxl", negative_prompt=args.negative_prompt,
            out_dir=args.out_dir,
            runner_kwargs=dict(arch=args.arch, init=args.init),
            editor="cosxl" + args.editor_arch_suffix,
            num_inference_steps=args.num_inference_steps,
            ddim_inversion_steps=args.ddim_inversion_steps,
        )
        print(out)
        return
    if args.web:
        from ..product import web_demo

        web_demo.serve("cosxl", port=args.server_port,
                       tiny=args.tiny)
        return
    gradio_app.build_demo("cosxl", runner_kwargs=dict(arch=args.arch, init=args.init)
                          ).launch(server_port=args.server_port)


if __name__ == "__main__":
    main()
