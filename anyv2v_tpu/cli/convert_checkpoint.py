"""Checkpoint conversion CLI: HF/diffusers snapshot dirs -> a single
framework ``.npz`` loadable via any builder's ``init:`` knob.

The reference downloads weights with ``from_pretrained`` at run time
(SURVEY.md §2.8); this environment has no network, so conversion is a
separate offline step:

    python -m anyv2v_tpu.cli.convert_checkpoint \
        --backbone i2vgen-xl --src /path/to/ali-vilab-i2vgen-xl --out i2v.npz
    python -m anyv2v_tpu.cli.convert_checkpoint \
        --backbone seine --src /path/to/stable-diffusion-v1-4 \
        --ckpt /path/to/seine.pt --out seine.npz

Every converted tree is structurally validated against the target flax
module before saving (``assert_params_match``), so a wrong key map fails
loudly at conversion time, not at apply time.
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger("anyv2v_tpu.convert")

BACKBONES = ("i2vgen-xl", "consisti2v", "seine",
             "instructpix2pix", "magicbrush", "cosxl")


def _validate_i2vgen(params, meta) -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models.unet_i2vgen import I2VGenUNet, I2VGenUNetConfig
    from ..utils.convert import assert_params_match

    cfg = I2VGenUNetConfig()
    for k, v in meta.get("unet", {}).items():
        if hasattr(cfg, k):
            cfg = dataclasses.replace(cfg, **{k: tuple(v) if isinstance(v, list) else v})
    unet = I2VGenUNet(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            sample=jnp.zeros((1, 2, 16, 16, 4)),
            timestep=jnp.int32(0),
            encoder_hidden_states=jnp.zeros((1, 4, cfg.cross_attention_dim)),
            fps=jnp.int32(8),
            image_latents=jnp.zeros((1, 2, 16, 16, 4)),
            image_embeddings=jnp.zeros((1, 1, cfg.cross_attention_dim)),
        ))
    assert_params_match(shapes, params["unet"])
    logger.info("i2vgen UNet tree validated (%d leaves)",
                len(jax.tree_util.tree_leaves(params["unet"])))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="HF checkpoint -> npz")
    parser.add_argument("--backbone", required=True, choices=BACKBONES)
    parser.add_argument("--src", required=True,
                        help="snapshot dir (diffusers layout)")
    parser.add_argument("--ckpt", default=None,
                        help="extra checkpoint file (seine.pt for --backbone seine)")
    parser.add_argument("--out", required=True, help="output .npz path")
    parser.add_argument("--no_validate", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from ..utils import convert as C
    from ..utils.model_zoo import save_params

    if args.backbone == "i2vgen-xl":
        params, meta = C.convert_i2vgen_pipeline_dir(args.src)
        if not args.no_validate:
            _validate_i2vgen(params, meta)
    elif args.backbone == "consisti2v":
        params, meta = C.convert_consisti2v_dir(args.src)
    elif args.backbone == "seine":
        if not args.ckpt:
            parser.error("--backbone seine requires --ckpt seine.pt")
        params, meta = C.convert_seine_checkpoint(args.src, args.ckpt)
    else:
        params, meta = C.convert_sd_editor_dir(args.src, args.backbone)

    save_params(args.out, params, meta=meta)
    logger.info("saved %s (%s)", args.out, meta)


if __name__ == "__main__":
    main()
