"""Pipeline construction from config: model sizes, params sources.

The reference builds pipelines with HF ``from_pretrained`` downloads
(``run_group_ddim_inversion.py:82-87``). This environment has no network, so
params come from one of:

- ``init: random`` — seeded random init at the configured architecture
  (smoke tests, benchmarks, demo runs without weights);
- ``init: <path>.npz`` — a converted checkpoint saved by
  ``save_params`` / ``load_params`` below;
- torch/safetensors checkpoints via :mod:`anyv2v_tpu.utils.convert` (CLIP
  conversion is complete; UNet/VAE converters land with real-weight support).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextConfig, CLIPTextModel, CLIPVisionConfig, CLIPVisionModel
from ..models.unet_i2vgen import I2VGenUNet, I2VGenUNetConfig
from ..models.unet_videoldm import VideoLDMUNet, VideoLDMUNetConfig
from ..models.vae import AutoencoderKL, VAEConfig
from ..pipelines.consisti2v import ConsistI2VPipeline
from ..pipelines.i2vgen import I2VGenPipeline
from ..schedulers import make_schedule


# i2vgen-xl production architecture (ali-vilab/i2vgen-xl). The checkpoint
# carries attention_head_dim=64 which diffusers' 3D UNets treat as the head
# COUNT (issue #2011; convert.resolve_i2vgen_heads) — so the true split is
# heads=64, head_dim=C/64 in {5,10,20}. That is what benches and entry() run.
I2VGEN_XL = dict(
    unet=I2VGenUNetConfig(num_attention_heads=64),
    vae=VAEConfig(),
    text=CLIPTextConfig(),
    vision=CLIPVisionConfig(),
)

# The TPU-friendly heads=C/64 variant (head_dim=64 everywhere) kept for
# kernel A/Bs; NOT the checkpoint architecture.
I2VGEN_XL_WIDEHEAD = dict(I2VGEN_XL, unet=I2VGenUNetConfig())

# small-but-structured config for smoke runs / CI (x8 VAE, full block zoo)
I2VGEN_TINY = dict(
    unet=I2VGenUNetConfig(
        block_out_channels=(16, 32, 32, 32),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=8,
        norm_num_groups=8,
        num_image_context_tokens=2,
        pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
        pnp_conv_target=(1, 1),
    ),
    vae=VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                  norm_num_groups=8),
    text=CLIPTextConfig(vocab_size=49408, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, projection_dim=None),
    vision=CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                            num_heads=4, image_size=224, patch_size=32,
                            projection_dim=32),
)

ARCHS = {"i2vgen-xl": I2VGEN_XL, "i2vgen-tiny": I2VGEN_TINY}

# ConsistI2V production architecture (TIGER-Lab/ConsistI2V: SD2.1-base UNet
# + VideoLDM temporal layers, rotary temporal PE, augmented temporal attn)
CONSISTI2V = dict(
    unet=VideoLDMUNetConfig(),
    vae=VAEConfig(),
    text=CLIPTextConfig(),
)
CONSISTI2V_TINY = dict(
    unet=VideoLDMUNetConfig(
        block_out_channels=(16, 32, 32, 32),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=8,
        n_temp_heads=2,
        norm_num_groups=8,
        pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
        pnp_conv_target=(1, 1),
    ),
    vae=VAEConfig(block_out_channels=(16, 16, 32, 32), layers_per_block=1,
                  norm_num_groups=8),
    text=CLIPTextConfig(vocab_size=49408, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, projection_dim=None),
)
CONSISTI2V_ARCHS = {"consisti2v": CONSISTI2V, "consisti2v-tiny": CONSISTI2V_TINY}


def build_consisti2v_pipeline(
    arch: str = "consisti2v",
    init: str = "random",
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    scheduler_kwargs: Dict[str, Any] | None = None,
    mesh=None,
) -> ConsistI2VPipeline:
    spec = CONSISTI2V_ARCHS[arch]
    unet_cfg = _override_dtype(spec["unet"], dtype)
    vae_cfg = _override_dtype(spec["vae"], dtype)
    text_cfg = spec["text"]
    unet = VideoLDMUNet(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(text_cfg)

    if init == "random":
        key = jax.random.PRNGKey(seed)
        params = {
            "unet": fast_random_params(
                lambda: unet.init(
                    key,
                    sample=jnp.zeros((1, 2, 16, 16, 4)),
                    timestep=jnp.int32(0),
                    encoder_hidden_states=jnp.zeros((1, 4, text_cfg.hidden_size)),
                    first_frame_latents=jnp.zeros((1, 1, 16, 16, 4)),
                    frame_stride=jnp.int32(3),
                ), seed),
            "vae": fast_random_params(
                lambda: vae.init(key, jnp.zeros((1, 64, 64, 3))), seed + 1),
            "text": fast_random_params(
                lambda: text.init(key, jnp.zeros((1, 4), jnp.int32)), seed + 2),
        }
    elif os.path.exists(init):
        params = load_params(init)
    else:
        raise ValueError(f"unknown init: {init}")

    schedule = make_schedule(**(scheduler_kwargs or {}))
    return ConsistI2VPipeline(unet=unet, vae=vae, text_encoder=text,
                              schedule=schedule, params=params, mesh=mesh)


def _override_dtype(cfg, dtype):
    import dataclasses

    return dataclasses.replace(cfg, dtype=dtype)


def cast_params(params, dtype):
    """Cast float leaves of a params tree (norm layers recompute in fp32 at
    apply time regardless, so bf16 storage costs little accuracy and halves
    HBM: the full i2vgen-xl bundle is ~2.4B params — fp32 storage plus
    activations exhausts a 16 GB v5e chip)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)


def build_i2vgen_pipeline(
    arch: str = "i2vgen-xl",
    init: str = "random",
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    sample_hw: Tuple[int, int] = (512, 512),
    num_frames: int = 16,
    scheduler_kwargs: Dict[str, Any] | None = None,
    param_dtype: jnp.dtype | None = None,
    components: Tuple[str, ...] = ("unet", "vae", "text", "vision"),
    mesh=None,
) -> I2VGenPipeline:
    import dataclasses as _dc

    spec = ARCHS[arch]
    unet_cfg = _override_dtype(spec["unet"], dtype)
    vae_cfg = _override_dtype(spec["vae"], dtype)
    text_cfg = spec["text"]
    vision_cfg = spec["vision"]

    params = meta = None
    if init != "random":
        if not os.path.exists(init):
            raise ValueError(f"unknown init: {init}")
        params, meta = load_params(init, return_meta=True)
        # converted checkpoints pin arch knobs (e.g. the diffusers head-count
        # rule resolved by the converter) — apply them so numerics match torch
        for k, v in (meta or {}).get("unet", {}).items():
            if hasattr(unet_cfg, k):
                v = tuple(v) if isinstance(v, list) else v
                unet_cfg = _dc.replace(unet_cfg, **{k: v})

    unet = I2VGenUNet(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(text_cfg)
    vision = CLIPVisionModel(vision_cfg)

    if params is None:
        params = _random_params(unet, vae, text, vision, text_cfg, vision_cfg,
                                seed, sample_hw, num_frames, components)
    if param_dtype is not None:
        params = cast_params(params, param_dtype)

    schedule = make_schedule(**(scheduler_kwargs or {}))
    return I2VGenPipeline(
        unet=unet, vae=vae, text_encoder=text, vision_encoder=vision,
        schedule=schedule, params=params, mesh=mesh,
    )


def fast_random_params(init_fn, seed: int, scale: float = 0.02):
    """Materialize a flax init tree without running the model.

    Eager ``Module.init`` dispatches every op individually — prohibitively
    slow over the axon device tunnel for the full-size UNet. Instead:
    ``jax.eval_shape`` the init (host-only trace), then fill every leaf from
    a single jitted program (one leaf-keyed normal per tensor; norm scales
    get 1.0 + noise, biases stay small). Distribution details do not match
    flax initializers — fine for random-weight smoke/bench runs; real runs
    load converted checkpoints.

    NOTE the fill is backend-dependent for the same ``seed``: the CPU path
    draws from ``np.random.RandomState`` (host fill — the jitted path costs
    one XLA compile per 128 leaves, ~160 s per tiny UNet on this 1-core
    host), while accelerator backends use ``jax.random.fold_in`` PRNG
    streams. A CPU-mesh run and a TPU run of the "same" random model
    therefore have different weights; seeded cross-backend reproducibility
    needs converted checkpoints, not this helper.
    """
    shapes = jax.eval_shape(init_fn)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def leaf_kind(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if leaf.dtype in (jnp.int32, jnp.int64):
            return "zeros"
        if name.endswith("scale") or name.endswith("alpha"):
            return "ones"
        if name.endswith("bias"):
            return "zeros"
        return "normal"

    if jax.default_backend() == "cpu":
        # host == device: fill on the host directly. The jitted path below
        # costs one XLA compile per 128 leaves — ~160 s per tiny UNet on this
        # 1-core host (measured; it was most of the multichip dryrun's
        # 8-minute wall) — while numpy fills the same tree in milliseconds.
        rng = np.random.RandomState(seed)
        leaves = []
        for path, leaf in flat:
            kind = leaf_kind(path, leaf)
            if kind == "zeros":
                arr = np.zeros(leaf.shape, np.float32)
            elif kind == "ones":
                arr = np.ones(leaf.shape, np.float32)
            else:
                arr = rng.standard_normal(leaf.shape).astype(np.float32) * scale
            leaves.append(jnp.asarray(arr, leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    base = jax.random.PRNGKey(seed)

    def make_leaf(i, path, leaf):
        kind = leaf_kind(path, leaf)
        if kind == "zeros":
            return jnp.zeros(leaf.shape, leaf.dtype)
        if kind == "ones":
            return jnp.ones(leaf.shape, leaf.dtype)
        key = jax.random.fold_in(base, i)
        return (jax.random.normal(key, leaf.shape, jnp.float32) * scale).astype(leaf.dtype)

    # chunked jits: one giant 1500-output program takes minutes to compile on
    # this host; ~128-leaf programs compile in seconds each
    leaves = []
    CHUNK = 128
    for start in range(0, len(flat), CHUNK):
        chunk = flat[start : start + CHUNK]

        @jax.jit
        def fill_chunk(start=start, chunk=chunk):
            return [make_leaf(start + j, p, l) for j, (p, l) in enumerate(chunk)]

        leaves.extend(fill_chunk())
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _random_params(unet, vae, text, vision, text_cfg, vision_cfg, seed,
                   sample_hw, num_frames, components=("unet", "vae", "text", "vision")):
    # tiny shapes are enough to materialize params (shape-polymorphic apply)
    f = min(num_frames, 2)
    unet_args = dict(
        sample=jnp.zeros((1, f, 16, 16, 4)),
        timestep=jnp.int32(0),
        encoder_hidden_states=jnp.zeros((1, 4, text_cfg.hidden_size)),
        fps=jnp.int32(8),
        image_latents=jnp.zeros((1, f, 16, 16, 4)),
        image_embeddings=jnp.zeros((1, 1, vision_cfg.projection_dim)),
    )
    k = jax.random.PRNGKey(seed)
    builders = {
        "unet": lambda: fast_random_params(lambda: unet.init(k, **unet_args), seed),
        "vae": lambda: fast_random_params(
            lambda: vae.init(k, jnp.zeros((1, 64, 64, 3))), seed + 1),
        "text": lambda: fast_random_params(
            lambda: text.init(k, jnp.zeros((1, 4), jnp.int32)), seed + 2),
        "vision": lambda: fast_random_params(
            lambda: vision.init(
                k, jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3))
            ), seed + 3),
    }
    return {name: builders[name]() for name in components}


def save_params(path: str, params, meta: Dict[str, Any] | None = None) -> None:
    """Flat-key npz save of a params tree; ``meta`` (arch overrides resolved
    at conversion time, e.g. the i2vgen head count) rides along as JSON."""
    import json as _json

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    if meta:
        flat["__meta__"] = np.asarray(_json.dumps(meta))
    np.savez(path, **flat)


def load_params(path: str, return_meta: bool = False):
    import json as _json

    data = np.load(path)
    tree: Dict[str, Any] = {}
    meta: Dict[str, Any] = {}
    for name in data.files:
        if name == "__meta__":
            meta = _json.loads(str(data[name]))
            continue
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[name])
    return (tree, meta) if return_meta else tree


# ===========================================================================
# First-frame image editors (AnyV2V stage one, SURVEY.md §2.4)
# ===========================================================================

from ..models.unet_sd import SD15_IP2P, SDXL_COSXL, SDUNet, SDUNetConfig  # noqa: E402
from ..pipelines.image_edit import CosXLEditPipeline, InstructPix2PixPipeline  # noqa: E402

# SD1.5 text encoder (openai/clip-vit-large-patch14: quick_gelu)
SD15_TEXT = CLIPTextConfig(hidden_size=768, intermediate_size=3072,
                           num_layers=12, num_heads=12, hidden_act="quick_gelu",
                           projection_dim=None)

IMAGE_EDIT_ARCHS = {
    # timbrooks/instruct-pix2pix and vinesmsuic/magicbrush-jul7 share the arch
    "instructpix2pix": dict(unet=SD15_IP2P, vae=VAEConfig(), text=SD15_TEXT),
    "magicbrush": dict(unet=SD15_IP2P, vae=VAEConfig(), text=SD15_TEXT),
    "cosxl": dict(unet=SDXL_COSXL,
                  vae=VAEConfig(scaling_factor=0.13025),  # SDXL VAE scale
                  text=None),
    "instructpix2pix-tiny": dict(
        unet=SDUNetConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                          cross_attention_dim=16, num_attention_heads=2,
                          norm_num_groups=4, dtype=jnp.float32),
        vae=VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_num_groups=4, dtype=jnp.float32),
        text=CLIPTextConfig(vocab_size=49408, hidden_size=16, intermediate_size=32,
                            num_layers=1, num_heads=2, projection_dim=None),
    ),
    "cosxl-tiny": dict(
        unet=SDUNetConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                          cross_attention_dim=16, num_attention_heads=(2, 2, 2),
                          transformer_depth=(1, 1, 2),
                          cross_attn_blocks=(False, True, True),
                          norm_num_groups=4, addition_embed="sdxl",
                          addition_time_embed_dim=8,
                          projection_class_embeddings_input_dim=16 + 6 * 8,
                          dtype=jnp.float32),
        vae=VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_num_groups=4, scaling_factor=0.13025,
                      dtype=jnp.float32),
        text=None,
    ),
}
IMAGE_EDIT_ARCHS["magicbrush-tiny"] = IMAGE_EDIT_ARCHS["instructpix2pix-tiny"]


def build_image_edit_pipeline(
    model: str = "instructpix2pix",
    init: str = "random",
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    pooled_dim: int | None = None,
):
    """Build a first-frame editor (reference ``edit_image.py --model`` names:
    instructpix2pix / magicbrush / cosxl / instantstyle; '-tiny' for CI)."""
    if model.startswith("instantstyle"):
        return build_instantstyle_pipeline(model, init=init, seed=seed, dtype=dtype)
    spec = IMAGE_EDIT_ARCHS[model]
    unet_cfg = _override_dtype(spec["unet"], dtype)
    vae_cfg = _override_dtype(spec["vae"], dtype)
    if unet_cfg.dtype == jnp.float32 or "tiny" in model:
        unet_cfg, vae_cfg = spec["unet"], spec["vae"]  # tiny stays fp32

    unet = SDUNet(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    is_sdxl = unet_cfg.addition_embed == "sdxl"
    text_cfg = spec["text"]
    text = CLIPTextModel(text_cfg) if text_cfg is not None else None

    if init == "random":
        key = jax.random.PRNGKey(seed)
        hw = 64  # latent 8x8: smallest size whose 3 downsamples stay mirrored
        unet_args = dict(
            sample=jnp.zeros((1, hw // 8, hw // 8, unet_cfg.in_channels)),
            timestep=jnp.float32(1.0),
            encoder_hidden_states=jnp.zeros((1, 4, unet_cfg.cross_attention_dim)),
        )
        if is_sdxl:
            pd = pooled_dim or (1280 if "tiny" not in model else 16)
            unet_args["added_text_embeds"] = jnp.zeros((1, pd))
            unet_args["added_time_ids"] = jnp.zeros((1, 6))
        params = {
            "unet": fast_random_params(lambda: unet.init(key, **unet_args), seed),
            "vae": fast_random_params(
                lambda: vae.init(key, jnp.zeros((1, 64, 64, 3))), seed + 1),
        }
        if text is not None:
            params["text"] = fast_random_params(
                lambda: text.init(key, jnp.zeros((1, 4), jnp.int32)), seed + 2)
    elif os.path.exists(init):
        params = load_params(init)
    else:
        raise ValueError(f"unknown init: {init}")

    schedule = make_schedule()
    if is_sdxl:
        return CosXLEditPipeline(unet=unet, vae=vae, schedule=schedule,
                                 params=params)
    return InstructPix2PixPipeline(unet=unet, vae=vae, text_encoder=text,
                                   schedule=schedule, params=params)


# ===========================================================================
# SEINE backbone (seine.pt EMA on SD1.4; SURVEY.md §2.3)
# ===========================================================================

from ..models.unet_seine import SeineUNet, SeineUNetConfig  # noqa: E402
from ..pipelines.seine import SeinePipeline  # noqa: E402

SEINE = dict(
    unet=SeineUNetConfig(),             # 9-ch input, 768 ctx (SD1.4 CLIP-L)
    vae=VAEConfig(),
    text=SD15_TEXT,                     # SD1.4 uses the same CLIP ViT-L
)
SEINE_TINY = dict(
    unet=SeineUNetConfig(
        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
        cross_attention_dim=16, num_attention_heads=2, norm_num_groups=4,
        pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
        pnp_conv_target=(1, 1), dtype=jnp.float32,
    ),
    vae=VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                  norm_num_groups=4, dtype=jnp.float32),
    text=CLIPTextConfig(vocab_size=49408, hidden_size=16, intermediate_size=32,
                        num_layers=1, num_heads=2, projection_dim=None),
)
SEINE_ARCHS = {"seine": SEINE, "seine-tiny": SEINE_TINY}

# SEINE scheduler: plain linear betas 1e-4..0.02
# (seine/configs/ddim_inversion.yaml:26-28), unlike the SD scaled_linear
SEINE_SCHEDULER = dict(beta_start=1e-4, beta_end=0.02, beta_schedule="linear")


def build_seine_pipeline(
    arch: str = "seine",
    init: str = "random",
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    scheduler_kwargs: Dict[str, Any] | None = None,
    mesh=None,
) -> SeinePipeline:
    spec = SEINE_ARCHS[arch]
    unet_cfg = spec["unet"] if "tiny" in arch else _override_dtype(spec["unet"], dtype)
    vae_cfg = spec["vae"] if "tiny" in arch else _override_dtype(spec["vae"], dtype)
    text_cfg = spec["text"]
    unet = SeineUNet(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(text_cfg)

    if init == "random":
        key = jax.random.PRNGKey(seed)
        params = {
            "unet": fast_random_params(
                lambda: unet.init(
                    key,
                    sample=jnp.zeros((1, 2, 16, 16, unet_cfg.in_channels)),
                    timestep=jnp.int32(0),
                    encoder_hidden_states=jnp.zeros((1, 4, text_cfg.hidden_size
                                                     if "tiny" in arch
                                                     else unet_cfg.cross_attention_dim)),
                ), seed),
            "vae": fast_random_params(
                lambda: vae.init(key, jnp.zeros((1, 64, 64, 3))), seed + 1),
            "text": fast_random_params(
                lambda: text.init(key, jnp.zeros((1, 4), jnp.int32)), seed + 2),
        }
    elif os.path.exists(init):
        params = load_params(init)
    else:
        raise ValueError(f"unknown init: {init}")

    schedule = make_schedule(**{**SEINE_SCHEDULER, **(scheduler_kwargs or {})})
    return SeinePipeline(unet=unet, vae=vae, text_encoder=text,
                         schedule=schedule, params=params, mesh=mesh)


# ===========================================================================
# InstantStyle (SDXL + canny ControlNet + IP-Adapter; SURVEY.md §2.4)
# ===========================================================================

from ..models.controlnet import ControlNet  # noqa: E402
from ..pipelines.instantstyle import ImageProjModel, InstantStylePipeline  # noqa: E402


def build_instantstyle_pipeline(
    arch: str = "instantstyle",
    init: str = "random",
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    clip_embed_dim: int | None = None,
) -> InstantStylePipeline:
    """SDXL base + controlnet-canny-sdxl + ip-adapter_sdxl (style target
    block up_blocks.0.attentions.1 -> flax 'up_0_attn_1'); '-tiny' for CI."""
    import dataclasses as _dc

    if arch == "instantstyle":
        unet_cfg = _dc.replace(SDXL_COSXL, in_channels=4,
                               ip_adapter_targets=("up_0_attn_1",), dtype=dtype)
        vae_cfg = VAEConfig(scaling_factor=0.13025, dtype=dtype)
        clip_dim = clip_embed_dim or 1280   # OpenCLIP bigG projection
        pooled_dim = 1280
    elif arch == "instantstyle-tiny":
        unet_cfg = SDUNetConfig(
            in_channels=4, block_out_channels=(8, 16, 16), layers_per_block=1,
            cross_attention_dim=16, num_attention_heads=(2, 2, 2),
            transformer_depth=(1, 1, 2), cross_attn_blocks=(False, True, True),
            norm_num_groups=4, addition_embed="sdxl", addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=16 + 6 * 8,
            ip_adapter_targets=("up_0_attn_1",), dtype=jnp.float32)
        vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                            norm_num_groups=4, scaling_factor=0.13025,
                            dtype=jnp.float32)
        clip_dim = clip_embed_dim or 16
        pooled_dim = 16
    else:
        raise ValueError(arch)

    unet = SDUNet(unet_cfg)
    controlnet = ControlNet(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    proj = ImageProjModel(cross_attention_dim=unet_cfg.cross_attention_dim,
                          num_tokens=4,
                          dtype=unet_cfg.dtype)

    if init == "random":
        key = jax.random.PRNGKey(seed)
        hw = 64
        base_args = dict(
            timestep=jnp.float32(1.0),
            encoder_hidden_states=jnp.zeros((1, 4, unet_cfg.cross_attention_dim)),
            added_text_embeds=jnp.zeros((1, pooled_dim)),
            added_time_ids=jnp.zeros((1, 6)),
        )
        params = {
            "unet": fast_random_params(
                lambda: unet.init(
                    key, sample=jnp.zeros((1, hw // 8, hw // 8, 4)),
                    ip_tokens=jnp.zeros((1, 4, unet_cfg.cross_attention_dim)),
                    **base_args), seed),
            "controlnet": fast_random_params(
                lambda: controlnet.init(
                    key, sample=jnp.zeros((1, hw // 8, hw // 8, 4)),
                    controlnet_cond=jnp.zeros((1, hw, hw, 3)), **base_args),
                seed + 1),
            "vae": fast_random_params(
                lambda: vae.init(key, jnp.zeros((1, 64, 64, 3))), seed + 2),
            "image_proj": fast_random_params(
                lambda: proj.init(key, jnp.zeros((1, clip_dim))), seed + 3),
        }
    elif os.path.exists(init):
        params = load_params(init)
    else:
        raise ValueError(f"unknown init: {init}")

    return InstantStylePipeline(unet=unet, controlnet=controlnet, vae=vae,
                                image_proj=proj, schedule=make_schedule(),
                                params=params)





# ===========================================================================
# SDXL dual text encoders (CosXL / InstantStyle prompt encoding)
# ===========================================================================

# text_encoder: CLIP ViT-L, penultimate hidden states, no projection used
SDXL_TEXT_1 = CLIPTextConfig(hidden_size=768, intermediate_size=3072,
                             num_layers=12, num_heads=12, hidden_act="quick_gelu",
                             projection_dim=None)
# text_encoder_2: OpenCLIP ViT-bigG, penultimate hiddens + projected pooled
SDXL_TEXT_2 = CLIPTextConfig(hidden_size=1280, intermediate_size=5120,
                             num_layers=32, num_heads=20, hidden_act="gelu",
                             projection_dim=1280)
SDXL_TEXT_2_TINY = CLIPTextConfig(vocab_size=49408, hidden_size=16,
                                  intermediate_size=32, num_layers=2,
                                  num_heads=2, projection_dim=16)


def build_sdxl_text_encoders(tiny: bool = False, seed: int = 0):
    """Returns ((enc1, params1), (enc2, params2)) for SDXL prompt encoding."""
    cfg1 = (CLIPTextConfig(vocab_size=49408, hidden_size=16, intermediate_size=32,
                           num_layers=2, num_heads=2, projection_dim=None)
            if tiny else SDXL_TEXT_1)
    cfg2 = SDXL_TEXT_2_TINY if tiny else SDXL_TEXT_2
    enc1, enc2 = CLIPTextModel(cfg1), CLIPTextModel(cfg2)
    key = jax.random.PRNGKey(seed)
    p1 = fast_random_params(lambda: enc1.init(key, jnp.zeros((1, 4), jnp.int32)), seed)
    p2 = fast_random_params(lambda: enc2.init(key, jnp.zeros((1, 4), jnp.int32)), seed + 1)
    return (enc1, p1), (enc2, p2)


def encode_sdxl_prompt(enc1, params1, enc2, params2, input_ids1, input_ids2):
    """SDXL prompt embedding recipe: concat of both encoders' PENULTIMATE
    hidden states on the feature axis (768 + 1280 = 2048) + text_encoder_2's
    projected pooled output (diffusers SDXL encode_prompt semantics)."""
    h1, _ = enc1.apply(params1, input_ids1, penultimate=True)
    h2, pooled2 = enc2.apply(params2, input_ids2, penultimate=True)
    return jnp.concatenate([h1, h2], axis=-1), pooled2
