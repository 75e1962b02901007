"""Extract the LITERAL state-dict key list of the reference ConsistI2V UNet.

VERDICT r4 item 9: `TIGER-Lab/ConsistI2V`'s unet weights are loaded into
the vendored `VideoLDMUNet3DConditionModel`
(`/root/reference/consisti2v/consisti2v/models/videoldm_unet.py`), whose
module tree — and therefore checkpoint key surface — is fully determined
by that in-tree source given the config. The vendored files import a
larger diffusers surface than SEINE's; the parameter-bearing pieces that
must be stubbed faithfully (ResnetBlock2D, Down/Upsample2D,
Down/UpBlock2D bases, FeedForward/GEGLU, TimestepEmbedding) follow the
diffusers layouts that every SD checkpoint on disk witnesses; everything
novel (conv3ds/alpha temporal resnets, tempo_attns, first-frame
conditioning modules, frame-stride embedding, ConditionalAttention)
comes from the reference's own files. Rotary freqs use the reference's
vendored rotary module via the package's own relative import.

Config provenance:
- the SD2.1-base UNet constants (block_out 320/640/1280/1280, cross 1024,
  heads [5,10,20,20] (=64/head), use_linear_projection True,
  layers_per_block 2) — public base-model constants;
- the ConsistI2V additions (use_temporal, n_frames 16, n_temp_heads 8,
  first_frame_condition_mode "concat", rotary temporal PE, augmented
  temporal attention, frame-stride condition) — SURVEY §2.2 /
  the reference pipeline defaults (`videoldm_unet.py:131-137`).

Meta-device instantiation: keys + shapes only.
"""

from __future__ import annotations

import importlib
import json
import sys
import types

CONSISTI2V_ROOT = "/root/reference/consisti2v"

CONSISTI2V_CONFIG = {
    "sample_size": 64,
    "in_channels": 4,
    "out_channels": 4,
    "center_input_sample": False,
    "flip_sin_to_cos": True,
    "freq_shift": 0,
    "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                         "CrossAttnDownBlock2D", "DownBlock2D"],
    "mid_block_type": "UNetMidBlock2DCrossAttn",
    "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D",
                       "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"],
    "only_cross_attention": False,
    "block_out_channels": [320, 640, 1280, 1280],
    "layers_per_block": 2,
    "downsample_padding": 1,
    "mid_block_scale_factor": 1,
    "act_fn": "silu",
    "norm_num_groups": 32,
    "norm_eps": 1e-5,
    "cross_attention_dim": 1024,
    "attention_head_dim": [5, 10, 20, 20],
    "use_linear_projection": True,
    # ConsistI2V additions
    "use_temporal": True,
    "n_frames": 16,
    "n_temp_heads": 8,
    "first_frame_condition_mode": "concat",
    "augment_temporal_attention": True,
    "temp_pos_embedding": "rotary",
    "use_frame_stride_condition": True,
}


def _install_stubs() -> None:
    import inspect

    import torch
    import torch.nn as nn

    d_prev = sys.modules.get("diffusers")
    if d_prev is not None and hasattr(getattr(d_prev, "models", None),
                                      "resnet"):
        return  # this superset stub (or richer) is already installed
    # (a smaller stub — e.g. extract_seine's — is upgraded in place below)

    class _FrozenConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    def register_to_config(init):
        import functools

        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items()
                   if k not in ("self",) and not k.startswith("_")}
            self._internal_dict = _FrozenConfig(cfg)
            init(self, *args, **kwargs)
        return wrapped

    class ConfigMixin:
        @property
        def config(self):
            return getattr(self, "_internal_dict", _FrozenConfig())

        @classmethod
        def from_config(cls, config):
            sig = inspect.signature(cls.__init__)
            accepted = {k: v for k, v in dict(config).items()
                        if k in sig.parameters}
            return cls(**accepted)

    class ModelMixin(nn.Module):
        @property
        def dtype(self):
            for p in self.parameters():
                return p.dtype
            return torch.float32

    class BaseOutput(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            for k, v in kw.items():
                setattr(self, k, v)

    # ---- faithful diffusers parameter layouts (witnessed by every SD
    # checkpoint: resnets.N.{norm1,conv1,time_emb_proj,norm2,conv2,
    # conv_shortcut}, downsamplers.0.conv, upsamplers.0.conv, ff GEGLU) ----

    LoRACompatibleConv = nn.Conv2d
    LoRACompatibleLinear = nn.Linear

    class ResnetBlock2D(nn.Module):
        def __init__(self, *, in_channels, out_channels=None,
                     conv_shortcut=False, dropout=0.0, temb_channels=512,
                     groups=32, groups_out=None, pre_norm=True, eps=1e-6,
                     non_linearity="swish", skip_time_act=False,
                     time_embedding_norm="default", kernel=None,
                     output_scale_factor=1.0, use_in_shortcut=None, up=False,
                     down=False, conv_shortcut_bias=True,
                     conv_2d_out_channels=None):
            super().__init__()
            out_channels = in_channels if out_channels is None else out_channels
            self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
            self.conv1 = LoRACompatibleConv(in_channels, out_channels, 3,
                                            padding=1)
            if temb_channels is not None:
                n_out = (out_channels * 2
                         if time_embedding_norm == "scale_shift"
                         else out_channels)
                self.time_emb_proj = LoRACompatibleLinear(temb_channels, n_out)
            self.norm2 = nn.GroupNorm(groups_out or groups, out_channels,
                                      eps=eps)
            self.dropout = nn.Dropout(dropout)
            conv_2d_out_channels = conv_2d_out_channels or out_channels
            self.conv2 = LoRACompatibleConv(out_channels, conv_2d_out_channels,
                                            3, padding=1)
            use_in_shortcut = (in_channels != conv_2d_out_channels
                               if use_in_shortcut is None else use_in_shortcut)
            if use_in_shortcut:
                self.conv_shortcut = LoRACompatibleConv(
                    in_channels, conv_2d_out_channels, 1,
                    bias=conv_shortcut_bias)

    class Downsample2D(nn.Module):
        def __init__(self, channels, use_conv=False, out_channels=None,
                     padding=1, name="conv"):
            super().__init__()
            out_channels = out_channels or channels
            assert use_conv
            self.conv = LoRACompatibleConv(channels, out_channels, 3,
                                           stride=2, padding=padding)

    class Upsample2D(nn.Module):
        def __init__(self, channels, use_conv=False,
                     use_conv_transpose=False, out_channels=None,
                     name="conv"):
            super().__init__()
            out_channels = out_channels or channels
            assert use_conv and not use_conv_transpose
            self.conv = LoRACompatibleConv(channels, out_channels, 3,
                                           padding=1)

    class DownBlock2D(nn.Module):
        # positional signature matched to the vendored
        # VideoLDMDownBlock.super().__init__ call
        # (videoldm_unet_blocks.py:969-982)
        def __init__(self, in_channels, out_channels, temb_channels,
                     dropout=0.0, num_layers=1, resnet_eps=1e-6,
                     resnet_time_scale_shift="default",
                     resnet_act_fn="swish", resnet_groups=32,
                     resnet_pre_norm=True, output_scale_factor=1.0,
                     add_downsample=True, downsample_padding=1):
            super().__init__()
            self.resnets = nn.ModuleList([
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels, temb_channels=temb_channels,
                    eps=resnet_eps, groups=resnet_groups, dropout=dropout,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                    pre_norm=resnet_pre_norm)
                for i in range(num_layers)])
            self.downsamplers = None
            if add_downsample:
                self.downsamplers = nn.ModuleList([Downsample2D(
                    out_channels, use_conv=True, out_channels=out_channels,
                    padding=downsample_padding, name="op")])
            self.gradient_checkpointing = False

    class UpBlock2D(nn.Module):
        # positional signature matched to VideoLDMUpBlock.super().__init__
        # (videoldm_unet_blocks.py:1076-1090)
        def __init__(self, in_channels, prev_output_channel, out_channels,
                     temb_channels, dropout=0.0, num_layers=1,
                     resnet_eps=1e-6, resnet_time_scale_shift="default",
                     resnet_act_fn="swish", resnet_groups=32,
                     resnet_pre_norm=True, output_scale_factor=1.0,
                     add_upsample=True):
            super().__init__()
            resnets = []
            for i in range(num_layers):
                res_skip = in_channels if (i == num_layers - 1) \
                    else out_channels
                res_in = prev_output_channel if i == 0 else out_channels
                resnets.append(ResnetBlock2D(
                    in_channels=res_in + res_skip, out_channels=out_channels,
                    temb_channels=temb_channels, eps=resnet_eps,
                    groups=resnet_groups, dropout=dropout,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                    pre_norm=resnet_pre_norm))
            self.resnets = nn.ModuleList(resnets)
            self.upsamplers = None
            if add_upsample:
                self.upsamplers = nn.ModuleList([Upsample2D(
                    out_channels, use_conv=True, out_channels=out_channels)])
            self.gradient_checkpointing = False

    class Attention(nn.Module):
        # diffusers processor-based Attention, the subset reachable at the
        # ConsistI2V config (every exotic arm asserted off so it cannot
        # silently mis-model): to_q/to_k/to_v bias-less + to_out [Linear,
        # Dropout]. Subclassed by the vendored TemporalConditionalAttention,
        # which reads self.inner_dim and calls set_processor.
        def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                     dim_head=64, dropout=0.0, bias=False,
                     upcast_attention=False, upcast_softmax=False,
                     cross_attention_norm=None,
                     cross_attention_norm_num_groups=32,
                     added_kv_proj_dim=None, norm_num_groups=None,
                     spatial_norm_dim=None, out_bias=True, scale_qk=True,
                     only_cross_attention=False, eps=1e-5,
                     rescale_output_factor=1.0, residual_connection=False,
                     _from_deprecated_attn_block=False, processor=None,
                     out_dim=None):
            super().__init__()
            assert norm_num_groups is None and spatial_norm_dim is None
            assert cross_attention_norm is None and added_kv_proj_dim is None
            assert out_dim is None
            self.inner_dim = dim_head * heads
            self.heads = heads
            self.cross_attention_dim = cross_attention_dim or query_dim
            self.to_q = LoRACompatibleLinear(query_dim, self.inner_dim,
                                             bias=bias)
            self.to_k = LoRACompatibleLinear(self.cross_attention_dim,
                                             self.inner_dim, bias=bias)
            self.to_v = LoRACompatibleLinear(self.cross_attention_dim,
                                             self.inner_dim, bias=bias)
            self.to_out = nn.ModuleList(
                [LoRACompatibleLinear(self.inner_dim, query_dim,
                                      bias=out_bias), nn.Dropout(dropout)])
            self.processor = processor

        def set_processor(self, processor):
            self.processor = processor

    class GEGLU(nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

    class FeedForward(nn.Module):
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", final_dropout=False):
            super().__init__()
            inner = int(dim * mult)
            dim_out = dim_out if dim_out is not None else dim
            assert activation_fn == "geglu", activation_fn
            self.net = nn.ModuleList(
                [GEGLU(dim, inner), nn.Dropout(dropout),
                 nn.Linear(inner, dim_out)])

    class AdaLayerNorm(nn.Module):
        def __init__(self, embedding_dim, num_embeddings):
            super().__init__()
            self.emb = nn.Embedding(num_embeddings, embedding_dim)
            self.silu = nn.SiLU()
            self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
            self.norm = nn.LayerNorm(embedding_dim,
                                     elementwise_affine=False)

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos,
                     downscale_freq_shift):
            super().__init__()
            self.num_channels = num_channels

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None, post_act_fn=None, cond_proj_dim=None):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(
                time_embed_dim, out_dim if out_dim is not None
                else time_embed_dim)

    def get_activation(name):
        return {"silu": nn.SiLU, "swish": nn.SiLU, "gelu": nn.GELU,
                "relu": nn.ReLU, "mish": nn.Mish}[name]()

    class _Unused(nn.Module):
        """Placeholder for imported-but-not-constructed classes; loudly
        refuses instantiation so a config that needs them cannot silently
        produce a wrong fixture."""

        def __init__(self, *a, **k):
            raise NotImplementedError(
                f"{type(self).__name__} stub was instantiated — the "
                "extraction config reaches a module this stub does not "
                "model faithfully")

    class _Logger:
        def __getattr__(self, name):
            return lambda *a, **k: None

    def _unused_named(name):
        return type(name, (_Unused,), {})

    # ---- module graph ----
    d = types.ModuleType("diffusers")
    d.__version__ = "0.21.0"
    cu = types.ModuleType("diffusers.configuration_utils")
    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    du = types.ModuleType("diffusers.utils")
    du.BaseOutput = BaseOutput
    du.CONFIG_NAME = "config.json"
    du.DIFFUSERS_CACHE = ""
    du.FLAX_WEIGHTS_NAME = "diffusion_flax_model.msgpack"
    du.HF_HUB_OFFLINE = True
    du.SAFETENSORS_WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"
    du.WEIGHTS_NAME = "diffusion_pytorch_model.bin"
    du._add_variant = lambda name, variant=None: name
    du._get_model_file = lambda *a, **k: None
    du.deprecate = lambda *a, **k: None
    du.is_accelerate_available = lambda: False
    du.is_torch_version = lambda op, v: True
    du.logging = types.SimpleNamespace(get_logger=lambda *a, **k: _Logger())
    diu = types.ModuleType("diffusers.utils.import_utils")
    diu.is_xformers_available = lambda: False
    du.import_utils = diu
    dtu = types.ModuleType("diffusers.utils.torch_utils")
    dtu.maybe_allow_in_graph = lambda cls: cls
    du.torch_utils = dtu

    dm = types.ModuleType("diffusers.models")
    dm.ModelMixin = ModelMixin
    dmu = types.ModuleType("diffusers.models.modeling_utils")
    dmu.ModelMixin = ModelMixin
    dmu.load_state_dict = lambda *a, **k: {}
    dmu.load_model_dict_into_meta = lambda *a, **k: []
    dme = types.ModuleType("diffusers.models.embeddings")
    dme.TimestepEmbedding = TimestepEmbedding
    dme.Timesteps = Timesteps
    for nm in ("GaussianFourierProjection", "ImageHintTimeEmbedding",
               "ImageProjection", "ImageTimeEmbedding", "PositionNet",
               "TextImageProjection", "TextImageTimeEmbedding",
               "TextTimeEmbedding", "ImagePositionalEmbeddings",
               "PatchEmbed"):
        setattr(dme, nm, _unused_named(nm))
    dma = types.ModuleType("diffusers.models.attention")
    dma.FeedForward = FeedForward
    dma.AdaLayerNorm = AdaLayerNorm
    dma.AdaLayerNormZero = _unused_named("AdaLayerNormZero")
    dma.GatedSelfAttentionDense = _unused_named("GatedSelfAttentionDense")
    dmap = types.ModuleType("diffusers.models.attention_processor")
    dmap.ADDED_KV_ATTENTION_PROCESSORS = ()
    dmap.CROSS_ATTENTION_PROCESSORS = ()
    dmap.AttentionProcessor = object
    dmap.AttnAddedKVProcessor = type("AttnAddedKVProcessor", (), {})
    dmap.LORA_ATTENTION_PROCESSORS = ()
    for nm in ("AttnProcessor", "AttnProcessor2_0", "AttnAddedKVProcessor2_0",
               "SpatialNorm", "CustomDiffusionAttnProcessor",
               "CustomDiffusionXFormersAttnProcessor",
               "SlicedAttnAddedKVProcessor", "XFormersAttnAddedKVProcessor",
               "LoRAAttnAddedKVProcessor", "XFormersAttnProcessor",
               "LoRAXFormersAttnProcessor", "LoRAAttnProcessor",
               "LoRAAttnProcessor2_0", "SlicedAttnProcessor"):
        setattr(dmap, nm, type(nm, (), {}))
    dmap.Attention = Attention
    dmr = types.ModuleType("diffusers.models.resnet")
    dmr.ResnetBlock2D = ResnetBlock2D
    dmr.Downsample2D = Downsample2D
    dmr.Upsample2D = Upsample2D
    dmt = types.ModuleType("diffusers.models.transformer_2d")
    dmt.Transformer2DModelOutput = BaseOutput
    dmd = types.ModuleType("diffusers.models.dual_transformer_2d")
    dmd.DualTransformer2DModel = _unused_named("DualTransformer2DModel")
    dmac = types.ModuleType("diffusers.models.activations")
    dmac.get_activation = get_activation
    dmb = types.ModuleType("diffusers.models.unet_2d_blocks")
    dmb.DownBlock2D = DownBlock2D
    dmb.UpBlock2D = UpBlock2D
    dmb.UNetMidBlock2DCrossAttn = _unused_named("UNetMidBlock2DCrossAttn")
    dmb.UNetMidBlock2DSimpleCrossAttn = _unused_named(
        "UNetMidBlock2DSimpleCrossAttn")
    dmc = types.ModuleType("diffusers.models.unet_2d_condition")
    dmc.UNet2DConditionOutput = BaseOutput
    dml = types.ModuleType("diffusers.models.lora")
    dml.LoRACompatibleConv = LoRACompatibleConv
    dml.LoRACompatibleLinear = LoRACompatibleLinear
    dml.LoRALinearLayer = _unused_named("LoRALinearLayer")
    dlo = types.ModuleType("diffusers.loaders")
    dlo.UNet2DConditionLoadersMixin = type("UNet2DConditionLoadersMixin",
                                           (), {})

    if "beartype" not in sys.modules:  # for the vendored rotary module
        import typing

        bt = types.ModuleType("beartype")
        bt.beartype = lambda f: f
        bt_typing = types.ModuleType("beartype.typing")
        for nm in ("Literal", "Union", "Optional", "Tuple", "List",
                   "Callable"):
            setattr(bt_typing, nm, getattr(typing, nm))
        bt.typing = bt_typing
        sys.modules["beartype"] = bt
        sys.modules["beartype.typing"] = bt_typing
    d.configuration_utils = cu
    d.utils = du
    d.models = dm
    d.loaders = dlo
    dm.modeling_utils = dmu
    dm.embeddings = dme
    dm.attention = dma
    dm.attention_processor = dmap
    dm.resnet = dmr
    dm.transformer_2d = dmt
    dm.dual_transformer_2d = dmd
    dm.activations = dmac
    dm.unet_2d_blocks = dmb
    dm.unet_2d_condition = dmc
    dm.lora = dml
    for name, mod in (
            ("diffusers", d),
            ("diffusers.configuration_utils", cu),
            ("diffusers.utils", du),
            ("diffusers.utils.import_utils", diu),
            ("diffusers.utils.torch_utils", dtu),
            ("diffusers.loaders", dlo),
            ("diffusers.models", dm),
            ("diffusers.models.modeling_utils", dmu),
            ("diffusers.models.embeddings", dme),
            ("diffusers.models.attention", dma),
            ("diffusers.models.attention_processor", dmap),
            ("diffusers.models.resnet", dmr),
            ("diffusers.models.transformer_2d", dmt),
            ("diffusers.models.dual_transformer_2d", dmd),
            ("diffusers.models.activations", dmac),
            ("diffusers.models.unet_2d_blocks", dmb),
            ("diffusers.models.unet_2d_condition", dmc),
            ("diffusers.models.lora", dml)):
        sys.modules[name] = mod


def consisti2v_unet_state_dict_shapes() -> dict[str, list[int]]:
    """{key: shape} of the reference ConsistI2V UNet at the production
    architecture, instantiated from the reference source on meta device."""
    import torch

    _install_stubs()
    if CONSISTI2V_ROOT not in sys.path:
        sys.path.insert(0, CONSISTI2V_ROOT)
    unet_mod = importlib.import_module("consisti2v.models.videoldm_unet")
    with torch.device("meta"):
        model = unet_mod.VideoLDMUNet3DConditionModel.from_config(
            dict(CONSISTI2V_CONFIG))
    return {k: list(v.shape) for k, v in model.state_dict().items()}


if __name__ == "__main__":
    print(json.dumps(consisti2v_unet_state_dict_shapes(), indent=0))