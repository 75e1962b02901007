"""Extract the LITERAL state-dict key list of the reference SEINE UNet.

VERDICT r4 item 9 (real-checkpoint dress rehearsal): `seine.pt`'s "ema"
dict is loaded with strict `load_state_dict` into the model built by
`UNet3DConditionModel.from_pretrained_2d(..., use_concat=True)`
(`/root/reference/seine/run_pnp_edit.py:53-66`), so the model's own
state-dict keys ARE the checkpoint's keys. The model definition is fully
in-tree (`/root/reference/seine/models/`); only five diffusers symbols and
`rotary_embedding_torch` are imported, none of which alters the module
TREE: ConfigMixin/register_to_config (config capture), ModelMixin
(nn.Module + dtype plumbing), BaseOutput/logging (no params), and
TimestepEmbedding/Timesteps whose two-Linear layout (`linear_1`/`linear_2`)
is stable across every diffusers version the reference supports.
`rotary_embedding_torch` is satisfied by the reference's OWN vendored copy
(`consisti2v/consisti2v/models/rotary_embedding.py`, version-matching the
0.3.5 pin) so buffer/Parameter registration is the reference's own.

Instantiation is on the torch meta device — keys + shapes, no memory.

The literal config is transcribed in the reference source itself
(`models/unet.py:546-581` comment = SD1.4 unet/config.json) plus the
`from_pretrained_2d` mutations (3D block types, in_channels 9,
use_first_frame False — `models/unet.py:588-604`).
"""

from __future__ import annotations

import importlib
import importlib.util
import json
import sys
import types

SEINE_ROOT = "/root/reference/seine"
ROTARY_SRC = "/root/reference/consisti2v/consisti2v/models/rotary_embedding.py"

# the literal SD1.4 unet config (models/unet.py:546-581) with the
# from_pretrained_2d(use_concat=True) mutations applied (:588-604)
SEINE_CONFIG = {
    "sample_size": 64,
    "in_channels": 9,
    "out_channels": 4,
    "center_input_sample": False,
    "flip_sin_to_cos": True,
    "freq_shift": 0,
    "down_block_types": ["CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
                         "CrossAttnDownBlock3D", "DownBlock3D"],
    "up_block_types": ["UpBlock3D", "CrossAttnUpBlock3D",
                       "CrossAttnUpBlock3D", "CrossAttnUpBlock3D"],
    "block_out_channels": [320, 640, 1280, 1280],
    "layers_per_block": 2,
    "downsample_padding": 1,
    "mid_block_scale_factor": 1,
    "act_fn": "silu",
    "norm_num_groups": 32,
    "norm_eps": 1e-5,
    "cross_attention_dim": 768,
    "attention_head_dim": 8,
    "use_first_frame": False,
}


def _install_stubs() -> None:
    import inspect

    import torch
    import torch.nn as nn

    if "diffusers" in sys.modules:
        # a previous extractor installed a stub; ensure it covers SEINE's
        # import surface (the consisti2v superset does), then add only the
        # rotary shim below
        d = sys.modules["diffusers"]
        assert hasattr(d.models.embeddings, "TimestepEmbedding")
        _install_rotary()
        return

    class _FrozenConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    def register_to_config(init):
        import functools

        @functools.wraps(init)  # keep the signature for from_config
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

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift

    class TimestepEmbedding(nn.Module):
        # diffusers layout, stable since 0.2.x: linear_1 -> act -> linear_2
        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None, post_act_fn=None, cond_proj_dim=None):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(
                time_embed_dim, out_dim if out_dim is not None
                else time_embed_dim)

    class GEGLU(nn.Module):
        # diffusers layout: one fused proj Linear(dim_in, dim_out * 2)
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out * 2)

    class FeedForward(nn.Module):
        # diffusers layout, stable across the versions the reference
        # supports: net.0 = activation module (GEGLU default, holding the
        # in-projection), net.1 = Dropout, net.2 = Linear(inner, dim_out)
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
        # diffusers layout: emb (Embedding) -> silu -> linear -> chunked
        # scale/shift over a param-free LayerNorm
        def __init__(self, embedding_dim, num_embeddings):
            super().__init__()
            self.emb = nn.Embedding(num_embeddings, embedding_dim)
            self.silu = nn.SiLU()
            self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
            self.norm = nn.LayerNorm(embedding_dim,
                                     elementwise_affine=False)

    class _Logger:
        def __getattr__(self, name):
            return lambda *a, **k: None

    d = types.ModuleType("diffusers")
    cu = types.ModuleType("diffusers.configuration_utils")
    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    du = types.ModuleType("diffusers.utils")
    du.BaseOutput = BaseOutput
    du.WEIGHTS_NAME = "diffusion_pytorch_model.bin"
    du.logging = types.SimpleNamespace(get_logger=lambda *a, **k: _Logger())
    dm = types.ModuleType("diffusers.models")
    dmu = types.ModuleType("diffusers.models.modeling_utils")
    dmu.ModelMixin = ModelMixin
    dme = types.ModuleType("diffusers.models.embeddings")
    dme.TimestepEmbedding = TimestepEmbedding
    dme.Timesteps = Timesteps
    diu = types.ModuleType("diffusers.utils.import_utils")
    diu.is_xformers_available = lambda: False
    du.import_utils = diu
    dma = types.ModuleType("diffusers.models.attention")
    dma.FeedForward = FeedForward
    dma.AdaLayerNorm = AdaLayerNorm
    d.configuration_utils = cu
    d.utils = du
    d.models = dm
    dm.modeling_utils = dmu
    dm.embeddings = dme
    dm.attention = dma
    for name, mod in (("diffusers", d),
                      ("diffusers.configuration_utils", cu),
                      ("diffusers.utils", du),
                      ("diffusers.utils.import_utils", diu),
                      ("diffusers.models", dm),
                      ("diffusers.models.modeling_utils", dmu),
                      ("diffusers.models.embeddings", dme),
                      ("diffusers.models.attention", dma)):
        sys.modules[name] = mod

    _install_rotary()


def _install_rotary() -> None:
    if "rotary_embedding_torch" in sys.modules:
        return
    if "beartype" not in sys.modules:
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
    spec = importlib.util.spec_from_file_location(
        "rotary_embedding_torch", ROTARY_SRC)
    rot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rot)
    sys.modules["rotary_embedding_torch"] = rot


def seine_unet_state_dict_shapes() -> dict[str, list[int]]:
    """{key: shape} of the reference SEINE UNet at the real seine.pt
    architecture, instantiated from the reference source on meta device."""
    import torch

    _install_stubs()
    if SEINE_ROOT not in sys.path:
        sys.path.insert(0, SEINE_ROOT)
    unet_mod = importlib.import_module("models.unet")
    with torch.device("meta"):
        model = unet_mod.UNet3DConditionModel.from_config(dict(SEINE_CONFIG))
    return {k: list(v.shape) for k, v in model.state_dict().items()}


if __name__ == "__main__":
    shapes = seine_unet_state_dict_shapes()
    print(json.dumps(shapes, indent=0))