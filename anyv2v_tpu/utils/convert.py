"""Torch/HF checkpoint -> flax params conversion.

The reference loads all weights via HF ``from_pretrained`` (SURVEY.md §2.8:
ali-vilab/i2vgen-xl, TIGER-Lab/ConsistI2V, SD1.4 + seine.pt, SDXL + adapters).
This module converts torch state dicts (as numpy; loadable from safetensors
or ``torch.load`` including SEINE's ``["ema"]`` sub-dict,
``seine/run_ddim_inversion.py:77``) into this framework's flax param trees.

Conventions:
- torch Linear ``weight`` [out, in] -> flax Dense ``kernel`` [in, out] (transpose)
- torch Conv2d ``weight`` [out, in, kh, kw] -> flax ``kernel`` [kh, kw, in, out]
- torch Conv3d ``weight`` [out, in, kf, kh, kw] -> [kf, kh, kw, in, out]
- norm ``weight``/``bias`` -> ``scale``/``bias``
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import numpy as np


Tree = Dict[str, Any]


def t_linear(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> Tree:
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_conv(sd: Mapping[str, np.ndarray], prefix: str) -> Tree:
    w = np.asarray(sd[f"{prefix}.weight"])
    if w.ndim == 4:
        kernel = w.transpose(2, 3, 1, 0)
    elif w.ndim == 5:
        kernel = w.transpose(2, 3, 4, 1, 0)
    else:
        raise ValueError(f"unexpected conv weight rank {w.ndim} at {prefix}")
    out = {"kernel": np.ascontiguousarray(kernel)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_norm(sd: Mapping[str, np.ndarray], prefix: str) -> Tree:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def t_embed(sd: Mapping[str, np.ndarray], prefix: str) -> Tree:
    return {"embedding": np.asarray(sd[f"{prefix}.weight"])}


def _clip_layer(sd: Mapping[str, np.ndarray], p: str) -> Tree:
    return {
        "self_attn": {
            "q_proj": t_linear(sd, f"{p}.self_attn.q_proj"),
            "k_proj": t_linear(sd, f"{p}.self_attn.k_proj"),
            "v_proj": t_linear(sd, f"{p}.self_attn.v_proj"),
            "out_proj": t_linear(sd, f"{p}.self_attn.out_proj"),
        },
        "layer_norm1": t_norm(sd, f"{p}.layer_norm1"),
        "layer_norm2": t_norm(sd, f"{p}.layer_norm2"),
        "fc1": t_linear(sd, f"{p}.mlp.fc1"),
        "fc2": t_linear(sd, f"{p}.mlp.fc2"),
    }


def convert_clip_text(sd: Mapping[str, np.ndarray], num_layers: int) -> Tree:
    """HF ``CLIPTextModel(WithProjection)`` state dict -> CLIPTextModel params."""
    base = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    params: Tree = {
        "token_embedding": t_embed(sd, f"{base}embeddings.token_embedding"),
        "position_embedding": np.asarray(sd[f"{base}embeddings.position_embedding.weight"]),
        "final_layer_norm": t_norm(sd, f"{base}final_layer_norm"),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _clip_layer(sd, f"{base}encoder.layers.{i}")
    if "text_projection.weight" in sd:
        params["text_projection"] = t_linear(sd, "text_projection", bias=False)
    return params


def convert_clip_vision(sd: Mapping[str, np.ndarray], num_layers: int) -> Tree:
    """HF ``CLIPVisionModelWithProjection`` state dict -> CLIPVisionModel params."""
    base = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    params: Tree = {
        "class_embedding": np.asarray(sd[f"{base}embeddings.class_embedding"]),
        "position_embedding": np.asarray(sd[f"{base}embeddings.position_embedding.weight"]),
        "patch_embedding": t_conv(sd, f"{base}embeddings.patch_embedding"),
        # NB: "pre_layrnorm" typo is in the HF checkpoint format itself
        "pre_layrnorm": t_norm(sd, f"{base}pre_layrnorm"),
        "post_layernorm": t_norm(sd, f"{base}post_layernorm"),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _clip_layer(sd, f"{base}encoder.layers.{i}")
    if "visual_projection.weight" in sd:
        params["visual_projection"] = t_linear(sd, "visual_projection", bias=False)
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file into numpy: safetensors or torch pickle.

    Handles SEINE-style nested dicts (``ckpt["ema"]``) by taking the largest
    tensor-dict found.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))

    import torch  # CPU-only wheel is in the image; never used on the TPU path

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and not any(hasattr(v, "numpy") for v in obj.values()):
        # nested container: prefer 'ema' (seine.pt), else 'state_dict', else largest
        for key in ("ema", "state_dict", "module"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in obj.items() if hasattr(v, "numpy")}


# ===========================================================================
# UNet / VAE converters
#
# Each converter maps a torch/HF state dict (numpy values) onto the matching
# flax module tree from anyv2v_tpu.models. Reference loading sites:
# - i2vgen-xl: diffusers I2VGenXLUNet + AutoencoderKL
#   (/root/reference/i2vgen-xl/run_group_ddim_inversion.py:82-87)
# - ConsistI2V: the vendored VideoLDMUNet3DConditionModel
#   (/root/reference/consisti2v/run_ddim_inversion.py:86-89,
#    consisti2v/consisti2v/models/videoldm_unet.py)
# - SEINE: SD1.4 subfolders + seine.pt "ema" dict
#   (/root/reference/seine/run_ddim_inversion.py:69-103)
# ===========================================================================


def t_linear_zero_bias(sd, prefix: str, out_features: int | None = None) -> Tree:
    """Linear whose flax side always has a bias; zeros when torch lacks it."""
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": np.ascontiguousarray(w.T)}
    out["bias"] = (np.asarray(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd
                   else np.zeros((w.shape[0],), w.dtype))
    return out


def t_proj_1x1(sd, prefix: str, as_conv: bool) -> Tree:
    """Transformer proj_in/proj_out: torch may be Conv2d 1x1 or Linear
    (use_linear_projection); adapt either to the flax module layout."""
    w = np.asarray(sd[f"{prefix}.weight"])
    if as_conv:
        kernel = (w.transpose(2, 3, 1, 0) if w.ndim == 4
                  else w.T[None, None])  # Linear -> 1x1 conv kernel
    else:
        kernel = (w[:, :, 0, 0].T if w.ndim == 4 else w.T)
    out = {"kernel": np.ascontiguousarray(kernel)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def pad_attention_heads(attn: Tree, heads: int, head_dim: int) -> Tree:
    """Fold lane-alignment padding into attention projection weights.

    Mirrors ``models.layers.Attention``'s padded storage for
    sublane-unaligned head dims (checkpoint-true i2vgen heads=64, head_dim
    C/64 in {5,10,20} -> stored 8/16/32; ``ops.attention.padded_head_dim``):
    to_q/to_k/to_v gain zero output columns per head (zero q/k columns add 0
    to every score; zero v columns yield zero output lanes) and to_out gains
    zero input rows at the same positions — bit-identical math, aligned
    activations, no runtime pad/slice tensors."""
    from ..ops.attention import padded_head_dim

    pd = padded_head_dim(head_dim)
    if pd == head_dim:
        return attn

    def pad_cols(lin):
        out = dict(lin)
        k = np.asarray(lin["kernel"]).reshape(-1, heads, head_dim)
        out["kernel"] = np.ascontiguousarray(
            np.pad(k, ((0, 0), (0, 0), (0, pd - head_dim))).reshape(
                k.shape[0], heads * pd))
        if "bias" in lin:
            b = np.asarray(lin["bias"]).reshape(heads, head_dim)
            out["bias"] = np.ascontiguousarray(
                np.pad(b, ((0, 0), (0, pd - head_dim))).reshape(heads * pd))
        return out

    def pad_rows(lin):
        out = dict(lin)
        k = np.asarray(lin["kernel"])
        k = k.reshape(heads, head_dim, k.shape[-1])
        out["kernel"] = np.ascontiguousarray(
            np.pad(k, ((0, 0), (0, pd - head_dim), (0, 0))).reshape(
                heads * pd, k.shape[-1]))
        return out

    new = dict(attn)
    for n in ("to_q", "to_k", "to_v"):
        new[n] = pad_cols(attn[n])
    new["to_out"] = pad_rows(attn["to_out"])
    return new


def _attn(sd, p: str, heads: int | None = None,
          head_dim: int | None = None) -> Tree:
    """diffusers Attention -> layers.Attention {to_q,to_k,to_v,to_out}.
    torch to_out is Sequential(Linear, Dropout) -> flax single Dense.
    ``heads``/``head_dim`` trigger padded-head storage (see
    ``pad_attention_heads``) for sublane-unaligned splits."""
    out = {
        "to_q": t_linear_zero_bias(sd, f"{p}.to_q") if f"{p}.to_q.bias" in sd
                else t_linear(sd, f"{p}.to_q"),
        "to_k": t_linear(sd, f"{p}.to_k"),
        "to_v": t_linear(sd, f"{p}.to_v"),
        "to_out": t_linear(sd, f"{p}.to_out.0"),
    }
    if heads is not None and head_dim is not None:
        out = pad_attention_heads(out, heads, head_dim)
    return out


def _attn_flat(sd, p: str, names=("to_q", "to_k", "to_v", "to_out")) -> Tree:
    """Same as _attn but for flax modules with flattened attn param names
    (e.g. attn1_to_q at the block level). Returns {name: linear_tree}."""
    q, k, v, o = names
    return {
        q: t_linear(sd, f"{p}.to_q"),
        k: t_linear(sd, f"{p}.to_k"),
        v: t_linear(sd, f"{p}.to_v"),
        o: t_linear(sd, f"{p}.to_out.0"),
    }


def _ff(sd, p: str) -> Tree:
    """diffusers FeedForward: geglu -> {net.0.proj, net.2}; gelu the same."""
    return {
        "proj_in": t_linear(sd, f"{p}.net.0.proj"),
        "proj_out": t_linear(sd, f"{p}.net.2"),
    }


def _layernorm(sd, p: str) -> Tree:
    return t_norm(sd, p)


def _resnet(sd, p: str) -> Tree:
    out = {
        "norm1": t_norm(sd, f"{p}.norm1"),
        "conv1": t_conv(sd, f"{p}.conv1"),
        "norm2": t_norm(sd, f"{p}.norm2"),
        "conv2": t_conv(sd, f"{p}.conv2"),
    }
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = t_linear(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = t_conv(sd, f"{p}.conv_shortcut")
    return out


def _temp_conv(sd, p: str) -> Tree:
    """diffusers TemporalConvLayer: convN = Sequential(GroupNorm, SiLU,
    [Dropout,] Conv3d) -> norm at .0, conv at .2 (conv1) / .3 (conv2-4)."""
    out: Tree = {}
    for i in range(1, 5):
        conv_idx = 2 if i == 1 else 3
        out[f"norm{i}"] = t_norm(sd, f"{p}.conv{i}.0")
        out[f"conv{i}"] = t_conv(sd, f"{p}.conv{i}.{conv_idx}")
    return out


def _basic_block(sd, p: str, heads: int | None = None,
                 head_dim: int | None = None) -> Tree:
    """diffusers BasicTransformerBlock -> layers.BasicTransformerBlock."""
    out = {
        "norm1": _layernorm(sd, f"{p}.norm1"),
        "attn1": _attn(sd, f"{p}.attn1", heads, head_dim),
        "norm3": _layernorm(sd, f"{p}.norm3"),
        "ff": _ff(sd, f"{p}.ff"),
    }
    if f"{p}.attn2.to_q.weight" in sd:
        out["norm2"] = _layernorm(sd, f"{p}.norm2")
        out["attn2"] = _attn(sd, f"{p}.attn2", heads, head_dim)
    return out


def _spatial_transformer(sd, p: str, heads: int | None = None,
                         head_dim: int | None = None) -> Tree:
    """diffusers Transformer2DModel -> layers.SpatialTransformer
    (proj_in/out are 1x1 convs in the flax module)."""
    return {
        "norm": t_norm(sd, f"{p}.norm"),
        "proj_in": t_proj_1x1(sd, f"{p}.proj_in", as_conv=True),
        "blocks_0": _basic_block(sd, f"{p}.transformer_blocks.0", heads,
                                 head_dim),
        "proj_out": t_proj_1x1(sd, f"{p}.proj_out", as_conv=True),
    }


def _temporal_transformer(sd, p: str, heads: int | None = None,
                          head_dim: int | None = None) -> Tree:
    """diffusers TransformerTemporalModel -> layers.TemporalTransformer
    (proj_in/out are Linear on both sides)."""
    return {
        "norm": t_norm(sd, f"{p}.norm"),
        "proj_in": t_proj_1x1(sd, f"{p}.proj_in", as_conv=False),
        "blocks_0": _basic_block(sd, f"{p}.transformer_blocks.0", heads,
                                 head_dim),
        "proj_out": t_proj_1x1(sd, f"{p}.proj_out", as_conv=False),
    }


def _timestep_embedding(sd, p: str) -> Tree:
    return {
        "linear_1": t_linear(sd, f"{p}.linear_1"),
        "linear_2": t_linear(sd, f"{p}.linear_2"),
    }


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL) — shared by all three backbones
# ---------------------------------------------------------------------------


def _vae_attn(sd, p: str) -> Tuple[Tree, Tree]:
    """VAE mid attention: modern naming (to_q/group_norm) or pre-0.17
    (query/key/value/proj_attn). Returns (attn_norm, attn) trees."""
    if f"{p}.to_q.weight" in sd:
        norm = t_norm(sd, f"{p}.group_norm")
        attn = {
            "to_q": t_linear(sd, f"{p}.to_q"),
            "to_k": t_linear(sd, f"{p}.to_k"),
            "to_v": t_linear(sd, f"{p}.to_v"),
            "to_out": t_linear(sd, f"{p}.to_out.0"),
        }
    else:
        norm = t_norm(sd, f"{p}.group_norm")
        attn = {
            "to_q": t_linear(sd, f"{p}.query"),
            "to_k": t_linear(sd, f"{p}.key"),
            "to_v": t_linear(sd, f"{p}.value"),
            "to_out": t_linear(sd, f"{p}.proj_attn"),
        }
    return norm, attn


def convert_vae(sd: Mapping[str, np.ndarray],
                block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
                layers_per_block: int = 2) -> Tree:
    """diffusers ``AutoencoderKL`` state dict -> models.vae.AutoencoderKL
    params (returns the full variables dict {"params": ...})."""
    n = len(block_out_channels)
    enc: Tree = {"conv_in": t_conv(sd, "encoder.conv_in")}
    for i in range(n):
        for j in range(layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    mid_norm, mid_attn = _vae_attn(sd, "encoder.mid_block.attentions.0")
    enc["mid"] = {
        "resnet_0": _resnet(sd, "encoder.mid_block.resnets.0"),
        "attn_norm": mid_norm,
        "attn": mid_attn,
        "resnet_1": _resnet(sd, "encoder.mid_block.resnets.1"),
    }
    enc["conv_norm_out"] = t_norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = t_conv(sd, "encoder.conv_out")
    enc["quant_conv"] = t_conv(sd, "quant_conv")

    dec: Tree = {
        "post_quant_conv": t_conv(sd, "post_quant_conv"),
        "conv_in": t_conv(sd, "decoder.conv_in"),
    }
    mid_norm, mid_attn = _vae_attn(sd, "decoder.mid_block.attentions.0")
    dec["mid"] = {
        "resnet_0": _resnet(sd, "decoder.mid_block.resnets.0"),
        "attn_norm": mid_norm,
        "attn": mid_attn,
        "resnet_1": _resnet(sd, "decoder.mid_block.resnets.1"),
    }
    for i in range(n):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    dec["conv_norm_out"] = t_norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = t_conv(sd, "decoder.conv_out")
    return {"params": {"encoder": enc, "decoder": dec}}


# ---------------------------------------------------------------------------
# i2vgen-xl UNet (diffusers I2VGenXLUNet)
# ---------------------------------------------------------------------------


def resolve_i2vgen_heads(hf_config: Mapping) -> int:
    """diffusers' head rule (issue #2011): num_attention_heads falls back to
    attention_head_dim, and the value is the HEAD COUNT for block
    transformers. Returns the head count to set as
    I2VGenUNetConfig.num_attention_heads."""
    return int(hf_config.get("num_attention_heads")
               or hf_config.get("attention_head_dim", 64))


def _head_count_from(hf_config: Mapping):
    """2D-UNet head rule (same diffusers misnaming as resolve_i2vgen_heads):
    num_attention_heads falls back to attention_head_dim, and the value is
    the head COUNT — an int (SD1.5 ip2p: 8) or a per-level list (SDXL:
    [5, 10, 20]). Returns int or tuple for SDUNetConfig.num_attention_heads."""
    v = (hf_config.get("num_attention_heads")
         or hf_config.get("attention_head_dim", 8))
    return tuple(v) if isinstance(v, (list, tuple)) else int(v)


def convert_unet_i2vgen(sd: Mapping[str, np.ndarray],
                        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
                        layers_per_block: int = 2,
                        num_attention_heads: int | None = None,
                        attention_head_dim: int = 64) -> Tree:
    """diffusers ``I2VGenXLUNet`` state dict -> models.unet_i2vgen.I2VGenUNet
    params. Sequential-index keys follow diffusers 0.26 module layout.

    ``num_attention_heads``/``attention_head_dim`` follow I2VGenUNetConfig
    semantics (the resolved diffusers-#2011 head COUNT wins;
    ``resolve_i2vgen_heads``): when the per-block head_dim is
    sublane-unaligned (the checkpoint's heads=64 -> dh 5/10/20), projection
    weights are stored PADDED (``pad_attention_heads``) to match the flax
    module's aligned storage."""
    n = len(block_out_channels)

    def _hd(ch: int) -> Tuple[int, int]:
        if num_attention_heads:
            return num_attention_heads, ch // num_attention_heads
        return ch // attention_head_dim, attention_head_dim
    p: Tree = {
        "conv_in": t_conv(sd, "conv_in"),
        # transformer_in: TransformerTemporalModel(num_attention_heads=8,
        # attention_head_dim=<HF head-count value>) — 8 heads whose dim is
        # the head-count value (models/unet_i2vgen.py)
        "transformer_in": _temporal_transformer(
            sd, "transformer_in", 8, num_attention_heads or attention_head_dim),
        "time_embedding": _timestep_embedding(sd, "time_embedding"),
        # fps_embedding is Sequential(Linear, SiLU, Linear)
        "fps_embedding": {
            "linear_1": t_linear(sd, "fps_embedding.0"),
            "linear_2": t_linear(sd, "fps_embedding.2"),
        } if "fps_embedding.0.weight" in sd else _timestep_embedding(sd, "fps_embedding"),
        # image_latents_proj_in: Sequential(Conv, SiLU, Conv, SiLU, Conv)
        "img_lat_proj1": t_conv(sd, "image_latents_proj_in.0"),
        "img_lat_proj2": t_conv(sd, "image_latents_proj_in.2"),
        "img_lat_proj3": t_conv(sd, "image_latents_proj_in.4"),
        # image_latents_context_embedding: Conv, SiLU, AvgPool, Conv, SiLU, Conv
        "img_ctx_conv1": t_conv(sd, "image_latents_context_embedding.0"),
        "img_ctx_conv2": t_conv(sd, "image_latents_context_embedding.3"),
        "img_ctx_conv3": t_conv(sd, "image_latents_context_embedding.5"),
        # context_embedding: Sequential(Linear, SiLU, Linear)
        "context_embedding_1": t_linear(sd, "context_embedding.0"),
        "context_embedding_2": t_linear(sd, "context_embedding.2"),
        "conv_norm_out": t_norm(sd, "conv_norm_out"),
        "conv_out": t_conv(sd, "conv_out"),
    }
    # image_latents_temporal_encoder: norm1, attn1, gelu ff — 2 heads of
    # dim = latent channels (always unaligned -> padded storage)
    te = "image_latents_temporal_encoder"
    lat_ch = int(np.asarray(sd["image_latents_proj_in.4.weight"]).shape[0])
    p["image_latents_temporal_encoder"] = {
        "norm1": _layernorm(sd, f"{te}.norm1"),
        "attn1": pad_attention_heads({
            "to_q": t_linear(sd, f"{te}.attn1.to_q"),
            "to_k": t_linear(sd, f"{te}.attn1.to_k"),
            "to_v": t_linear(sd, f"{te}.attn1.to_v"),
            "to_out": t_linear_zero_bias(sd, f"{te}.attn1.to_out.0"),
        }, heads=2, head_dim=lat_ch),
        "ff": _ff(sd, f"{te}.ff"),
    }
    for i in range(n):
        is_cross = i < n - 1
        heads, hd = _hd(block_out_channels[i])
        base = f"down_blocks.{i}"
        for j in range(layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            p[f"down_{i}_tempconv_{j}"] = _temp_conv(sd, f"{base}.temp_convs.{j}")
            if is_cross:
                p[f"down_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"{base}.attentions.{j}", heads, hd)
                p[f"down_{i}_tempattn_{j}"] = _temporal_transformer(
                    sd, f"{base}.temp_attentions.{j}", heads, hd)
        if i < n - 1:
            p[f"down_{i}_downsample"] = {"conv": t_conv(sd, f"{base}.downsamplers.0.conv")}
    heads, hd = _hd(block_out_channels[-1])
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_tempconv_0"] = _temp_conv(sd, "mid_block.temp_convs.0")
    p["mid_attn"] = _spatial_transformer(sd, "mid_block.attentions.0", heads, hd)
    p["mid_tempattn"] = _temporal_transformer(sd, "mid_block.temp_attentions.0",
                                              heads, hd)
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    p["mid_tempconv_1"] = _temp_conv(sd, "mid_block.temp_convs.1")
    rev = tuple(reversed(block_out_channels))
    for i in range(n):
        is_cross = i > 0
        heads, hd = _hd(rev[i])
        base = f"up_blocks.{i}"
        for j in range(layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            p[f"up_{i}_tempconv_{j}"] = _temp_conv(sd, f"{base}.temp_convs.{j}")
            if is_cross:
                p[f"up_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"{base}.attentions.{j}", heads, hd)
                p[f"up_{i}_tempattn_{j}"] = _temporal_transformer(
                    sd, f"{base}.temp_attentions.{j}", heads, hd)
        if i < n - 1:
            p[f"up_{i}_upsample"] = {"conv": t_conv(sd, f"{base}.upsamplers.0.conv")}
    return {"params": p}


# ---------------------------------------------------------------------------
# ConsistI2V VideoLDM UNet (vendored reference:
# consisti2v/consisti2v/models/videoldm_unet.py)
# ---------------------------------------------------------------------------


def _alpha_temporal_resnet(sd, p: str) -> Tree:
    """Reference TemporalResnetBlock (videoldm_unet_blocks.py:225-313):
    norm1/conv1/norm2/conv2/alpha; its never-used time_emb_proj is skipped."""
    return {
        "norm1": t_norm(sd, f"{p}.norm1"),
        "conv1": t_conv(sd, f"{p}.conv1"),
        "norm2": t_norm(sd, f"{p}.norm2"),
        "conv2": t_conv(sd, f"{p}.conv2"),
        "alpha": np.asarray(sd[f"{p}.alpha"]).reshape(1),
    }


def _videoldm_spatial_block(sd, p: str) -> Tree:
    """BasicConditionalTransformerBlock spatial -> _SpatialFFBlock (flattened
    attn names)."""
    out = {
        "norm1": t_norm(sd, f"{p}.norm1"),
        "norm2": t_norm(sd, f"{p}.norm2"),
        "norm3": t_norm(sd, f"{p}.norm3"),
        "ff": _ff(sd, f"{p}.ff"),
    }
    for attn in ("attn1", "attn2"):
        out[f"{attn}_to_q"] = t_linear(sd, f"{p}.{attn}.to_q")
        out[f"{attn}_to_k"] = t_linear(sd, f"{p}.{attn}.to_k")
        out[f"{attn}_to_v"] = t_linear(sd, f"{p}.{attn}.to_v")
        out[f"{attn}_to_out"] = t_linear(sd, f"{p}.{attn}.to_out.0")
    return out


def _videoldm_spatial_transformer(sd, p: str) -> Tree:
    return {
        "norm": t_norm(sd, f"{p}.norm"),
        "proj_in": t_proj_1x1(sd, f"{p}.proj_in", as_conv=True),
        "block": _videoldm_spatial_block(sd, f"{p}.transformer_blocks.0"),
        "proj_out": t_proj_1x1(sd, f"{p}.proj_out", as_conv=True),
    }


def _videoldm_temporal_transformer(sd, p: str) -> Tree:
    """Temporal Transformer2DConditionModel (alpha-gated whole output) ->
    VideoLDMTemporalTransformer. attn1 = TemporalConditionalAttention."""
    b = f"{p}.transformer_blocks.0"
    out = {
        "norm": t_norm(sd, f"{p}.norm"),
        "proj_in": t_proj_1x1(sd, f"{p}.proj_in", as_conv=True),
        "proj_out": t_proj_1x1(sd, f"{p}.proj_out", as_conv=True),
        "alpha": np.asarray(sd[f"{p}.alpha"]).reshape(1),
        "norm1": t_norm(sd, f"{b}.norm1"),
        "norm2": t_norm(sd, f"{b}.norm2"),
        "norm3": t_norm(sd, f"{b}.norm3"),
        "ff": _ff(sd, f"{b}.ff"),
        "attn1": _attn(sd, f"{b}.attn1"),
    }
    for name in ("to_q", "to_k", "to_v"):
        out[f"attn2_{name}"] = t_linear(sd, f"{b}.attn2.{name}")
    out["attn2_to_out"] = t_linear(sd, f"{b}.attn2.to_out.0")
    return out


def convert_unet_videoldm(sd: Mapping[str, np.ndarray],
                          block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
                          layers_per_block: int = 2,
                          use_temporal: bool = True,
                          use_frame_stride_condition: bool = True) -> Tree:
    """ConsistI2V ``VideoLDMUNet3DConditionModel`` state dict ->
    models.unet_videoldm.VideoLDMUNet params. Reference module lists:
    resnets / conv3ds / attentions / tempo_attns
    (videoldm_unet_blocks.py:438-492,645-693,868-870)."""
    n = len(block_out_channels)
    p: Tree = {
        "conv_in": t_conv(sd, "conv_in"),
        "time_embedding": _timestep_embedding(sd, "time_embedding"),
        "conv_norm_out": t_norm(sd, "conv_norm_out"),
        "conv_out": t_conv(sd, "conv_out"),
    }
    if use_frame_stride_condition:
        fs = _timestep_embedding(sd, "frame_stride_embedding")
        p["frame_stride_fc1"] = fs["linear_1"]
        p["frame_stride_fc2"] = fs["linear_2"]
    for i in range(n):
        is_cross = i < n - 1
        base = f"down_blocks.{i}"
        # conv2d first-frame mode: per-block 1x1 conv on the resized
        # first-frame latent (videoldm_unet_blocks.py:383,:588,:781,:989)
        if f"{base}.first_frame_conv.weight" in sd:
            p[f"down_{i}_first_frame_conv"] = t_conv(sd, f"{base}.first_frame_conv")
        for j in range(layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            if use_temporal:
                p[f"down_{i}_conv3d_{j}"] = _alpha_temporal_resnet(sd, f"{base}.conv3ds.{j}")
            if is_cross:
                p[f"down_{i}_attn_{j}"] = _videoldm_spatial_transformer(sd, f"{base}.attentions.{j}")
                if use_temporal:
                    p[f"down_{i}_tempattn_{j}"] = _videoldm_temporal_transformer(
                        sd, f"{base}.tempo_attns.{j}")
        if i < n - 1:
            p[f"down_{i}_downsample"] = {"conv": t_conv(sd, f"{base}.downsamplers.0.conv")}
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    if use_temporal:
        p["mid_conv3d_0"] = _alpha_temporal_resnet(sd, "mid_block.conv3ds.0")
        p["mid_conv3d_1"] = _alpha_temporal_resnet(sd, "mid_block.conv3ds.1")
    p["mid_attn"] = _videoldm_spatial_transformer(sd, "mid_block.attentions.0")
    if "mid_block.first_frame_conv.weight" in sd:
        p["mid_first_frame_conv"] = t_conv(sd, "mid_block.first_frame_conv")
    for i in range(n):
        is_cross = i > 0
        base = f"up_blocks.{i}"
        if f"{base}.first_frame_conv.weight" in sd:
            p[f"up_{i}_first_frame_conv"] = t_conv(sd, f"{base}.first_frame_conv")
        for j in range(layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            if use_temporal:
                p[f"up_{i}_conv3d_{j}"] = _alpha_temporal_resnet(sd, f"{base}.conv3ds.{j}")
            if is_cross:
                p[f"up_{i}_attn_{j}"] = _videoldm_spatial_transformer(sd, f"{base}.attentions.{j}")
                if use_temporal:
                    p[f"up_{i}_tempattn_{j}"] = _videoldm_temporal_transformer(
                        sd, f"{base}.tempo_attns.{j}")
        if i < n - 1:
            p[f"up_{i}_upsample"] = {"conv": t_conv(sd, f"{base}.upsamplers.0.conv")}
    return {"params": p}


# ---------------------------------------------------------------------------
# SEINE UNet3D (vendored reference: seine/models/unet.py, seine.pt "ema")
# ---------------------------------------------------------------------------


def _seine_block(sd, p: str) -> Tree:
    """seine BasicTransformerBlock (attention.py:439): attn1 spatial, attn2
    cross, attn_temp with T5 rel-pos bias table, geglu ff."""
    out = {
        "norm1": t_norm(sd, f"{p}.norm1"),
        "norm2": t_norm(sd, f"{p}.norm2"),
        "norm_temp": t_norm(sd, f"{p}.norm_temp"),
        "norm3": t_norm(sd, f"{p}.norm3"),
        "ff": _ff(sd, f"{p}.ff"),
        # TemporalAttention.time_rel_pos_bias.relative_attention_bias:
        # nn.Embedding(num_buckets, heads) (attention.py:940)
        "time_rel_pos_bias": np.asarray(
            sd[f"{p}.attn_temp.time_rel_pos_bias.relative_attention_bias.weight"]
        ),
    }
    for src, dst in (("attn1", "attn1"), ("attn2", "attn2"), ("attn_temp", "temp")):
        out[f"{dst}_to_q"] = t_linear(sd, f"{p}.{src}.to_q")
        out[f"{dst}_to_k"] = t_linear(sd, f"{p}.{src}.to_k")
        out[f"{dst}_to_v"] = t_linear(sd, f"{p}.{src}.to_v")
        out[f"{dst}_to_out"] = t_linear(sd, f"{p}.{src}.to_out.0")
    return out


def _seine_transformer(sd, p: str) -> Tree:
    return {
        "norm": t_norm(sd, f"{p}.norm"),
        "proj_in": t_proj_1x1(sd, f"{p}.proj_in", as_conv=True),
        "block": _seine_block(sd, f"{p}.transformer_blocks.0"),
        "proj_out": t_proj_1x1(sd, f"{p}.proj_out", as_conv=True),
    }


def convert_unet_seine(sd: Mapping[str, np.ndarray],
                       block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
                       layers_per_block: int = 2) -> Tree:
    """SEINE ``UNet3DConditionModel`` state dict (seine.pt ``["ema"]``) ->
    models.unet_seine.SeineUNet params. InflatedConv3d weights are plain 2D
    conv weights (seine/models/resnet.py:13-22)."""
    n = len(block_out_channels)
    p: Tree = {
        "conv_in": t_conv(sd, "conv_in"),
        "time_embedding": _timestep_embedding(sd, "time_embedding"),
        "conv_norm_out": t_norm(sd, "conv_norm_out"),
        "conv_out": t_conv(sd, "conv_out"),
    }
    for i in range(n):
        is_cross = i < n - 1
        base = f"down_blocks.{i}"
        for j in range(layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            if is_cross:
                p[f"down_{i}_attn_{j}"] = _seine_transformer(sd, f"{base}.attentions.{j}")
        if i < n - 1:
            p[f"down_{i}_downsample"] = {"conv": t_conv(sd, f"{base}.downsamplers.0.conv")}
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_attn"] = _seine_transformer(sd, "mid_block.attentions.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    for i in range(n):
        is_cross = i > 0
        base = f"up_blocks.{i}"
        for j in range(layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            if is_cross:
                p[f"up_{i}_attn_{j}"] = _seine_transformer(sd, f"{base}.attentions.{j}")
        if i < n - 1:
            p[f"up_{i}_upsample"] = {"conv": t_conv(sd, f"{base}.upsamplers.0.conv")}
    return {"params": p}


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def tree_shapes(tree) -> Dict[str, tuple]:
    """Flat {path: shape} of an arbitrary nested dict of arrays."""
    out: Dict[str, tuple] = {}

    def walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        else:
            out[prefix] = tuple(np.shape(node))

    walk(tree, "")
    return out


def assert_params_match(expected_tree, converted_tree) -> None:
    """Structural validation: the converted tree must have exactly the keys
    and shapes the flax module expects (from init or eval_shape)."""
    want = tree_shapes(expected_tree)
    got = tree_shapes(converted_tree)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = sorted(k for k in set(want) & set(got) if want[k] != got[k])
    msgs = []
    if missing:
        msgs.append(f"missing {len(missing)}: {missing[:8]}")
    if extra:
        msgs.append(f"unexpected {len(extra)}: {extra[:8]}")
    if bad:
        msgs.append(
            "shape mismatches: "
            + ", ".join(f"{k} want {want[k]} got {got[k]}" for k in bad[:8])
        )
    if msgs:
        raise ValueError("converted params do not match module: " + "; ".join(msgs))


# ---------------------------------------------------------------------------
# SD1.5 / SDXL 2D UNet (first-frame editors: instruct-pix2pix, MagicBrush,
# CosXL — SURVEY.md §2.4; HF checkpoints timbrooks/instruct-pix2pix,
# vinesmsuic/magicbrush-jul7, stabilityai/cosxl "cosxl_edit.safetensors")
# ---------------------------------------------------------------------------


def _spatial_transformer_deep(sd, p: str, depth: int,
                              heads: int | None = None,
                              head_dim: int | None = None) -> Tree:
    """Transformer2DModel with `depth` transformer blocks (SDXL: 2/10).
    ``heads``/``head_dim`` trigger padded-head storage (pad_attention_heads)
    for sublane-unaligned splits."""
    out = {
        "norm": t_norm(sd, f"{p}.norm"),
        "proj_in": t_proj_1x1(sd, f"{p}.proj_in", as_conv=True),
        "proj_out": t_proj_1x1(sd, f"{p}.proj_out", as_conv=True),
    }
    for k in range(depth):
        out[f"blocks_{k}"] = _basic_block(sd, f"{p}.transformer_blocks.{k}",
                                          heads, head_dim)
    return out


def convert_unet_sd(sd: Mapping[str, np.ndarray],
                    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
                    layers_per_block: int = 2,
                    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False),
                    transformer_depth=1,
                    addition_embed: str = "none",
                    num_attention_heads=8) -> Tree:
    """diffusers ``UNet2DConditionModel`` (SD1.5 ip2p / SDXL) state dict ->
    models.unet_sd.SDUNet params. ``num_attention_heads`` mirrors
    ``SDUNetConfig.num_attention_heads`` (int or per-level tuple) so
    sublane-unaligned head splits get padded storage."""
    n = len(block_out_channels)

    def depth_for(i):
        return (transformer_depth[i] if isinstance(transformer_depth, (tuple, list))
                else transformer_depth)

    def heads_for(i):
        return (num_attention_heads[i]
                if isinstance(num_attention_heads, (tuple, list))
                else num_attention_heads)

    def head_dim_for(i):
        return block_out_channels[i] // heads_for(i)

    p: Tree = {
        "conv_in": t_conv(sd, "conv_in"),
        "time_embedding": _timestep_embedding(sd, "time_embedding"),
        "conv_norm_out": t_norm(sd, "conv_norm_out"),
        "conv_out": t_conv(sd, "conv_out"),
    }
    if addition_embed == "sdxl":
        p["add_embedding"] = _timestep_embedding(sd, "add_embedding")
    for i in range(n):
        base = f"down_blocks.{i}"
        for j in range(layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            if cross_attn_blocks[i]:
                p[f"down_{i}_attn_{j}"] = _spatial_transformer_deep(
                    sd, f"{base}.attentions.{j}", depth_for(i),
                    heads_for(i), head_dim_for(i))
        if i < n - 1:
            p[f"down_{i}_downsample"] = {"conv": t_conv(sd, f"{base}.downsamplers.0.conv")}
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_attn"] = _spatial_transformer_deep(sd, "mid_block.attentions.0",
                                              depth_for(n - 1),
                                              heads_for(n - 1),
                                              head_dim_for(n - 1))
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    rev_cross = tuple(reversed(cross_attn_blocks))
    for i in range(n):
        base = f"up_blocks.{i}"
        for j in range(layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            if rev_cross[i]:
                p[f"up_{i}_attn_{j}"] = _spatial_transformer_deep(
                    sd, f"{base}.attentions.{j}", depth_for(n - 1 - i),
                    heads_for(n - 1 - i), head_dim_for(n - 1 - i))
        if i < n - 1:
            p[f"up_{i}_upsample"] = {"conv": t_conv(sd, f"{base}.upsamplers.0.conv")}
    return {"params": p}


# ---------------------------------------------------------------------------
# ControlNet (SDXL canny) + IP-Adapter (InstantStyle stage)
# ---------------------------------------------------------------------------


def convert_controlnet(sd: Mapping[str, np.ndarray],
                       block_out_channels: Tuple[int, ...] = (320, 640, 1280),
                       layers_per_block: int = 2,
                       cross_attn_blocks: Tuple[bool, ...] = (False, True, True),
                       transformer_depth=(1, 2, 10)) -> Tree:
    """diffusers ``ControlNetModel`` (SDXL) -> models.controlnet.ControlNet
    params (reference loader instantstyle.py:16-18)."""
    n = len(block_out_channels)

    def depth_for(i):
        return (transformer_depth[i] if isinstance(transformer_depth, (tuple, list))
                else transformer_depth)

    p: Tree = {
        "conv_in": t_conv(sd, "conv_in"),
        "time_embedding": _timestep_embedding(sd, "time_embedding"),
        "add_embedding": _timestep_embedding(sd, "add_embedding"),
        "controlnet_mid_block": t_conv(sd, "controlnet_mid_block"),
    }
    ce = "controlnet_cond_embedding"
    p[ce] = {"conv_in": t_conv(sd, f"{ce}.conv_in"),
             "conv_out": t_conv(sd, f"{ce}.conv_out")}
    k = 0
    while f"{ce}.blocks.{k}.weight" in sd:
        p[ce][f"blocks_{k}"] = t_conv(sd, f"{ce}.blocks.{k}")
        k += 1
    k = 0
    while f"controlnet_down_blocks.{k}.weight" in sd:
        p[f"controlnet_down_blocks_{k}"] = t_conv(sd, f"controlnet_down_blocks.{k}")
        k += 1
    for i in range(n):
        base = f"down_blocks.{i}"
        for j in range(layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"{base}.resnets.{j}")
            if cross_attn_blocks[i]:
                p[f"down_{i}_attn_{j}"] = _spatial_transformer_deep(
                    sd, f"{base}.attentions.{j}", depth_for(i))
        if i < n - 1:
            p[f"down_{i}_downsample"] = {"conv": t_conv(sd, f"{base}.downsamplers.0.conv")}
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_attn"] = _spatial_transformer_deep(sd, "mid_block.attentions.0",
                                              depth_for(n - 1))
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    return {"params": p}


def sdxl_attn2_order(block_out_channels=(320, 640, 1280),
                     layers_per_block: int = 2,
                     cross_attn_blocks=(False, True, True),
                     transformer_depth=(1, 2, 10)):
    """Flax names of every cross-attention (attn2) module in diffusers'
    attn_processors traversal order (module attribute order: down_blocks,
    mid_block, up_blocks; within a block: attentions.j.transformer_blocks.k).
    Each attention module contributes attn1 then attn2 — the IP-Adapter state
    dict (`ip_adapter/ip_adapter.py` load via ModuleList(attn_processors
    .values())) indexes to_k_ip/to_v_ip at the attn2 (odd) positions."""
    n = len(block_out_channels)

    def depth_for(i):
        return (transformer_depth[i] if isinstance(transformer_depth, (tuple, list))
                else transformer_depth)

    order = []
    for i in range(n):
        if cross_attn_blocks[i]:
            for j in range(layers_per_block):
                for k in range(depth_for(i)):
                    order.append(("down", i, j, k))
    for k in range(depth_for(n - 1)):
        order.append(("mid", n - 1, 0, k))
    rev_cross = tuple(reversed(cross_attn_blocks))
    for i in range(n):
        if rev_cross[i]:
            for j in range(layers_per_block + 1):
                for k in range(depth_for(n - 1 - i)):
                    order.append(("up", i, j, k))
    return order


def convert_ip_adapter(ip_sd: Mapping[str, Mapping[str, np.ndarray]],
                       target_blocks: Tuple[str, ...] = ("up_0_attn_1",),
                       block_out_channels=(320, 640, 1280),
                       layers_per_block: int = 2,
                       cross_attn_blocks=(False, True, True),
                       transformer_depth=(1, 2, 10)) -> Tuple[Tree, Dict[str, Tree]]:
    """ip-adapter_sdxl.bin ({"image_proj": ..., "ip_adapter": {"<idx>.to_k_ip"
    ...}}) -> (ImageProjModel params, {flax_transformer_name: {blocks_k:
    {attn2 ip trees}}}) for the configured target blocks only (non-targets
    use skip processors in the reference — their ip weights are unused)."""
    proj_sd = ip_sd["image_proj"]
    image_proj = {"params": {
        "proj": {"kernel": np.ascontiguousarray(np.asarray(proj_sd["proj.weight"]).T),
                 "bias": np.asarray(proj_sd["proj.bias"])},
        "norm": {"scale": np.asarray(proj_sd["norm.weight"]),
                 "bias": np.asarray(proj_sd["norm.bias"])},
    }}
    adapter_sd = ip_sd["ip_adapter"]
    order = sdxl_attn2_order(block_out_channels, layers_per_block,
                             cross_attn_blocks, transformer_depth)
    per_block: Dict[str, Tree] = {}
    for pos, (kind, i, j, k) in enumerate(order):
        idx = 2 * pos + 1   # attn1 at even, attn2 (ip) at odd indices
        name = "mid_attn" if kind == "mid" else f"{kind}_{i}_attn_{j}"
        if name not in target_blocks:
            continue
        per_block.setdefault(name, {})[f"blocks_{k}"] = {
            "attn2": {
                "to_k_ip": {"kernel": np.ascontiguousarray(
                    np.asarray(adapter_sd[f"{idx}.to_k_ip.weight"]).T)},
                "to_v_ip": {"kernel": np.ascontiguousarray(
                    np.asarray(adapter_sd[f"{idx}.to_v_ip.weight"]).T)},
            }
        }
    return image_proj, per_block


def convert_resampler(proj_sd: Mapping[str, np.ndarray], depth: int = 4) -> Tree:
    """ip-adapter-plus* ``image_proj`` state dict (the perceiver
    ``Resampler``, ``ip_adapter/resampler.py:81-147``) ->
    pipelines.instantstyle.Resampler params. ``to_kv`` is one fused Linear
    in torch; our module splits it into k/v heads column-wise."""
    p: Tree = {
        "latents": np.asarray(proj_sd["latents"])[0],   # [1, Q, D] -> [Q, D]
        "proj_in": t_linear(proj_sd, "proj_in"),
        "proj_out": t_linear(proj_sd, "proj_out"),
        "norm_out": t_norm(proj_sd, "norm_out"),
    }
    for i in range(depth):
        a = f"layers.{i}.0"       # PerceiverAttention
        f = f"layers.{i}.1"       # FeedForward Sequential
        kv = np.asarray(proj_sd[f"{a}.to_kv.weight"])   # [2*inner, D]
        inner = kv.shape[0] // 2
        p[f"layers_{i}_norm1"] = t_norm(proj_sd, f"{a}.norm1")
        p[f"layers_{i}_norm2"] = t_norm(proj_sd, f"{a}.norm2")
        p[f"layers_{i}_to_q"] = t_linear(proj_sd, f"{a}.to_q", bias=False)
        p[f"layers_{i}_to_kv_k"] = {
            "kernel": np.ascontiguousarray(kv[:inner].T)}
        p[f"layers_{i}_to_kv_v"] = {
            "kernel": np.ascontiguousarray(kv[inner:].T)}
        p[f"layers_{i}_to_out"] = t_linear(proj_sd, f"{a}.to_out", bias=False)
        p[f"layers_{i}_ff_norm"] = t_norm(proj_sd, f"{f}.0")
        p[f"layers_{i}_ff_in"] = t_linear(proj_sd, f"{f}.1", bias=False)
        p[f"layers_{i}_ff_out"] = t_linear(proj_sd, f"{f}.3", bias=False)
    return {"params": p}


def convert_mlp_proj(proj_sd: Mapping[str, np.ndarray]) -> Tree:
    """ip-adapter-full ``image_proj`` (``MLPProjModel``,
    ``ip_adapter/ip_adapter.py:48-64``) -> pipelines.instantstyle
    .MLPProjModel params."""
    return {"params": {
        "proj_0": t_linear(proj_sd, "proj.0"),
        "proj_2": t_linear(proj_sd, "proj.2"),
        "proj_3": t_norm(proj_sd, "proj.3"),
    }}


def merge_ip_adapter_into_unet(unet_params: Tree, per_block: Dict[str, Tree]) -> Tree:
    """Graft converted ip trees into a converted SDUNet params tree."""
    import copy

    out = copy.deepcopy(unet_params)
    for name, blocks in per_block.items():
        target = out["params"][name]
        for blk_name, tree in blocks.items():
            target[blk_name]["attn2"].update(tree["attn2"])
    return out


# ---------------------------------------------------------------------------
# Checkpoint-directory ingestion (diffusers layout)
# ---------------------------------------------------------------------------


def load_folder_state_dict(folder: str) -> Dict[str, np.ndarray]:
    """All tensors from a diffusers model folder: merges every *.safetensors
    shard; falls back to *.bin / *.pt torch pickles."""
    import glob as _glob
    import os as _os

    sd: Dict[str, np.ndarray] = {}
    shards = sorted(_glob.glob(_os.path.join(folder, "*.safetensors")))
    if shards:
        from safetensors.numpy import load_file

        for s in shards:
            sd.update(load_file(s))
        return sd
    for pat in ("*.bin", "*.pt", "*.ckpt"):
        for f in sorted(_glob.glob(_os.path.join(folder, pat))):
            sd.update(load_torch_state_dict(f))
    if not sd:
        raise FileNotFoundError(f"no weight files in {folder}")
    return sd


def _read_json(path: str):
    import json as _json

    with open(path) as f:
        return _json.load(f)


def _convert_vae_dir(folder: str) -> Tree:
    """convert_vae with shape params read from the folder's config.json."""
    import os as _os

    cfg = (_read_json(_os.path.join(folder, "config.json"))
           if _os.path.exists(_os.path.join(folder, "config.json")) else {})
    return convert_vae(
        load_folder_state_dict(folder),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=int(cfg.get("layers_per_block", 2)))


def convert_i2vgen_pipeline_dir(src: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """ali-vilab/i2vgen-xl snapshot dir (subfolders unet/ vae/ text_encoder/
    image_encoder/) -> ({unet, vae, text, vision} params, arch meta).

    Reference loading site: ``i2vgen-xl/run_group_ddim_inversion.py:82-87``.
    """
    import os as _os

    unet_cfg = _read_json(_os.path.join(src, "unet", "config.json"))
    heads = resolve_i2vgen_heads(unet_cfg)
    boc = tuple(unet_cfg.get("block_out_channels", (320, 640, 1280, 1280)))
    lpb = int(unet_cfg.get("layers_per_block", 2))
    params = {
        "unet": convert_unet_i2vgen(load_folder_state_dict(_os.path.join(src, "unet")),
                                    block_out_channels=boc, layers_per_block=lpb,
                                    num_attention_heads=heads),
        "vae": _convert_vae_dir(_os.path.join(src, "vae")),
        "text": {"params": convert_clip_text(
            load_folder_state_dict(_os.path.join(src, "text_encoder")),
            num_layers=_read_json(_os.path.join(src, "text_encoder", "config.json")
                                  )["num_hidden_layers"])},
        "vision": {"params": convert_clip_vision(
            load_folder_state_dict(_os.path.join(src, "image_encoder")),
            num_layers=_read_json(_os.path.join(src, "image_encoder", "config.json")
                                  )["num_hidden_layers"])},
    }
    cross_dim = unet_cfg.get("cross_attention_dim", 1024)
    # image-context token count derived from the checkpoint itself
    ctx2_out = params["unet"]["params"]["context_embedding_2"]["kernel"].shape[1]
    meta = {"backbone": "i2vgen-xl",
            "unet": {"num_attention_heads": heads,
                     "block_out_channels": list(boc),
                     "layers_per_block": lpb,
                     "cross_attention_dim": cross_dim,
                     "norm_num_groups": unet_cfg.get("norm_num_groups", 32),
                     "num_image_context_tokens": int(ctx2_out // cross_dim)}}
    return params, meta


def convert_consisti2v_dir(src: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """TIGER-Lab/ConsistI2V snapshot dir -> ({unet, vae, text}, meta)
    (reference ``consisti2v/run_ddim_inversion.py:86-89``)."""
    import os as _os

    unet_cfg = _read_json(_os.path.join(src, "unet", "config.json"))
    boc = tuple(unet_cfg.get("block_out_channels", (320, 640, 1280, 1280)))
    params = {
        "unet": convert_unet_videoldm(
            load_folder_state_dict(_os.path.join(src, "unet")),
            block_out_channels=boc,
            layers_per_block=int(unet_cfg.get("layers_per_block", 2)),
            use_temporal=bool(unet_cfg.get("use_temporal", True)),
            use_frame_stride_condition=bool(
                unet_cfg.get("use_frame_stride_condition", True))),
        "vae": _convert_vae_dir(_os.path.join(src, "vae")),
        "text": {"params": convert_clip_text(
            load_folder_state_dict(_os.path.join(src, "text_encoder")),
            num_layers=_read_json(_os.path.join(src, "text_encoder", "config.json")
                                  )["num_hidden_layers"])},
    }
    return params, {"backbone": "consisti2v"}


def convert_seine_checkpoint(sd_path: str, ckpt_path: str,
                             block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
                             layers_per_block: int = 2,
                             ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """SD1.4 snapshot dir (vae/ text_encoder/) + seine.pt EMA dict ->
    ({unet, vae, text}, meta) (reference ``seine/run_ddim_inversion.py:69-103``;
    SEINE has no unet config.json — the SD1.4 arch is fixed upstream)."""
    import os as _os

    params = {
        "unet": convert_unet_seine(load_torch_state_dict(ckpt_path),
                                   block_out_channels=block_out_channels,
                                   layers_per_block=layers_per_block),
        "vae": _convert_vae_dir(_os.path.join(sd_path, "vae")),
        "text": {"params": convert_clip_text(
            load_folder_state_dict(_os.path.join(sd_path, "text_encoder")),
            num_layers=_read_json(_os.path.join(sd_path, "text_encoder", "config.json")
                                  )["num_hidden_layers"])},
    }
    return params, {"backbone": "seine"}


def convert_sd_editor_dir(src: str, model: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """timbrooks/instruct-pix2pix-style snapshot dir -> ({unet, vae, text},
    meta) for the first-frame editors."""
    import os as _os

    unet_cfg = _read_json(_os.path.join(src, "unet", "config.json"))
    is_sdxl = unet_cfg.get("addition_embed_type") == "text_time"
    boc = tuple(unet_cfg.get("block_out_channels", (320, 640, 1280, 1280)))
    cross = tuple(t.startswith("CrossAttn")
                  for t in unet_cfg.get("down_block_types",
                                        ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"]))
    depth = unet_cfg.get("transformer_layers_per_block", 1)
    depth = tuple(depth) if isinstance(depth, list) else depth
    params = {
        "unet": convert_unet_sd(
            load_folder_state_dict(_os.path.join(src, "unet")),
            block_out_channels=boc,
            layers_per_block=int(unet_cfg.get("layers_per_block", 2)),
            cross_attn_blocks=cross, transformer_depth=depth,
            addition_embed="sdxl" if is_sdxl else "none",
            # 2D-UNet configs: attention_head_dim is the HEAD COUNT (int,
            # SD1.5 ip2p: 8) or the per-level head count list (SDXL:
            # [5, 10, 20]) — the same misnaming as the 3D UNets
            num_attention_heads=_head_count_from(unet_cfg)),
        "vae": _convert_vae_dir(_os.path.join(src, "vae")),
    }
    if _os.path.isdir(_os.path.join(src, "text_encoder")):
        params["text"] = {"params": convert_clip_text(
            load_folder_state_dict(_os.path.join(src, "text_encoder")),
            num_layers=_read_json(_os.path.join(src, "text_encoder", "config.json")
                                  )["num_hidden_layers"])}
    return params, {"backbone": model, "sdxl": is_sdxl}
