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
