"""Attention-map extraction for visualization / debugging (the reference's
``ip_adapter/utils.py:7-92`` attn-map hooks — torch forward hooks there;
here a pure function over Q/K, since injection-as-data means there are no
mutable processors to hook)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def attention_probs(
    query: jax.Array,    # [B, Sq, heads*Dh] (flattened-head layout)
    key: jax.Array,      # [B, Sk, heads*Dh]
    heads: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """softmax(QK^T / sqrt(d)) per head: [B, heads, Sq, Sk]."""
    b, sq, d = query.shape
    dh = d // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(dh))
    q = query.reshape(b, sq, heads, dh)
    k = key.reshape(b, key.shape[1], heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    return jax.nn.softmax(s, axis=-1)


def attn_map_grid(probs: jax.Array, h: int, w: int,
                  token_idx: int = 0) -> jax.Array:
    """Head-averaged cross-attention map for one context token, reshaped to
    the spatial grid: [B, h, w] (the reference's per-token visualization)."""
    m = probs.mean(axis=1)[..., token_idx]   # [B, Sq]
    b = m.shape[0]
    return m.reshape(b, h, w)
