"""Fused multi-head attention for TPU.

Replaces ``F.scaled_dot_product_attention`` used throughout the reference
(e.g. ``i2vgen-xl/pnp_utils.py:208-210``) and the manual / xformers paths in
``seine/models/attention.py:218-311``.

Two backends behind one function:

- ``xla``: ``jax.nn.dot_product_attention`` — XLA fuses QK^T+softmax+V well on
  TPU for the moderate sequence lengths here (spatial: (H/8)^2 <= 4096 at
  512^2; temporal: #frames <= 128).
- ``pallas``: the flash kernel in :mod:`anyv2v_tpu.ops.pallas_attention`
  (used when shapes are MXU-tile aligned).

Inputs are flattened [B, S, heads*head_dim] (the layout every UNet block
produces); head split/merge stays inside so module code never touches heads.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads)


def multi_head_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    heads: int,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    backend: str = "xla",
) -> jax.Array:
    """Attention over flattened-head inputs.

    query: [B, Sq, heads*Dh]; key/value: [B, Sk, heads*Dh]
    bias:  optional additive attention bias broadcastable to [B, heads, Sq, Sk]
           (T5 relative position bias for SEINE temporal attention,
           ``seine/models/attention.py:813-815``).
    mask:  optional boolean mask broadcastable to [B, heads, Sq, Sk].
    Returns [B, Sq, heads*Dh] in the query dtype.
    """
    b, sq, d = query.shape
    q = _split_heads(query, heads)   # [B, Sq, H, Dh]
    k = _split_heads(key, heads)
    v = _split_heads(value, heads)

    if backend == "pallas":
        from .pallas_attention import flash_attention_bshd

        out = flash_attention_bshd(q, k, v, bias=bias, scale=scale)
        return out.reshape(b, sq, d)

    out = jax.nn.dot_product_attention(
        q, k, v, bias=bias, mask=mask, scale=scale, implementation="xla"
    )
    return out.reshape(b, sq, d)
