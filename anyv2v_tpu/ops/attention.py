"""Fused multi-head attention for TPU.

Replaces ``F.scaled_dot_product_attention`` used throughout the reference
(e.g. ``i2vgen-xl/pnp_utils.py:208-210``) and the manual / xformers paths in
``seine/models/attention.py:218-311``.

Backend selections behind one function:

- ``auto`` (default, on TPU): the packed block-diagonal short-seq kernel
  (:mod:`anyv2v_tpu.ops.pallas_short_attention`) for self-attention at
  seq <= 128 (temporal attention over frames — XLA materializes the fp32
  [rows, H, S, S] scores through 5+ HBM round-trips there); the flash kernel
  (:mod:`anyv2v_tpu.ops.pallas_attention`) for long sequences (spatial
  attention, where the score matrix at 4096^2 costs more bandwidth than the
  matmuls); XLA for everything else (cross-attention to text at seq 157,
  masked/biased exotic paths).
- ``xla``: ``jax.nn.dot_product_attention``.
- ``pallas`` / ``pallas_short``: force a specific kernel.

The process-wide default comes from ``ANYV2V_ATTN_BACKEND`` (auto/xla/pallas)
so benches and drivers can A/B without threading a flag through every module.

Inputs are flattened [B, S, heads*head_dim] (the layout every UNet block
produces); head split/merge stays inside so module code never touches heads.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

# Minimum query length for the flash kernel to beat XLA on v5e (measured:
# parity at 256, 1.1-1.6x at 1024-4096; below 256 tile padding dominates).
_PALLAS_MIN_SQ = 512


def default_backend() -> str:
    return os.environ.get("ANYV2V_ATTN_BACKEND", "auto")


def _resolve(backend: Optional[str], sq: int, sk: int, head_dim: int,
             bias: Optional[jax.Array], mask: Optional[jax.Array],
             batch: int = 1) -> str:
    if backend is None or backend == "auto":
        backend = default_backend()
    if backend != "auto":
        return backend
    if jax.default_backend() != "tpu" or mask is not None:
        return "xla"
    if (
        sq == sk
        and sq <= 128
        and bias is None
        and head_dim % 8 == 0
    ):
        # short self-attention (temporal layers: seq = n_frames): the packed
        # block-diagonal kernel — XLA materializes fp32 [rows, H, S, S]
        # scores through 5+ HBM round-trips here (~78 ms of a 247 ms UNet
        # forward at 16f 512^2, measured; PERF.md round 3)
        return "pallas_short"
    if bias is None and sq != sk and sk <= 512:
        from .pallas_cross_attention import cross_kv_is_supported

        if cross_kv_is_supported(sq, sk, head_dim) and batch * sq >= 32768:
            # cross-attention to short text/image context: whole-K/V-in-VMEM
            # kernel — the general flash grid degenerates to tiny programs
            # here (measured 1.3-1.7x vs flash across the UNets' shapes)
            return "pallas_cross"
        # below the row threshold XLA beats both kernels on short-KV shapes
        return "xla"
    if sq >= _PALLAS_MIN_SQ and head_dim % 8 == 0 and head_dim <= 128:
        # long sequences (spatial attention): flash kernel
        # (wider heads, e.g. VAE mid attn d=512, fail mosaic)
        return "pallas"
    return "xla"


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
    backend: Optional[str] = None,
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
    backend = _resolve(backend, sq, key.shape[1], d // heads, bias, mask,
                       batch=b)
    if backend in ("pallas_short", "pallas_cross") and not (
        bias is None and mask is None
    ):
        # the short/cross kernels have no bias/mask operand; silently
        # dropping one would be a wrong answer, not a slow one
        raise ValueError(f"backend={backend!r} does not support bias/mask")
    if backend == "pallas_short":
        from .pallas_short_attention import short_attention_bsc

        # heads stay folded in the channel dim: the kernel slices them
        # in-kernel, so the [B,S,H,D]->[B,H,S,D] copies never happen
        return short_attention_bsc(query, key, value, heads=heads, scale=scale)
    if backend == "pallas_cross":
        from .pallas_cross_attention import cross_attention_short_kv

        return cross_attention_short_kv(query, key, value, heads=heads,
                                        scale=scale)

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


def temporal_attention(
    query: jax.Array,   # [B, S, HW, heads*Dh] — module-native temporal layout
    key: jax.Array,
    value: jax.Array,
    heads: int,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """Self-attention over the frame axis S of 4D temporal tokens WITHOUT the
    [B,S,HW,C] <-> [B,HW,S,C] transposes the 3D path needs: on TPU the
    strided kernel (:func:`..ops.pallas_short_attention.short_attention_frames`)
    reads the native layout directly; elsewhere (CPU mesh/tests) the
    transpose + XLA path keeps the same math."""
    b, s, hw, c = query.shape
    head_dim = c // heads
    if backend is None or backend == "auto":
        backend = default_backend()
    if backend in ("auto", "pallas", "pallas_short") and (
        jax.default_backend() == "tpu" and head_dim % 8 == 0
    ):
        from .pallas_short_attention import short_attention_frames

        return short_attention_frames(query, key, value, heads=heads,
                                      scale=scale)

    def t(x):
        return x.transpose(0, 2, 1, 3).reshape(b * hw, s, heads, head_dim)

    out = jax.nn.dot_product_attention(t(query), t(key), t(value),
                                       scale=scale, implementation="xla")
    return out.reshape(b, hw, s, c).transpose(0, 2, 1, 3)
