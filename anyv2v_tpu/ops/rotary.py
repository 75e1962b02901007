"""Rotary position embeddings for temporal attention.

Replaces the vendored ``rotary_embedding_torch`` in the reference
(``consisti2v/consisti2v/models/rotary_embedding.py``) used by ConsistI2V's
``TemporalConditionalAttention`` / ``RotaryEmbAttnProcessor2_0``
(``videoldm_attention.py:710-807``), including the ``key_pos_idx`` override
that places first-frame keys at custom positions
(``videoldm_attention.py:588-599``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def rotary_freqs(dim: int, theta: float = 10000.0) -> np.ndarray:
    """Default 'lang' frequencies: theta^(-2i/dim) for i in [0, dim/2)."""
    return 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))


def rotary_angles(positions: jax.Array, freqs: jax.Array) -> jax.Array:
    """Outer product positions x freqs, repeated pairwise to full dim.

    positions: [..., S] (may be float for fractional positions)
    returns angles [..., S, dim] where dim = 2 * len(freqs)
    """
    ang = positions[..., None].astype(jnp.float32) * freqs.astype(jnp.float32)
    return jnp.repeat(ang, 2, axis=-1)  # interleaved pairs, rotary_embedding_torch style


def apply_rotary(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate pairs (x_{2i}, x_{2i+1}) by angles.

    x: [..., S, D]; angles: broadcastable [..., S, D]. Matches
    ``rotary_embedding_torch.apply_rotary_emb`` (interleaved convention,
    reference ``rotary_embedding.py:36``).
    """
    x_f32 = x.astype(jnp.float32)
    x1 = x_f32[..., 0::2]
    x2 = x_f32[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x_f32.shape)
    out = x_f32 * jnp.cos(angles) + rotated * jnp.sin(angles)
    return out.astype(x.dtype)


def apply_rotary_partial(x: jax.Array, angles: jax.Array,
                         rot_dim: int) -> jax.Array:
    """Rotate only the first ``rot_dim`` channels of x's last axis, identity
    on the rest, as ONE fused elementwise expression.

    Equivalent to ``x.at[..., :rot_dim].set(apply_rotary(x[..., :rot_dim],
    angles))`` but without the dynamic-update-slice that form lowers to —
    measured 10.9 ms/step of DUS copies across the 20 rotary applications of
    one ConsistI2V UNet forward. Lowers as concat(rotated_head, tail): the
    rotation touches only ``rot_dim`` channels and the tail is a contiguous
    copy XLA fuses into the concat write (measured faster than both the DUS
    form and a full-width cos/sin-padded multiply-add). ``angles``:
    broadcastable [..., S, rot_dim]; ``rot_dim`` must be even
    (interleaved-pair convention)."""
    d = x.shape[-1]
    if rot_dim >= d:
        return apply_rotary(x, angles)
    return jnp.concatenate(
        [apply_rotary(x[..., :rot_dim], angles), x[..., rot_dim:]], axis=-1)


def rotate_queries_or_keys(
    x: jax.Array,
    freqs: jax.Array,
    seq_pos: Optional[jax.Array] = None,
) -> jax.Array:
    """Rotate [..., S, D] by positions 0..S-1 (or explicit ``seq_pos``).

    ``seq_pos`` override mirrors the reference's
    ``rotate_queries_or_keys(..., seq_pos=key_pos_idx)``
    (``rotary_embedding.py:143-165``).
    """
    s = x.shape[-2]
    if seq_pos is None:
        seq_pos = jnp.arange(s, dtype=jnp.float32)
    angles = rotary_angles(seq_pos, freqs)
    return apply_rotary(x, angles)
