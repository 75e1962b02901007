"""Pallas TPU fused cross-attention for SHORT key/value sequences.

The UNets' attn2 layers attend 1024-4096 pixel queries to <= ~256
text/image-context tokens (reference op: ``F.scaled_dot_product_attention``
in ``i2vgen-xl/pnp_utils.py:208-210`` with encoder_hidden_states K/V).
Through the general flash kernel this shape wastes ~4 ms of a UNet step
(measured, PERF.md round 4): the (batch*head, q-block) grid degenerates to
hundreds of tiny programs whose per-step overhead and [B,S,H,D] transposes
dominate the actual 13 GFLOP of work.

This kernel exploits K/V being tiny: the ENTIRE K/V (all heads, padded to a
128-multiple of rows) sits in VMEM per batch program, queries stream in
block_q-row tiles in their native [B, S, heads*head_dim] layout, and heads
never leave the channel dim (same lane-window trick as
``pallas_short_attention``):

- head PAIRS (head_dim 64) are processed on 128-lane windows with
  zero-masked K halves: both QK matmuls contract over the full 128 lanes
  (the zeroed half cancels the other head), two softmaxed score sets hit the
  same 128-lane V window, and one lane select merges the pair. All slices
  are 128-lane-aligned -> no Mosaic lane rotations.
- head_dim >= 128 (multiples of 128) slice directly, no pairing needed.
- key padding is one additive [1, Sk_pad] iota mask, computed in-kernel.

Traffic: q + out + (k + v once per batch row). No transposes, no score
materialization. Softmax is exact (global max subtraction; Sk fits in one
tile so no online rescaling is needed).

Falls back to interpret mode off-TPU so the same tests run on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_MAX_SK_PAD = 512     # above this the general flash kernel wins
_BLOCK_Q = 2048


def _softmax_pv(s, v, out_dtype):
    """s: [Bq, Sk_pad] fp32 masked scores -> softmax -> @ v ([Sk_pad, W])."""
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT).astype(out_dtype)


def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, head_dim: int,
                  scale: float, sk_valid: int):
    q = q_ref[0]                     # [Bq, C]
    k = k_ref[0]                     # [Sk_pad, C]
    v = v_ref[0]
    bq, c = q.shape
    sk_pad = k.shape[0]

    key_mask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, sk_pad), 1) < sk_valid,
        0.0, -1e30).astype(jnp.float32)

    def scores(qw, kw):
        return jax.lax.dot_general(
            qw, kw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale + key_mask

    pairwise = head_dim == 64 and heads > 1
    if pairwise:
        lane64 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < 64
        for p_i in range(heads // 2):
            c0 = p_i * 128
            qw = q[:, c0:c0 + 128]
            kw = k[:, c0:c0 + 128]
            vw = v[:, c0:c0 + 128]
            zero = jnp.zeros_like(kw)
            o_lo = _softmax_pv(scores(qw, jnp.where(lane64, kw, zero)), vw,
                               o_ref.dtype)
            o_hi = _softmax_pv(scores(qw, jnp.where(lane64, zero, kw)), vw,
                               o_ref.dtype)
            o_ref[0, :, c0:c0 + 128] = jnp.where(lane64, o_lo, o_hi)
        tail = range(heads - 1, heads) if heads % 2 else range(0)
    else:
        tail = range(heads)
    for h in tail:
        c0 = h * head_dim
        o_ref[0, :, c0:c0 + head_dim] = _softmax_pv(
            scores(q[:, c0:c0 + head_dim], k[:, c0:c0 + head_dim]),
            v[:, c0:c0 + head_dim], o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "head_dim", "scale", "sk_valid", "block_q",
                     "interpret"))
def _cross_call(q, k, v, *, heads, head_dim, scale, sk_valid, block_q,
                interpret):
    b, sq, c = q.shape
    sk_pad = k.shape[1]
    grid = (b, sq // block_q)
    kernel = functools.partial(_cross_kernel, heads=heads, head_dim=head_dim,
                               scale=scale, sk_valid=sk_valid)
    flops = 2 * 2 * b * heads * sq * sk_pad * head_dim
    kv_spec = pl.BlockSpec((1, sk_pad, c), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * b * sq * c + 2 * b * sk_pad * c)
            * q.dtype.itemsize,
            transcendentals=b * heads * sq * sk_pad,
        ),
    )(q, k, v)


def cross_attention_short_kv(
    q: jax.Array,    # [B, Sq, C]  (C = heads * head_dim)
    k: jax.Array,    # [B, Sk, C], Sk <= _MAX_SK_PAD
    v: jax.Array,
    heads: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused attention of long queries over a short key/value sequence in the
    flattened-head layout. Returns [B, Sq, C]."""
    b, sq, c = q.shape
    sk = k.shape[1]
    head_dim = c // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))

    sk_pad = _ceil_to(sk, 128)
    if sk_pad != sk:
        pad = ((0, 0), (0, sk_pad - sk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # sublane alignment: a forced-backend sq (e.g. 1000) must still yield an
    # 8-aligned BlockSpec; pad sq up to the 8-aligned block size
    block_q = min(_BLOCK_Q, _ceil_to(sq, 8))
    sq_pad = _ceil_to(sq, block_q)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))

    interpret = jax.default_backend() != "tpu"
    out = _cross_call(q, k, v, heads=heads, head_dim=head_dim,
                      scale=float(scale), sk_valid=sk, block_q=block_q,
                      interpret=interpret)
    return out[:, :sq] if sq_pad != sq else out


def cross_kv_is_supported(sq: int, sk: int, head_dim: int) -> bool:
    """Shapes this kernel handles (and wins on): short K/V, long queries,
    lane-aligned head windows."""
    return (
        sk <= _MAX_SK_PAD
        and sq >= 512
        and (head_dim == 64 or head_dim % 128 == 0)
        and head_dim <= 256
    )
