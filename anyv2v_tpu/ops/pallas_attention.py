"""Pallas TPU flash attention.

The hot op of every UNet block (SURVEY.md §2.9 item 1): spatial self/cross
attention over (H/8 * W/8) <= 4096 tokens and temporal attention over <= 128
frames. Replaces ``F.scaled_dot_product_attention`` / xformers from the
reference with an online-softmax kernel that keeps K/V for one (batch, head)
resident in VMEM (4096 x 64 bf16 = 0.5 MB per tensor — well under the 16 MB
VMEM budget) and streams q blocks through the MXU.

PnP Q/K substitution happens *before* this kernel as a batch-row remap
(``anyv2v_tpu.ops.pnp``), so one kernel serves injected and clean steps.

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


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                  block_k: int, kv_len: int):
    """One (batch*head, q-block) program: online softmax over k blocks."""
    q = q_ref[0].astype(jnp.float32)  # [Bq, D]
    block_q, d = q.shape
    n_kb = kv_len // block_k

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Bq, Bk]
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_bhsd(q, k, v, bias, scale, block_q, block_k, interpret):
    """q,k,v: [BH, S, D] (q seq Sq, kv seq Sk, both already padded);
    bias: [BH, Sq, Sk] or None."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sq // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, block_q, sk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = functools.partial(_flash_kernel, scale=scale, block_k=block_k, kv_len=sk)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale,
                          block_k=block_k, kv_len=sk)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(*args)


def flash_attention_bshd(
    q: jax.Array,   # [B, Sq, H, D]
    k: jax.Array,   # [B, Sk, H, D]
    v: jax.Array,   # [B, Sk, H, D]
    bias: Optional[jax.Array] = None,  # broadcastable to [B, H, Sq, Sk]
    scale: Optional[float] = None,
) -> jax.Array:
    """Flash attention with automatic padding/masking to MXU-friendly tiles.

    Returns [B, Sq, H, D] in q's dtype.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))

    block_q = min(512, _ceil_to(sq, 128))
    block_k = min(512, _ceil_to(sk, 128))
    sq_p = _ceil_to(sq, block_q)
    sk_p = _ceil_to(sk, block_k)

    def to_bhsd(x, s_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    qf = to_bhsd(q, sq_p)
    kf = to_bhsd(k, sk_p)
    vf = to_bhsd(v, sk_p)

    need_mask = sk_p != sk
    if bias is not None or need_mask:
        bias_full = jnp.zeros((b, h, sq, sk), jnp.float32) if bias is None else (
            jnp.broadcast_to(bias.astype(jnp.float32), (b, h, sq, sk))
        )
        bias_full = jnp.pad(
            bias_full.reshape(b * h, sq, sk),
            ((0, 0), (0, sq_p - sq), (0, sk_p - sk)),
            constant_values=0.0,
        )
        if need_mask:
            key_pad = jnp.arange(sk_p) >= sk
            bias_full = jnp.where(key_pad[None, None, :], -1e30, bias_full)
        bias_arg = bias_full
    else:
        bias_arg = None

    interpret = jax.default_backend() != "tpu"
    out = _flash_bhsd(qf, kf, vf, bias_arg, float(scale), block_q, block_k, interpret)
    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
