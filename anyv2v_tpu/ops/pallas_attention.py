"""Pallas TPU flash attention.

The hot op of every UNet block (SURVEY.md §2.9 item 1): spatial self/cross
attention over (H/8 * W/8) <= 4096 tokens and temporal attention over <= 128
frames. Replaces ``F.scaled_dot_product_attention`` / xformers from the
reference (``i2vgen-xl/pnp_utils.py:208-210``, ``seine/models/attention.py:218-311``)
with an online-softmax kernel that keeps K/V for one (batch, head) resident
in VMEM (4096 x 64 bf16 = 0.5 MB per tensor — well under the 16 MB VMEM
budget) and streams q blocks through the MXU.

Performance notes (measured on v5e):
- matmuls run at the INPUT dtype with fp32 accumulation
  (``preferred_element_type``) — casting q/k/v to fp32 first would cut MXU
  throughput ~8x. The softmax statistics (m, l) and accumulator stay fp32;
  probabilities are cast back to the value dtype for the PV matmul.
- key-padding is masked in-kernel from the static valid length — never via a
  materialized [B, H, Sq, Sk] bias tensor (which costs more HBM traffic than
  the attention itself at 4096^2).
- the k loop is unrolled (static trip count <= 32) so the final
  partially-valid block is the only one paying the mask select.

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
                  block_k: int, kv_len: int, kv_valid: int):
    """One (batch*head, q-block) program: online softmax over k blocks.

    kv_len is the padded K/V length (multiple of block_k); kv_valid the true
    length — columns >= kv_valid are masked out in the last block only.
    """
    q = q_ref[0]                      # [Bq, D], input dtype (bf16 on TPU)
    block_q, d = q.shape
    n_kb = kv_len // block_k

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    for kb in range(n_kb):           # static unroll: n_kb <= 32
        k = k_ref[0, kb * block_k:(kb + 1) * block_k, :]
        v = v_ref[0, kb * block_k:(kb + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT
        ) * scale                    # [Bq, Bk] fp32 accumulate from bf16 MXU
        if bias_ref is not None:
            s = s + bias_ref[0, :, kb * block_k:(kb + 1) * block_k].astype(jnp.float32)
        if (kb + 1) * block_k > kv_valid:  # only the final partial block
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), dimension=1
            )
            s = jnp.where(col < kv_valid, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "kv_valid", "interpret")
)
def _flash_bhsd(q, k, v, bias, scale, block_q, block_k, kv_valid, interpret):
    """q,k,v: [BH, S, D] (q seq Sq, kv seq Sk, both already padded);
    bias: [BH, Sq, Sk_padded] or None."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sq // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    kernel = functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                               kv_len=sk, kv_valid=kv_valid)
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, block_q, sk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    else:
        kernel_with_bias = kernel

        def kernel(q_ref, k_ref, v_ref, o_ref):  # noqa: F811
            kernel_with_bias(q_ref, k_ref, v_ref, None, o_ref)

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


def _flash_splitkv_kernel(q_ref, ks_ref, vs_ref, kc_ref, vc_ref, o_ref, *,
                          scale: float, block_k: int, sk1_len: int,
                          sk1_valid: int, sk2_len: int, sk2_valid: int):
    """Online softmax over TWO key sources sharing one state: the per-row
    self keys (ks/vs) then the batch-shared context keys (kc/vc). Softmax
    is order-invariant, so the result equals attention over
    concat([self, ctx]) keys — without the concat ever existing."""
    q = q_ref[0]
    block_q, d = q.shape

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    def step(k, v, s_mask_from, kb, acc, m, l):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        if s_mask_from is not None:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), dimension=1)
            s = jnp.where(col < s_mask_from, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return acc, m_new, l

    for kb in range(sk1_len // block_k):          # static unroll
        k = ks_ref[0, kb * block_k:(kb + 1) * block_k, :]
        v = vs_ref[0, kb * block_k:(kb + 1) * block_k, :]
        mask = sk1_valid if (kb + 1) * block_k > sk1_valid else None
        acc, m, l = step(k, v, mask, kb, acc, m, l)
    for kb in range(sk2_len // block_k):
        k = kc_ref[0, kb * block_k:(kb + 1) * block_k, :]
        v = vc_ref[0, kb * block_k:(kb + 1) * block_k, :]
        mask = sk2_valid if (kb + 1) * block_k > sk2_valid else None
        acc, m, l = step(k, v, mask, kb, acc, m, l)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("frames", "heads", "scale", "block_q",
                              "block_k", "sk1_valid", "sk2_valid",
                              "interpret")
)
def _flash_splitkv(q, ks, vs, kc, vc, frames, heads, scale, block_q,
                   block_k, sk1_valid, sk2_valid, interpret):
    """q/ks/vs: [(B*F)*H, S*, D]; kc/vc: [B*H, Sc, D] shared by the F
    frames of each batch row (seq axes padded). Returns [(B*F)*H, Sq, D].

    Grid (B*H, F, n_q) with n_q fastest: the shared-context K/V block
    index depends only on the first grid dim, so it is DMA'd once per
    (batch, head) and reused across all F frames' programs."""
    bfh, sq, d = q.shape
    sk1 = ks.shape[1]
    bh_ctx, sk2 = kc.shape[0], kc.shape[1]
    grid = (bh_ctx, frames, sq // block_q)

    kernel = functools.partial(
        _flash_splitkv_kernel, scale=scale, block_k=block_k,
        sk1_len=sk1, sk1_valid=sk1_valid, sk2_len=sk2,
        sk2_valid=sk2_valid)

    def qmap(bch, fi, i):
        # transposed-layout row of (batch bc, frame fi, head hh) where
        # bch = bc * heads + hh: row = (bc * frames + fi) * heads + hh
        bc = bch // heads
        hh = bch % heads
        return ((bc * frames + fi) * heads + hh, i, 0)

    def smap(bch, fi, i):
        bc = bch // heads
        hh = bch % heads
        return ((bc * frames + fi) * heads + hh, 0, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bfh, sq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk1, d), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk1, d), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk2, d), lambda bch, fi, i: (bch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk2, d), lambda bch, fi, i: (bch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), qmap,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bfh * sq * (sk1_valid + sk2_valid) * d,
            bytes_accessed=(q.size + 2 * ks.size + 2 * kc.size)
            * q.dtype.itemsize,
            transcendentals=bfh * sq * (sk1_valid + sk2_valid),
        ),
    )(q, ks, vs, kc, vc)


def flash_attention_splitkv(
    q: jax.Array,        # [B*F, Sq, H, D]
    k_self: jax.Array,   # [B*F, Sk1, H, D]
    v_self: jax.Array,   # [B*F, Sk1, H, D]
    k_ctx: jax.Array,    # [B, Sk2, H, D] — shared by each batch row's frames
    v_ctx: jax.Array,    # [B, Sk2, H, D]
    frames: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention of each frame's queries over its own keys PLUS a
    batch-shared context block (ConsistI2V first-frame K/V concat,
    ``videoldm_transformer_blocks.py:479-504``) — numerically equal to
    flash over ``concat([k_self, k_ctx-per-frame], axis=1)`` but the
    repeated context keys are never materialized: they are projected,
    transposed and DMA'd once per (batch, head) instead of once per frame.
    Returns [B*F, Sq, H, D]."""
    bf, sq, h, d = q.shape
    b = bf // frames
    if b * frames != bf or k_ctx.shape[0] != b:
        raise ValueError(
            f"splitkv batch mismatch: q rows {bf} != frames {frames} x "
            f"ctx rows {k_ctx.shape[0]}")
    sk1 = k_self.shape[1]
    sk2 = k_ctx.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))

    sk_tot = sk1 + sk2
    block_q = min(512 if sk_tot <= 4096 else 256, _ceil_to(sq, 128))
    block_k = min(512, _ceil_to(min(sk1, sk2), 128))
    sq_p = _ceil_to(sq, block_q)
    sk1_p = _ceil_to(sk1, block_k)
    sk2_p = _ceil_to(sk2, block_k)

    def to_bhsd(x, s_pad):
        bb = x.shape[0]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(bb * h, x.shape[1], d)
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    interpret = jax.default_backend() != "tpu"
    out = _flash_splitkv(
        to_bhsd(q, sq_p), to_bhsd(k_self, sk1_p), to_bhsd(v_self, sk1_p),
        to_bhsd(k_ctx, sk2_p), to_bhsd(v_ctx, sk2_p), frames, h,
        float(scale), block_q, block_k, sk1, sk2, interpret)
    out = out[:, :sq].reshape(bf, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def flash_attention_bshd(
    q: jax.Array,   # [B, Sq, H, D]
    k: jax.Array,   # [B, Sk, H, D]
    v: jax.Array,   # [B, Sk, H, D]
    bias: Optional[jax.Array] = None,  # broadcastable to [B, H, Sq, Sk]
    scale: Optional[float] = None,
) -> jax.Array:
    """Flash attention with automatic padding/masking to MXU-friendly tiles.

    Returns [B, Sq, H, D] in q's dtype.

    Layout note (round 5, negative result): the [B,S,H,D] -> [B,H,S,D]
    operand transposes below are materialized XLA copies (~1.45 ms per L0
    VideoLDM attention). Two attempts to eliminate them both hit Mosaic's
    tiling model: a (1, bq, 1, d) BlockSpec can't slice a singleton head
    off the second-minor axis (block dims must be %8 or full), and a
    MANUAL per-head DMA (`make_async_copy` on a lane slice of the HBM ref)
    fails with "Slice shape along dimension 2 must be aligned to tiling
    (8)" — the (8,128) tile pair covers (H, D), so a one-head slice is not
    expressible either way. The copies run at ~345 GB/s and stay.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))

    # block_q halves for long K/V: the unrolled k loop keeps ~n_kb live
    # [block_q, block_k] fp32 score buffers on the VMEM stack, and sk=8192
    # (ConsistI2V first-frame-concat spatial K/V, videoldm_transformer_blocks
    # .py:479-489) overflows the 16 MB limit at block_q 512 (measured 17.4M).
    # Short K/V (<= 1024: one k block) runs best at 1024/1024 — the L1 self
    # class measures 1.47 vs 1.71 ms at 512/512 (probe_flash_blocks round 5);
    # L0 classes measured best at the defaults (8.20 / 13.94 ms).
    if sk <= 1024:
        block_q = min(1024, _ceil_to(sq, 128))
        block_k = min(1024, _ceil_to(sk, 128))
    else:
        block_q = min(512 if sk <= 4096 else 256, _ceil_to(sq, 128))
        block_k = min(512, _ceil_to(sk, 128))
    sq_p = _ceil_to(sq, block_q)
    sk_p = _ceil_to(sk, block_k)
    interpret = jax.default_backend() != "tpu"

    def to_bhsd(x, s_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    qf = to_bhsd(q, sq_p)
    kf = to_bhsd(k, sk_p)
    vf = to_bhsd(v, sk_p)

    if bias is not None:
        # bias is rare on this path (T5 rel-pos temporal attention); pad keys
        # with -1e30 so padded columns vanish, queries with 0.
        bias_full = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, sq, sk))
        bias_arg = jnp.pad(
            bias_full.reshape(b * h, sq, sk),
            ((0, 0), (0, sq_p - sq), (0, 0)), constant_values=0.0,
        )
        bias_arg = jnp.pad(
            bias_arg, ((0, 0), (0, 0), (0, sk_p - sk)), constant_values=-1e30
        )
    else:
        bias_arg = None   # padding handled in-kernel from kv_valid

    out = _flash_bhsd(qf, kf, vf, bias_arg, float(scale), block_q, block_k,
                      sk, interpret)
    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
