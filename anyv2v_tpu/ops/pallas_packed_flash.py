"""Pallas TPU flash attention for NARROW-head splits (heads packed in lanes).

The checkpoint-true i2vgen-xl architecture runs heads=64 with head_dim =
C/64 in {5, 10, 20} (diffusers issue #2011; reference call site
``i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:845-854``), stored padded to
dh in {8, 16, 32} (:func:`anyv2v_tpu.ops.attention.padded_head_dim`). The
split-head flash kernel is hopeless there: every [Sk, dh] K/V block pads dh
to 128 lanes in VMEM (16x memory and bandwidth waste at dh=8) and each of
the B*64 programs does tiny-depth matmuls. XLA's unfused path materializes
[B, 64, Sq, Sk] fp32 scores (68.7 GB for one L0 invert layer at 512^2).

This kernel keeps heads FOLDED in the channel dim and packs G = 128 // dh
heads per 128-lane MXU window:

- grid = (batch, window, q-block); each program owns one q block
  [block_q, 128] and the whole K/V window [Sk_pad, 128] in VMEM
  (1 MB each at Sk=4096 bf16).
- per k-block, a G-trip ``fori_loop`` computes one head's scores with a
  lane-masked K (``where`` on a broadcasted iota — zeroed other-head lanes
  cancel in the full-depth contraction, the same argument as the short
  kernel's pairwise trick, ``pallas_short_attention.py:85-105``).
- online-softmax state (m, l, acc) is ONE [block_q, 128] fp32 triple with
  per-head values REPLICATED across each head's lanes; per-head updates are
  lane-masked selects, so no narrow slices ever reach Mosaic (narrow
  per-head slices are what hung the compiler at heads=64 — VERDICT r2).
- the PV matmul runs at full 128-lane width; lanes outside the active head
  are garbage and die in the masked accumulator update.

MXU cost: every score pays the array's native 128-deep contraction — the
structural floor for narrow heads (a [M,128]x[128,N] pass always contracts
128 lanes; only dh of them carry signal). The kernel's job is to hit that
floor with zero HBM or VMEM inflation; the 12.8x score-count multiplier vs
the widehead split is the architecture's, not the kernel's (PERF.md).

Falls back to interpret mode off-TPU so the same tests run on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def packed_is_supported(heads: int, head_dim: int, sk: int) -> bool:
    """Shape class this kernel serves: whole heads tile 128-lane windows and
    the K/V window fits VMEM comfortably (Sk_pad x 128 bf16 x 2 tensors)."""
    return (
        head_dim <= 64
        and 128 % head_dim == 0
        and (heads * head_dim) % 128 == 0
        and heads >= 128 // head_dim
        and sk <= 8192
    )


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, dh: int,
                   block_k: int, kv_len: int, kv_valid: int):
    """One (batch, window, q-block) program.

    q_ref: [1, block_q, 128]; k_ref/v_ref: [1, kv_len, 128] (whole window);
    o_ref like q_ref. G = 128 // dh heads live in the window.
    """
    q = q_ref[0]                       # [bq, 128], input dtype
    block_q = q.shape[0]
    g_heads = 128 // dh
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)

    m = jnp.full((block_q, 128), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 128), jnp.float32)
    acc = jnp.zeros((block_q, 128), jnp.float32)

    lane_k = jax.lax.broadcasted_iota(jnp.int32, (block_k, 128), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    for kb in range(kv_len // block_k):    # static unroll, <= 32 trips
        kblk = k_ref[0, kb * block_k:(kb + 1) * block_k, :]
        vblk = v_ref[0, kb * block_k:(kb + 1) * block_k, :]
        masked_tail = (kb + 1) * block_k > kv_valid

        def body(g, carry, kblk=kblk, vblk=vblk, masked_tail=masked_tail,
                 kb=kb):
            m, l, acc = carry
            lo = g * dh
            sel_k = (lane_k >= lo) & (lane_k < lo + dh)
            sel_o = (lane_q >= lo) & (lane_q < lo + dh)
            kg = jnp.where(sel_k, kblk, jnp.zeros_like(kblk))
            s = jax.lax.dot_general(
                q, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale                                   # [bq, bk] fp32
            if masked_tail:                             # static per kb
                s = jnp.where(kb * block_k + col < kv_valid, s, -1e30)
            # per-head scalars recovered from the lane-replicated state
            m_old = jnp.max(jnp.where(sel_o, m, -jnp.inf), axis=-1,
                            keepdims=True)              # [bq, 1]
            l_old = jnp.max(jnp.where(sel_o, l, 0.0), axis=-1, keepdims=True)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_old - m_new)
            l_new = l_old * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )                                            # [bq, 128]
            acc = jnp.where(sel_o, acc * alpha + pv, acc)
            m = jnp.where(sel_o, jnp.broadcast_to(m_new, m.shape), m)
            l = jnp.where(sel_o, jnp.broadcast_to(l_new, l.shape), l)
            return m, l, acc

        m, l, acc = jax.lax.fori_loop(0, g_heads, body, (m, l, acc))

    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "dh", "block_q", "block_k", "kv_valid",
                     "interpret"),
)
def _packed_call(q, k, v, *, scale, dh, block_q, block_k, kv_valid,
                 interpret):
    """q: [B, Sq_pad, C]; k/v: [B, Sk_pad, C] (C = heads*dh, padded seqs)."""
    b, sq, c = q.shape
    sk = k.shape[1]
    n_win = c // 128
    grid = (b, n_win, sq // block_q)

    q_spec = pl.BlockSpec((1, block_q, 128), lambda b_, w, i: (b_, i, w),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk, 128), lambda b_, w, i: (b_, 0, w),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_packed_kernel, scale=scale, dh=dh,
                               block_k=block_k, kv_len=sk, kv_valid=kv_valid)
    g_heads = 128 // dh
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # every head's QK and PV contract the full 128-lane window
            flops=2 * 2 * b * g_heads * n_win * sq * sk * 128,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * g_heads * n_win * sq * sk,
        ),
    )(q, k, v)


def packed_flash_attention(
    q: jax.Array,    # [B, Sq, C]  (C = heads * dh, heads folded in channels)
    k: jax.Array,    # [B, Sk, C]
    v: jax.Array,    # [B, Sk, C]
    heads: int,
    scale: float | None = None,
) -> jax.Array:
    """Flash attention over folded narrow-head inputs (self or cross).

    Serves dh = C // heads in {8, 16, 32, 64} with heads*dh % 128 == 0 —
    the checkpoint-true i2vgen split after weight-folded head padding.
    Returns [B, Sq, C] in q's dtype.
    """
    b, sq, c = q.shape
    sk = k.shape[1]
    dh = c // heads
    if not packed_is_supported(heads, dh, sk):
        raise ValueError(f"unsupported packed-flash shape: heads={heads} "
                         f"dh={dh} sk={sk}")
    if scale is None:
        scale = 1.0 / float(np.sqrt(dh))

    block_q = min(256, _ceil_to(sq, 128))
    block_k = min(512, _ceil_to(sk, 128))
    sq_p = _ceil_to(sq, block_q)
    sk_p = _ceil_to(sk, block_k)

    def pad_seq(x, s_pad):
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    qf = pad_seq(q, sq_p)
    kf = pad_seq(k, sk_p)
    vf = pad_seq(v, sk_p)

    interpret = jax.default_backend() != "tpu"
    out = _packed_call(qf, kf, vf, scale=float(scale), dh=dh,
                       block_q=block_q, block_k=block_k, kv_valid=sk,
                       interpret=interpret)
    return out[:, :sq]
