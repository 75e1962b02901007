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


def _dot_precision(interpret: bool):
    """Compiled Mosaic kernels need a CONCRETE precision: with
    ``precision=None`` the dot inherits ``jax_default_matmul_precision``,
    and under the test config ("highest") that requests the bf16 3-pass
    emulation, which Mosaic cannot lower (MosaicError). Interpret mode (the
    CPU test path) keeps ``None`` so kernel dots follow the session config
    and match the fp32 references bit-tightly."""
    return None if interpret else jax.lax.Precision.DEFAULT


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


def _wide_kv_kernel(q_ref, k_ref, v_ref, o_ref, kw_ref, vw_ref, *,
                    scale: float, dh: int, skp: int, kv_valid: int,
                    rebuild: bool, precision):
    """One (batch, window, q-block) program computing ALL G heads' scores in
    ONE MXU pass against a block-packed wide K/V.

    The per-head loop of :func:`_packed_whole_kernel` issues G small
    [bq,128]x[128,Sk] matmuls with a VPU softmax between each — at short K/V
    (cross-attention Sk=157, L1 self Sk=1024) the loop granularity keeps the
    MXU idle and the kernel lands 3.2-6.5x off its structural floor
    (PERF.md checkpoint-true probe table). This kernel restructures:

    - scratch K_wide/V_wide [G*skp, 128]: row block g holds K/V lane-masked
      to head g's lanes (zeroed other-head lanes cancel in the full-depth
      contraction; zeroed V_wide lanes keep head g's PV contribution out of
      other heads' output lanes). Built ONCE per (batch, window) — scratch
      persists across the q-block grid steps — and revisited by every
      q-block.
    - scores for all G heads = ONE [bq,128] x [128, G*skp] matmul (NT, the
      standard attention orientation). Identical MXU work to the G-trip loop
      (every score still contracts 128 lanes — the narrow-head floor), but
      one big pipelined pass instead of G stalls.
    - softmax per head on lane-aligned [bq, skp] column slices (skp is a
      multiple of 128), exp2 with the scale*log2(e) fold, divide-by-l folded
      into the bf16 P cast.
    - PV for all heads = ONE [bq, G*skp] x [G*skp, 128] NN matmul.

    Serves G*skp <= 8192 (VMEM: fp32 scores + bf16 P + wide K/V). The
    whole-K/V per-head variant remains for L0 self-attention (G*skp = 64k).
    """
    if rebuild:   # interpret mode: scratch persistence not guaranteed
        _build_wide(k_ref, v_ref, kw_ref, vw_ref, dh=dh, skp=skp)
    else:
        @pl.when(pl.program_id(2) == 0)
        def _():
            _build_wide(k_ref, v_ref, kw_ref, vw_ref, dh=dh, skp=skp)

    q = (q_ref[0].astype(jnp.float32)
         * (scale * 1.4426950408889634)).astype(q_ref.dtype)
    s = jax.lax.dot_general(
        q, kw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                               # [bq, G*skp] fp32
    block_q = q.shape[0]
    g_heads = 128 // dh
    masked = kv_valid < skp
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, skp), 1)
    parts = []
    for g in range(g_heads):
        sl = s[:, g * skp:(g + 1) * skp]
        if masked:
            sl = jnp.where(col < kv_valid, sl, -1e30)
        m = jnp.max(sl, axis=-1, keepdims=True)
        p = jnp.exp2(sl - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        parts.append((p * (1.0 / l)).astype(q_ref.dtype))
    p = jnp.concatenate(parts, axis=1)              # [bq, G*skp] bf16
    o_ref[0] = jax.lax.dot_general(
        p, vw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(o_ref.dtype)


def _build_wide(k_ref, v_ref, kw_ref, vw_ref, *, dh: int, skp: int):
    k = k_ref[0]                                    # [skp, 128]
    v = v_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (skp, 128), 1)
    zero_k = jnp.zeros_like(k)
    for g in range(128 // dh):
        sel = (lane >= g * dh) & (lane < (g + 1) * dh)
        kw_ref[g * skp:(g + 1) * skp, :] = jnp.where(sel, k, zero_k)
        vw_ref[g * skp:(g + 1) * skp, :] = jnp.where(sel, v, zero_k)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "dh", "block_q", "kv_valid", "interpret"),
)
def _wide_kv_call(q, k, v, *, scale, dh, block_q, kv_valid, interpret):
    """Wide-KV variant: q [B, Sq_pad, C]; k/v [B, skp, C] (skp % 128 == 0)."""
    b, sq, c = q.shape
    skp = k.shape[1]
    n_win = c // 128
    g_heads = 128 // dh
    grid = (b, n_win, sq // block_q)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda b_, w, i: (b_, i, w),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, skp, 128), lambda b_, w, i: (b_, 0, w),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_wide_kv_kernel, scale=scale, dh=dh, skp=skp,
                               kv_valid=kv_valid, rebuild=interpret,
                               precision=_dot_precision(interpret))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((g_heads * skp, 128), q.dtype),
            pltpu.VMEM((g_heads * skp, 128), q.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * g_heads * n_win * sq * skp * 128,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * g_heads * n_win * sq * skp,
        ),
    )(q, k, v)


def _wide_t_kernel(q_ref, k_ref, v_ref, o_ref, kw_ref, vw_ref, *,
                   scale: float, dh: int, skp: int, kv_valid: int,
                   rebuild: bool, precision):
    """Transposed-scores wide variant for SHORT K/V (cross-attention):
    scores live as [G*skp, bq] so per-head blocks are SUBLANE slices —
    skp only needs 16-row alignment (157 -> 160) instead of the
    lane-aligned 128 multiple (157 -> 256) the untransposed layout needs,
    cutting padded MXU + VPU work 1.6x at the text/image context length.
    QK is one [G*skp,128] x [128,bq]^T pass; PV contracts the sublane dim
    of both operands ([G*skp,bq]^T x [G*skp,128] — the dW-style orientation
    the MXU runs natively)."""
    if rebuild:
        _build_wide(k_ref, v_ref, kw_ref, vw_ref, dh=dh, skp=skp)
    else:
        @pl.when(pl.program_id(2) == 0)
        def _():
            _build_wide(k_ref, v_ref, kw_ref, vw_ref, dh=dh, skp=skp)

    q = (q_ref[0].astype(jnp.float32)
         * (scale * 1.4426950408889634)).astype(q_ref.dtype)
    s = jax.lax.dot_general(
        kw_ref[:], q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                               # [G*skp, bq] fp32
    block_q = q.shape[0]
    g_heads = 128 // dh
    masked = kv_valid < skp
    if masked:
        # mask only the 16-row aligned tail slice that contains pad rows
        tail0 = (kv_valid // 16) * 16
        row = jax.lax.broadcasted_iota(jnp.int32, (skp - tail0, block_q), 0)
    parts = []
    for g in range(g_heads):
        sl = s[g * skp:(g + 1) * skp]
        if masked:
            tail = jnp.where(row + tail0 < kv_valid,
                             sl[tail0:], -1e30)
            sl = jnp.concatenate([sl[:tail0], tail], axis=0)
        m = jnp.max(sl, axis=0, keepdims=True)
        p = jnp.exp2(sl - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        parts.append((p * (1.0 / l)).astype(q_ref.dtype))
    p = jnp.concatenate(parts, axis=0)              # [G*skp, bq] bf16
    o_ref[0] = jax.lax.dot_general(
        p, vw_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "dh", "block_q", "kv_valid", "interpret"),
)
def _wide_t_call(q, k, v, *, scale, dh, block_q, kv_valid, interpret):
    """Transposed wide variant: q [B, Sq_pad, C]; k/v [B, skp, C]
    (skp % 16 == 0)."""
    b, sq, c = q.shape
    skp = k.shape[1]
    n_win = c // 128
    g_heads = 128 // dh
    grid = (b, n_win, sq // block_q)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda b_, w, i: (b_, i, w),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, skp, 128), lambda b_, w, i: (b_, 0, w),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_wide_t_kernel, scale=scale, dh=dh, skp=skp,
                               kv_valid=kv_valid, rebuild=interpret,
                               precision=_dot_precision(interpret))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((g_heads * skp, 128), q.dtype),
            pltpu.VMEM((g_heads * skp, 128), q.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * g_heads * n_win * sq * skp * 128,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * g_heads * n_win * sq * skp,
        ),
    )(q, k, v)


def _packed_whole_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         dh: int, kv_valid: int, precision):
    """One (batch, window, q-block) program with the WHOLE K/V window
    resident and per-q-block scores in VMEM — no online-softmax state.

    At this framework's shapes (sk <= 4096) the [block_q, Sk] fp32 score
    buffer fits VMEM, so the online rescaling of :func:`_packed_kernel` is
    pure overhead: its per-head lane-replicated (m, l, acc) updates are
    ~6 VPU ops on [block_q, 128] per head per k-block — measured ~40% of the
    kernel at L0 (82.5 ms vs the 44.7 ms 128-lane MXU floor). This variant
    also masks **Q** per head instead of K: a [block_q, 128] select instead
    of [block_k, 128], Sk/block_q times cheaper, with the same cancellation
    (zeroed q lanes kill the other heads' k contributions in the full-depth
    contraction). The PV matmul runs unmasked at full width; lanes outside
    the active head carry garbage and die in the per-head output select.
    """
    # softmax scale folded into q once ([bq, 128] fp32 — 1/Sk the cost of
    # scaling scores), together with log2(e): softmax(s) = 2^(s2 - m2) /
    # sum 2^(s2 - m2) for s2 = s*log2(e), so exp2 replaces exp and the
    # per-score multiply inside the transcendental disappears. The
    # unnormalized-p PV output divides by l at [bq, 128] instead of dividing
    # p at [bq, Sk]. All three cut per-score VPU ops, which dominate once
    # the online state is gone.
    q = (q_ref[0].astype(jnp.float32)
         * (scale * 1.4426950408889634)).astype(q_ref.dtype)
    k = k_ref[0]                       # [sk_pad, 128]
    v = v_ref[0]
    block_q = q.shape[0]
    sk_pad = k.shape[0]
    g_heads = 128 // dh
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)
    pad_tail = sk_pad > kv_valid
    if pad_tail:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk_pad), 1)

    def head_sel(g):
        lo = g * dh
        return (lane_q >= lo) & (lane_q < lo + dh)

    def scores(g):
        qg = jnp.where(head_sel(g), q, jnp.zeros_like(q))
        s = jax.lax.dot_general(
            qg, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                            # [bq, sk_pad] fp32
        if pad_tail:
            s = jnp.where(col < kv_valid, s, -1e30)
        return s

    def consume(acc, g, s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) / l                                        # [bq, 128]
        return jnp.where(head_sel(g), pv, acc)

    # NOTE two measured-and-rejected restructurings (v5e, L0 shapes):
    # (a) full head-loop unroll (Mosaic supports only unroll=1 or =all) —
    #     g_heads concurrent [block_q, Sk] fp32 score buffers blow the
    #     16 MB VMEM stack (22.6M at sk=4096);
    # (b) a 2-stage software pipeline (prefetch head g+1's QK before head
    #     g's softmax, score buffer loop-carried, vmem_limit raised) —
    #     87.1 ms vs 63.9 ms at L0 b=16: carrying a 4 MB buffer through
    #     scf.for costs more in copies than the MXU/VPU overlap saves.
    def body(g, acc):
        return consume(acc, g, scores(g))

    acc = jax.lax.fori_loop(0, g_heads, body,
                            jnp.zeros((block_q, 128), jnp.float32))
    o_ref[0] = acc.astype(o_ref.dtype)


def _packed_whole_pipe_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                              dh: int, kv_valid: int, precision):
    """Whole-K/V variant with a Python-unrolled 2-deep software pipeline:
    head g+1's QK matmul is issued before head g's softmax/PV consume, so
    Mosaic can overlap the MXU pass with the VPU softmax. Only two
    [block_q, Sk] fp32 score buffers are ever live (vs g_heads for a full
    eager unroll, which blows VMEM — see the NOTE in _packed_whole_kernel;
    vs the rejected scf-carried pipeline, no buffer crosses a loop boundary).
    """
    q = (q_ref[0].astype(jnp.float32)
         * (scale * 1.4426950408889634)).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    block_q = q.shape[0]
    sk_pad = k.shape[0]
    g_heads = 128 // dh
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)
    pad_tail = sk_pad > kv_valid
    if pad_tail:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk_pad), 1)

    def head_sel(g):
        lo = g * dh
        return (lane_q >= lo) & (lane_q < lo + dh)

    def scores(g):
        qg = jnp.where(head_sel(g), q, jnp.zeros_like(q))
        s = jax.lax.dot_general(
            qg, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if pad_tail:
            s = jnp.where(col < kv_valid, s, -1e30)
        return s

    def consume(acc, g, s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) / l
        return jnp.where(head_sel(g), pv, acc)

    acc = jnp.zeros((block_q, 128), jnp.float32)
    s = scores(0)
    for g in range(g_heads):
        s_next = scores(g + 1) if g + 1 < g_heads else None
        acc = consume(acc, g, s)
        s = s_next
    o_ref[0] = acc.astype(o_ref.dtype)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, dh: int,
                   block_k: int, kv_len: int, kv_valid: int, precision):
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
                precision=precision,
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
                precision=precision,
            )                                            # [bq, 128]
            acc = jnp.where(sel_o, acc * alpha + pv, acc)
            m = jnp.where(sel_o, jnp.broadcast_to(m_new, m.shape), m)
            l = jnp.where(sel_o, jnp.broadcast_to(l_new, l.shape), l)
            return m, l, acc

        m, l, acc = jax.lax.fori_loop(0, g_heads, body, (m, l, acc))

    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "dh", "block_q", "kv_valid", "interpret",
                     "pipe"),
)
def _packed_call_whole(q, k, v, *, scale, dh, block_q, kv_valid, interpret,
                       pipe=False):
    """Whole-K/V variant: q [B, Sq_pad, C]; k/v [B, Sk_pad, C]."""
    b, sq, c = q.shape
    sk = k.shape[1]
    n_win = c // 128
    grid = (b, n_win, sq // block_q)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda b_, w, i: (b_, i, w),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk, 128), lambda b_, w, i: (b_, 0, w),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _packed_whole_pipe_kernel if pipe else _packed_whole_kernel,
        scale=scale, dh=dh, kv_valid=kv_valid,
        precision=_dot_precision(interpret))
    g_heads = 128 // dh
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * g_heads * n_win * sq * sk * 128,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * g_heads * n_win * sq * sk,
        ),
    )(q, k, v)


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
                               block_k=block_k, kv_len=sk, kv_valid=kv_valid,
                               precision=_dot_precision(interpret))
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

    def pad_seq(x, s_pad):
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    interpret = jax.default_backend() != "tpu"
    import os
    variant = os.environ.get("ANYV2V_PACKED_VARIANT", "auto")

    sk_whole = _ceil_to(sk, 128)
    g_heads = 128 // dh

    # Wide-KV variant when the block-packed [G*skp, 128] K/V pair plus the
    # [block_q, G*skp] fp32 score buffer fit VMEM AND the shape class is one
    # where it measured faster than the whole-K/V per-head loop (v5e A/B,
    # probe_packed): self-attention (L1 1024^2 dh16: 9.5 vs 11.4 ms b=16;
    # L2 256^2 dh32: 7.0 vs 10.8 ms b=48) and short-q shapes. Large-q CROSS
    # attention (sq >= 1024, sk=157) measured at parity-to-slower (11.2 vs
    # 10.2 ms L0 b=16) — both variants sit ~3x above the MXU floor there
    # with the matmul shape itself underutilized, so cross stays on the
    # whole-K/V loop.
    # Transposed wide variant for short cross K/V: sublane-aligned per-head
    # score blocks need only 16-row key padding (157 -> 160 vs 256), so
    # padded MXU + softmax work shrinks 1.6x (A/B gated below).
    skp_t = _ceil_to(sk, 16)
    if variant == "wide_t" or (
        variant == "auto" and sq != sk and sq > 256 and sk <= 256
        and g_heads * skp_t <= 4096
    ):
        # measured (v5e, bf16): L0 cross 12.2 -> 7.9 ms b=16 / 20.2 -> 13.7
        # b=48; L1 cross b=48 10.9 -> 9.3 (b=16 parity). Short-q cross
        # (sq <= 256, L2) stays on the untransposed wide variant, which won
        # there (7.0 vs 10.8 ms b=48).
        block_q = min(512, _ceil_to(sq, 128))
        sq_p = _ceil_to(sq, block_q)
        out = _wide_t_call(pad_seq(q, sq_p), pad_seq(k, skp_t),
                           pad_seq(v, skp_t),
                           scale=float(scale), dh=dh, block_q=block_q,
                           kv_valid=sk, interpret=interpret)
        return out[:, :sq]

    wide = g_heads * sk_whole
    use_wide = wide <= 8192 and (sq == sk or sq <= 256)
    if (use_wide and variant in ("auto", "wide")) or variant == "wide":
        # fp32 score buffer held near 4 MB: bq = 2^20 / wide, 128-aligned
        block_q = min(512, max(128, (1 << 20) // wide // 128 * 128))
        block_q = min(block_q, _ceil_to(sq, 128))
        sq_p = _ceil_to(sq, block_q)
        out = _wide_kv_call(pad_seq(q, sq_p), pad_seq(k, sk_whole),
                            pad_seq(v, sk_whole),
                            scale=float(scale), dh=dh, block_q=block_q,
                            kv_valid=sk, interpret=interpret)
        return out[:, :sq]

    # Whole-K/V variant whenever the per-window [Sk_pad, 128] K/V pair plus
    # the [block_q, Sk_pad] fp32 score buffer fit VMEM (every shape this
    # model produces: sk <= 4096): no online-softmax state, Q-side head
    # masking — measured the online kernel at ~29% slower at L0 (81 vs
    # 64 ms) and 41% at sk=157 cross (15.7 vs 11.1 ms). block_q scales
    # inversely with Sk_pad to hold the score buffer near 4 MB (bq 512 at
    # sk 4096 exceeds the 16 MB VMEM stack limit, measured 17.06M).
    if sk_whole <= 4096 and variant != "online":
        block_q = min(2048, max(256, (256 * 4096) // sk_whole // 128 * 128))
        block_q = min(block_q, _ceil_to(sq, 128))
        # Staggered 2-deep software pipeline for the large SELF-attention
        # class (L0: sq = sk = 4096): head g+1's QK overlaps head g's
        # softmax/PV; measured 54.3 vs 62.9 ms at L0 b=16 (block_q halved to
        # keep two live score buffers within VMEM — bq 256 x2 OOMs at 27.3M).
        # Cross shapes keep the rolled loop (block_q 2048 dominates there).
        pipe = variant.startswith("whole_pipe") or (
            variant == "auto" and sq == sk and sk_whole >= 2048)
        if pipe and variant != "whole_pipe_full":
            # two score buffers live: halve block_q to stay within VMEM
            # ("whole_pipe_full" keeps block_q and relies on Mosaic fusion)
            block_q = max(128, block_q // 2)
        sq_p = _ceil_to(sq, block_q)
        out = _packed_call_whole(pad_seq(q, sq_p), pad_seq(k, sk_whole),
                                 pad_seq(v, sk_whole),
                                 scale=float(scale), dh=dh, block_q=block_q,
                                 kv_valid=sk, interpret=interpret, pipe=pipe)
        return out[:, :sq]

    block_q = min(256, _ceil_to(sq, 128))
    sq_p = _ceil_to(sq, block_q)
    qf = pad_seq(q, sq_p)
    block_k = min(512, _ceil_to(sk, 128))
    sk_p = _ceil_to(sk, block_k)
    kf = pad_seq(k, sk_p)
    vf = pad_seq(v, sk_p)
    out = _packed_call(qf, kf, vf, scale=float(scale), dh=dh,
                       block_q=block_q, block_k=block_k, kv_valid=sk,
                       interpret=interpret)
    return out[:, :sq]
