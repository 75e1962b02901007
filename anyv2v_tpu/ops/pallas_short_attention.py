"""Pallas TPU fused attention for SHORT sequences (temporal attention).

The video UNets' temporal attentions run seq = n_frames (16-128) over a huge
batch of (pixel, head) rows (SURVEY.md §2.9 item 2; reference op:
``seine/models/attention.py:797``, diffusers ``TransformerTemporalModel``).
XLA's unfused path materializes the fp32 ``[rows, heads, S, S]`` score tensor
through 5+ HBM round-trips (QK dot, sub/exp fusion, reduce, div, PV dot,
plus head-split copies) — measured ~78 ms of a 247 ms UNet forward at the
headline 16-frame 512^2 config, ~25x its FLOP share.

This kernel makes short-seq attention HBM-minimal: traffic = q, k, v, out,
nothing else.

Design (v5e measured):
- **Sequence packing**: G = 128 // S_pad independent sequences are packed
  into one 128-row MXU tile; scores are a single ``[tile, tile]`` matmul with
  a precomputed block-diagonal additive mask (off-diagonal pairs and padded
  key columns get -1e30). The (G-1)/G wasted MXU flops are free — the XLA
  path is bandwidth-bound, not MXU-bound (PERF.md round-2 item 2 measured
  the same packing LOSING at XLA level because the masked score tensor still
  went through HBM; in-kernel it never leaves VMEM).
- **No host-side transposes**: the packed layout ``[B*S', C]`` is a reshape
  of the module's native ``[B, S, C]`` token layout (bitcast, no copy), and
  heads are column slices handled by a static in-kernel loop — the
  ``[B,S,H,D] -> [B,H,S,D]`` copies XLA inserts are gone entirely.
- matmuls at input dtype (bf16) with fp32 accumulation; softmax fp32.

Numerics note: scores use one global max subtraction per packed row (exact
softmax, same as any flash kernel); padded key columns vanish via -1e30.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _masked_softmax_attn(q, k, v, mask, scale, out_dtype):
    """One [tile, tile] attention: q,k,v [tile, W]; k pre-masked so that only
    one head's feature columns are nonzero (the matmul contracts over the
    full W, zeroed k columns kill the other head's q contribution)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT
    ) * scale + mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT).astype(out_dtype)


def _window_heads(heads: int, head_dim: int) -> int:
    """Heads per 128-lane MXU window for the lane-masked packing trick
    (pairwise at dh=64; G = 128/dh for the checkpoint-true narrow splits).
    0 disables windowing (wide or non-dividing head dims)."""
    if head_dim > 64 or 128 % head_dim != 0 or heads < 128 // head_dim:
        return 0
    return 128 // head_dim


def _solve_window(q, k, v, mask_h, n_masks, g_win, head_win, head_dim,
                  scale, out_dtype):
    """All g_win heads of one 128-lane window: per head, K's other-head
    lanes are zero-masked (VPU select; the zeroed columns cancel the other
    heads' q in the full-depth contraction) and results merge with lane
    selects. g_win == 2 unrolls (the measured-optimal pairwise path);
    wider windows (checkpoint-true heads=64 at dh 8/16/32) run a
    fori_loop with iota-derived lane masks — no narrow slices reach
    Mosaic, whose per-head narrow-slice unrolls hang at heads=64."""
    # lane masks are built separately for the K rows (zeroing the other
    # heads' feature lanes before the contraction) and the Q/output rows
    # (merging per-head results) — K and Q tiles have different row counts
    # in the rectangular (sk > sq) packing
    zero = jnp.zeros_like(k)
    o_shape = q.shape[:-1] + (128,)
    if g_win == 2:
        lane64_k = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1) < 64
        lane64_q = jax.lax.broadcasted_iota(jnp.int32, o_shape, 1) < 64
        o_lo = _masked_softmax_attn(q, jnp.where(lane64_k, k, zero), v,
                                    mask_h(head_win), scale, out_dtype)
        o_hi = _masked_softmax_attn(q, jnp.where(lane64_k, zero, k), v,
                                    mask_h(head_win + 1), scale, out_dtype)
        return jnp.where(lane64_q, o_lo, o_hi)

    lane_k = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, o_shape, 1)

    def solve(g, o_acc):
        lo = g * head_dim
        sel_k = (lane_k >= lo) & (lane_k < lo + head_dim)
        sel_q = (lane_q >= lo) & (lane_q < lo + head_dim)
        kg = jnp.where(sel_k, k, zero)
        mask = mask_h(head_win + g) if n_masks > 1 else mask_h(0)
        o_g = _masked_softmax_attn(q, kg, v, mask, scale, out_dtype)
        return jnp.where(sel_q, o_g, o_acc)

    # Python-unrolled: the G per-head chains are independent, so Mosaic can
    # pipeline head g+1's matmuls under head g's softmax — the rolled
    # fori_loop serializes them and measured latency-bound (the strided
    # temporal call at the checkpoint-true heads=64/dh=8 L0 shape: 22.6 ms
    # rolled vs ~70x its HBM floor; see PERF.md round-4 anatomy). All body
    # ops are full-128-lane tiles ([tile, 128] selects + dots) — the
    # narrow-slice unrolls that hung Mosaic at heads=64 (VERDICT r2) never
    # appear here. Buffers are [tile, tile] fp32, small enough that 16 live
    # copies fit VMEM.
    o_acc = jnp.zeros(o_shape, out_dtype)
    for g in range(g_win):
        o_acc = solve(g, o_acc)
    return o_acc


def _short_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, heads: int,
                  head_dim: int, scale: float, tile_q: int, tile_k: int):
    """One program: [Rq, C] query rows against [Rk, C] key/value rows
    (C = heads*head_dim), looping matching (tile_q, tile_k) row sub-tiles;
    each sub-tile's heads are solved in VMEM. tile_q == tile_k for packed
    self-attention; tile_k > tile_q for the rectangular augmented-window
    shapes (ConsistI2V first-frame keys: sk = sq + 8,
    ref ``consisti2v/models/videoldm_transformer_blocks.py:490-504``).

    ``mask_ref`` is [n_masks, tile_q, tile_k]: n_masks == 1 for the plain
    block-diagonal mask, n_masks == heads when a per-head additive bias
    (SEINE's T5 relative-position bias, ref ``seine/models/attention.py:894``)
    is folded into the mask — the bias is query/key-position-only, so it
    tiles across the packed diagonal blocks and costs nothing per row.

    Heads are processed G = 128/head_dim at a time on 128-lane windows via
    lane-masked K (see :func:`_solve_window`); heads that don't fill a whole
    window fall to the narrow per-head tail loop (few-head splits only —
    routing never sends many-head non-dividing splits here). The tail loop
    also serves WIDE heads (head_dim up to 256, VideoLDM's C=1280 temporal
    attention at dh=160): the dot contracts the full per-head lane span."""
    rows = q_ref.shape[0]
    n_masks = mask_ref.shape[0]

    def mask_h(h):
        return mask_ref[h if n_masks > 1 else 0]

    g_win = _window_heads(heads, head_dim)
    n_win = heads // g_win if g_win else 0
    for i in range(rows // tile_q):
        r0, s0 = i * tile_q, i * tile_k
        for w_i in range(n_win):
            c0 = w_i * 128
            q = q_ref[r0:r0 + tile_q, c0:c0 + 128]
            k = k_ref[s0:s0 + tile_k, c0:c0 + 128]
            v = v_ref[s0:s0 + tile_k, c0:c0 + 128]
            o_ref[r0:r0 + tile_q, c0:c0 + 128] = _solve_window(
                q, k, v, mask_h, n_masks, g_win, w_i * g_win, head_dim,
                scale, o_ref.dtype)
        for h in range(n_win * g_win if g_win else 0, heads):
            c0 = h * head_dim
            q = q_ref[r0:r0 + tile_q, c0:c0 + head_dim]
            k = k_ref[s0:s0 + tile_k, c0:c0 + head_dim]
            v = v_ref[s0:s0 + tile_k, c0:c0 + head_dim]
            o_ref[r0:r0 + tile_q, c0:c0 + head_dim] = _masked_softmax_attn(
                q, k, v, mask_h(h), scale, o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "head_dim", "scale", "tile_q", "tile_k",
                     "n_tiles", "interpret"),
)
def _short_packed(q, k, v, mask, *, heads, head_dim, scale, tile_q, tile_k,
                  n_tiles, interpret):
    """q: [Nq, C]; k,v: [Nk, C] packed rows (sequences are contiguous row
    runs of sq_pad / sk_pad; G = tile_q // sq_pad of them per tile; blocks
    hold n_tiles tiles)."""
    nq, c = q.shape
    rows_q = n_tiles * tile_q
    rows_k = n_tiles * tile_k
    grid = (nq // rows_q,)
    q_spec = pl.BlockSpec((rows_q, c), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((rows_k, c), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(mask.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_short_kernel, heads=heads, head_dim=head_dim,
                               scale=scale, tile_q=tile_q, tile_k=tile_k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nq, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
        out_specs=q_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nq * tile_k * c,
            bytes_accessed=(2 * nq + 2 * k.shape[0]) * c * q.dtype.itemsize
            + 2 * nq * c,
            transcendentals=nq * tile_k,
        ),
    )(q, k, v, mask)


def _block_diag_mask(s_pad_q: int, s_pad_k: int, g: int,
                     s_valid: int) -> np.ndarray:
    """[g*s_pad_q, g*s_pad_k] additive fp32 mask: query row r may attend key
    c iff they belong to the same packed sequence and c is a valid
    (non-padded) key position."""
    r = np.arange(g * s_pad_q)
    ck = np.arange(g * s_pad_k)
    same_seq = (r[:, None] // s_pad_q) == (ck[None, :] // s_pad_k)
    valid_key = (ck[None, :] % s_pad_k) < s_valid
    return np.where(same_seq & valid_key, 0.0, -1e30).astype(np.float32)


def _strided_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, heads: int,
                    head_dim: int, scale: float):
    """Strided (no-transpose) variant: refs are [1, S_pad, W, C] blocks of the
    module-native [B, F, HW, C] token layout; rows of the flattened
    [S_pad*W, C] tile are ordered (frame, pixel), and the mask admits only
    same-pixel pairs — the frame axis never has to be transposed next to the
    feature axis, so the [B,F,HW,C] <-> [B,HW,F,C] copies disappear.
    k/v may carry MORE frame rows than q (Sk_pad > S_pad: ConsistI2V's
    augmented first-frame keys appended along the frame axis) — the mask is
    rectangular [tile_q, tile_k] then."""
    s_pad, w, c = q_ref.shape[1:]
    sk_pad = k_ref.shape[1]
    tile = s_pad * w
    tile_k = sk_pad * w
    q = q_ref[0].reshape(tile, c)
    k = k_ref[0].reshape(tile_k, c)
    v = v_ref[0].reshape(tile_k, c)
    n_masks = mask_ref.shape[0]

    def mask_h(h):
        return mask_ref[h if n_masks > 1 else 0]

    g_win = _window_heads(heads, head_dim)
    n_win = heads // g_win if g_win else 0
    for w_i in range(n_win):
        c0 = w_i * 128
        o_ref[0, :, :, c0:c0 + 128] = _solve_window(
            q[:, c0:c0 + 128], k[:, c0:c0 + 128], v[:, c0:c0 + 128],
            mask_h, n_masks, g_win, w_i * g_win, head_dim, scale,
            o_ref.dtype).reshape(s_pad, w, 128)
    for h in range(n_win * g_win if g_win else 0, heads):
        c0 = h * head_dim
        o_ref[0, :, :, c0:c0 + head_dim] = _masked_softmax_attn(
            q[:, c0:c0 + head_dim], k[:, c0:c0 + head_dim],
            v[:, c0:c0 + head_dim], mask_h(h), scale, o_ref.dtype,
        ).reshape(s_pad, w, head_dim)


def _strided_mask(s_pad: int, w: int, s_valid: int,
                  sk_pad: int | None = None,
                  sk_valid: int | None = None) -> np.ndarray:
    """[s_pad*w, sk_pad*w] additive mask for (frame, pixel)-ordered rows:
    row r = f*w + p attends key c iff same pixel (c % w == r % w) and the
    key's frame (c // w) is a valid (non-padded) position. Square
    (sk_pad == s_pad) for plain temporal self-attention; rectangular for
    augmented first-frame keys appended along the frame axis."""
    sk_pad = s_pad if sk_pad is None else sk_pad
    sk_valid = s_valid if sk_valid is None else sk_valid
    r = np.arange(s_pad * w)
    ck = np.arange(sk_pad * w)
    same_px = (r[:, None] % w) == (ck[None, :] % w)
    valid_f = (ck[None, :] // w) < sk_valid
    return np.where(same_px & valid_f, 0.0, -1e30).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("heads", "head_dim", "scale", "w", "interpret"))
def _strided_call(q, k, v, mask, *, heads, head_dim, scale, w, interpret):
    b, s_pad, hw, c = q.shape
    sk_pad = k.shape[1]
    grid = (b, hw // w)
    spec = pl.BlockSpec((1, s_pad, w, c), lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk_pad, w, c), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(mask.shape, lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_strided_kernel, heads=heads,
                               head_dim=head_dim, scale=scale)
    n = b * s_pad * hw
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hw, c), q.dtype),
        grid=grid,
        in_specs=[spec, kv_spec, kv_spec, mask_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * sk_pad * w * c,
            bytes_accessed=3 * n * c * q.dtype.itemsize + 4 * n * c,
            transcendentals=n * sk_pad * w,
        ),
    )(q, k, v, mask)


# strided variant pays an 8x score/exp inflation factor S_pad*8 vs 128-packed
# tiles; identical at S_pad=16, cheap to 32, transpose+pack wins beyond
_STRIDED_MAX_SPAD = 32


def short_attention_frames(
    q: jax.Array,    # [B, S, HW, C]  (module-native temporal token layout)
    k: jax.Array,    # [B, Sk, HW, C] (Sk == S, or S < Sk <= S+16: augmented
    v: jax.Array,    #                 first-frame keys on the frame axis)
    heads: int,
    scale: float | None = None,
    bias: jax.Array | None = None,   # [heads, S, Sk] (shared across B and HW)
) -> jax.Array:
    """Fused attention over the frame axis S of [B, S, HW, C] tokens without
    any layout transposes (S <= 32; larger S falls back to the packed kernel
    on a transposed view). k/v may carry extra frame rows (ConsistI2V's
    augmented 3x3 first-frame window appended along the frame axis) — the
    precomputed mask goes rectangular. ``bias`` is a per-head additive score
    bias shared by every pixel row (SEINE's T5 relative-position bias) — it
    folds into the precomputed mask, so it costs nothing per row. Returns
    [B, S, HW, C]."""
    b, s, hw, c = q.shape
    sk = k.shape[1]
    head_dim = c // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))

    # the elementwise-product kernel computes zero wasted scores and wins on
    # the narrow-head big-pixel temporal class (checkpoint-true heads=64 at
    # padded dh=8, hw=4096: measured 1.23x invert / 1.37-1.47x edit vs the
    # strided kernel — PERF.md round 4); parity-or-worse on the other shapes.
    # NOTE: read at TRACE time — under an outer jit the variant is baked into
    # the compiled graph (same semantics as ANYV2V_ATTN_BACKEND); flip it
    # before the first trace, not between calls.
    variant = os.environ.get("ANYV2V_TEMPORAL_VARIANT", "auto")
    if variant != "strided" and s <= 32 and (
            variant == "ew" or (head_dim <= 8 and hw >= 4096)):
        from .pallas_temporal_ew import temporal_ew_attention

        out = temporal_ew_attention(q, k, v, heads=heads, scale=scale,
                                    bias=bias)
        if out is not None:
            return out

    s_pad = _ceil_to(s, 8)
    sk_pad = _ceil_to(sk, 8)
    w = max(8, 128 // s_pad)
    # the strided grid tiles the pixel axis in windows of w; a non-multiple
    # hw (odd latent grids) would leave the last partial tile unwritten —
    # route those shapes through the packed kernel's transposed view instead
    if s_pad > _STRIDED_MAX_SPAD or sk_pad > _STRIDED_MAX_SPAD + 16 \
            or hw % w != 0:
        def t(x):
            return x.transpose(0, 2, 1, 3).reshape(b * hw, x.shape[1], c)

        out = short_attention_bsc(t(q), t(k), t(v), heads=heads, scale=scale,
                                  bias=bias)
        return out.reshape(b, hw, s, c).transpose(0, 2, 1, 3)

    def pad(x, to):
        if to != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, to - x.shape[1]), (0, 0), (0, 0)))
        return x

    mask = jnp.asarray(_strided_mask(s_pad, w, s, sk_pad, sk))[None]
    if bias is not None:
        # rows are (frame, pixel)-ordered: bias term at (r, c) is
        # bias[h, r//w, c//w] — a w x w block expansion of the padded bias
        bp = jnp.pad(bias.astype(jnp.float32),
                     ((0, 0), (0, s_pad - s), (0, sk_pad - sk)))
        expanded = jnp.broadcast_to(
            bp[:, :, None, :, None], (heads, s_pad, w, sk_pad, w)
        ).reshape(heads, s_pad * w, sk_pad * w)
        mask = mask + expanded
    interpret = jax.default_backend() != "tpu"
    out = _strided_call(pad(q, s_pad), pad(k, sk_pad), pad(v, sk_pad), mask,
                        heads=heads, head_dim=head_dim, scale=float(scale),
                        w=w, interpret=interpret)
    return out[:, :s]


def short_attention_bsc(
    q: jax.Array,    # [B, Sq, C]  (C = heads * head_dim)
    k: jax.Array,    # [B, Sk, C]  (Sk == Sq, or Sq < Sk <= 128: augmented keys)
    v: jax.Array,    # [B, Sk, C]
    heads: int,
    scale: float | None = None,
    bias: jax.Array | None = None,   # [heads, Sq, Sk] (shared across B)
) -> jax.Array:
    """Fused attention over short sequences (Sq, Sk <= 128), batched over B
    rows, heads packed in the channel dim. Sk may exceed Sq (per-row extra
    keys — ConsistI2V's augmented temporal attention attends t frames plus
    the first frame's 8-neighborhood, sk = t + 8,
    ref ``videoldm_transformer_blocks.py:490-504``); queries and keys pack
    into proportional row runs and the rectangular block-diagonal mask pairs
    them. ``bias`` is a per-head additive score bias shared by every batch
    row (SEINE's T5 rel-pos bias, ref ``seine/models/attention.py:894-898``):
    it is position-only, so it tiles across the packed diagonal blocks into
    the precomputed mask. Returns [B, Sq, C]."""
    b, sq, c = q.shape
    sk = k.shape[1]
    head_dim = c // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))

    sq_pad = _ceil_to(sq, 8)
    sk_pad = _ceil_to(sk, 8)
    g = max(1, 128 // sq_pad)         # sequences per MXU tile
    tile_q = g * sq_pad               # 128 when sq_pad divides 128
    tile_k = g * sk_pad

    def pack(x, s, s_pad):
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        return x.reshape(b * s_pad, c)

    qf = pack(q, sq, sq_pad)
    kf = pack(k, sk, sk_pad)
    vf = pack(v, sk, sk_pad)

    # tiles per program: a few to amortize grid overhead, bounded so the
    # double-buffered bf16 blocks (q + out at tile_q rows, k + v at tile_k
    # rows) stay well inside VMEM
    n_tiles = 1
    while (n_tiles * 2 * tile_q <= 1024
           and n_tiles * 2 * (tile_q + tile_k) * c <= 1024 * 1024
           and (b % (n_tiles * 2 * g)) == 0):
        n_tiles *= 2
    seqs_block = n_tiles * g
    b_pad = _ceil_to(b, seqs_block)
    if b_pad != b:
        qf = jnp.pad(qf, ((0, (b_pad - b) * sq_pad), (0, 0)))
        kf = jnp.pad(kf, ((0, (b_pad - b) * sk_pad), (0, 0)))
        vf = jnp.pad(vf, ((0, (b_pad - b) * sk_pad), (0, 0)))

    mask = jnp.asarray(_block_diag_mask(sq_pad, sk_pad, g, sk))[None]
    if bias is not None:
        bp = jnp.pad(bias.astype(jnp.float32),
                     ((0, 0), (0, sq_pad - sq), (0, sk_pad - sk)))
        mask = mask + jnp.tile(bp, (1, g, g))  # [heads, tile_q, tile_k]
    interpret = jax.default_backend() != "tpu"
    out = _short_packed(qf, kf, vf, mask, heads=heads, head_dim=head_dim,
                        scale=float(scale), tile_q=tile_q, tile_k=tile_k,
                        n_tiles=n_tiles, interpret=interpret)
    out = out[: b * sq_pad].reshape(b, sq_pad, c)
    return out[:, :sq]
