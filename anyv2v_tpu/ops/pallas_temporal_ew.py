"""Elementwise-product temporal attention: zero packing inflation.

Temporal attention in the video UNets attends a tiny frame axis (S = 16)
independently per pixel (ref ``i2vgen-xl/models/unet_3d_blocks.py`` temporal
transformers; ``consisti2v/models/videoldm_transformer_blocks.py:479-504``;
``seine/models/attention.py:894-898``). Both existing kernels pay structural
MXU waste on this shape class at narrow head dims:

- the packed/strided kernels compute scores as [128, 128] lane-window
  matmuls: at the checkpoint-true heads=64/dh=8 split that is a 16x lane
  waste (8 useful lanes of the 128-lane contraction) TIMES an 8x packing
  inflation (w pixels packed per tile attend each other's rows and are
  masked off) — the measured strided L0 call (S=16, hw=4096, C_packed=512)
  sits ~27x above its HBM bandwidth floor, pure MXU overwork.

This kernel restates the math so NO wasted score is ever computed. For each
frame pair (i, j) the per-pixel, per-head score is

    s[h, p] = scale * sum_d q[i, p, h, d] * k[j, p, h, d]

i.e. an elementwise product over the packed channel axis followed by a
per-head lane-group sum. The product is one VPU op on the module-native
[hw_t, C] tile; the group sum is a tiny matmul against a constant [C, heads]
indicator (scale and log2(e) folded in), so the MXU emits exactly
hw_t * heads useful outputs — the structural minimum. Softmax runs over the
S_k score tiles held as live values (S <= 32), and the PV pass broadcasts
the normalized [hw_t, heads] probabilities back to head lanes with the
transposed indicator and multiply-accumulates against v[j] in place.

Cost at the L0 i2vgen shape (b=1, S=16, hw=4096, heads=64, dh=8): ~1.1e9
VPU flops + ~7e7 MXU outputs + 6.7e7 exps ~= 0.3-0.6 ms vs the strided
kernel's measured 9.2 ms — the kernel is bandwidth/VPU-bound instead of
mask-inflated-MXU-bound. Frames are attended exactly (the j loop runs the
TRUE S_k — no frame padding, no mask tensor at all); rectangular S_k > S
(ConsistI2V's augmented first-frame keys) and a per-head [S, S_k] additive
bias (SEINE's T5 relative-position bias) are supported directly.

Numerics note: the q*k elementwise product is materialized in the input
dtype (bf16 in production) before the fp32 indicator contraction, so every
product is rounded to bf16 once — strictly worse score precision than the
packed/strided kernels, whose MXU matmuls accumulate exact bf16-operand
products in fp32. Measured well inside the model-level 0.35*std TPU gate
(the all-fp32 product variant spent ~60% of its VPU time on cast tile-ops
and was rejected); if the gate ever tightens, revisit this first.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = math.log2(math.e)

# VMEM budget for one k (or v) block [S_k, hw_t, C] bf16; k+v double-buffered
# plus q/o and the fp32 score tiles must sit inside ~16 MB.
_KV_BLOCK_BYTES = 2 * 1024 * 1024


def _precision(interpret):
    return None if interpret else jax.lax.Precision.DEFAULT


def _ew_kernel(q_ref, k_ref, v_ref, e1_ref, e2_ref, *rest, sk: int,
               interpret: bool):
    """One program = one query frame i over one pixel tile.

    q_ref [1, 1, hw_t, C]; k_ref/v_ref [1, S_k, hw_t, C] (revisited — the
    grid's minor axis is i, and their index map is constant in i, so the
    blocks stay VMEM-resident across the S query frames); e1 [C, heads] in
    q.dtype (0/1 per-head lane indicator; scale*log2e is folded into q by
    the wrapper); e2 [heads, C] in q.dtype (lane expansion); optional bias
    block [1, S_k, heads] fp32 (exp2 domain).
    """
    bias_ref, o_ref = (rest if len(rest) == 2 else (None, rest[0]))
    prec = _precision(interpret)
    # scale*log2e is folded into q ONCE (same trick as the packed kernels);
    # products stay bf16 into the MXU's fp32 accumulation — the all-fp32
    # variant spent ~60% of its VPU time on explicit cast tile-ops.
    q = q_ref[0, 0]  # [hw_t, C] bf16, pre-scaled by the caller
    e1 = e1_ref[...]
    scores = []
    for j in range(sk):
        s = jax.lax.dot_general(
            q * k_ref[0, j], e1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if bias_ref is not None:
            s = s + bias_ref[0, j]
        scores.append(s)  # [hw_t, heads] fp32, exp2 domain
    m = scores[0]
    for s in scores[1:]:
        m = jnp.maximum(m, s)
    ps = [jnp.exp2(s - m) for s in scores]
    l = ps[0]
    for p in ps[1:]:
        l = l + p
    inv = 1.0 / l
    e2 = e2_ref[...]
    acc = None
    for j in range(sk):
        pj = (ps[j] * inv).astype(v_ref.dtype)
        pe = jax.lax.dot_general(  # broadcast head prob to its lanes
            pj, e2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        term = pe * v_ref[0, j]
        acc = term if acc is None else acc + term
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _pick_hw_tile(hw: int, sk: int, c: int) -> int | None:
    """Largest power-of-two pixel tile whose [S_k, hw_t, C] bf16 k-block fits
    the VMEM budget; None if even 8 rows don't fit or don't divide hw."""
    cap = _KV_BLOCK_BYTES // (sk * c * 2)
    hw_t = 8
    if cap < 8 or hw % 8 != 0:
        return None
    while hw_t * 2 <= cap and hw % (hw_t * 2) == 0:
        hw_t *= 2
    return hw_t


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "hw_t", "interpret", "has_bias"))
def _ew_call(q, k, v, e1, e2, bias, *, heads, scale, hw_t, interpret,
             has_bias):
    b, s, hw, c = q.shape
    sk = k.shape[1]
    grid = (b, hw // hw_t, s)
    q_spec = pl.BlockSpec((1, 1, hw_t, c), lambda ib, jw, i: (ib, i, jw, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk, hw_t, c), lambda ib, jw, i: (ib, 0, jw, 0),
                           memory_space=pltpu.VMEM)
    e1_spec = pl.BlockSpec(e1.shape, lambda ib, jw, i: (0, 0),
                           memory_space=pltpu.VMEM)
    e2_spec = pl.BlockSpec(e2.shape, lambda ib, jw, i: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [q_spec, kv_spec, kv_spec, e1_spec, e2_spec]
    args = [q, k, v, e1, e2]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, sk, heads), lambda ib, jw, i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(bias)
    kernel = functools.partial(_ew_kernel, sk=sk, interpret=interpret)
    n = b * s * hw
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, hw, c), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=q_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * sk * c * 2 * 2 + n * sk * heads * 2 * 2,
            bytes_accessed=(2 * n + 2 * b * sk * hw) * c * q.dtype.itemsize,
            transcendentals=n * sk * heads,
        ),
    )(*args)


def temporal_ew_attention(
    q: jax.Array,    # [B, S, HW, C]  (module-native temporal token layout)
    k: jax.Array,    # [B, Sk, HW, C] (Sk == S, or augmented first-frame keys)
    v: jax.Array,    # [B, Sk, HW, C]
    heads: int,
    scale: float | None = None,
    bias: jax.Array | None = None,   # [heads, S, Sk] (shared across B and HW)
) -> jax.Array:
    """Frame-axis attention on [B, S, HW, C] tokens with zero score waste;
    returns None-shape-compatible [B, S, HW, C]. Returns None (caller falls
    back) when no power-of-two pixel tile fits the VMEM budget or S > 32
    (unrolled loop bound — long video uses the packed kernel)."""
    b, s, hw, c = q.shape
    sk = k.shape[1]
    head_dim = c // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))
    if s > 32 or sk > 48:
        return None
    hw_t = _pick_hw_tile(hw, sk, c)
    if hw_t is None:
        return None
    lanes = np.arange(c)
    ind = (lanes[None, :] // head_dim == np.arange(heads)[:, None])
    e1 = jnp.asarray(ind.T, q.dtype)
    e2 = jnp.asarray(ind, q.dtype)
    # scale*log2e folds into q once (fp32 mul, one re-rounding — the same
    # fold every packed kernel applies); e1 stays a pure 0/1 indicator
    q = (q.astype(jnp.float32) * (float(scale) * _LOG2E)).astype(q.dtype)
    has_bias = bias is not None
    if has_bias:
        # kernel scores live in the exp2 domain -> fold log2e; layout
        # [S, Sk, heads] so each program's block slices its query frame
        bias = jnp.transpose(bias.astype(jnp.float32) * _LOG2E, (1, 2, 0))
    else:
        bias = jnp.zeros((1,), jnp.float32)  # unused placeholder
    interpret = jax.default_backend() != "tpu"
    return _ew_call(q, k, v, e1, e2, bias, heads=heads, scale=float(scale),
                    hw_t=hw_t, interpret=interpret, has_bias=has_bias)
