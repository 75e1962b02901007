"""Pallas TPU fused (3,1,1) temporal convolution over [B, F, P, C] tokens.

The video UNets' temporal conv layers (diffusers ``TemporalConvLayer``,
ConsistI2V's temporal resnets; reference modules built on ``nn.Conv3d`` with
kernel (3,1,1)) convolve ONLY the frame axis — pointwise over pixels. XLA's
``conv_general_dilated`` handles the batch-1 inversion shape well
(~175 TF/s) but collapses to ~70 TF/s at the CFG batch of 3 and drags the
surrounding groupnorms into materialized fp32 broadcast layouts (~55 ms of a
635 ms edit step, measured — PERF.md round 4). A 3-shifted-dot XLA
formulation fixes the layouts but reads x three times and spills fp32
partials (+36 GB/step at batch 1, measured).

This kernel reads x once: a [F, w, C] tile of the [B, F, P, C] token tensor
is zero-extended by one frame on each side in VMEM, the three frame-shifted
views are static sublane slices of the flattened [(F+2)*w, C] tile, and
y = sum_d shift_d(x) @ W[d] + b accumulates in fp32 against VMEM-resident
weights (3*C*C' bf16 <= 9.8 MB at C=1280). Traffic: x + out + weights-once,
all matmuls on the MXU at full contraction depth.

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


def _tconv_kernel(x_ref, w_ref, b_ref, o_ref, *, f: int, w: int,
                  s_ref=None, t_ref=None):
    x = x_ref[0]                                  # [F, w, C]
    c = x.shape[-1]
    c_out = o_ref.shape[-1]
    xf = x.reshape(f * w, c)
    if s_ref is not None:
        # fused groupnorm-apply + silu: h = silu(x*s + t) in fp32, cast to
        # the compute dtype in VMEM — the unfused version materializes this
        # convert through HBM (~16 ms of an edit step, measured).
        # s/t ride along whole ([B, C] is tiny); pick this batch's row.
        b_i = pl.program_id(0)
        sv = s_ref[pl.ds(b_i, 1)]
        tv = t_ref[pl.ds(b_i, 1)]
        h = xf.astype(jnp.float32) * sv + tv
        h = h * (1.0 / (1.0 + jnp.exp(-h)))
        xf = h.astype(o_ref.dtype)
    # zero-extend one frame (w rows) on each side: shifted views become
    # static sublane slices (w is a multiple of 8)
    zpad = jnp.zeros((w, c), xf.dtype)
    xp = jnp.concatenate([zpad, xf, zpad], axis=0)     # [(F+2)*w, C]
    acc = jnp.zeros((f * w, c_out), jnp.float32)
    for d in range(3):
        acc = acc + jax.lax.dot_general(
            xp[d * w:(d + f) * w], w_ref[d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.reshape(f, w, c_out).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("w", "out_dtype", "interpret"))
def _tconv_call(x, wk, b, s, t, *, w, out_dtype, interpret):
    bsz, f, p, c = x.shape
    c_out = wk.shape[-1]
    grid = (bsz, p // w)
    kernel = _tconv_kernel if s is None else (
        lambda x_ref, w_ref, b_ref, s_ref, t_ref, o_ref, **kw:
        _tconv_kernel(x_ref, w_ref, b_ref, o_ref, s_ref=s_ref, t_ref=t_ref,
                      **kw))
    kernel = functools.partial(kernel, f=f, w=w)
    n = bsz * f * p
    in_specs = [
        pl.BlockSpec((1, f, w, c), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c, c_out), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_out), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, wk, b]
    if s is not None:
        st_spec = pl.BlockSpec((bsz, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [st_spec, st_spec]
        operands += [s, t]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, f, p, c_out), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, f, w, c_out), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 3 * c * c_out,
            bytes_accessed=(n * c + n * c_out) * x.dtype.itemsize
            + 3 * c * c_out * wk.dtype.itemsize,
            transcendentals=0 if s is None else n * c,
        ),
    )(*operands)


def _kernel_fits(c: int, c_out: int, f: int, w: int) -> bool:
    """Conservative VMEM estimate for one program: resident weights +
    double-buffered x/out blocks + the zero-extended copy + fp32 accumulator
    (+ the fp32 normalize temporaries on the fused-norm path). Long videos
    at wide channels (F=128, C>=1280) exceed the ~16 MB budget even at the
    minimum pixel window — those shapes fall back to the dots formulation."""
    bytes_needed = (
        3 * c * c_out * 2
        + w * ((f + 2) * c * 2 + 2 * f * c * 2 + 2 * f * c_out * 2
               + f * c_out * 4 + f * c * 4)
    )
    return bytes_needed <= 13 * 1024 * 1024


def _pixel_tile(c: int, c_out: int, f: int, p: int) -> int:
    """Pixel-window size: keep x/out blocks (double-buffered), the
    zero-extended [(F+2)*w, C] copy and the fp32 accumulator inside the VMEM
    budget next to the resident weights; rows a multiple of 8. Prefers a
    divisor of P so the wrapper never pads pixels (a full-tensor copy)."""
    budget = 3 * 1024 * 1024
    per_pixel = (2 * f + (f + 2)) * c * 2 + f * c_out * (4 + 2 * 2)
    w = min(max(8, budget // max(per_pixel, 1) // 8 * 8), 512, _ceil_to(p, 8))
    for cand in range(w, 7, -8):
        if p % cand == 0:
            return cand
    return w


def _run(x, kernel, bias, s, t, out_dtype):
    lead = x.shape
    if x.ndim == 5:
        b, f, h, wdt, c = x.shape
        x = x.reshape(b, f, h * wdt, c)
    b, f, p, c = x.shape
    c_out = kernel.shape[-1]

    w = _pixel_tile(c, c_out, f, p)
    p_pad = _ceil_to(p, w)
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, p_pad - p), (0, 0)))

    interpret = jax.default_backend() != "tpu"
    out = _tconv_call(x, kernel, bias.reshape(1, -1), s, t, w=w,
                      out_dtype=out_dtype, interpret=interpret)
    if p_pad != p:
        out = out[:, :, :p]
    return out.reshape(*lead[:-1], c_out)


def temporal_conv3(
    x: jax.Array,        # [B, F, H, W, C] or [B, F, P, C]
    kernel: jax.Array,   # [3, 1, 1, C, C'] (nn.Conv tree) or [3, C, C']
    bias: jax.Array,     # [C']
) -> jax.Array:
    """(3,1,1) temporal conv: frame-axis kernel 3 with zero padding,
    pointwise over pixels. Returns x's shape with C -> C'."""
    if kernel.ndim == 5:
        kernel = kernel.reshape(3, kernel.shape[-2], kernel.shape[-1])
    return _run(x, kernel, bias, None, None, x.dtype)


def groupnorm_silu_temporal_conv3(
    x: jax.Array,        # [B, F, H, W, C] or [B, F, P, C] (pre-norm)
    gamma: jax.Array,    # [C] groupnorm scale
    beta: jax.Array,     # [C] groupnorm bias
    kernel: jax.Array,   # [3, 1, 1, C, C'] or [3, C, C']
    bias: jax.Array,     # [C']
    groups: int,
    eps: float,
    compute_dtype: jnp.dtype,
    pixel_sharded: bool = False,
) -> jax.Array:
    """groupnorm -> silu -> (3,1,1) temporal conv as ONE kernel pass.

    Group statistics (per batch, per group, fp32) are a cheap XLA reduce over
    x; the apply/silu/cast runs inside the conv kernel's VMEM tile — unfused,
    the fp32->bf16 convert alone materializes the whole tensor through HBM
    (~16 ms of a 635 ms edit step, measured — PERF.md round 4)."""
    if kernel.ndim == 5:
        kernel = kernel.reshape(3, kernel.shape[-2], kernel.shape[-1])
    from ..parallel.mesh import (axis_index, current_manual_axis,
                                 frames_to_pixels, gather_frames,
                                 pixels_to_frames, pmean_axis)

    manual = current_manual_axis()
    b = x.shape[0]
    c = x.shape[-1]
    # split ONLY the channel dim for the group reduce (keeping the frame
    # axis separate keeps the reduce frame-local + a [B, G]-sized combine)
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], groups, c // groups)
    red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = jnp.mean(xf, axis=red)                          # [B, G]
    var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
    if manual is not None and manual[1] > 1:
        # inside the manual-SPMD UNet region x holds only this chip's SHARD
        # (frames if pixel_sharded=False, pixels if True): group statistics
        # are GLOBAL over (F, pixels) -> pmean the per-chip moments (equal
        # shard sizes make the plain mean-of-means exact)
        name = manual[0]
        mean_sq = pmean_axis(jnp.mean(jnp.square(xf), axis=red), name)
        mean = pmean_axis(mean, name)
        var = mean_sq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)                         # [B, G]
    inv_c = jnp.repeat(inv, c // groups, axis=1)           # [B, C]
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    s = inv_c * gamma.astype(jnp.float32)[None, :]
    t = beta.astype(jnp.float32)[None, :] - mean_c * s
    kernel = kernel.astype(compute_dtype)
    bias = bias.astype(compute_dtype)

    def compute(x, kernel, bias, s, t):
        f = x.shape[1]
        p_pix = int(np.prod(x.shape[2:-1]))
        c_out = kernel.shape[-1]
        use_kernel = jax.default_backend() == "tpu" and _kernel_fits(
            c, c_out, f, _pixel_tile(c, c_out, f, p_pix))
        if not use_kernel:
            # CPU mesh/tests, or shapes whose tiles exceed VMEM: same math,
            # unfused
            shape = [1] * (x.ndim - 1) + [c]
            h = (x.astype(jnp.float32) * s.reshape(b, *shape[1:])
                 + t.reshape(b, *shape[1:]))
            h = (h * jax.nn.sigmoid(h)).astype(compute_dtype)
            hp = jnp.pad(h, ((0, 0), (1, 1)) + ((0, 0),) * (x.ndim - 2))
            out = None
            for d in range(3):
                part = jax.lax.dot_general(
                    hp[:, d:d + f], kernel[d],
                    (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
                out = part if out is None else out + part
            return (out + bias).astype(compute_dtype)

        return _run(x, kernel, bias, s, t, jnp.dtype(compute_dtype))

    # Inside the manual-SPMD UNet region the (3,1,1) conv needs all frames:
    # all_to_all to pixel sharding (frames complete, pixels split), run the
    # fused apply/silu/conv locally, all_to_all back. Tiny deep-level grids
    # (pixel count not divisible) gather the short frame axis instead.
    # pixel_sharded=True: the caller (TemporalConvLayer) already hoisted ONE
    # all_to_all around its four convs — x holds all frames locally.
    if manual is not None and manual[1] > 1 and pixel_sharded:
        return compute(x, kernel, bias, s, t)
    if manual is not None and manual[1] > 1:
        name, n = manual
        n_pix = int(np.prod(x.shape[2:-1]))
        if x.ndim == 4 and n_pix % n == 0 and n_pix // n >= 8:
            xp = frames_to_pixels(x, name, 1, 2)
            out = compute(xp, kernel, bias, s, t)
            return pixels_to_frames(out, name, 1, 2)
        xg = gather_frames(x, name, 1)
        out = compute(xg, kernel, bias, s, t)
        f_loc = x.shape[1]
        i = axis_index(name)
        return jax.lax.dynamic_slice_in_dim(out, i * f_loc, f_loc, axis=1)
    return compute(x, kernel, bias, s, t)
