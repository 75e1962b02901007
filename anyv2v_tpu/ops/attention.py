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
import jax.numpy as jnp

# Minimum query length for the flash kernel to beat XLA on v5e (measured:
# parity at 256, 1.1-1.6x at 1024-4096; below 256 tile padding dominates).
_PALLAS_MIN_SQ = 512


def default_backend() -> str:
    return os.environ.get("ANYV2V_ATTN_BACKEND", "auto")


def padded_head_dim(d: int) -> int:
    """Storage per-head dim for attention projections.

    The checkpoint-true i2vgen-xl split (heads=64, head_dim=C/64 in {5,10,20}
    — diffusers issue #2011) has sublane-unaligned head dims. Runtime
    zero-padding of activations materializes [B,S,heads,5]-tiled temps whose
    minor dim pads 5->128 lanes in XLA's tiled layout (measured 6.38 GB of
    HLO temps for ONE L0 cross-attention at 512^2 — VERDICT r2); instead the
    padding is folded into the projection WEIGHTS once at param-build /
    conversion time (pad to_q/to_k/to_v output columns and to_out input rows
    per head), so activations are born aligned at zero runtime cost.

    Rule: unaligned dims pad to the next power of two (>= 8), which always
    divides 128 — so G = 128 // padded heads pack exactly into one MXU lane
    window (the kernels' head-packing trick). Aligned dims are unchanged.
    Zero q/k pad columns contribute 0 to every q.k score, zero v pad columns
    produce zero output lanes matched by zero to_out rows, and softmax scale
    comes from the TRUE head dim — the padded math is exact.
    """
    if d % 8 == 0:
        return d
    p = 8
    while p < d:
        p *= 2
    return p


def _window_packable(heads: int, head_dim: int) -> bool:
    """True when G = 128 // head_dim whole heads tile each 128-lane window
    exactly — the shape class the head-packed kernels serve (checkpoint-true
    i2vgen heads=64 at padded head dims 8/16/32; see padded_head_dim)."""
    return (
        head_dim <= 64
        and 128 % head_dim == 0
        and (heads * head_dim) % 128 == 0
        and heads >= 128 // head_dim
    )


def _resolve(backend: Optional[str], sq: int, sk: int, head_dim: int,
             bias: Optional[jax.Array], mask: Optional[jax.Array],
             batch: int = 1, heads: int = 1) -> str:
    if backend is None or backend == "auto":
        backend = default_backend()
    if backend != "auto":
        return backend
    if jax.default_backend() != "tpu" or mask is not None:
        return "xla"
    if (
        (sq == sk or 0 < sk - sq <= 16)
        and sq <= 128
        and sk <= 128
        and (bias is None or _shared_head_bias(bias))
        and head_dim % 8 == 0
        and (head_dim <= 128 or (head_dim <= 256 and heads <= 16))
        and (head_dim == 64 or heads <= 16 or _window_packable(heads, head_dim))
    ):
        # short (self or near-self) attention (temporal layers: seq =
        # n_frames): the packed block-diagonal kernel — XLA materializes
        # fp32 [rows, H, S, S] scores through 5+ HBM round-trips here
        # (~78 ms of a 247 ms UNet forward at 16f 512^2, measured; PERF.md
        # round 3). sk - sq <= 16 admits ConsistI2V's augmented temporal
        # attention (sk = t + 8 first-frame-neighborhood keys,
        # ref videoldm_transformer_blocks.py:490-504) without catching text
        # cross-attention. head_dim <= 256 at heads <= 16 admits VideoLDM's
        # C=1280 temporal split (heads=8, dh=160) through the per-head tail
        # loop. A batch-shared per-head bias (SEINE's T5 rel-pos bias) folds
        # into the kernel's precomputed mask. The heads gate bounds the
        # kernel's per-head unrolled narrow-slice loops: heads=64
        # checkpoint-true splits only enter via whole 128-lane windows
        # (_window_packable); non-packable many-head splits hang Mosaic
        # (measured: b=48 s=64 h=64 d=24 never finishes compiling).
        return "pallas_short"
    if (bias is None and head_dim < 64 and _window_packable(heads, head_dim)
            and sq >= 256 and sk <= 8192 and batch * sq >= 8192):
        # narrow-head long/cross attention (checkpoint-true i2vgen heads=64,
        # padded dh 8/16/32): the head-packed flash kernel keeps heads folded
        # in the channel dim, packs G = 128/dh heads per MXU lane window, and
        # runs online softmax with lane-replicated per-head state — the
        # split-head flash kernel wastes >= 75% of MXU lanes and VMEM here.
        # Row gate 8192 (was 16384): the per-chip shard workload (F_local=2,
        # batch*sq = 8192 at L0) measures packed 7.08 vs flash 7.74 ms (b=1)
        # and 18.94 vs 21.18 (b=3) — probe_flash_layout round 5
        return "pallas_packed"
    if bias is None and sq != sk and sk <= 512:
        from .pallas_cross_attention import cross_kv_is_supported

        if cross_kv_is_supported(sq, sk, head_dim) and batch * sq >= 32768:
            # cross-attention to short text/image context: whole-K/V-in-VMEM
            # kernel — the general flash grid degenerates to tiny programs
            # here (measured 1.3-1.7x vs flash across the UNets' shapes)
            return "pallas_cross"
        if (batch * sq >= 32768 and sq >= _PALLAS_MIN_SQ
                and head_dim % 8 == 0 and head_dim <= 128):
            # narrow-head splits neither windowed kernel serves: flash still
            # avoids XLA's materialized [B,H,Sq,Sk] scores at these row counts
            return "pallas"
        # below the row threshold XLA beats both kernels on short-KV shapes
        return "xla"
    if sq >= _PALLAS_MIN_SQ and head_dim % 8 == 0 and head_dim <= 128:
        # long sequences (spatial attention): flash kernel
        # (wider heads, e.g. VAE mid attn d=512, fail mosaic)
        return "pallas"
    return "xla"


def _shared_head_bias(bias: Optional[jax.Array]) -> bool:
    """True when ``bias`` is a per-head additive bias shared across the batch
    ([1, heads, Sq, Sk] or [heads, Sq, Sk]) — the shape class the packed
    short kernel folds into its precomputed mask (SEINE's T5 rel-pos bias is
    position-only, ``seine/models/attention.py:894-898``)."""
    if bias is None:
        return False
    return (bias.ndim == 4 and bias.shape[0] == 1) or bias.ndim == 3


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads)


def _pad_head_dim(x: jax.Array, heads: int, pad: int) -> jax.Array:
    """Zero-pad each head's feature dim by ``pad`` (folded-channel layout).

    Exact-math trick for the checkpoint-true i2vgen-xl head split (heads=64,
    head_dim = C/64 in {5,10,20} — diffusers issue #2011): zero q/k feature
    padding contributes 0 to every q.k score, zero v padding produces zero
    output columns that the caller slices off, and the softmax scale is
    passed explicitly from the TRUE head_dim — so the padded kernel result
    equals unpadded attention bit-for-bit (up to fp reassociation)."""
    import jax.numpy as jnp

    b, s, d = x.shape
    dh = d // heads
    xh = x.reshape(b, s, heads, dh)
    xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return xh.reshape(b, s, heads * (dh + pad))


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

    Batch rows are independent problems, so inside a manual-SPMD UNet region
    (:func:`anyv2v_tpu.parallel.mesh.manual_axis` — frames sharded, frames
    folded into these rows) the call is already shard-local and needs no
    communication.
    """
    return _mha_impl(query, key, value, heads=heads, bias=bias, mask=mask,
                     scale=scale, backend=backend)


def spatial_attention_ffconcat(
    query: jax.Array,    # [(B*F), Sq, heads*Dh]
    k_self: jax.Array,   # [(B*F), Sk1, heads*Dh]
    v_self: jax.Array,   # [(B*F), Sk1, heads*Dh]
    k_ctx: jax.Array,    # [B, Sk2, heads*Dh] — one context per batch row,
    v_ctx: jax.Array,    #                      shared by its F frames
    frames: int,
    heads: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """ConsistI2V first-frame-concat spatial self-attention
    (``videoldm_transformer_blocks.py:479-504``): every frame attends over
    its own tokens plus frame-0's tokens. The reference (and the previous
    round here) repeats the frame-0 K/V per frame and concats — ~78 MB of
    repeated keys at L0 that then ride a projection, a transpose and the
    kernel's DMA once PER FRAME. The split-KV flash kernel
    (:func:`..ops.pallas_attention.flash_attention_splitkv`) keeps the
    shared context as its own operand, projected/transposed/DMA'd once per
    (batch, head); softmax order-invariance makes it numerically the
    concat attention.

    Off-TPU (CPU mesh, tests) falls back to the materialized concat +
    ``multi_head_attention`` — same math, asserted against the kernel in
    the test suite."""
    bf, sq, d = query.shape
    dh = d // heads
    use_kernel = (
        jax.default_backend() == "tpu"
        and dh % 8 == 0
        and dh <= 128
        and sq >= 256
        and default_backend() == "auto"
    )
    if not use_kernel:
        k = jnp.concatenate(
            [k_self, jnp.repeat(k_ctx, frames, axis=0)], axis=1)
        v = jnp.concatenate(
            [v_self, jnp.repeat(v_ctx, frames, axis=0)], axis=1)
        return multi_head_attention(query, k, v, heads=heads, scale=scale)

    from .pallas_attention import flash_attention_splitkv

    out = flash_attention_splitkv(
        _split_heads(query, heads), _split_heads(k_self, heads),
        _split_heads(v_self, heads), _split_heads(k_ctx, heads),
        _split_heads(v_ctx, heads), frames=frames, scale=scale)
    return out.reshape(bf, sq, d)


def _mha_impl(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    heads: int,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    b, sq, d = query.shape
    head_dim = d // heads
    # sublane-align small head dims by zero-padding (exact — see
    # _pad_head_dim); routing uses the padded dim so the checkpoint-true
    # heads=64 split (head_dim 5/10/20) still reaches the fused kernels
    pad = (-head_dim) % 8
    eff_dh = head_dim + pad
    backend = _resolve(backend, sq, key.shape[1], eff_dh, bias, mask, batch=b,
                       heads=heads)
    short_bias_ok = backend == "pallas_short" and _shared_head_bias(bias)
    if backend in ("pallas_short", "pallas_cross", "pallas_packed") and not (
        (bias is None or short_bias_ok) and mask is None
    ):
        # the cross kernel has no bias/mask operand, and the short kernel
        # only folds batch-shared per-head biases; silently dropping either
        # would be a wrong answer, not a slow one
        raise ValueError(f"backend={backend!r} does not support this bias/mask")
    if pad and backend in ("pallas_short", "pallas_cross", "pallas"):
        scale = head_dim ** -0.5 if scale is None else scale
        query = _pad_head_dim(query, heads, pad)
        key = _pad_head_dim(key, heads, pad)
        value = _pad_head_dim(value, heads, pad)
        # recurse into the impl, NOT the public wrapper — when this runs
        # inside a shard_map body the wrapper would nest another shard_map
        out = _mha_impl(query, key, value, heads=heads, bias=bias,
                        mask=mask, scale=scale, backend=backend)
        return out.reshape(b, sq, heads, eff_dh)[..., :head_dim].reshape(b, sq, d)
    if backend == "pallas_short":
        from .pallas_short_attention import short_attention_bsc

        # heads stay folded in the channel dim: the kernel slices them
        # in-kernel, so the [B,S,H,D]->[B,H,S,D] copies never happen
        kernel_bias = None
        if bias is not None:
            kernel_bias = bias[0] if bias.ndim == 4 else bias  # [H, Sq, Sk]
        return short_attention_bsc(query, key, value, heads=heads, scale=scale,
                                   bias=kernel_bias)
    if backend == "pallas_cross":
        from .pallas_cross_attention import cross_attention_short_kv

        return cross_attention_short_kv(query, key, value, heads=heads,
                                        scale=scale)
    if backend == "pallas_packed":
        from .pallas_packed_flash import packed_flash_attention

        return packed_flash_attention(query, key, value, heads=heads,
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
    pixel_sharded: bool = False,
    bias: Optional[jax.Array] = None,  # [heads, S, Sk], GLOBAL frame axis
) -> jax.Array:
    """Self-attention over the frame axis S of 4D temporal tokens WITHOUT the
    [B,S,HW,C] <-> [B,HW,S,C] transposes the 3D path needs: on TPU the
    strided kernel (:func:`..ops.pallas_short_attention.short_attention_frames`)
    reads the native layout directly; elsewhere (CPU mesh/tests) the
    transpose + XLA path keeps the same math.

    Inside a manual-SPMD UNet region (frames sharded over mesh axis ``name``,
    :func:`anyv2v_tpu.parallel.mesh.manual_axis`) the op resharding is
    explicit: all_to_all frames<->pixels (temporal attention couples frames
    but not pixels), compute with all frames local, all_to_all back —
    per-chip volume ~2/n of the tensor each way vs (n-1)/n for a frame
    all-gather. Deep levels whose pixel count doesn't divide the mesh
    all-gather the (tiny) frame axis instead and keep the local slice."""
    from ..parallel.mesh import (axis_index, current_manual_axis,
                                 frames_to_pixels, gather_frames,
                                 pixels_to_frames)

    ctx = current_manual_axis()
    if ctx is not None:
        name, n = ctx
        if pixel_sharded or n <= 1:
            # caller already holds all frames locally (the TemporalTransformer
            # hoisted one all_to_all to its module boundary)
            return _temporal_attention_impl(query, key, value, heads=heads,
                                            scale=scale, backend=backend,
                                            bias=bias)
        if n > 1:
            hw = query.shape[2]
            if hw % n == 0 and hw // n >= 8:
                q, k, v = (frames_to_pixels(t, name, 1, 2)
                           for t in (query, key, value))
                out = _temporal_attention_impl(q, k, v, heads=heads,
                                               scale=scale, backend=backend,
                                               bias=bias)
                return pixels_to_frames(out, name, 1, 2)
            # tiny deep-level grids: gather the short frame axis, compute the
            # full problem, keep this chip's frame slice
            q, k, v = (gather_frames(t, name, 1)
                       for t in (query, key, value))
            out = _temporal_attention_impl(q, k, v, heads=heads, scale=scale,
                                           backend=backend, bias=bias)
            f_loc = query.shape[1]
            i = axis_index(name)
            return jax.lax.dynamic_slice_in_dim(out, i * f_loc, f_loc, axis=1)
    return _temporal_attention_impl(query, key, value, heads=heads,
                                    scale=scale, backend=backend, bias=bias)


def _temporal_attention_impl(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    heads: int,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    b, s, hw, c = query.shape
    head_dim = c // heads
    if backend is None or backend == "auto":
        backend = default_backend()
    pad_dh = (-head_dim) % 8
    eff_dh = head_dim + pad_dh
    if backend in ("auto", "pallas", "pallas_short") and (
        jax.default_backend() == "tpu"
        # same bound as _resolve: few-head temporal splits, the pairwise
        # d=64 path, or window-packable narrow splits (checkpoint-true
        # heads=64 at padded dh 8/16/32); wide heads (VideoLDM C=1280
        # temporal, d=160) stay on XLA
        and eff_dh <= 128
        and (eff_dh == 64 or heads <= 16 or _window_packable(heads, eff_dh))
    ):
        from .pallas_short_attention import short_attention_frames

        pad = pad_dh
        if pad:
            # exact zero-padding to sublane alignment (see _pad_head_dim)
            import jax.numpy as jnp

            scale = head_dim ** -0.5 if scale is None else scale

            def padh(x):
                xh = x.reshape(*x.shape[:3], heads, head_dim)
                xh = jnp.pad(xh, ((0, 0),) * 4 + ((0, pad),))
                return xh.reshape(*x.shape[:3], heads * (head_dim + pad))

            out = short_attention_frames(padh(query), padh(key), padh(value),
                                         heads=heads, scale=scale, bias=bias)
            return out.reshape(b, s, hw, heads, head_dim + pad)[
                ..., :head_dim].reshape(b, s, hw, c)
        return short_attention_frames(query, key, value, heads=heads,
                                      scale=scale, bias=bias)

    def t(x):
        return x.transpose(0, 2, 1, 3).reshape(b * hw, x.shape[1], heads,
                                               head_dim)

    out = jax.nn.dot_product_attention(
        t(query), t(key), t(value), scale=scale,
        bias=None if bias is None else bias[None], implementation="xla")
    return out.reshape(b, hw, s, c).transpose(0, 2, 1, 3)
