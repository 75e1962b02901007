"""Fused transformer feed-forward (GEGLU / GELU) for TPU.

Every transformer block in the three UNets ends with a mult-4 feed-forward
(diffusers ``FeedForward``; reference usage e.g.
``consisti2v/consisti2v/models/videoldm_transformer_blocks.py`` and
``seine/models/attention.py`` via diffusers). As two separate matmuls XLA
materializes the ``[N, 2*4C]`` gate intermediate through HBM: measured on a
16f 512^2 i2vgen-xl UNet step (PERF.md round 4), the proj_in/proj_out pair
costs ~45 ms/step and the proj_out read runs HBM-bound at ~270 GiB/s attained
(the [16,4096,2560] intermediate is 336 MB at the C=320 level alone).

This kernel keeps the gate intermediate in VMEM: weights are small enough to
stay resident (W1+W2 at C=320: 2.4 MB; C=640: 9.8 MB — under the ~16 MB VMEM
budget), so one grid sweep streams row tiles through

    v = x @ W1[:, :I] + b1[:I]
    g = x @ W1[:, I:] + b1[I:]
    o = (v * gelu(g)).astype(bf16) @ W2 + b2

with fp32 MXU accumulation and the product cast to the model dtype between
the two matmuls (bit-comparable with the unfused path, which stores the
intermediate in the module dtype). HBM traffic drops from
``2*x + 2*intermediate`` to ``x + out + weights-once``.

At C >= 1280 the weights no longer fit (W1 alone is 26 MB) and N is small
(<= 4096 rows at 16 frames), so the dispatcher leaves those levels to XLA —
the intermediate there is only ~42 MB.

Exact (erf) gelu, matching torch ``F.gelu`` / the unfused module.
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


def _gelu_exact(x: jax.Array) -> jax.Array:
    """Erf-grade gelu without erf: Mosaic has no erf lowering, and the
    branch-free A&S rational form costs ~17% of the whole kernel on the VPU
    (measured). Instead Phi(x) = sigmoid(q(x)) with q an odd degree-9
    least-squares fit on [-6, 6]: max |gelu - gelu_exact| = 6.5e-6 — ~60x
    below the bf16 quantization the gate intermediate undergoes — at ~2 VPU
    ops over the classic (3.8e-4-error) logistic approximation. Saturation
    is exact for |x| -> inf (odd leading term, fp32 exp under/overflow)."""
    c1, c3 = np.float32(1.59574226), np.float32(7.27759356e-2)
    c5, c7 = np.float32(-1.69720225e-4), np.float32(-7.46862465e-5)
    c9 = np.float32(2.93341302e-6)
    s = x * x
    q = x * (c1 + s * (c3 + s * (c5 + s * (c7 + s * c9))))
    return x / (1.0 + jnp.exp(-q))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                inner: int, geglu: bool):
    x = x_ref[...]                                   # [Tr, C], model dtype
    w1 = w1_ref[...]                                 # [C, 2I] or [C, I]
    b1 = b1_ref[...]                                 # [1, 2I] or [1, I]
    v = jax.lax.dot_general(
        x, w1[:, :inner], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + b1[:, :inner].astype(jnp.float32)
    if geglu:
        g = jax.lax.dot_general(
            x, w1[:, inner:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + b1[:, inner:].astype(jnp.float32)
        h = v * _gelu_exact(g)
    else:
        h = _gelu_exact(v)
    # the unfused path stores the intermediate in the module dtype — match it
    h = h.astype(x.dtype)
    o = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("inner", "geglu", "row_tile",
                                             "interpret"))
def _ffn_call(x, w1, b1, w2, b2, *, inner, geglu, row_tile, interpret):
    n, c = x.shape
    p = w1.shape[1]
    grid = (n // row_tile,)
    kernel = functools.partial(_ffn_kernel, inner=inner, geglu=geglu)
    flops = 2 * n * c * p + 2 * n * inner * c
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * n * c * x.dtype.itemsize
                            + (c * p + inner * c) * w1.dtype.itemsize),
            transcendentals=n * inner,
        ),
    )(x, w1, b1, w2, b2)


# Row tile by channel width, sized so x/out tiles + resident weights + the
# fp32 [Tr, I] gate temporaries stay inside the ~16 MB VMEM budget.
def _row_tile(c: int) -> int:
    return 512 if c <= 384 else 256


# Resident-weight VMEM envelope: the measured-working ceiling is c=768 at
# mult 4 in bf16 (w1 + w2 = 3*mult*c^2 * 2 bytes = 14.2 MB inside the 16 MB
# scoped budget alongside the row tiles). Wider dtypes shrink the feasible c.
_FFN_WEIGHT_BYTES_MAX = 3 * 4 * 768 * 768 * 2


def ffn_is_fused(n_rows: int, c: int, mult: int = 4, itemsize: int = 2) -> bool:
    """True when the fused kernel handles (and wins on) this shape: weights
    resident in VMEM (itemsize-aware — a float32 model dtype halves the
    feasible width) and enough rows that streaming them beats XLA's two
    near-peak matmuls (the intermediate round-trip only dominates once
    N >> C)."""
    return (
        jax.default_backend() == "tpu"
        and 3 * mult * c * c * itemsize <= _FFN_WEIGHT_BYTES_MAX
        and (c * mult) % 128 == 0
        and n_rows >= 8 * c
    )


def fused_ffn(
    x: jax.Array,        # [..., C]
    w1: jax.Array,       # [C, 2*mult*C] (geglu) or [C, mult*C] (gelu)
    b1: jax.Array,       # [2*mult*C] or [mult*C]
    w2: jax.Array,       # [mult*C, C]
    b2: jax.Array,       # [C]
    activation: str = "geglu",
) -> jax.Array:
    """Fused feed-forward over the trailing axis; leading axes are flattened
    to rows. Caller is responsible for checking :func:`ffn_is_fused`."""
    geglu = activation == "geglu"
    *lead, c = x.shape
    inner = w2.shape[0]
    n = int(np.prod(lead))
    xr = x.reshape(n, c)

    # rows are independent problems: inside the manual-SPMD UNet region
    # (frames sharded, folded into these rows) the call is already
    # shard-local and needs no communication
    tr = _row_tile(c)
    n_pad = _ceil_to(n, tr)
    if n_pad != n:
        xr = jnp.pad(xr, ((0, n_pad - n), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = _ffn_call(
        xr, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
        inner=inner, geglu=geglu, row_tile=tr, interpret=interpret,
    )
    if n_pad != n:
        out = out[:n]
    return out.reshape(*lead, c)
