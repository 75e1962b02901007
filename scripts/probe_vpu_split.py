"""Micro-probe: split the packed-attention kernels into MXU and VPU legs.

For the checkpoint-true shapes the wide-KV and whole-K/V variants measure
within 10% of each other (probe_packed), far above the MXU floor — so the
bottleneck is NOT matmul granularity. This probe times stripped kernels to
attribute the per-score cost:

- ``mxu``: QK + PV matmuls only, softmax replaced by a single cast
- ``mxu+exp``: adds exp2 only
- ``full``: the production softmax (mask, max, exp2, sum, normalize)

Usage: python scripts/probe_vpu_split.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, reps=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    run_s = (time.perf_counter() - t0) / reps
    print(f"  {label:46s} {run_s*1e3:9.2f} ms", flush=True)
    return run_s


def _whole_kernel(q_ref, k_ref, v_ref, o_ref, *, dh, mode):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    block_q = q.shape[0]
    g_heads = 128 // dh
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)

    def head_sel(g):
        lo = g * dh
        return (lane_q >= lo) & (lane_q < lo + dh)

    def body(g, acc):
        qg = jnp.where(head_sel(g), q, jnp.zeros_like(q))
        s = jax.lax.dot_general(
            qg, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mode == "mxu":
            p = (s * 1e-4).astype(v.dtype)
        elif mode == "mxu+exp":
            p = jnp.exp2(s - 20.0).astype(v.dtype)
        elif mode == "mxu+exp+max":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m).astype(v.dtype)
        elif mode == "prod":
            # production _packed_whole_kernel ordering: fp32 p, sum, pv/l
            m = jnp.max(s, axis=-1, keepdims=True)
            p32 = jnp.exp2(s - m)
            l = jnp.sum(p32, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p32.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l
            return jnp.where(head_sel(g), pv, acc)
        elif mode == "bf16sum":
            # cast first (fuses into exp), sum the bf16 p in fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m).astype(v.dtype)
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l
            return jnp.where(head_sel(g), pv, acc)
        else:  # full
            m = jnp.max(s, axis=-1, keepdims=True)
            p32 = jnp.exp2(s - m)
            l = jnp.sum(p32, axis=-1, keepdims=True)
            p = (p32 * (1.0 / l)).astype(v.dtype)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.where(head_sel(g), pv, acc)

    acc = jax.lax.fori_loop(0, g_heads, body,
                            jnp.zeros((block_q, 128), jnp.float32))
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dh", "block_q", "mode"))
def whole(q, k, v, *, dh, block_q, mode):
    b, sq, c = q.shape
    sk = k.shape[1]
    n_win = c // 128
    grid = (b, n_win, sq // block_q)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda b_, w, i: (b_, i, w),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk, 128), lambda b_, w, i: (b_, 0, w),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_whole_kernel, dh=dh, mode=mode),
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
    )(q, k, v)


def mk(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape) * 0.1,
                       jnp.bfloat16)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print("== L0 self b=16 sq=sk=4096 dh=8 (whole variant legs) ==")
    q, k, v = (mk((16, 4096, 512), seed=s) for s in range(3))
    for mode in ("mxu", "prod", "bf16sum"):
        timed(lambda q, k, v, m=mode: whole(q, k, v, dh=8, block_q=256,
                                            mode=m),
              q, k, v, label=f"L0 self {mode}")
    for bq in (128, 512):
        timed(lambda q, k, v, b=bq: whole(q, k, v, dh=8, block_q=b,
                                          mode="bf16sum"),
              q, k, v, label=f"L0 self bf16sum bq={bq}")
    print("== L0 cross b=16 sq=4096 sk=256(pad157) dh=8 ==")
    k2, v2 = mk((16, 256, 512), 1), mk((16, 256, 512), 2)
    for mode in ("mxu", "prod", "bf16sum"):
        for bq in (1024, 2048, 4096):
            timed(lambda q, k, v, m=mode, b=bq: whole(q, k, v, dh=8,
                                                      block_q=b, mode=m),
                  q, k2, v2, label=f"L0 cross {mode} bq={bq}")


if __name__ == "__main__":
    main()
