"""On-TPU probe for the head-packed kernels at checkpoint-true shapes.

Measures compile + run of the narrow-head (heads=64, padded dh 8/16/32)
attention paths at the production 16f/512^2 shapes that OOMed (flash with
runtime padding) or hung Mosaic (short kernel) in round 2, and A/Bs against
whatever XLA can run. Not part of the test suite — a development tool whose
results are recorded in PERF.md.

Usage: python scripts/probe_packed.py [scenario ...]
Scenarios: spatial cross temporal widehead all (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from anyv2v_tpu.ops.attention import multi_head_attention, temporal_attention


def timed(fn, *args, reps=5, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    # force readback: axon defers some device errors past block_until_ready
    float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    run_s = (time.perf_counter() - t0) / reps
    print(f"  {label:42s} compile+1 {compile_s:7.2f}s   run {run_s*1e3:9.2f} ms",
          flush=True)
    return run_s


def mk(shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape) * 0.1, dtype)


def _ab_variants(q, k, v, heads, scale, label, variants=("whole", "wide")):
    import os

    for var in variants:
        os.environ["ANYV2V_PACKED_VARIANT"] = var
        f = jax.jit(lambda q, k, v: multi_head_attention(
            q, k, v, heads=heads, scale=scale, backend="pallas_packed"))
        try:
            timed(f, q, k, v, label=f"{label} [{var}]")
        except Exception as e:  # e.g. VMEM OOM on an off-route variant
            print(f"  {label:42s} [{var}] FAILED: {str(e).splitlines()[0][:90]}",
                  flush=True)
    os.environ.pop("ANYV2V_PACKED_VARIANT", None)


def spatial():
    """L0 spatial self-attention, invert (b=16) and edit (b=48)."""
    print("== spatial self-attention heads=64 dh=8 (C_eff=512, sq=4096) ==")
    for b in (16, 48):
        q, k, v = (mk((b, 4096, 512), seed=s) for s in range(3))
        _ab_variants(q, k, v, 64, 5.0 ** -0.5, f"packed b={b}",
                     variants=("whole", "whole_pipe", "whole_pipe_full"))
    # L1: dh 10 -> 16, sq 1024, C_eff 1024
    q, k, v = (mk((16, 1024, 1024), seed=s) for s in range(3))
    _ab_variants(q, k, v, 64, 10.0 ** -0.5, "packed L1 b=16 sq=1024 dh=16")
    q, k, v = (mk((48, 1024, 1024), seed=s) for s in range(3))
    _ab_variants(q, k, v, 64, 10.0 ** -0.5, "packed L1 b=48 sq=1024 dh=16")
    # L2: dh 20 -> 32, sq 256, C_eff 2048
    q, k, v = (mk((48, 256, 2048), seed=s) for s in range(3))
    _ab_variants(q, k, v, 64, 20.0 ** -0.5, "packed L2 b=48 sq=256 dh=32")


def cross():
    print("== cross-attention heads=64 dh=8, sk=157 ==")
    for b in (16, 48):
        q = mk((b, 4096, 512), seed=0)
        k = mk((b, 157, 512), seed=1)
        v = mk((b, 157, 512), seed=2)
        _ab_variants(q, k, v, 64, 5.0 ** -0.5, f"packed cross b={b}")
    # L1 cross: dh 10 -> 16, sq 1024
    q = mk((48, 1024, 1024), seed=0)
    k = mk((48, 157, 1024), seed=1)
    v = mk((48, 157, 1024), seed=2)
    _ab_variants(q, k, v, 64, 10.0 ** -0.5, "packed L1 cross b=48")


def temporal():
    print("== temporal attention heads=64 dh=8, S=16, hw=4096 ==")
    for b in (1, 3):
        q, k, v = (mk((b, 16, 4096, 512), seed=s) for s in range(3))
        f = jax.jit(lambda q, k, v: temporal_attention(
            q, k, v, heads=64, scale=5.0 ** -0.5))
        timed(f, q, k, v, label=f"short/windowed b={b}")
        g = jax.jit(lambda q, k, v: temporal_attention(
            q, k, v, heads=64, scale=5.0 ** -0.5, backend="xla"))
        timed(g, q, k, v, label=f"xla            b={b}")


def widehead():
    """Reference point: the TPU-friendly dh=64 split at the same tensor
    sizes (the r1 bench architecture)."""
    print("== widehead reference: heads=5 dh=64 (C=320), sq=4096 ==")
    q, k, v = (mk((16, 4096, 320), seed=s) for s in range(3))
    f = jax.jit(lambda q, k, v: multi_head_attention(
        q, k, v, heads=5, backend="pallas"))
    timed(f, q, k, v, label="flash b=16")


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scenarios = sys.argv[1:] or ["all"]
    table = {"spatial": spatial, "cross": cross, "temporal": temporal,
             "widehead": widehead}
    for s in scenarios:
        if s == "all":
            for fn in table.values():
                fn()
        else:
            table[s]()


if __name__ == "__main__":
    main()
