"""Perf probe: per-step cost analysis of the headline UNet on the real chip.

Prints compiled FLOPs / bytes-accessed (XLA cost analysis) and measured
per-step wall-clock for:
  - inversion step (batch 1, no PnP)
  - PnP edit step (batch 3, injection flags traced)

plus optional sub-experiments gated by env vars. Analysis tool, not a bench:
numbers here guide kernel work (PERF.md); BENCH_*.json stays bench.py's job.

Usage:  python scripts/perf_probe.py [n_frames]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from anyv2v_tpu.models.unet_i2vgen import PnPFlags
from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline


def timed(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("flops", 0) / 1e12, c.get("bytes accessed", 0) / 1e9


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    pipe = build_i2vgen_pipeline(
        arch="i2vgen-xl", init="random", dtype=jnp.bfloat16,
        sample_hw=(512, 512), num_frames=n_frames,
        param_dtype=jnp.bfloat16, components=("unet",),
    )
    unet, params = pipe.unet, pipe.params
    D = unet.config.cross_attention_dim
    rng = np.random.RandomState(0)

    def mk(b):
        return dict(
            sample=jnp.asarray(rng.randn(b, n_frames, 64, 64, 4), jnp.float32),
            timestep=jnp.int32(981),
            encoder_hidden_states=jnp.asarray(rng.randn(b, 77, D) * 0.02, jnp.float32),
            fps=jnp.int32(8),
            image_latents=jnp.asarray(rng.randn(b, n_frames, 64, 64, 4), jnp.float32),
            image_embeddings=jnp.asarray(rng.randn(b, 1, D) * 0.02, jnp.float32),
        )

    a1, a3 = mk(1), mk(3)

    def fwd1(params, a):
        return unet.apply(params["unet"], **a)

    def fwd3(params, a):
        t = a["timestep"]
        return unet.apply(params["unet"], **a,
                          pnp=PnPFlags(conv=t > 800, spatial=t > 800, temporal=t > 500))

    tf1, gb1 = cost(fwd1, params, a1)
    t1 = timed(jax.jit(fwd1), params, a1)
    print(f"invert step (b=1): {tf1:.2f} TFLOP, {gb1:.1f} GB, {t1*1e3:.1f} ms "
          f"-> {tf1/t1:.0f} TF/s, {gb1/t1:.0f} GB/s", flush=True)

    tf3, gb3 = cost(fwd3, params, a3)
    t3 = timed(jax.jit(fwd3), params, a3)
    print(f"edit step  (b=3): {tf3:.2f} TFLOP, {gb3:.1f} GB, {t3*1e3:.1f} ms "
          f"-> {tf3/t3:.0f} TF/s, {gb3/t3:.0f} GB/s", flush=True)
    print(f"edit/invert ratio: {t3/t1:.2f} (FLOP ratio {tf3/tf1:.2f}, "
          f"byte ratio {gb3/gb1:.2f})", flush=True)


if __name__ == "__main__":
    main()
