"""Capture an XProf trace of single UNet steps and print the HLO-op time
breakdown (top rows of the hlo_stats tool). Analysis companion to
scripts/perf_probe.py; findings land in PERF.md.

Usage: python scripts/perf_trace.py [b1|b3] [n_frames]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from anyv2v_tpu.models.unet_i2vgen import PnPFlags
from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "b1"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    b = 3 if mode == "b3" else 1

    pipe = build_i2vgen_pipeline(
        arch="i2vgen-xl", init="random", dtype=jnp.bfloat16,
        sample_hw=(512, 512), num_frames=n_frames,
        param_dtype=jnp.bfloat16, components=("unet",),
    )
    unet, params = pipe.unet, pipe.params
    D = unet.config.cross_attention_dim
    rng = np.random.RandomState(0)
    args = dict(
        sample=jnp.asarray(rng.randn(b, n_frames, 64, 64, 4), jnp.float32),
        timestep=jnp.int32(981),
        encoder_hidden_states=jnp.asarray(rng.randn(b, 77, D) * 0.02, jnp.float32),
        fps=jnp.int32(8),
        image_latents=jnp.asarray(rng.randn(b, n_frames, 64, 64, 4), jnp.float32),
        image_embeddings=jnp.asarray(rng.randn(b, 1, D) * 0.02, jnp.float32),
    )

    if b == 3:
        def fwd(params, a):
            t = a["timestep"]
            return unet.apply(params["unet"], **a,
                              pnp=PnPFlags(conv=t > 800, spatial=t > 800,
                                           temporal=t > 500))
    else:
        def fwd(params, a):
            return unet.apply(params["unet"], **a)

    trace_dir = f"/tmp/xprof_probe_{mode}_{n_frames}"
    if not glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True):
        f = jax.jit(fwd)
        jax.block_until_ready(f(params, args))  # compile outside the trace
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = f(params, args)
            jax.block_until_ready(out)

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    with open(os.path.join(trace_dir, "hlo_stats.json"), "w") as fh:
        fh.write(data)
    rows = json.loads(data)
    print("type:", type(rows), "keys/len:",
          list(rows)[:10] if isinstance(rows, dict) else len(rows))
    print("saved to", os.path.join(trace_dir, "hlo_stats.json"))


if __name__ == "__main__":
    main()
