"""XProf HLO-op breakdown of single SEINE UNet steps (VERDICT r4 item 4:
SEINE's 83.8 s invert leg has no published anatomy — name the top term).
Companion to scripts/perf_trace.py / perf_trace_consisti2v.py; findings
land in PERF.md.

Usage: python scripts/perf_trace_seine.py [b1|b3] [n_frames]
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from anyv2v_tpu.utils.model_zoo import build_seine_pipeline


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "b1"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    b = 3 if mode == "b3" else 1

    pipe = build_seine_pipeline(arch="seine", init="random",
                                dtype=jnp.bfloat16)
    unet, params = pipe.unet, pipe.params
    D = unet.config.cross_attention_dim
    rng = np.random.RandomState(0)
    # 9-channel input: latents (4) + mask (1) + masked video (4)
    # (reference run_pnp_edit.py mask_generation_before + concat)
    args = dict(
        sample=jnp.asarray(rng.randn(b, n_frames, 64, 64, 9), jnp.float32),
        timestep=jnp.int32(981),
        encoder_hidden_states=jnp.asarray(rng.randn(b, 77, D) * 0.02,
                                          jnp.float32),
    )

    def fwd(p, a):
        return unet.apply(p["unet"], **a)

    trace_dir = f"/tmp/xprof_seine_{mode}_{n_frames}"
    if not glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True):
        f = jax.jit(fwd)
        jax.block_until_ready(f(params, args))
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
    d = json.loads(data)
    rows = d["rows"]

    def cells(r):
        return [c.get("v") if isinstance(c, dict) else c for c in r["c"]]

    tot = 0.0
    cat = collections.Counter()
    byname = collections.Counter()
    occ = collections.Counter()
    for r in rows:
        c = cells(r)
        category, name, n, selft = c[2], c[3], int(c[6]), float(c[9])
        tot += selft
        cat[category] += selft
        key = re.sub(r"[.\d]+$", "", name)
        byname[(category, key)] += selft
        occ[(category, key)] += n
    print(f"total self us (3 steps): {tot:.0f} -> per step"
          f" {tot/3/1000:.2f} ms")
    print("\n== by category (per-step ms) ==")
    for k, v in cat.most_common(12):
        print(f"  {k:40s} {v/3/1000:8.2f}")
    print("\n== top ops (per-step ms) ==")
    for k, v in byname.most_common(24):
        print(f"  {k[0][:22]:22s} {k[1][:52]:52s} {v/3/1000:8.2f}  x{occ[k]}")


if __name__ == "__main__":
    main()
