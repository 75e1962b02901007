"""Per-chip shard workloads for ConsistI2V and SEINE (round 5).

Completes the v5e-8 story for the sibling backbones: like
``bench_shard_workload.py`` (i2vgen), runs each UNet forward at EXACTLY
one chip's local workload inside its manual-SPMD region
(``mock_manual_axis`` replaces every collective with a shape-equivalent
local op — same kernels, same grids; ICI is modeled separately from the
audited HLO volumes, PERF.md multi-chip table):

- ConsistI2V: 16 REAL (denoised) frames shard over 8 chips (F_local=2);
  the conditioning frame rides replicated (the 16f mesh deployment shape —
  the single-chip 16-INPUT-frame protocol has 15 video frames, which does
  not divide 8; the per-step costs differ by ~1/16, noted in the output).
- SEINE: 16 frames, 9-channel sample, F_local=2.

Projection per backbone: 500 x (shard_fwd + ICI) + 50 x (edit_shard_fwd +
ICI) + 1 s VAE/host — the non-UNet per-step overhead is NOT added (it is
not separable from BENCH_BACKBONES' 15-video-frame step times; its i2vgen
analogue measured 8.3 ms/step, so treat totals as ~4 s optimistic).

Usage: python scripts/bench_shard_backbones.py [--chips 8] [--iters 12]
Writes stdout JSON (tpu_session phase shard_bb -> SHARD_BACKBONES.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[shard-bb +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--iters", type=int, default=12)
    # modeled ICI legs (audited HLO volume at 2x45 GB/s ring, PERF.md):
    ap.add_argument("--ici-c2v-ms", type=float, default=4.6)
    ap.add_argument("--ici-seine-ms", type=float, default=1.8)
    args = ap.parse_args()

    import jax

    if os.environ.get("ANYV2V_FORCE_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        from anyv2v_tpu.utils.compile_cache import enable as _enable
        _enable()

    import jax.numpy as jnp

    from anyv2v_tpu.parallel.mesh import mock_manual_axis
    from anyv2v_tpu.utils.benchguard import hard_sync

    n, F = args.chips, args.frames
    f_loc = F // n
    assert F % n == 0
    rng = np.random.RandomState(0)

    def bench(fn, *xs):
        out = fn(*xs)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        hard_sync(out)
        return (time.perf_counter() - t0) / args.iters

    results = {}

    # --- ConsistI2V -------------------------------------------------------
    from anyv2v_tpu.utils.model_zoo import build_consisti2v_pipeline

    pipe = build_consisti2v_pipeline(arch="consisti2v", init="random",
                                     dtype=jnp.bfloat16)
    _log("consisti2v pipeline built")
    D = pipe.unet.config.cross_attention_dim
    params = pipe.params

    def c2v_inputs(b, f):
        return (
            jnp.asarray(rng.randn(b, f, 64, 64, 4).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(b, 77, D).astype(np.float32) * 0.02),
            jnp.asarray(rng.randn(b, 1, 64, 64, 4).astype(np.float32) * 0.2),
        )

    def c2v_fwd(mock):
        def fwd(params, sample, text, ffl):
            def call():
                return pipe.unet.apply(
                    params["unet"], sample=sample, timestep=jnp.int32(500),
                    encoder_hidden_states=text, first_frame_latents=ffl,
                    frame_stride=jnp.int32(3))
            if mock:
                with mock_manual_axis("frame", n):
                    return call()
            return call()
        return jax.jit(fwd)

    row = {}
    for label, b, mock, f in (("invert_shard", 1, True, f_loc),
                              ("invert_full", 1, False, F),
                              ("edit_shard", 3, True, f_loc),
                              ("edit_full", 3, False, F)):
        _log(f"consisti2v {label} (b={b}, f={f}, mock={mock})")
        row[label] = bench(c2v_fwd(mock), params, *c2v_inputs(b, f))
        _log(f"consisti2v {label}: {row[label] * 1e3:.1f} ms/forward")
    ici = args.ici_c2v_ms / 1e3
    proj = 500 * (row["invert_shard"] + ici) + 50 * (row["edit_shard"]
                                                     + 3 * ici) + 1.0
    results["consisti2v"] = {
        "forward_ms": {k: round(v * 1e3, 1) for k, v in row.items()},
        "scaling": {
            "invert_shard_over_full": round(
                row["invert_shard"] / row["invert_full"], 4),
            "edit_shard_over_full": round(
                row["edit_shard"] / row["edit_full"], 4),
            "ideal": round(1 / n, 4)},
        "modeled_ici_ms": args.ici_c2v_ms,
        "v5e8_total_s": round(proj, 2),
    }
    del pipe, params
    import gc
    gc.collect()

    # --- SEINE ------------------------------------------------------------
    from anyv2v_tpu.utils.model_zoo import build_seine_pipeline

    pipe = build_seine_pipeline(arch="seine", init="random",
                                dtype=jnp.bfloat16)
    _log("seine pipeline built")
    D = pipe.unet.config.cross_attention_dim
    params = pipe.params

    def seine_inputs(b, f):
        return (
            jnp.asarray(rng.randn(b, f, 64, 64, 9).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(b, 120, D).astype(np.float32) * 0.02),
        )

    def seine_fwd(mock):
        def fwd(params, sample, text):
            def call():
                return pipe.unet.apply(
                    params["unet"], sample=sample, timestep=jnp.int32(500),
                    encoder_hidden_states=text)
            if mock:
                with mock_manual_axis("frame", n):
                    return call()
            return call()
        return jax.jit(fwd)

    row = {}
    for label, b, mock, f in (("invert_shard", 1, True, f_loc),
                              ("invert_full", 1, False, F),
                              ("edit_shard", 3, True, f_loc),
                              ("edit_full", 3, False, F)):
        _log(f"seine {label} (b={b}, f={f}, mock={mock})")
        row[label] = bench(seine_fwd(mock), params, *seine_inputs(b, f))
        _log(f"seine {label}: {row[label] * 1e3:.1f} ms/forward")
    ici = args.ici_seine_ms / 1e3
    proj = 500 * (row["invert_shard"] + ici) + 50 * (row["edit_shard"]
                                                     + 3 * ici) + 1.0
    results["seine"] = {
        "forward_ms": {k: round(v * 1e3, 1) for k, v in row.items()},
        "scaling": {
            "invert_shard_over_full": round(
                row["invert_shard"] / row["invert_full"], 4),
            "edit_shard_over_full": round(
                row["edit_shard"] / row["edit_full"], 4),
            "ideal": round(1 / n, 4)},
        "modeled_ici_ms": args.ici_seine_ms,
        "v5e8_total_s": round(proj, 2),
    }

    print(json.dumps({
        "metric": f"v5e-{n} per-chip shard workloads, {F}f 512^2 "
                  "ConsistI2V + SEINE (F_local="
                  f"{f_loc}), measured on 1 real chip via mock_manual_axis",
        **results,
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main()
