"""Measure the v5e-8 projection's COMPUTE leg on the one real chip.

VERDICT r4 item 1: the ~41 s v5e-8 projection modeled its compute leg as
"measured single-chip step / 8" — untested at per-chip shapes, where the
kernel grids lose 8x of their batch/frame rows while per-dispatch overhead
does not shrink. This script runs the UNet forward at EXACTLY what each of
8 chips holds inside the manual-SPMD region (`parallel.mesh.manual_axis`):

- ``sample``: F_local = F/8 frames (2 for the headline 16f workload),
- ``image_latents``: replicated, all F frames (the step-invariant
  conditioning path — identical on every chip),
- every collective replaced by a shape-equivalent LOCAL op
  (``parallel.mesh.mock_manual_axis``): all_to_all -> split+concat,
  all_gather -> tile, pmean -> identity. Same kernels, same grids, same
  local HBM traffic; ICI is modeled separately (audited HLO volume at ring
  bandwidth, PERF.md multi-chip section).

It also measures the UNSHARDED forward on the same harness so the ratio
(shard_forward / full_forward) is an apples-to-apples scaling factor, and
re-derives the v5e-8 invert/edit projection from MEASURED per-shard numbers:

    v5e-8 step ~= shard_forward + ICI_modeled + (full_step - full_forward)

(the last term = scheduler/CFG/dispatch overhead outside the UNet region,
conservatively kept whole). Prints one JSON object.

Usage:  python scripts/bench_shard_workload.py [--chips 8] [--frames 16]
        [--iters 12] [--full-step-invert 0.470] [--full-step-edit 1.196]

Reference for the workload being projected:
/root/reference/i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:1385-1433.
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
    print(f"[shard-bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--hw", type=int, default=512,
                    help="pixel size (512 = headline; small for CPU smoke)")
    # whole-step wall times from the round-4 FULL run (BENCH_FULL.json:
    # 235.0 s / 500 invert, 59.8 s / 50 edit) — used only for the
    # scheduler-overhead term and the reference ratio.
    ap.add_argument("--full-step-invert", type=float, default=0.470)
    ap.add_argument("--full-step-edit", type=float, default=1.196)
    # modeled ICI legs from the audited HLO collective volume (PERF.md):
    # 0.40 GB/forward bf16 at 2x45 GB/s ring, edit = 3 CFG rows.
    ap.add_argument("--ici-invert-ms", type=float, default=3.9)
    ap.add_argument("--ici-edit-ms", type=float, default=11.7)
    args = ap.parse_args()

    import jax

    # JAX_PLATFORMS=cpu is TOO LATE in this image (sitecustomize registers
    # the axon TPU backend at interpreter start) — honor an explicit flag so
    # CPU smoke runs can never become a second TPU client.
    if os.environ.get("ANYV2V_FORCE_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        from anyv2v_tpu.utils.compile_cache import enable as _enable
        _enable()

    import jax.numpy as jnp

    from anyv2v_tpu.parallel.mesh import mock_manual_axis
    from anyv2v_tpu.utils.benchguard import hard_sync
    from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline

    n = args.chips
    F = args.frames
    f_loc = F // n
    assert F % n == 0

    pipe = build_i2vgen_pipeline(
        arch="i2vgen-xl", init="random", dtype=jnp.bfloat16,
        sample_hw=(args.hw, args.hw), num_frames=F,
        param_dtype=jnp.bfloat16, components=("unet",),
    )
    _log("pipeline built")
    D = pipe.unet.config.cross_attention_dim
    h = args.hw // 8
    rng = np.random.RandomState(0)
    params = pipe.params["unet"]

    def inputs(b: int, f: int):
        return dict(
            sample=jnp.asarray(rng.randn(b, f, h, h, 4).astype(np.float32) * 0.2,
                               jnp.float32),
            timestep=jnp.asarray(500, jnp.int32),
            encoder_hidden_states=jnp.asarray(
                rng.randn(b, 77, D).astype(np.float32) * 0.02),
            fps=jnp.asarray(8, jnp.int32),
            image_latents=jnp.asarray(
                rng.randn(b, F, h, h, 4).astype(np.float32) * 0.2),
            image_embeddings=jnp.asarray(
                rng.randn(b, 1, D).astype(np.float32) * 0.02),
        )

    def make_fwd(mock: bool):
        def fwd(params, kw):
            if mock:
                with mock_manual_axis("frame", n):
                    return pipe.unet.apply(params, **kw)
            return pipe.unet.apply(params, **kw)
        return jax.jit(fwd)

    def bench(fn, params, kw, iters):
        out = fn(params, kw)
        hard_sync(out)           # compile + first run
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, kw)
        hard_sync(out)
        return (time.perf_counter() - t0) / iters

    res = {}
    for label, b, mock, f in (
        ("invert_shard", 1, True, f_loc),
        ("invert_full", 1, False, F),
        ("edit_shard", 3, True, f_loc),
        ("edit_tail_shard", 2, True, f_loc),
        ("edit_full", 3, False, F),
    ):
        fn = make_fwd(mock)
        kw = inputs(b, f)
        _log(f"compiling {label} (b={b}, f={f}, mock={mock})")
        dt = bench(fn, params, kw, args.iters)
        res[label] = dt
        _log(f"{label}: {dt * 1e3:.1f} ms/forward")

    # re-derived projection (seconds). Edit: the static-segment PnP scan
    # runs the first half of the 50 steps at batch 3 (source row live) and
    # the post-injection tail at batch 2 (default temporal threshold 0.5 —
    # pipelines/i2vgen.py split_scan), so the leg prices 25 + 25 steps.
    ov_inv = max(args.full_step_invert - res["invert_full"], 0.0)
    ov_edit = max(args.full_step_edit - res["edit_full"], 0.0)
    step_inv = res["invert_shard"] + args.ici_invert_ms / 1e3 + ov_inv
    step_edit = res["edit_shard"] + args.ici_edit_ms / 1e3 + ov_edit
    step_tail = (res["edit_tail_shard"] + args.ici_edit_ms * 2 / 3 / 1e3
                 + ov_edit)
    edit_leg = 25 * step_edit + 25 * step_tail
    proj = {
        "invert_step_s": step_inv,
        "edit_step_s": step_edit,
        "edit_tail_step_s": step_tail,
        "invert_500_s": 500 * step_inv,
        "edit_50_s": edit_leg,
        "vae_host_s": 1.0,
        "total_s": 500 * step_inv + edit_leg + 1.0,
    }
    out = {
        "metric": f"v5e-{n} per-chip shard workload, {F}f {args.hw}^2 "
                  f"i2vgen-xl (F_local={f_loc}), measured on 1 real chip "
                  "via mock_manual_axis",
        "forward_ms": {k: round(v * 1e3, 1) for k, v in res.items()},
        "scaling": {
            "invert_shard_over_full": round(
                res["invert_shard"] / res["invert_full"], 4),
            "edit_shard_over_full": round(
                res["edit_shard"] / res["edit_full"], 4),
            "ideal": round(1 / n, 4),
        },
        "modeled_ici_ms": {"invert": args.ici_invert_ms,
                           "edit": args.ici_edit_ms},
        "overhead_outside_unet_ms": {"invert": round(ov_inv * 1e3, 1),
                                     "edit": round(ov_edit * 1e3, 1)},
        "projection": {k: round(v, 2) for k, v in proj.items()},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
