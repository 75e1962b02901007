"""Benchmark: 16-frame 512^2 AnyV2V invert + PnP-edit wall-clock on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ratio}

The workload is the BASELINE.json headline (SURVEY.md §6): i2vgen-xl
DDIM inversion (500 UNet forwards, batch 1) + PnP edit (50 forwards, batch 3)
+ 17 VAE encodes + 16 decodes at 16 frames, 512^2, bf16 UNet / fp32 scans.

Default mode measures warm per-step costs on short scans and projects the
500/50-step total (exact per-step extrapolation is sound: the scan body is a
single compiled program whose cost is step-invariant). Set BENCH_FULL=1 to
run the true 500+50 step workload. Set BENCH_PROFILE=<dir> to capture a
jax.profiler (XProf) trace of the measured sections — trace capture adds
real overhead, so profiled numbers are for analysis, not for the record.

``vs_baseline`` = baseline_seconds / value, where baseline_seconds = 60.0 is
the driver-set v5e-8 target (BASELINE.json "north_star"); > 1.0 beats the
target on a SINGLE chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SECONDS = 60.0
_T0 = time.perf_counter()


def _log(msg: str) -> None:
    if os.environ.get("BENCH_VERBOSE", "0") == "1":
        print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
              flush=True)


def _sync(x) -> None:
    """Hard sync: dependent scalar through EVERY output leaf + finiteness.

    Round 4's one-element-of-one-leaf readback was observed returning before
    the computation drained over the axon tunnel (it shipped a 47 ms "50-step
    edit" artifact); :func:`anyv2v_tpu.utils.benchguard.hard_sync` dispatches
    a reduction per output leaf behind the producer on the device stream and
    reads the combined scalar back — it cannot return early."""
    from anyv2v_tpu.utils.benchguard import hard_sync

    hard_sync(x)

def main() -> None:
    from anyv2v_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline
    from anyv2v_tpu.utils.profiling import trace_if

    profile_dir = os.environ.get("BENCH_PROFILE")

    full = os.environ.get("BENCH_FULL", "0") == "1"
    # BENCH_FRAMES=128 targets the long-video path (reference README:182).
    # The host trajectory store (round 5) removes the 16.8 GB full-grid
    # term, but a REAL 128f run still crashes the single v5e chip: the
    # UNet's 128-frame activations (~8x the 16f forward) plus 2.8 GB bf16
    # params exceed 16 GB HBM (measured — PERF.md round 5). 128f is mesh
    # territory (sharded 128f asserted on the virtual 8-mesh); the host
    # store wiring below serves frame counts that do fit.
    n_frames = int(os.environ.get("BENCH_FRAMES", "16"))
    traj_store = "host" if n_frames >= 64 else "device"
    hw = (512, 512)
    arch = os.environ.get("BENCH_ARCH", "i2vgen-xl")

    _log(f"building pipeline arch={arch}")
    pipe = build_i2vgen_pipeline(
        arch=arch, init="random", dtype=jnp.bfloat16,
        sample_hw=hw, num_frames=n_frames, param_dtype=jnp.bfloat16,
        components=("unet", "vae"),  # bench feeds precomputed text/image embeds
    )
    _log("pipeline built (params initialized, bf16 storage)")
    D = pipe.unet.config.cross_attention_dim
    h = hw[0] // 8
    rng = np.random.RandomState(0)

    frames01 = jnp.asarray(rng.rand(n_frames, hw[0], hw[1], 3).astype(np.float32))
    text = jnp.asarray(rng.randn(1, 77, D).astype(np.float32) * 0.02)
    img_emb = jnp.asarray(rng.randn(1, 1, D).astype(np.float32) * 0.02)

    # --- VAE: 16-frame encode + first-frame conditioning (17 encodes total),
    #     16-frame decode --------------------------------------------------
    t0 = time.perf_counter()
    latents = pipe.encode_video(frames01)
    img_lat = pipe.prepare_image_latents(frames01[0], n_frames)
    _sync((latents, img_lat))
    _vae_warm = time.perf_counter() - t0
    _log(f"vae encode compiled+run in {_vae_warm:.1f}s")
    t0 = time.perf_counter()
    latents = pipe.encode_video(frames01)
    img_lat = pipe.prepare_image_latents(frames01[0], n_frames)
    _sync((latents, img_lat))
    t_vae_encode = time.perf_counter() - t0

    video = pipe.decode_latents(latents)
    _sync(video)
    t0 = time.perf_counter()
    video = pipe.decode_latents(latents)
    _sync(video)
    t_vae_decode = time.perf_counter() - t0

    # --- inversion ---------------------------------------------------------
    n_inv_measure = 500 if full else 20
    # warm compile
    _log("compiling inversion scan")
    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=n_inv_measure,
                               traj_store=traj_store)
    _sync(traj)
    _log("inversion scan compiled")
    t0 = time.perf_counter()
    with trace_if(profile_dir):
        traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb,
                                   num_inversion_steps=n_inv_measure,
                                   traj_store=traj_store)
        _sync(traj)
    from anyv2v_tpu.utils.benchguard import check_scan_time

    t_inv = check_scan_time("i2vgen invert", time.perf_counter() - t0,
                            n_inv_measure)
    # host readback forces real completion and surfaces deferred device
    # errors (axon executes asynchronously; a bare block_until_ready has
    # been observed to return before OOM errors are raised)
    assert np.isfinite(np.asarray(traj[-1]).sum()), "inversion produced non-finite"
    t_invert_total = t_inv if full else t_inv * (500 / n_inv_measure)

    # --- PnP edit ----------------------------------------------------------
    n_edit_measure = 50 if full else 10
    text3 = jnp.tile(text, (3, 1, 1))
    img_lat3 = jnp.tile(img_lat, (3, 1, 1, 1, 1))
    img_emb3 = jnp.tile(img_emb, (3, 1, 1))
    _log("compiling pnp edit scan")
    out = pipe.sample_with_pnp(traj, inv_ts, text3, img_lat3, img_emb3,
                               num_inference_steps=n_edit_measure)
    _sync(out)
    _log("pnp edit scan compiled")
    t0 = time.perf_counter()
    out = pipe.sample_with_pnp(traj, inv_ts, text3, img_lat3, img_emb3,
                               num_inference_steps=n_edit_measure)
    _sync(out)
    t_edit = check_scan_time("i2vgen edit", time.perf_counter() - t0,
                             n_edit_measure)
    assert np.isfinite(np.asarray(out).sum()), "edit produced non-finite"
    t_edit_total = t_edit if full else t_edit * (50 / n_edit_measure)

    total = t_invert_total + t_edit_total + t_vae_encode + t_vae_decode
    print(json.dumps({
        "metric": f"{n_frames}f 512^2 i2vgen-xl invert(500)+pnp-edit(50) wall-clock, 1 chip"
                  + ("" if full else " (projected from warm short scans)"),
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / total, 4),
        "detail": {
            "invert_s": round(t_invert_total, 3),
            "edit_s": round(t_edit_total, 3),
            "vae_encode_s": round(t_vae_encode, 3),
            "vae_decode_s": round(t_vae_decode, 3),
            "device": str(jax.devices()[0]),
            "mode": "full" if full else "projected",
        },
    }))


if __name__ == "__main__":
    main()
