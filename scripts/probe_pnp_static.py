"""On-chip A/B of the static-segment PnP edit scan (PERF.md round 5).

Measures the i2vgen-xl PnP edit leg (the bench.py protocol's warm 10-step
scan, batch-3 CFG, 16f 512^2) with ``ANYV2V_PNP_STATIC=1`` (default:
constant-flag runs compiled with STATIC injection flags) vs ``=0`` (one
traced-flag program for every step). The flag is read per ``sample_with_pnp``
call (a host-level branch, not trace-time), so both variants run in one
process. Also records the invert leg once for context. Prints one JSON
object; the tpu_session bundle writes it to PNP_AB.json.

Reference for the loop being measured:
/root/reference/i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:1130-1179.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[pnp-ab +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> None:
    from anyv2v_tpu.utils.compile_cache import enable as _enable

    _enable()

    import jax
    import jax.numpy as jnp

    from anyv2v_tpu.utils.benchguard import check_scan_time, hard_sync
    from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline

    n_frames, hw = 16, (512, 512)
    pipe = build_i2vgen_pipeline(
        arch="i2vgen-xl", init="random", dtype=jnp.bfloat16,
        sample_hw=hw, num_frames=n_frames, param_dtype=jnp.bfloat16,
        components=("unet",),
    )
    _log("pipeline built")
    D = pipe.unet.config.cross_attention_dim
    h = hw[0] // 8
    rng = np.random.RandomState(0)

    latents = jnp.asarray(
        rng.randn(1, n_frames, h, h, 4).astype(np.float32) * 0.18)
    text = jnp.asarray(rng.randn(1, 77, D).astype(np.float32) * 0.02)
    img_lat = jnp.asarray(
        rng.randn(1, n_frames, h, h, 4).astype(np.float32) * 0.18)
    img_emb = jnp.asarray(rng.randn(1, 1, D).astype(np.float32) * 0.02)

    n_inv = 20
    _log("compiling inversion scan (trajectory source)")
    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=n_inv)
    hard_sync(traj)

    n_edit = 10
    text3 = jnp.tile(text, (3, 1, 1))
    img_lat3 = jnp.tile(img_lat, (3, 1, 1, 1, 1))
    img_emb3 = jnp.tile(img_emb, (3, 1, 1))

    res = {}
    for label, env in (("static", "1"), ("traced", "0")):
        os.environ["ANYV2V_PNP_STATIC"] = env
        try:
            _log(f"compiling edit scan ({label})")
            out = pipe.sample_with_pnp(traj, inv_ts, text3, img_lat3,
                                       img_emb3,
                                       num_inference_steps=n_edit)
            hard_sync(out)
            t0 = time.perf_counter()
            out = pipe.sample_with_pnp(traj, inv_ts, text3, img_lat3,
                                       img_emb3,
                                       num_inference_steps=n_edit)
            hard_sync(out)
            dt = check_scan_time(f"i2vgen edit ({label})",
                                 time.perf_counter() - t0, n_edit)
            assert np.isfinite(np.asarray(out).sum())
            res[label] = dt
            _log(f"{label}: {dt:.3f} s / {n_edit} steps")
        finally:
            os.environ.pop("ANYV2V_PNP_STATIC", None)

    out = {
        "metric": "i2vgen-xl 16f 512^2 PnP edit scan, static-segment vs "
                  f"traced-flag, warm {n_edit}-step scans on 1 chip",
        "edit_s": {k: round(v, 3) for k, v in res.items()},
        "edit_50_s": {k: round(v * (50 / n_edit), 3) for k, v in res.items()},
        "speedup": round(res["traced"] / res["static"], 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
