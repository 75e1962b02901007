"""Three-backbone TPU wall-clock (VERDICT r1 item 4).

Measures ConsistI2V and SEINE end-to-end edit wall-clock on one chip at
their shipped configs' true step counts (500-step inversion + 50-step PnP
edit at 16 frames 512^2 — ``configs/consisti2v/ddim_inversion.yaml:35,47``,
``configs/seine/ddim_inversion.yaml:27`` / ``pnp_edit.yaml:32``), the same
protocol as the i2vgen-xl headline in ``bench.py``.

Default mode measures warm per-step costs on short scans and projects the
500/50 totals. BENCH_FULL=1 runs the true step counts. Projected mode runs
CONSERVATIVE on the edit leg (~10% measured, round 5): the static-segment
PnP scan splits into per-pattern programs, and a 10-step scan amortizes
each segment's dispatch over fewer steps than the real 50-step run
(measured full: ConsistI2V 134.9 vs 139.2 projected, SEINE 94.9 vs 96.3).

Prints one JSON line per backbone; pass backbone names as argv to subset
(default: consisti2v seine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from anyv2v_tpu.utils.benchguard import check_scan_time

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[bench_backbones +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _sync(x) -> None:
    """Hard sync: dependent scalar through EVERY output leaf + finiteness.

    Round 4 shipped a corrupt ConsistI2V edit_s (47 ms for 50 steps) because
    the old helper read back one element of one leaf and the axon tunnel
    returned early; :func:`anyv2v_tpu.utils.benchguard.hard_sync` cannot."""
    from anyv2v_tpu.utils.benchguard import hard_sync

    hard_sync(x)


def bench_consisti2v(full: bool):
    import jax
    import jax.numpy as jnp

    from anyv2v_tpu.utils.model_zoo import build_consisti2v_pipeline

    pipe = build_consisti2v_pipeline(arch="consisti2v", init="random",
                                     dtype=jnp.bfloat16)
    _log("consisti2v pipeline built")
    D = pipe.unet.config.cross_attention_dim
    F, h = 16, 64
    rng = np.random.RandomState(0)
    frames01 = jnp.asarray(rng.rand(F, 512, 512, 3).astype(np.float32))
    text = jnp.asarray(rng.randn(1, 77, D).astype(np.float32) * 0.02)

    t0 = time.perf_counter()
    latents = pipe.encode_video(frames01)
    _sync(latents)
    _log(f"vae encode compiled+run in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    latents = pipe.encode_video(frames01)
    _sync(latents)
    t_vae_encode = time.perf_counter() - t0

    video = pipe.decode_latents(latents)
    _sync(video)
    t0 = time.perf_counter()
    video = pipe.decode_latents(latents)
    _sync(video)
    t_vae_decode = time.perf_counter() - t0

    n_inv = 500 if full else 20
    _log("compiling consisti2v inversion scan")
    traj, inv_ts = pipe.invert(latents, text, num_inversion_steps=n_inv)
    _sync(traj)
    _log("inversion compiled; measuring")
    t0 = time.perf_counter()
    traj, inv_ts = pipe.invert(latents, text, num_inversion_steps=n_inv)
    _sync(traj)
    t_inv = check_scan_time("consisti2v invert", time.perf_counter() - t0,
                            n_inv)
    assert np.isfinite(np.asarray(traj[-1]).sum())
    t_invert_total = t_inv if full else t_inv * (500 / n_inv)

    # cfg_txt=35, cfg_img=1 (configs/consisti2v/pnp_edit.yaml:25-26): 3-row CFG
    n_edit = 50 if full else 10
    text3 = jnp.tile(text, (3, 1, 1))
    kw = dict(text_embeds_all=text3,
              edited_ff_latent=latents[:, :1], src_ff_latent=latents[:, :1],
              num_inference_steps=n_edit, t_idx=max(0, n_edit // 10 - 1),
              cfg_txt=35.0, cfg_img=1.0)
    _log("compiling consisti2v pnp edit scan")
    out = pipe.sample_with_pnp(traj, inv_ts, **kw)
    _sync(out)
    _log("edit compiled; measuring")
    t0 = time.perf_counter()
    out = pipe.sample_with_pnp(traj, inv_ts, **kw)
    _sync(out)
    t_edit = check_scan_time("consisti2v edit", time.perf_counter() - t0,
                             n_edit)
    assert np.isfinite(np.asarray(out).sum())
    t_edit_total = t_edit if full else t_edit * (50 / n_edit)

    return dict(invert_s=t_invert_total, edit_s=t_edit_total,
                vae_encode_s=t_vae_encode, vae_decode_s=t_vae_decode,
                mode="full" if full else "projected")


def bench_seine(full: bool):
    import jax
    import jax.numpy as jnp

    from anyv2v_tpu.utils.model_zoo import build_seine_pipeline

    pipe = build_seine_pipeline(arch="seine", init="random",
                                dtype=jnp.bfloat16)
    _log("seine pipeline built")
    D = pipe.unet.config.cross_attention_dim
    F, h = 16, 64
    rng = np.random.RandomState(0)
    frames01 = jnp.asarray(rng.rand(F, 512, 512, 3).astype(np.float32))
    text = jnp.asarray(rng.randn(1, 120, D).astype(np.float32) * 0.02)

    t0 = time.perf_counter()
    latents = pipe.encode_video(frames01)
    _sync(latents)
    _log(f"vae encode compiled+run in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    latents = pipe.encode_video(frames01)
    _sync(latents)
    t_vae_encode = time.perf_counter() - t0

    video = pipe.decode_latents(latents)
    _sync(video)
    t0 = time.perf_counter()
    video = pipe.decode_latents(latents)
    _sync(video)
    t_vae_decode = time.perf_counter() - t0

    mask = jnp.concatenate(
        [jnp.zeros((1, 1, h, h, 1), jnp.float32),
         jnp.ones((1, F - 1, h, h, 1), jnp.float32)], axis=1)
    masked = latents * (1.0 - mask)

    n_inv = 500 if full else 20
    _log("compiling seine inversion scan")
    traj, traj_ts = pipe.invert(latents, mask, masked, text,
                                num_inversion_steps=n_inv,
                                num_save_steps=max(n_inv // 2, 1))
    _sync(traj)
    _log("inversion compiled; measuring")
    t0 = time.perf_counter()
    traj, traj_ts = pipe.invert(latents, mask, masked, text,
                                num_inversion_steps=n_inv,
                                num_save_steps=max(n_inv // 2, 1))
    _sync(traj)
    t_inv = check_scan_time("seine invert", time.perf_counter() - t0, n_inv)
    assert np.isfinite(np.asarray(traj[-1]).sum())
    t_invert_total = t_inv if full else t_inv * (500 / n_inv)

    # cfg_scale=4, ddpm sampler (configs/seine/pnp_edit.yaml:24,28-29)
    n_edit = 50 if full else 10
    text3 = jnp.tile(text, (3, 1, 1))
    kw = dict(text_embeds_all=text3, mask=mask, masked_edit_latent=masked,
              masked_src_latent=masked, num_inference_steps=n_edit,
              cfg_scale=4.0, sampler="ddpm", key=jax.random.PRNGKey(7))
    _log("compiling seine pnp edit scan")
    out = pipe.sample_with_pnp(traj, traj_ts, **kw)
    _sync(out)
    _log("edit compiled; measuring")
    t0 = time.perf_counter()
    out = pipe.sample_with_pnp(traj, traj_ts, **kw)
    _sync(out)
    t_edit = check_scan_time("seine edit", time.perf_counter() - t0, n_edit)
    assert np.isfinite(np.asarray(out).sum())
    t_edit_total = t_edit if full else t_edit * (50 / n_edit)

    return dict(invert_s=t_invert_total, edit_s=t_edit_total,
                vae_encode_s=t_vae_encode, vae_decode_s=t_vae_decode,
                mode="full" if full else "projected")


def main():
    from anyv2v_tpu.utils.compile_cache import enable as _enable

    _enable()
    import jax

    full = os.environ.get("BENCH_FULL", "0") == "1"
    which = sys.argv[1:] or ["consisti2v", "seine"]
    runners = {"consisti2v": bench_consisti2v, "seine": bench_seine}
    results = {}
    for name in which:
        d = runners[name](full)
        total = d["invert_s"] + d["edit_s"] + d["vae_encode_s"] + d["vae_decode_s"]
        d = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in d.items()}
        d["device"] = str(jax.devices()[0])
        rec = {
            "metric": f"16f 512^2 {name} invert(500)+pnp-edit(50) wall-clock, 1 chip",
            "value": round(total, 3),
            "unit": "s",
            "detail": d,
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_BACKBONES.json")
    # subset runs (argv) merge into the existing record instead of dropping
    # the other backbone's entry
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    _log(f"wrote {out}")


if __name__ == "__main__":
    main()
