"""Quantitative multi-chip projection (VERDICT r1 item 3a).

Compiles ONE frame-sharded i2vgen-xl UNet forward over a virtual
(cfg=1, frame=8) mesh — the exact sharding the pipelines use — and audits the
SPMD partitioner's inserted collectives from the compiled HLO: op kind,
output shape, bytes. From that it models a v5e-8 per-step wall-clock:

    t_step = max(FLOPs/8 / (peak * eff_mxu),  HBM_bytes/8 / bw_hbm) + t_ici

where t_ici sums ring-all-gather/all-reduce times over the 8-device 'frame'
axis at the stated ICI bandwidth. Collectives that overlap compute under
XLA's async scheduler make t_ici an upper bound; the compute leg uses the
MEASURED single-chip step time divided by 8 (so kernel efficiency is
empirical, not assumed).

Assumptions are printed with the result; run on the CPU virtual mesh (no
TPU needed — the partitioned HLO is identical modulo backend codegen).

Usage: python scripts/collective_audit.py [--frames 16] [--hw 64] [--arch i2vgen-xl]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

# ---------------------------------------------------------------------------
# hardware model (v5e; "How to Scale Your Model" numbers)
# ---------------------------------------------------------------------------
PEAK_BF16 = 197e12          # FLOP/s per chip
BW_HBM = 819e9              # B/s per chip
# one ICI link per torus direction, 45 GB/s each way; a bidirectional ring
# all-gather on one mesh axis uses both directions concurrently
BW_ICI_RING = 2 * 45e9      # B/s effective ring bandwidth per chip


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def _shape_bytes(shape_str: str) -> int:
    """'bf16[3,16,64,64,320]{...}' -> bytes."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def _tuple_bytes(shape_str: str) -> int:
    """Sum bytes over a (possibly tuple-typed) HLO result shape."""
    inner = shape_str
    if shape_str.startswith("("):
        inner = shape_str[1:shape_str.rfind(")")]
    total = 0
    for part in re.findall(r"[a-z0-9]+\[[0-9,]*\]", inner):
        total += _shape_bytes(part)
    return total


def audit(compiled_text: str, top_n: int = 0):
    """Collect per-kind counts and bytes for collective ops in compiled HLO.

    ``top_n`` > 0 also prints the largest individual collectives with their
    result shapes — the work list for gather-volume reduction."""
    kinds = ("all-gather", "all-reduce", "reduce-scatter",
             "collective-permute", "all-to-all")
    found = {}
    singles = []
    for line in compiled_text.splitlines():
        s = line.strip()
        m = re.match(r"[%\w.\-]+ = (\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*) "
                     r"([a-z\-]+)(\(|-start\()", s)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        if op not in kinds:
            continue
        b = _tuple_bytes(shape_str)
        found.setdefault(op, [0, 0])
        found[op][0] += 1
        found[op][1] += b
        singles.append((b, op, shape_str[:90]))
    if top_n:
        print(f"\ntop {top_n} individual collectives:")
        for b, op, shp in sorted(singles, reverse=True)[:top_n]:
            print(f"  {b / 1e6:9.2f} MB  {op:20s} {shp}")
    return found


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--hw", type=int, default=64, help="latent H=W")
    ap.add_argument("--arch", default="i2vgen-xl")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--measured-step-s", type=float, default=None,
                    help="measured single-chip per-step seconds (invert)")
    args = ap.parse_args()

    from anyv2v_tpu.models.unet_i2vgen import I2VGenUNet
    from anyv2v_tpu.models.unet_seine import SeineUNet
    from anyv2v_tpu.models.unet_videoldm import VideoLDMUNet
    from anyv2v_tpu.parallel.mesh import make_mesh
    from anyv2v_tpu.utils.model_zoo import (ARCHS, CONSISTI2V_ARCHS,
                                            SEINE_ARCHS)

    all_archs = {**ARCHS, **CONSISTI2V_ARCHS, **SEINE_ARCHS}
    cfg = all_archs[args.arch]["unet"]
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": jnp.bfloat16})
    mesh = make_mesh(n_cfg=1, n_frame=8)

    B, F, hw = args.batch, args.frames, args.hw
    family = ("consisti2v" if args.arch in CONSISTI2V_ARCHS
              else "seine" if args.arch in SEINE_ARCHS else "i2vgen")
    if family == "consisti2v":
        unet = VideoLDMUNet(cfg)
        # sample = the F REAL (denoised) frames; the conditioning frame
        # enters replicated (ConsistI2VPipeline._apply_unet)
        kw = dict(
            sample=jax.ShapeDtypeStruct((B, F, hw, hw, 4), jnp.float32),
            timestep=jax.ShapeDtypeStruct((), jnp.int32),
            encoder_hidden_states=jax.ShapeDtypeStruct(
                (B, 77, cfg.cross_attention_dim), jnp.float32),
            first_frame_latents=jax.ShapeDtypeStruct((B, 1, hw, hw, 4),
                                                     jnp.float32),
            frame_stride=jax.ShapeDtypeStruct((), jnp.int32),
        )
    elif family == "seine":
        unet = SeineUNet(cfg)
        kw = dict(
            sample=jax.ShapeDtypeStruct((B, F, hw, hw, 9), jnp.float32),
            timestep=jax.ShapeDtypeStruct((), jnp.int32),
            encoder_hidden_states=jax.ShapeDtypeStruct(
                (B, 77, cfg.cross_attention_dim), jnp.float32),
        )
    else:
        unet = I2VGenUNet(cfg)
        kw = dict(
            sample=jax.ShapeDtypeStruct((B, F, hw, hw, 4), jnp.float32),
            timestep=jax.ShapeDtypeStruct((), jnp.int32),
            encoder_hidden_states=jax.ShapeDtypeStruct(
                (B, 77, cfg.cross_attention_dim), jnp.float32),
            fps=jax.ShapeDtypeStruct((), jnp.int32),
            image_latents=jax.ShapeDtypeStruct((B, F, hw, hw, 4), jnp.float32),
            image_embeddings=jax.ShapeDtypeStruct((B, 1, cfg.cross_attention_dim),
                                                  jnp.float32),
        )
    params = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), **{
            k: jnp.zeros(v.shape, v.dtype) for k, v in kw.items()}))

    vid = NamedSharding(mesh, P(None, "frame", None, None, None))
    rep = NamedSharding(mesh, P())
    manual = not os.environ.get("AUDIT_NO_SHARDMAP")
    in_sh = {k: rep for k in kw}
    in_sh["sample"] = vid
    if family == "i2vgen" and not manual:
        in_sh["image_latents"] = vid
    shardings = (jax.tree.map(lambda _: rep, params), in_sh)

    from anyv2v_tpu.parallel.mesh import manual_axis

    vspec = P(None, "frame", None, None, None)
    n_dev = mesh.shape["frame"]
    keys = list(kw)

    def fwd(p, inputs):
        # mirrors the pipelines' _apply_unet: the whole forward is ONE
        # manual-SPMD shard_map region; temporal ops all_to_all inside
        # (i2vgen: image_latents replicated; consisti2v: the conditioning
        # frame replicated, true F+1 sequence assembled inside)
        if not manual:
            return unet.apply(p, **inputs)

        def local(p, *vals):
            with manual_axis("frame", n_dev):
                return unet.apply(p, **dict(zip(keys, vals)))

        in_specs = tuple([P()] + [vspec if k == "sample" else P()
                                  for k in keys])
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=vspec,
            check_vma=False,
        )(p, *[inputs[k] for k in keys])

    print(f"lowering {args.arch} F={F} {hw}x{hw} over mesh {dict(mesh.shape)} ...",
          file=sys.stderr)
    lowered = jax.jit(fwd, in_shardings=shardings, out_shardings=vid).lower(
        params, kw)
    cost = lowered.cost_analysis() or {}
    print("compiling (SPMD partitioner inserts collectives) ...",
          file=sys.stderr)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if os.environ.get("AUDIT_SAVE_HLO"):
        with open(os.environ["AUDIT_SAVE_HLO"], "w") as fh:
            fh.write(txt)

    found = audit(txt, top_n=int(os.environ.get("AUDIT_TOP_N", "12")))
    ccost = compiled.cost_analysis() or {}
    flops = ccost.get("flops", cost.get("flops", 0.0))

    total_coll_bytes = sum(b for _, b in found.values())
    n = mesh.shape["frame"]
    # ring model: all-gather/all-reduce of R result bytes moves R*(n-1)/n
    # per chip (all-reduce = reduce-scatter + all-gather: x2)
    t_ici = 0.0
    for op, (cnt, b) in sorted(found.items()):
        factor = 2.0 if op == "all-reduce" else 1.0
        t = factor * b * (n - 1) / n / BW_ICI_RING
        t_ici += t
        print(f"  {op:20s} x{cnt:3d}  {b / 1e6:9.2f} MB   ring time {t * 1e3:7.3f} ms")

    print(f"\nper-forward collective volume: {total_coll_bytes / 1e6:.1f} MB, "
          f"modeled ICI time {t_ici * 1e3:.2f} ms at {BW_ICI_RING / 1e9:.0f} GB/s ring")
    if flops:
        print(f"HLO flops (per forward, whole batch): {flops / 1e12:.2f} TF")

    if args.measured_step_s:
        t_compute = args.measured_step_s / n
        t_step = t_compute + t_ici
        print(f"\nmodel: measured single-chip step {args.measured_step_s * 1e3:.0f} ms"
              f" / {n} chips = {t_compute * 1e3:.1f} ms compute"
              f" + {t_ici * 1e3:.2f} ms ICI (serial upper bound)"
              f" = {t_step * 1e3:.1f} ms/step on v5e-{n}")
        print(f"500-step invert + 50-step edit (3x batch) projection: "
              f"{(500 * t_step + 50 * 3 * t_step):.1f} s")


if __name__ == "__main__":
    main()
