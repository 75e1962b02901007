"""ONE-process TPU work bundle.

The axon worker reliably serves the FIRST client after (re)initialization;
follow-on clients have been observed to wedge in the grant-claim leg for
~45 min (see PERF.md round-5 notes). So every piece of on-chip work for a
session rides ONE python process, sequentially, each phase writing its
artifact before the next begins:

  1. per-chip shard workload bench  -> SHARD_BENCH.json   (VERDICT r4 #1)
  2. backbone benches re-record     -> BENCH_BACKBONES.json (VERDICT r4 #2)
  3. ConsistI2V b1 step anatomy     -> /tmp/xprof_consisti2v_b1_16 + stdout
  4. SEINE b1 step anatomy          -> /tmp/xprof_seine_b1_16 + stdout

Usage:  python scripts/tpu_session.py [phases...]
        (default: shard backbones trace_c2v trace_seine)
Phases (artifact):
  shard        -> SHARD_BENCH.json     per-chip shard workload bench
  backbones    -> BENCH_BACKBONES.json ConsistI2V + SEINE re-record
  trace_c2v    -> /tmp/xprof_consisti2v_b1_16  step anatomy
  trace_seine  -> /tmp/xprof_seine_b1_16       step anatomy
  pnp_ab       -> PNP_AB.json          static vs traced PnP edit A/B
  flash_ab     -> FLASH_AB.json        splitkv + routing probes
  flash_blocks -> stdout               flash block-size sweep
  shard_trace  -> /tmp/xprof_shard_b{1,3}_f2   F_local=2 anatomy
  hlo          -> /tmp/hlo_{backbone}.txt      compiled-HLO dumps
  tpu_gate     -> (pytest)             on-chip kernel equivalence gate
  shard_bb     -> SHARD_BACKBONES.json ConsistI2V/SEINE per-chip shards
  c2v_shard_trace -> /tmp/xprof_c2v_shard_b1_f2  ConsistI2V F_local=2 anatomy
  bench128     -> BENCH_128F.json      128f long-video bench attempt
"""

from __future__ import annotations

import gc
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[tpu-session +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _load(script_name):
    """Import a sibling script file (scripts/ is not a package)."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        script_name + ".py")
    spec = importlib.util.spec_from_file_location(script_name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _phase(name, fn):
    _log(f"=== phase {name} start ===")
    try:
        fn()
        _log(f"=== phase {name} OK ===")
        return True
    except Exception:
        _log(f"=== phase {name} FAILED ===\n{traceback.format_exc()}")
        return False
    finally:
        gc.collect()


def _capture_json(script_name, out_path, argv=()):
    """Run a sibling script's main() with stdout captured; ALWAYS write
    whatever was printed to ``out_path`` (even on failure — partial output
    is the crash diagnostic), then re-raise."""
    mod = _load(script_name)
    old_stdout, old_argv = sys.stdout, sys.argv
    buf = io.StringIO()
    sys.stdout = buf
    sys.argv = [script_name + ".py", *argv]
    try:
        mod.main()
    finally:
        sys.stdout = old_stdout
        sys.argv = old_argv
        out = buf.getvalue()
        print(out, flush=True)
        if out.strip():
            with open(out_path, "w") as f:
                f.write(out)


def run_shard():
    _capture_json("bench_shard_workload", "SHARD_BENCH.json")


def run_pnp_ab():
    _capture_json("probe_pnp_static", "PNP_AB.json")


def run_flash_ab():
    _capture_json("probe_flash_layout", "FLASH_AB.json")


def run_shard_bb():
    _capture_json("bench_shard_backbones", "SHARD_BACKBONES.json")


def run_hlo_dump():
    """Compiled-HLO text of the three UNet forwards (b=1, 16f 512^2) for
    offline layout/copy analysis — compile only, nothing executes."""
    import jax
    import jax.numpy as jnp

    rngs = __import__("numpy").random.RandomState(0)

    def dump(name, fn, *xs):
        txt = jax.jit(fn).lower(*xs).compile().as_text()
        path = f"/tmp/hlo_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        _log(f"wrote {path} ({len(txt) / 1e6:.1f} MB)")

    from anyv2v_tpu.utils.model_zoo import (build_consisti2v_pipeline,
                                            build_i2vgen_pipeline,
                                            build_seine_pipeline)

    p = build_consisti2v_pipeline(arch="consisti2v", init="random",
                                  dtype=jnp.bfloat16)
    D = p.unet.config.cross_attention_dim
    dump("consisti2v",
         lambda pr, s, eh, ff: p.unet.apply(
             pr, sample=s, timestep=jnp.int32(981), encoder_hidden_states=eh,
             first_frame_latents=ff, frame_stride=jnp.int32(3)),
         p.params["unet"],
         jnp.asarray(rngs.randn(1, 15, 64, 64, 4), jnp.float32),
         jnp.asarray(rngs.randn(1, 77, D) * 0.02, jnp.float32),
         jnp.asarray(rngs.randn(1, 1, 64, 64, 4), jnp.float32))
    del p

    p = build_seine_pipeline(arch="seine", init="random", dtype=jnp.bfloat16)
    D = p.unet.config.cross_attention_dim
    dump("seine",
         lambda pr, s, eh: p.unet.apply(
             pr, sample=s, timestep=jnp.int32(981),
             encoder_hidden_states=eh),
         p.params["unet"],
         jnp.asarray(rngs.randn(1, 16, 64, 64, 9), jnp.float32),
         jnp.asarray(rngs.randn(1, 120, D) * 0.02, jnp.float32))
    del p

    p = build_i2vgen_pipeline(arch="i2vgen-xl", init="random",
                              dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                              components=("unet",))
    D = p.unet.config.cross_attention_dim
    dump("i2vgen",
         lambda pr, s, eh, il, ie: p.unet.apply(
             pr, sample=s, timestep=jnp.int32(981), encoder_hidden_states=eh,
             fps=jnp.int32(8), image_latents=il, image_embeddings=ie),
         p.params["unet"],
         jnp.asarray(rngs.randn(1, 16, 64, 64, 4), jnp.float32),
         jnp.asarray(rngs.randn(1, 77, D) * 0.02, jnp.float32),
         jnp.asarray(rngs.randn(1, 16, 64, 64, 4), jnp.float32),
         jnp.asarray(rngs.randn(1, 1, D) * 0.02, jnp.float32))


def run_bench128():
    """128-frame long-video headline on ONE chip (reference README:182
    claims 128f on a 48 GB A6000): bench.py protocol at BENCH_FRAMES=128
    with the round-5 host trajectory store — the first MEASURED long-video
    number (prior rounds could only project: the 16.8 GB full grid did not
    fit HBM). Writes BENCH_128F.json."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    os.environ["BENCH_FRAMES"] = "128"
    os.environ["BENCH_VERBOSE"] = "1"
    old_stdout = sys.stdout
    buf = io.StringIO()
    sys.stdout = buf
    try:
        bench.main()
    finally:
        sys.stdout = old_stdout
        os.environ.pop("BENCH_FRAMES", None)
        os.environ.pop("BENCH_VERBOSE", None)
        out = buf.getvalue()
        print(out, flush=True)
        if out.strip():
            with open("BENCH_128F.json", "w") as f:
                f.write(out)


def run_c2v_shard_trace():
    """XProf the ConsistI2V per-chip shard forward (F_local=2 + replicated
    conditioning frame, mock collectives) — names the per-op terms behind
    the 1.63x invert scaling penalty (SHARD_BACKBONES.json)."""
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anyv2v_tpu.parallel.mesh import mock_manual_axis
    from anyv2v_tpu.utils.model_zoo import build_consisti2v_pipeline

    n, F = 8, 16
    f_loc = F // n
    pipe = build_consisti2v_pipeline(arch="consisti2v", init="random",
                                     dtype=jnp.bfloat16)
    _log("c2v shard-trace pipeline built")
    D = pipe.unet.config.cross_attention_dim
    rng = np.random.RandomState(0)
    params = pipe.params["unet"]

    for b in (1,):
        sample = jnp.asarray(
            rng.randn(b, f_loc, 64, 64, 4).astype(np.float32) * 0.2)
        text = jnp.asarray(rng.randn(b, 77, D).astype(np.float32) * 0.02)
        ffl = jnp.asarray(
            rng.randn(b, 1, 64, 64, 4).astype(np.float32) * 0.2)

        @jax.jit
        def fwd(p, sample, text, ffl):
            with mock_manual_axis("frame", n):
                return pipe.unet.apply(
                    p, sample=sample, timestep=jnp.int32(500),
                    encoder_hidden_states=text, first_frame_latents=ffl,
                    frame_stride=jnp.int32(3))

        trace_dir = f"/tmp/xprof_c2v_shard_b{b}_f{f_loc}"
        if glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True):
            _log(f"{trace_dir} exists, skipping")
            continue
        jax.block_until_ready(fwd(params, sample, text, ffl))
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = fwd(params, sample, text, ffl)
            jax.block_until_ready(out)
        _log(f"wrote {trace_dir}")


def run_tpu_gate():
    """The compiled-kernel equivalence gate on the real chip
    (ANYV2V_TESTS_TPU=1 pytest tests/test_tpu_equivalence.py) — required
    after any kernel/routing change before refreshing bench artifacts
    (gate.sh runs it too, but on-chip work must ride THIS process)."""
    import pytest

    os.environ["ANYV2V_TESTS_TPU"] = "1"
    try:
        rc = pytest.main(["-q", "-m", "", "tests/test_tpu_equivalence.py"])
    finally:
        os.environ.pop("ANYV2V_TESTS_TPU", None)
    if rc != 0:
        raise RuntimeError(f"TPU equivalence gate failed: pytest rc={rc}")


def run_shard_trace():
    """XProf the per-chip shard workload forward (F_local=2, b=1 and b=3,
    mock collectives) — names the per-op terms behind the measured 1.58x
    invert / 1.15x edit small-grid penalty (SHARD_BENCH.json)."""
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anyv2v_tpu.parallel.mesh import mock_manual_axis
    from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline

    n, F = 8, 16
    f_loc = F // n
    pipe = build_i2vgen_pipeline(
        arch="i2vgen-xl", init="random", dtype=jnp.bfloat16,
        sample_hw=(512, 512), num_frames=F, param_dtype=jnp.bfloat16,
        components=("unet",))
    _log("shard-trace pipeline built")
    D = pipe.unet.config.cross_attention_dim
    rng = np.random.RandomState(0)
    params = pipe.params["unet"]

    for b in (1, 3):
        kw = dict(
            sample=jnp.asarray(
                rng.randn(b, f_loc, 64, 64, 4).astype(np.float32) * 0.2),
            timestep=jnp.asarray(500, jnp.int32),
            encoder_hidden_states=jnp.asarray(
                rng.randn(b, 77, D).astype(np.float32) * 0.02),
            fps=jnp.asarray(8, jnp.int32),
            image_latents=jnp.asarray(
                rng.randn(b, F, 64, 64, 4).astype(np.float32) * 0.2),
            image_embeddings=jnp.asarray(
                rng.randn(b, 1, D).astype(np.float32) * 0.02),
        )

        @jax.jit
        def fwd(p, a):
            with mock_manual_axis("frame", n):
                return pipe.unet.apply(p, **a)

        trace_dir = f"/tmp/xprof_shard_b{b}_f{f_loc}"
        if glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True):
            _log(f"{trace_dir} exists, skipping")
            continue
        jax.block_until_ready(fwd(params, kw))
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = fwd(params, kw)
            jax.block_until_ready(out)
        _log(f"wrote {trace_dir}")


def run_backbones():
    bb = _load("bench_backbones")

    old_argv = sys.argv
    sys.argv = ["bench_backbones.py"]
    try:
        bb.main()
    finally:
        sys.argv = old_argv


def _run_trace(mod_name, argv1):
    mod = _load(mod_name)
    old_argv = sys.argv
    sys.argv = [mod_name, argv1]
    try:
        mod.main()
    finally:
        sys.argv = old_argv


def main():
    from anyv2v_tpu.utils.compile_cache import enable as _enable

    _enable()
    phases = sys.argv[1:] or ["shard", "backbones", "trace_c2v",
                              "trace_seine"]
    ok = {}
    for ph in phases:
        if ph == "shard":
            ok[ph] = _phase(ph, run_shard)
        elif ph == "pnp_ab":
            ok[ph] = _phase(ph, run_pnp_ab)
        elif ph == "flash_ab":
            ok[ph] = _phase(ph, run_flash_ab)
        elif ph == "shard_bb":
            ok[ph] = _phase(ph, run_shard_bb)
        elif ph == "c2v_shard_trace":
            ok[ph] = _phase(ph, run_c2v_shard_trace)
        elif ph == "hlo":
            ok[ph] = _phase(ph, run_hlo_dump)
        elif ph == "shard_trace":
            ok[ph] = _phase(ph, run_shard_trace)
        elif ph == "tpu_gate":
            ok[ph] = _phase(ph, run_tpu_gate)
        elif ph == "bench128":
            ok[ph] = _phase(ph, run_bench128)
        elif ph == "flash_blocks":
            def _blocks():
                mod = _load("probe_flash_blocks")
                old_argv = sys.argv
                sys.argv = ["probe_flash_blocks.py"]
                try:
                    mod.main()
                finally:
                    sys.argv = old_argv
            ok[ph] = _phase(ph, _blocks)
        elif ph == "backbones":
            ok[ph] = _phase(ph, run_backbones)
        elif ph == "trace_c2v":
            ok[ph] = _phase(ph, lambda: _run_trace(
                "perf_trace_consisti2v", "b1"))
        elif ph == "trace_seine":
            ok[ph] = _phase(ph, lambda: _run_trace(
                "perf_trace_seine", "b1"))
        else:
            _log(f"unknown phase {ph}")
            ok[ph] = False
    _log(f"session done: {ok}")
    sys.exit(0 if all(ok.values()) else 1)


if __name__ == "__main__":
    main()
