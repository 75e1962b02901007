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

Usage:  python scripts/tpu_session.py [phases...]   (default: all)
Phases: shard pnp_ab backbones trace_c2v trace_seine
  (pnp_ab -> PNP_AB.json, the static-segment PnP edit A/B — not in the
  default set; requested explicitly by follow-up sessions)
"""

from __future__ import annotations

import gc
import io
import json
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


def run_shard():
    sbw = _load("bench_shard_workload")

    # capture the script's stdout JSON into SHARD_BENCH.json
    old = sys.stdout
    buf = io.StringIO()
    sys.stdout = buf
    old_argv = sys.argv
    sys.argv = ["bench_shard_workload.py"]
    try:
        sbw.main()
    finally:
        sys.stdout = old
        sys.argv = old_argv
    out = buf.getvalue()
    print(out, flush=True)
    with open("SHARD_BENCH.json", "w") as f:
        f.write(out)


def run_pnp_ab():
    mod = _load("probe_pnp_static")

    old = sys.stdout
    buf = io.StringIO()
    sys.stdout = buf
    old_argv = sys.argv
    sys.argv = ["probe_pnp_static.py"]
    try:
        mod.main()
    finally:
        sys.stdout = old
        sys.argv = old_argv
    out = buf.getvalue()
    print(out, flush=True)
    with open("PNP_AB.json", "w") as f:
        f.write(out)


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
