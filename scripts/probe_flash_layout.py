"""On-chip A/B probes for the round-5 attention work (one JSON out).

1. ``splitkv``: the ConsistI2V first-frame-concat spatial self-attention —
   split-KV kernel (shared frame-0 K/V projected/DMA'd once per batch row,
   `ops/pallas_attention.flash_attention_splitkv`) vs the materialized
   repeat+concat+flash the reference design implies. Measured end-to-end
   jitted (projection-layout in, folded out) so the repeat/concat/transpose
   copies are priced in.

2. ``shard_routing``: i2vgen-xl L0 self-attention at the PER-CHIP shard
   shapes (F_local=2 → batch*sq = 8192, below the packed kernel's tuned
   16384-row gate): packed vs generic flash vs xla. Names the routing term
   inside SHARD_BENCH.json's 1.58x invert scaling penalty.

Usage: python scripts/probe_flash_layout.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (label, b_ctx, frames, sq, heads, dh) — L0/L1 ConsistI2V, invert + edit
SPLITKV_CASES = [
    ("videoldm_L0_b1", 1, 15, 4096, 8, 40),
    ("videoldm_L0_edit_b4", 4, 15, 4096, 8, 40),
    ("videoldm_L1_b1", 1, 15, 1024, 8, 80),
]

# (label, rows, sq, sk, heads, dh_padded, backends)
ROUTING_CASES = [
    ("i2vgen_L0_self_floc2_b1", 2, 4096, 4096, 64, 8,
     ("pallas_packed", "pallas", "xla")),
    ("i2vgen_L0_self_floc2_b3", 6, 4096, 4096, 64, 8,
     ("pallas_packed", "pallas", "xla")),
    ("i2vgen_L1_self_floc2_b1", 2, 1024, 1024, 64, 16,
     ("pallas_packed", "pallas", "xla")),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from anyv2v_tpu.utils.compile_cache import enable as _enable
    _enable()

    import jax
    import jax.numpy as jnp

    from anyv2v_tpu.ops.attention import (multi_head_attention,
                                          spatial_attention_ffconcat)
    from anyv2v_tpu.utils.benchguard import hard_sync

    def bench(fn, *xs):
        out = fn(*xs)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        hard_sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    res = {"splitkv": {}, "shard_routing": {}}

    for label, b, f, sq, heads, dh in SPLITKV_CASES:
        rng = np.random.RandomState(0)
        d = heads * dh
        h_tok = jnp.asarray(rng.randn(b * f, sq, d).astype(np.float32) * 0.1,
                            jnp.bfloat16)
        ff = jnp.asarray(rng.randn(b, sq, d).astype(np.float32) * 0.1,
                         jnp.bfloat16)

        @jax.jit
        def split_call(h_tok, ff):
            return spatial_attention_ffconcat(h_tok, h_tok, h_tok,
                                              ff, ff, frames=f, heads=heads)

        @jax.jit
        def concat_call(h_tok, ff):
            kv = jnp.concatenate(
                [h_tok, jnp.repeat(ff, f, axis=0)], axis=1)
            return multi_head_attention(h_tok, kv, kv, heads=heads)

        row = {"split": bench(split_call, h_tok, ff),
               "concat": bench(concat_call, h_tok, ff)}
        row["speedup"] = row["concat"] / row["split"]
        res["splitkv"][label] = {k: round(v, 3) for k, v in row.items()}
        print(f"[probe] splitkv {label}: {res['splitkv'][label]}",
              file=sys.stderr, flush=True)

    for label, rows, sq, sk, heads, dh, backends in ROUTING_CASES:
        rng = np.random.RandomState(1)
        d = heads * dh
        q = jnp.asarray(rng.randn(rows, sq, d).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(rows, sk, d).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        row = {}
        for be in backends:
            try:
                call = jax.jit(lambda q, k, be=be: multi_head_attention(
                    q, k, k, heads=heads, backend=be))
                row[be] = round(bench(call, q, k), 3)
            except Exception as e:  # noqa: BLE001 — record and move on
                row[be] = f"FAILED: {type(e).__name__}"
        res["shard_routing"][label] = row
        print(f"[probe] routing {label}: {row}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "round-5 attention A/B: splitkv vs concat (ms/call) + "
                  "per-chip shard-shape backend routing (ms/call)",
        **res,
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main()
