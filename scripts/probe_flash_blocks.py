"""Block-size sweep for the generic flash kernel at the VideoLDM/SEINE
spatial self-attention shapes (heads=8, dh=40, sq=sk=4096 and the
ff-concat sk=8192 class) — _flash_bhsd is called directly so block_q /
block_k come from the sweep, not the wrapper's defaults (512/512, halved
at long K/V).

Usage: python scripts/probe_flash_blocks.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = [
    # label, bh, sq, sk, d
    ("seine_L0_self", 16 * 8, 4096, 4096, 40),
    ("videoldm_L0_ffcat", 15 * 8, 4096, 8192, 40),
    ("L1_self", 16 * 8, 1024, 1024, 80),
]
BLOCKS = [(256, 512), (512, 512), (1024, 512), (512, 1024), (256, 1024),
          (1024, 1024), (2048, 512)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from anyv2v_tpu.utils.compile_cache import enable as _enable
    _enable()

    import jax.numpy as jnp

    from anyv2v_tpu.ops.pallas_attention import _flash_bhsd
    from anyv2v_tpu.utils.benchguard import hard_sync
    import jax

    res = {}
    for label, bh, sq, sk, d in CASES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(bh, sq, d).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(bh, sk, d).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        row = {}
        for bq, bk in BLOCKS:
            if bq > sq or bk > sk:
                continue
            try:
                out = _flash_bhsd(q, k, k, None, 1.0 / np.sqrt(d), bq, bk,
                                  sk, False)
                hard_sync(out)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = _flash_bhsd(q, k, k, None, 1.0 / np.sqrt(d), bq,
                                      bk, sk, False)
                hard_sync(out)
                row[f"bq{bq}_bk{bk}"] = round(
                    (time.perf_counter() - t0) / args.iters * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                row[f"bq{bq}_bk{bk}"] = f"FAILED: {type(e).__name__}"
            print(f"[blocks] {label} bq{bq}/bk{bk}: {row[f'bq{bq}_bk{bk}']}",
                  file=sys.stderr, flush=True)
        res[label] = row
    print(json.dumps({"metric": "flash block-size sweep (ms/call)",
                      "cases": res, "device": str(jax.devices()[0])},
                     indent=1))


if __name__ == "__main__":
    main()
