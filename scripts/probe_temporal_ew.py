"""On-TPU A/B: elementwise-product temporal kernel vs the routed strided
kernel at the production temporal shapes. Development tool; results recorded
in PERF.md."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from anyv2v_tpu.ops.pallas_short_attention import short_attention_frames
from anyv2v_tpu.ops.pallas_temporal_ew import temporal_ew_attention


def timed(fn, *args, reps=10, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    run_s = (time.perf_counter() - t0) / reps
    print(f"  {label:46s} compile+1 {compile_s:7.2f}s   run {run_s*1e3:9.3f} ms",
          flush=True)
    return out, run_s


def mk(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape) * 0.3,
                       jnp.bfloat16)


CASES = [
    # label, b, s, sk, hw, heads, dh, bias
    ("i2vgen L0 invert", 1, 16, 16, 4096, 64, 8, False),
    ("i2vgen L0 edit b=3", 3, 16, 16, 4096, 64, 8, False),
    ("i2vgen L1", 1, 16, 16, 1024, 64, 16, False),
    ("i2vgen L1 edit b=3", 3, 16, 16, 1024, 64, 16, False),
    ("i2vgen L2", 1, 16, 16, 256, 64, 32, False),
    ("consisti2v aug (sk=24, dh=40)", 2, 16, 24, 4096, 8, 40, False),
    ("consisti2v aug L1 (C=640)", 2, 16, 24, 1024, 8, 80, False),
    ("seine T5-bias (dh=40)", 2, 16, 16, 4096, 8, 40, True),
    ("videoldm wide (dh=160)", 2, 16, 16, 256, 8, 160, False),
]


def main():
    import os

    names = sys.argv[1:]
    for (label, b, s, sk, hw, heads, dh, use_bias) in CASES:
        if names and not any(n in label for n in names):
            continue
        c = heads * dh
        q = mk((b, s, hw, c), 1)
        k = mk((b, sk, hw, c), 2)
        v = mk((b, sk, hw, c), 3)
        bias = (jnp.asarray(np.random.RandomState(4).randn(heads, s, sk) * .5,
                            jnp.float32) if use_bias else None)
        scale = 1.0 / float(np.sqrt(dh))
        print(f"{label}: b={b} s={s} sk={sk} hw={hw} heads={heads} dh={dh}")
        # Pin the baseline to the strided kernel: the auto router sends the
        # headline shapes (head_dim<=8, hw>=4096) to the ew kernel itself, so
        # an unpinned baseline would A/B the ew kernel against itself.
        prev = os.environ.get("ANYV2V_TEMPORAL_VARIANT")
        os.environ["ANYV2V_TEMPORAL_VARIANT"] = "strided"
        try:
            f_str = jax.jit(lambda q, k, v: short_attention_frames(
                q, k, v, heads=heads, scale=scale, bias=bias))
            o1, t1 = timed(f_str, q, k, v, label="strided/packed (pinned)")
        finally:
            if prev is None:
                os.environ.pop("ANYV2V_TEMPORAL_VARIANT", None)
            else:
                os.environ["ANYV2V_TEMPORAL_VARIANT"] = prev
        f_ew = jax.jit(lambda q, k, v: temporal_ew_attention(
            q, k, v, heads=heads, scale=scale, bias=bias))
        o2, t2 = timed(f_ew, q, k, v, label="elementwise ew")
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                    - o2.astype(jnp.float32))))
        print(f"  maxdiff {err:.4f}   speedup {t1/t2:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
