"""Benchmark synchronization + plausibility guards.

Round-4 shipped a corrupt artifact (BENCH_BACKBONES.json ConsistI2V
``edit_s: 0.047`` — a 50-step, 3-row-CFG, 16f 512^2 edit "measured" in 47 ms)
because the sync helper read back ONE element of ONE output leaf: over the
axon tunnel a bare ``block_until_ready`` — and even a single-buffer readback —
has been observed to return before the whole computation drains.  Two fixes,
both mandatory for every recorded number:

1. :func:`hard_sync` pushes a *dependent scalar* through EVERY output leaf:
   it dispatches one mean-reduction per leaf on the device (TPU execution is
   serialized per device, so the reductions cannot run until the producing
   computation finishes) and reads the summed scalar back to the host.  The
   transfer is one float regardless of output size, so the sync cost stays
   negligible on the multi-second legs being timed.  The scalar is also the
   finiteness witness — callers get NaN/Inf detection for free.

2. :func:`check_scan_time` rejects physically impossible timings: a measured
   scan leg must cost at least ``n_steps * min_step_s``.  The floor is set
   ~10x below any attainable per-step time for the guarded workloads (a
   16f 512^2 UNet forward is >4 TFLOP even at batch 1 — far above 10 ms at
   v5e peak with zero overhead), so a trip can only mean a broken sync.
"""

from __future__ import annotations

import math

import numpy as np

# Conservative per-step wall-clock floor for one 16f 512^2 video-UNet forward
# (any backbone, any batch).  The cheapest real step ever measured in this
# tree is ~0.16 s (SEINE invert, PERF.md); v5e peak would need >20 ms for the
# FLOPs alone.  10 ms catches the observed failure (0.9 ms/step) with a full
# order of magnitude on each side.
MIN_UNET_STEP_S = 0.010


def hard_sync(x) -> float:
    """Force completion of every array leaf in ``x``; return the dependent
    scalar (sum of per-leaf fp32 means) and raise on non-finite outputs."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype") and hasattr(l, "shape")]
    if not leaves:
        return 0.0
    # One tiny reduction per leaf, dispatched behind the producing program on
    # the device stream; float() blocks until all of them (and therefore the
    # producer) have executed.
    total = None
    for leaf in leaves:
        m = jnp.mean(leaf.astype(jnp.float32)) if leaf.ndim else \
            leaf.astype(jnp.float32)
        total = m if total is None else total + m
    val = float(np.asarray(jax.device_get(total)))
    if not math.isfinite(val):
        raise FloatingPointError(
            f"hard_sync: non-finite output (leaf-mean sum = {val})")
    return val


def check_scan_time(label: str, measured_s: float, n_steps: int,
                    min_step_s: float = MIN_UNET_STEP_S) -> float:
    """Assert a measured scan wall-clock is physically plausible.

    Returns ``measured_s`` so it can be used inline.  Raises ``RuntimeError``
    when the timing is below ``n_steps * min_step_s`` — the signature of a
    sync that returned before the device drained (see module docstring)."""
    floor = n_steps * min_step_s
    if measured_s < floor:
        raise RuntimeError(
            f"implausible timing for {label}: measured {measured_s:.4f}s for "
            f"{n_steps} steps, below the {floor:.3f}s physical floor "
            f"({min_step_s*1e3:.0f} ms/step); the sync likely returned before "
            f"the device drained — do not record this number")
    return measured_s
