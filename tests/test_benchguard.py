"""Bench sync + plausibility guards (VERDICT r4 item 2).

The round-4 corrupt artifact (ConsistI2V ``edit_s: 0.047`` — 50 steps in
47 ms) must be provably rejected by the guard, and the hard sync must both
complete real computations and surface non-finite outputs."""

import numpy as np
import pytest

import jax.numpy as jnp

from anyv2v_tpu.utils.benchguard import (MIN_UNET_STEP_S, check_scan_time,
                                         hard_sync)


def test_check_scan_time_rejects_the_round4_artifact():
    # the exact shipped failure: a 10-step measured leg of 9.4 ms projected
    # to edit_s 0.047 for 50 steps
    with pytest.raises(RuntimeError, match="implausible"):
        check_scan_time("consisti2v edit", 0.0094, 10)
    with pytest.raises(RuntimeError, match="implausible"):
        check_scan_time("consisti2v edit", 0.047, 50)


def test_check_scan_time_accepts_real_timings():
    # slowest and fastest real per-step costs in the tree (PERF.md):
    # i2vgen edit 1.79 s/step, seine invert ~0.16 s/step
    assert check_scan_time("edit", 17.9, 10) == 17.9
    assert check_scan_time("invert", 3.2, 20) == 3.2
    # exactly at the floor passes (floor is exclusive)
    assert check_scan_time("x", 10 * MIN_UNET_STEP_S, 10) > 0


def test_hard_sync_returns_dependent_scalar_and_flags_nonfinite():
    x = {"a": jnp.ones((4, 4), jnp.float32), "b": jnp.full((2,), 3.0)}
    val = hard_sync(x)
    assert np.isclose(val, 1.0 + 3.0)

    bad = (jnp.ones((3,)), jnp.asarray([np.inf], jnp.float32))
    with pytest.raises(FloatingPointError):
        hard_sync(bad)


def test_hard_sync_handles_scalars_and_empty_trees():
    assert hard_sync(jnp.float32(2.5)) == pytest.approx(2.5)
    assert hard_sync(()) == 0.0
    assert hard_sync({"ts": jnp.arange(4, dtype=jnp.int32)}) == pytest.approx(1.5)
