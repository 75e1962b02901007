"""Scheduler numerics tests.

The reference has no tests (SURVEY.md §4); its implicit oracle is the DDIM
reconstruction round-trip (``run_group_ddim_inversion.py:157-192``). We test:
grid semantics match diffusers integer grids (hand-derived), exact round-trip
invertibility under a deterministic model, and hand-computed golden steps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.schedulers import (
    add_noise,
    ddim_inverse_step,
    ddim_step,
    ddim_transfer,
    ddpm_step,
    inversion_timesteps,
    make_schedule,
    sampling_timesteps,
    to_x0_and_eps,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule()  # SD-family defaults: scaled_linear, leading, offset 1


def test_sampling_grid_matches_reference_semantics(sched):
    # 50-step leading grid with offset 1: 981, 961, ..., 1
    ts = sampling_timesteps(sched, 50)
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    # 500-step inversion grid: 1, 3, ..., 999 (ascending odd)
    inv = inversion_timesteps(sched, 500)
    assert inv[0] == 1 and inv[-1] == 999 and len(inv) == 500
    # the editing grid must be a subset of the inversion grid (SURVEY.md §2.7):
    # this is why the reference inverts with 500 steps.
    assert set(ts.tolist()) <= set(inv.tolist())


def test_trailing_and_linspace_grids(sched):
    s_tr = make_schedule(timestep_spacing="trailing")
    ts = sampling_timesteps(s_tr, 50)
    assert ts[0] == 999 and len(ts) == 50
    s_ls = make_schedule(timestep_spacing="linspace")
    ts = sampling_timesteps(s_ls, 50)
    assert ts[0] == 999 and ts[-1] == 0


def test_betas_golden_values(sched):
    # scaled_linear endpoints: beta_0 = 0.00085, beta_-1 = 0.012 exactly
    betas = np.asarray(sched.betas)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    assert betas.shape == (1000,)
    a = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(a) < 0) and 0 < a[-1] < a[0] < 1


def test_zero_snr_rescale():
    s = make_schedule(rescale_betas_zero_snr=True)
    a = np.asarray(s.alphas_cumprod)
    assert abs(a[-1]) < 1e-10  # terminal SNR exactly zero
    base = make_schedule()
    np.testing.assert_allclose(a[0], np.asarray(base.alphas_cumprod)[0], rtol=1e-5)


def test_ddim_step_golden(sched):
    # hand-computed epsilon-pred DDIM step in float64
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4).astype(np.float32)
    eps = rng.randn(2, 3, 4).astype(np.float32)
    t, t_prev = 981, 961
    a = np.cumprod(1 - np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2)
    a_t, a_p = a[t], a[t_prev]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    got = ddim_step(sched, jnp.asarray(x), jnp.asarray(eps), jnp.int32(t), jnp.int32(t_prev))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_ddim_roundtrip_exact_inverse(sched):
    """With a model whose eps prediction is consistent (here: constant), the
    inverse step followed by the forward step must reproduce the input to
    float tolerance — the jitted analogue of the reference's reconstruction
    oracle."""
    x0 = jnp.asarray(np.random.RandomState(1).randn(1, 4, 8, 8), jnp.float32)
    eps = jnp.full_like(x0, 0.3)
    inv_grid = inversion_timesteps(sched, 500)
    # a few steps up then back down the same grid
    x = x0
    trajectory = [x]
    for i in range(5):
        t_src = jnp.int32(inv_grid[i] - 2 if i > 0 else -1)
        x = ddim_transfer(sched, x, eps, t_src, jnp.int32(inv_grid[i]))
        trajectory.append(x)
    for i in reversed(range(5)):
        t = jnp.int32(inv_grid[i])
        t_prev = jnp.int32(inv_grid[i] - 2 if i > 0 else -1)
        x = ddim_step(sched, x, eps, t, t_prev)
        np.testing.assert_allclose(np.asarray(x), np.asarray(trajectory[i]), rtol=1e-4, atol=1e-5)


def test_ddim_inverse_step_matches_transfer(sched):
    x = jnp.ones((2, 4), jnp.float32)
    eps = 0.5 * jnp.ones_like(x)
    got = ddim_inverse_step(sched, x, eps, jnp.int32(41), num_inference_steps=500)
    want = ddim_transfer(sched, x, eps, jnp.int32(39), jnp.int32(41))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    # first step: source level < 0 -> initial alpha (alphas_cumprod[0], since
    # set_alpha_to_one=False by default)
    got0 = ddim_inverse_step(sched, x, eps, jnp.int32(1), num_inference_steps=500)
    want0 = ddim_transfer(sched, x, eps, jnp.int32(-1), jnp.int32(1))
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0))


def test_prediction_types_consistent(sched):
    """epsilon / v / sample parameterizations of the same (x0, eps) pair must
    produce identical (x0, eps) via to_x0_and_eps."""
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(3, 5), jnp.float32)
    eps = jnp.asarray(rng.randn(3, 5), jnp.float32)
    t = jnp.int32(500)
    a = sched.alpha_bar(t)
    x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps
    v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0

    for pred_type, out in [("epsilon", eps), ("v_prediction", v), ("sample", x0)]:
        s = make_schedule(prediction_type=pred_type)
        got_x0, got_eps = to_x0_and_eps(s, x_t, out, t)
        np.testing.assert_allclose(np.asarray(got_x0), np.asarray(x0), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_eps), np.asarray(eps), rtol=1e-3, atol=1e-4)


def test_add_noise_roundtrip(sched):
    x0 = jnp.ones((2, 3), jnp.float32) * 2.0
    noise = jnp.ones_like(x0)
    t = jnp.int32(100)
    x_t = add_noise(sched, x0, noise, t)
    got_x0, _ = to_x0_and_eps(sched, x_t, noise, t)
    np.testing.assert_allclose(np.asarray(got_x0), np.asarray(x0), rtol=1e-5)


def test_ddpm_step_final_step_is_deterministic(sched):
    x = jnp.ones((2, 4), jnp.float32)
    eps = 0.1 * jnp.ones_like(x)
    noise = jnp.asarray(np.random.RandomState(3).randn(2, 4), jnp.float32)
    a = ddpm_step(sched, x, eps, jnp.int32(1), jnp.int32(-19), noise)
    b = ddpm_step(sched, x, eps, jnp.int32(1), jnp.int32(-19), noise * 100)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ddpm_step_mean_matches_hand_math(sched):
    rng = np.random.RandomState(4)
    x = rng.randn(2, 4).astype(np.float32)
    eps = rng.randn(2, 4).astype(np.float32)
    t, t_prev = 801, 781
    a = np.cumprod(1 - np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2)
    a_t, a_p = a[t], a[t_prev]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    cur_alpha = a_t / a_p
    cur_beta = 1 - cur_alpha
    mean = (np.sqrt(a_p) * cur_beta / (1 - a_t)) * x0 + (
        np.sqrt(cur_alpha) * (1 - a_p) / (1 - a_t)
    ) * x
    got = ddpm_step(
        sched, jnp.asarray(x), jnp.asarray(eps), jnp.int32(t), jnp.int32(t_prev),
        jnp.zeros_like(jnp.asarray(x)),
    )
    np.testing.assert_allclose(np.asarray(got), mean, rtol=2e-3, atol=1e-4)


def test_steps_jit_with_traced_timesteps(sched):
    """Steppers must be scan-compatible: traced int timesteps, one trace."""
    traces = []

    def step(x, t, t_prev):
        traces.append(1)
        return ddim_step(sched, x, 0.1 * x, t, t_prev)

    jstep = jax.jit(step)
    x = jnp.ones((2, 4), jnp.float32)
    jstep(x, jnp.int32(981), jnp.int32(961))
    jstep(x, jnp.int32(961), jnp.int32(941))
    assert len(traces) == 1

    def scan_fn(x, ts):
        def body(carry, t_pair):
            t, t_prev = t_pair
            return ddim_step(sched, carry, 0.1 * carry, t, t_prev), None

        return jax.lax.scan(body, x, ts)

    ts = jnp.stack([jnp.arange(981, 0, -20, dtype=jnp.int32),
                    jnp.arange(961, -20, -20, dtype=jnp.int32)], axis=1)
    out, _ = jax.jit(scan_fn)(x, ts)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
