"""DDPM ancestral sampling step as a pure function.

Replaces diffusers ``DDPMScheduler.step`` — the SEINE edit path's default
sampler (reference ``seine/run_pnp_edit.py:94-102``,
``seine/configs/pnp_edit.yaml:29``; cache lookup shifted to t+1 at
``run_pnp_edit.py:180`` is a pipeline concern, handled there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, to_x0_and_eps


def ddpm_step(
    schedule: DiffusionSchedule,
    sample: jax.Array,
    model_output: jax.Array,
    timestep: jax.Array,
    prev_timestep: jax.Array,
    noise: jax.Array,
    variance_type: str = "fixed_small",
) -> jax.Array:
    """One ancestral DDPM step x_t -> x_{t_prev}.

    Generalized to strided grids the way diffusers does (alpha ratio between
    grid neighbours). ``noise`` must be standard normal of ``sample``'s shape;
    it is ignored on the final step (t_prev < 0) exactly like diffusers (no
    noise added at t == 0).
    """
    x0, _ = to_x0_and_eps(schedule, sample, model_output, timestep)
    x = sample.astype(jnp.float32)

    a_t = schedule.alpha_bar(timestep)
    a_prev = schedule.alpha_bar(prev_timestep)
    beta_prod_t = 1.0 - a_t
    beta_prod_t_prev = 1.0 - a_prev
    current_alpha_t = a_t / a_prev
    current_beta_t = 1.0 - current_alpha_t

    # posterior mean coefficients (DDPM eq. 7)
    pred_x0_coeff = (jnp.sqrt(a_prev) * current_beta_t) / beta_prod_t
    current_sample_coeff = jnp.sqrt(current_alpha_t) * beta_prod_t_prev / beta_prod_t
    mean = pred_x0_coeff * x0 + current_sample_coeff * x

    # posterior variance
    variance = beta_prod_t_prev / beta_prod_t * current_beta_t
    if variance_type == "fixed_small":
        variance = jnp.clip(variance, min=1e-20)
    elif variance_type == "fixed_small_log":
        variance = jnp.exp(0.5 * jnp.log(jnp.clip(variance, min=1e-20))) ** 2
    elif variance_type == "fixed_large":
        variance = current_beta_t
    else:
        raise ValueError(f"unsupported variance_type: {variance_type}")

    is_final = prev_timestep < 0
    sigma = jnp.where(is_final, 0.0, jnp.sqrt(variance))
    out = mean + sigma * noise.astype(jnp.float32)
    return out.astype(sample.dtype)
