"""DDIM forward/inverse steps as pure functions.

Replaces diffusers ``DDIMScheduler.step`` / ``DDIMInverseScheduler.step`` used
by the reference (see ``i2vgen-xl/run_group_ddim_inversion.py:92-100``, the
vendored ``consisti2v/ddim_inverse_scheduler.py:291-373``, and SEINE's
hand-rolled mu/sigma update at ``seine/run_ddim_inversion.py:162-178``).

Scan-body friendly: timesteps are traced int32 scalars, alphas are gathered
from the schedule arrays, and all arithmetic is fp32 regardless of latent
dtype (the reference inverts in fp16 and tolerates drift; fp32 scheduler math
protects reconstruction PSNR — SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, to_x0_and_eps


def ddim_transfer(
    schedule: DiffusionSchedule,
    sample: jax.Array,
    model_output: jax.Array,
    t_alpha: jax.Array,
    t_to: jax.Array,
) -> jax.Array:
    """Deterministic DDIM map between noise levels.

    Extract (x0, eps) from ``sample`` using alpha_bar(``t_alpha``), then
    re-compose at alpha_bar(``t_to``)::

        x' = sqrt(a_to) * x0 + sqrt(1 - a_to) * eps

    Both directions use this single primitive:

    - sampling: ``t_alpha`` = current timestep, ``t_to`` = previous (smaller)
      grid value (possibly < 0 -> final_alpha_cumprod), per diffusers
      ``DDIMScheduler.step`` with eta = 0.
    - inversion: diffusers ``DDIMInverseScheduler.step`` evaluates the UNet at
      the *target* ascending grid value t but extracts x0 with alpha at the
      *source* level ``t - num_train//num_steps`` (< 0 on the first step ->
      initial/final_alpha_cumprod); so ``t_alpha`` = source, ``t_to`` = t.
    """
    x0, eps = to_x0_and_eps(schedule, sample, model_output, t_alpha)
    a_to = schedule.alpha_bar(t_to)
    out = jnp.sqrt(a_to) * x0 + jnp.sqrt(1.0 - a_to) * eps
    return out.astype(sample.dtype)


def ddim_step(
    schedule: DiffusionSchedule,
    sample: jax.Array,
    model_output: jax.Array,
    timestep: jax.Array,
    prev_timestep: jax.Array,
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """One DDIM sampling step x_t -> x_{t_prev} (t_prev < t, may be < 0).

    Equivalent to diffusers ``DDIMScheduler.step``. The reference wraps this
    in per-step ``b c f h w <-> (b f) c h w`` reshapes
    (``pipeline_i2vgen_xl.py:862-871``) — mathematically elementwise, so no
    reshape is needed here.
    """
    if eta == 0.0:
        return ddim_transfer(schedule, sample, model_output, timestep, prev_timestep)

    x0, eps = to_x0_and_eps(schedule, sample, model_output, timestep)
    a_t = schedule.alpha_bar(timestep)
    a_prev = schedule.alpha_bar(prev_timestep)
    variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
    sigma = eta * jnp.sqrt(variance)
    if noise is None:
        raise ValueError("eta > 0 requires noise")
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * eps
    prev = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise.astype(jnp.float32)
    return prev.astype(sample.dtype)


def ddim_inverse_step(
    schedule: DiffusionSchedule,
    sample: jax.Array,
    model_output: jax.Array,
    timestep: jax.Array,
    num_inference_steps: int,
) -> jax.Array:
    """One DDIM inversion step onto the ascending grid value ``timestep``.

    Matches diffusers ``DDIMInverseScheduler.step``: the UNet was evaluated at
    ``timestep`` (the target), x0-extraction uses the source level
    ``timestep - num_train_timesteps // num_inference_steps`` (clipped to
    < num_train; negative on the first step -> initial alpha_cumprod).
    """
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    t_src = jnp.minimum(
        jnp.asarray(timestep, jnp.int32) - step_ratio, schedule.num_train_timesteps - 1
    )
    return ddim_transfer(schedule, sample, model_output, t_src, timestep)
