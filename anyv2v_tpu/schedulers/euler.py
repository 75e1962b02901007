"""Euler-family schedulers as pure functions (first-frame editing stage).

Replaces the diffusers scheduler objects used by the reference's first-frame
image editors (SURVEY.md §2.4/§2.7):

- ``EulerAncestralDiscreteScheduler`` — InstructPix2Pix / MagicBrush
  (``black_box_image_edit/instructpix2pix.py:28-29``);
- ``EDMEulerScheduler`` with the patched log-spaced ``set_timesteps`` —
  CosXL (``black_box_image_edit/cosxl_edit.py:20-29``,
  ``black_box_image_edit/cosxl/utils.py:5-17``: sigma 0.002-120,
  v-prediction, sigma_data 1.0).

Design: the sigma grid is host-side numpy (computed once per run); the step
functions are scan-body friendly (traced step index gathers from the sigma
array; fp32 math).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule


# ---------------------------------------------------------------------------
# Euler-Ancestral (discrete, eps-prediction) — InstructPix2Pix
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EulerAncestralGrid:
    """Precomputed sigma/timestep grid (diffusers
    ``EulerAncestralDiscreteScheduler.set_timesteps``, "linspace" spacing)."""

    sigmas: np.ndarray      # [n_steps + 1], descending, last element 0
    timesteps: np.ndarray   # [n_steps] float (fractional under linspace)

    @property
    def init_noise_sigma(self) -> float:
        return float(np.sqrt(self.sigmas.max() ** 2 + 1.0))


def euler_ancestral_grid(schedule: DiffusionSchedule, num_steps: int) -> EulerAncestralGrid:
    T = schedule.num_train_timesteps
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sigmas_full = np.sqrt((1.0 - abar) / abar)
    timesteps = np.linspace(0, T - 1, num_steps, dtype=np.float64)[::-1].copy()
    sigmas = np.interp(timesteps, np.arange(T), sigmas_full)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return EulerAncestralGrid(sigmas=sigmas, timesteps=timesteps.astype(np.float32))


def euler_scale_model_input(sample: jax.Array, sigma: jax.Array) -> jax.Array:
    """latent / sqrt(sigma^2 + 1) (diffusers ``scale_model_input``)."""
    return (sample / jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def euler_ancestral_step(
    sample: jax.Array,        # fp32 latent at sigma_from
    model_output: jax.Array,  # eps prediction
    sigma_from: jax.Array,
    sigma_to: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """diffusers ``EulerAncestralDiscreteScheduler.step`` (epsilon)."""
    sample = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    pred_x0 = sample - sigma_from * eps
    sigma_up = jnp.sqrt(
        sigma_to**2 * (sigma_from**2 - sigma_to**2) / jnp.maximum(sigma_from**2, 1e-20)
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    derivative = (sample - pred_x0) / jnp.maximum(sigma_from, 1e-20)
    dt = sigma_down - sigma_from
    return sample + derivative * dt + noise.astype(jnp.float32) * sigma_up


# ---------------------------------------------------------------------------
# EDM Euler (continuous sigma, v-prediction) — CosXL
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EDMGrid:
    """CosXL's patched grid (``cosxl/utils.py:5-17``): log-spaced sigmas from
    sigma_max down to sigma_min, plus terminal 0."""

    sigmas: np.ndarray      # [n_steps + 1], descending, last element 0
    sigma_data: float = 1.0

    @property
    def init_noise_sigma(self) -> float:
        """diffusers ``EDMEulerScheduler.init_noise_sigma`` =
        sqrt(sigma_max^2 + 1); combined with precondition_inputs this makes
        the first scaled model input ~unit variance."""
        return float((self.sigmas.max() ** 2 + 1.0) ** 0.5)

    def timestep(self, sigma: jax.Array) -> jax.Array:
        """``precondition_noise``: t = 0.25 * ln(sigma)."""
        return 0.25 * jnp.log(sigma)


def edm_grid(num_steps: int, sigma_min: float = 0.002, sigma_max: float = 120.0,
             sigma_data: float = 1.0) -> EDMGrid:
    sigmas = np.exp(np.linspace(np.log(sigma_min), np.log(sigma_max), num_steps))[::-1]
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return EDMGrid(sigmas=sigmas, sigma_data=sigma_data)


def edm_scale_model_input(sample: jax.Array, sigma: jax.Array,
                          sigma_data: float = 1.0) -> jax.Array:
    """``precondition_inputs``: c_in = 1/sqrt(sigma^2 + sigma_data^2)."""
    return (sample / jnp.sqrt(sigma**2 + sigma_data**2)).astype(sample.dtype)


def edm_step_v(
    sample: jax.Array,        # fp32 latent at sigma_from
    model_output: jax.Array,  # v-prediction (raw network output)
    sigma_from: jax.Array,
    sigma_to: jax.Array,
    sigma_data: float = 1.0,
) -> jax.Array:
    """diffusers ``EDMEulerScheduler.step`` with prediction_type
    "v_prediction": denoised = c_skip * x + c_out * F(x); Euler update."""
    sample = sample.astype(jnp.float32)
    v = model_output.astype(jnp.float32)
    s2 = sigma_from**2 + sigma_data**2
    c_skip = sigma_data**2 / s2
    c_out = -sigma_from * sigma_data / jnp.sqrt(s2)
    denoised = c_skip * sample + c_out * v
    derivative = (sample - denoised) / jnp.maximum(sigma_from, 1e-20)
    return sample + derivative * (sigma_to - sigma_from)


def euler_discrete_grid(schedule: DiffusionSchedule, num_steps: int,
                        spacing: str = "leading",
                        steps_offset: int = 1) -> EulerAncestralGrid:
    """diffusers ``EulerDiscreteScheduler.set_timesteps`` — the SDXL default
    scheduler (InstantStyle generation path). "leading" spacing with
    steps_offset 1 (the SDXL scheduler config)."""
    T = schedule.num_train_timesteps
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sigmas_full = np.sqrt((1.0 - abar) / abar)
    if spacing == "leading":
        ratio = T // num_steps
        timesteps = (np.arange(num_steps) * ratio).round()[::-1].astype(np.float64)
        timesteps += steps_offset
    else:
        timesteps = np.linspace(0, T - 1, num_steps, dtype=np.float64)[::-1].copy()
    sigmas = np.interp(timesteps, np.arange(T), sigmas_full)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return EulerAncestralGrid(sigmas=sigmas, timesteps=timesteps.astype(np.float32))


def euler_discrete_step(
    sample: jax.Array,
    model_output: jax.Array,   # eps prediction
    sigma_from: jax.Array,
    sigma_to: jax.Array,
) -> jax.Array:
    """Deterministic Euler step (diffusers ``EulerDiscreteScheduler.step``)."""
    sample = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    pred_x0 = sample - sigma_from * eps
    derivative = (sample - pred_x0) / jnp.maximum(sigma_from, 1e-20)
    return sample + derivative * (sigma_to - sigma_from)
