"""Diffusion noise schedules and timestep grids as pure data.

Replaces the stateful diffusers scheduler objects used by the reference
(diffusers ``DDIMScheduler`` / ``DDIMInverseScheduler`` / ``DDPMScheduler``;
see reference ``i2vgen-xl/run_group_ddim_inversion.py:92-100`` and the vendored
``consisti2v/ddim_inverse_scheduler.py``) with an immutable schedule pytree and
pure stepping functions (``ddim.py`` / ``ddpm.py``).

All schedule math is float32 regardless of the model compute dtype: DDIM
inversion drift is the main PSNR risk (SURVEY.md §7 "hard parts"), so
alphas/betas never drop below fp32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Beta schedules
# ---------------------------------------------------------------------------


def linear_betas(num_train_timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)


def scaled_linear_betas(num_train_timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    """The Stable-Diffusion-family schedule: linear in sqrt(beta)."""
    return (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    )


def squaredcos_cap_v2_betas(num_train_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Glide/cosine schedule: beta_t = 1 - alpha_bar(t+1)/alpha_bar(t), capped.

    Matches ``betas_for_alpha_bar`` vendored in the reference at
    ``consisti2v/ddim_inverse_scheduler.py:49``.
    """

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_train_timesteps):
        t1 = i / num_train_timesteps
        t2 = (i + 1) / num_train_timesteps
        betas.append(min(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the final alphas_cumprod is exactly 0 (zero terminal SNR).

    Mirrors the algorithm vendored in the reference at
    ``consisti2v/ddim_inverse_scheduler.py:94`` (arXiv:2305.08891 eq. in-text).
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].copy()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].copy()

    # Shift so the last timestep is zero, then scale so the first is unchanged.
    alphas_bar_sqrt = alphas_bar_sqrt - alphas_bar_sqrt_T
    alphas_bar_sqrt = alphas_bar_sqrt * alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


_BETA_BUILDERS = {
    "linear": linear_betas,
    "scaled_linear": scaled_linear_betas,
}

# ---------------------------------------------------------------------------
# Schedule pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable noise schedule. Array fields are fp32 device arrays; the rest
    is static metadata (hashable, safe as a jit static arg via closure)."""

    # arrays
    betas: jax.Array
    alphas_cumprod: jax.Array
    # static
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))
    timestep_spacing: str = dataclasses.field(metadata=dict(static=True))
    steps_offset: int = dataclasses.field(metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(metadata=dict(static=True))
    clip_sample_range: float = dataclasses.field(metadata=dict(static=True))
    thresholding: bool = dataclasses.field(metadata=dict(static=True))
    set_alpha_to_one: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def final_alpha_cumprod(self) -> jax.Array:
        """alpha_bar used for t < 0 in DDIM (diffusers ``set_alpha_to_one``)."""
        if self.set_alpha_to_one:
            return jnp.float32(1.0)
        return self.alphas_cumprod[0]

    def alpha_bar(self, t: jax.Array) -> jax.Array:
        """alphas_cumprod[t] with t < 0 mapping to final_alpha_cumprod.

        ``t`` may be a traced int array (scan carry) — uses gather + where.
        """
        t = jnp.asarray(t, jnp.int32)
        safe_t = jnp.clip(t, 0, self.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod)


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "epsilon",
    timestep_spacing: str = "leading",
    steps_offset: int = 1,
    clip_sample: bool = False,
    clip_sample_range: float = 1.0,
    thresholding: bool = False,
    rescale_betas_zero_snr: bool = False,
    set_alpha_to_one: bool = False,
    trained_betas=None,
) -> DiffusionSchedule:
    """Build a schedule with diffusers-compatible semantics.

    Defaults match the SD-family configs the reference backbones ship with
    (scaled_linear 0.00085..0.012, leading spacing, steps_offset 1).
    """
    if trained_betas is not None:
        betas = np.asarray(trained_betas, dtype=np.float64)
    elif beta_schedule == "squaredcos_cap_v2":
        betas = squaredcos_cap_v2_betas(num_train_timesteps)
    elif beta_schedule in _BETA_BUILDERS:
        betas = _BETA_BUILDERS[beta_schedule](num_train_timesteps, beta_start, beta_end)
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")

    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)

    alphas_cumprod = np.cumprod(1.0 - betas)

    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        timestep_spacing=timestep_spacing,
        steps_offset=steps_offset,
        clip_sample=clip_sample,
        clip_sample_range=clip_sample_range,
        thresholding=thresholding,
        set_alpha_to_one=set_alpha_to_one,
    )


# ---------------------------------------------------------------------------
# Timestep grids (host-side numpy; grids are static under jit)
# ---------------------------------------------------------------------------


def sampling_timesteps(schedule: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending integer timesteps for sampling (diffusers DDIMScheduler.set_timesteps).

    With defaults (leading, offset 1, 1000 train steps): 50 steps ->
    [981, 961, ..., 1]; 500 steps -> [999, 997, ..., 1]. The reference relies
    on the 50-step grid being a subset of the 500-step inversion grid
    (SURVEY.md §2.7).
    """
    n_train = schedule.num_train_timesteps
    if num_inference_steps > n_train:
        raise ValueError(f"num_inference_steps {num_inference_steps} > {n_train}")
    spacing = schedule.timestep_spacing
    if spacing == "linspace":
        ts = np.linspace(0, n_train - 1, num_inference_steps).round()[::-1].astype(np.int64)
    elif spacing == "leading":
        step_ratio = n_train // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts += schedule.steps_offset
    elif spacing == "trailing":
        step_ratio = n_train / num_inference_steps
        ts = np.round(np.arange(n_train, 0, -step_ratio)).astype(np.int64)
        ts -= 1
    else:
        raise ValueError(f"unknown timestep_spacing: {spacing}")
    return ts.copy()


def inversion_timesteps(schedule: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """Ascending integer timesteps for DDIM inversion
    (diffusers DDIMInverseScheduler.set_timesteps semantics).

    With defaults (leading, offset 1): 500 steps -> [1, 3, ..., 999].
    """
    n_train = schedule.num_train_timesteps
    spacing = schedule.timestep_spacing
    if spacing == "linspace":
        ts = np.linspace(0, n_train - 1, num_inference_steps).round().astype(np.int64)
    elif spacing == "leading":
        step_ratio = n_train // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)
        ts += schedule.steps_offset
    elif spacing == "trailing":
        step_ratio = n_train / num_inference_steps
        ts = np.round(np.arange(n_train, 0, -step_ratio))[::-1].astype(np.int64)
        ts -= 1
    else:
        raise ValueError(f"unknown timestep_spacing: {spacing}")
    return ts.copy()


# ---------------------------------------------------------------------------
# Prediction-type conversions (shared by DDIM/DDPM steppers)
# ---------------------------------------------------------------------------


def to_x0_and_eps(
    schedule: DiffusionSchedule,
    sample: jax.Array,
    model_output: jax.Array,
    t: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Convert a model output under ``prediction_type`` to (pred_x0, pred_eps).

    Math in fp32; callers cast back as needed.
    """
    x = sample.astype(jnp.float32)
    out = model_output.astype(jnp.float32)
    a_t = schedule.alpha_bar(t)
    sqrt_a = jnp.sqrt(a_t)
    sqrt_1ma = jnp.sqrt(1.0 - a_t)

    p = schedule.prediction_type
    if p == "epsilon":
        x0 = (x - sqrt_1ma * out) / sqrt_a
        eps = out
    elif p == "sample":
        x0 = out
        eps = (x - sqrt_a * x0) / sqrt_1ma
    elif p == "v_prediction":
        x0 = sqrt_a * x - sqrt_1ma * out
        eps = sqrt_a * out + sqrt_1ma * x
    else:
        raise ValueError(f"unknown prediction_type: {p}")

    if schedule.clip_sample:
        x0 = jnp.clip(x0, -schedule.clip_sample_range, schedule.clip_sample_range)
        # re-derive eps from the clipped x0 (diffusers does this implicitly in DDPM)
        eps = (x - sqrt_a * x0) / sqrt_1ma
    return x0, eps


def add_noise(
    schedule: DiffusionSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward diffusion q(x_t | x_0) sample (diffusers ``add_noise``)."""
    a_t = schedule.alpha_bar(t)
    return (jnp.sqrt(a_t) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - a_t) * noise.astype(jnp.float32)).astype(x0.dtype)
