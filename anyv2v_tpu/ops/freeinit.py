"""FreeInit spectral noise re-initialization (ConsistI2V ``use_frameinit``).

Reference: ``consisti2v/consisti2v/utils/frameinit_utils.py`` —
``freq_mix_3d`` (:7-32) blends the low frequencies of a diffused ground-truth
latent with the high frequencies of fresh noise via a 3D FFT over (F, H, W);
filter builders at :35-141. Used by the editing pipeline at
``pipeline_video_editing.py:208-227, 623-633``.

Layout here is channels-last video [B, F, H, W, C]; the FFT axes are (1,2,3).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def freq_mix_3d(x: jax.Array, noise: jax.Array, low_pass_filter: jax.Array) -> jax.Array:
    """low-frequency(x) + high-frequency(noise), FFT over (F, H, W).

    ``low_pass_filter``: [F, H, W] in [0, 1], broadcast over batch/channel.
    """
    lpf = low_pass_filter[None, :, :, :, None]
    axes = (1, 2, 3)
    x_freq = jnp.fft.fftshift(jnp.fft.fftn(x.astype(jnp.float32), axes=axes), axes=axes)
    noise_freq = jnp.fft.fftshift(jnp.fft.fftn(noise.astype(jnp.float32), axes=axes), axes=axes)

    mixed = x_freq * lpf + noise_freq * (1.0 - lpf)
    mixed = jnp.fft.ifftn(jnp.fft.ifftshift(mixed, axes=axes), axes=axes).real
    return mixed.astype(x.dtype)


def _normalized_grid(shape):
    """Coordinates in [-1, 1] per axis for a centered (fftshifted) spectrum."""
    f, h, w = shape
    fs = (np.arange(f) * 2.0 / f - 1.0) if f > 1 else np.zeros(1)
    hs = np.arange(h) * 2.0 / h - 1.0
    ws = np.arange(w) * 2.0 / w - 1.0
    return np.meshgrid(fs, hs, ws, indexing="ij")


def gaussian_low_pass_filter(shape, d_s: float = 0.25, d_t: float = 0.25) -> np.ndarray:
    """Matches reference ``gaussian_low_pass_filter`` (frameinit_utils.py:35-62)."""
    f, h, w = shape
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, dtype=np.float32)
    gf, gh, gw = _normalized_grid(shape)
    d_square = ((gf / d_t) ** 2 + (gh / d_s) ** 2 + (gw / d_s) ** 2)
    return np.exp(-0.5 * d_square).astype(np.float32)


def ideal_low_pass_filter(shape, d_s: float = 0.25, d_t: float = 0.25) -> np.ndarray:
    gf, gh, gw = _normalized_grid(shape)
    d_square = ((gf / d_t) ** 2 + (gh / d_s) ** 2 + (gw / d_s) ** 2)
    return (d_square <= 1.0).astype(np.float32)


def butterworth_low_pass_filter(shape, n: int = 4, d_s: float = 0.25, d_t: float = 0.25) -> np.ndarray:
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, dtype=np.float32)
    gf, gh, gw = _normalized_grid(shape)
    d_square = ((gf / d_t) ** 2 + (gh / d_s) ** 2 + (gw / d_s) ** 2)
    return (1.0 / (1.0 + d_square**n)).astype(np.float32)


def box_low_pass_filter(shape, d_s: float = 0.25, d_t: float = 0.25) -> np.ndarray:
    f, h, w = shape
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, dtype=np.float32)
    filt = np.zeros(shape, dtype=np.float32)
    cf, ch, cw = f // 2, h // 2, w // 2
    tf, th, tw = (
        max(1, math.ceil(f * d_t / 2)),
        max(1, math.ceil(h * d_s / 2)),
        max(1, math.ceil(w * d_s / 2)),
    )
    filt[max(0, cf - tf) : cf + tf, max(0, ch - th) : ch + th, max(0, cw - tw) : cw + tw] = 1.0
    return filt


FILTERS = {
    "gaussian": gaussian_low_pass_filter,
    "ideal": ideal_low_pass_filter,
    "box": box_low_pass_filter,
    "butterworth": butterworth_low_pass_filter,
}
