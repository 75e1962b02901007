"""Plug-and-play feature injection as data.

The reference implements PnP by monkey-patching module forwards and mutating
batch slices in place (``i2vgen-xl/pnp_utils.py:109-115`` conv features,
``:189-196`` spatial attention Q/K, ``:295-302`` temporal attention Q/K):

    hidden[b:2b] = hidden[:b]   # source -> uncond
    hidden[2b:] = hidden[:b]    # source -> cond

Here injection is a traced boolean operand: one compiled graph covers both
injected and clean steps via a row-broadcast + ``jnp.where``. The per-step
boolean vectors are computed once from the ``pnp_*_t`` thresholds
(``run_group_pnp_edit.py:35-48``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def inject_source_rows(x: jax.Array, inject: jax.Array, num_chunks: int = 3) -> jax.Array:
    """Replace every batch chunk with the first (source) chunk when ``inject``.

    ``x``: [num_chunks * b, ...]; ``inject``: boolean scalar — traced (one
    compiled graph covers injected and clean steps; both where-operands are
    materialized every step) or a PYTHON bool (static-segment scan: the
    branch resolves at trace time, so clean steps carry zero injection
    traffic — see ``I2VGenPipeline.sample_with_pnp`` step grouping).

    Matches the reference's batch-thirds overwrite (generalized to the 2/3/4
    way CFG batches of ConsistI2V, ``pipeline_video_editing.py:1508-1551``).
    """
    if num_chunks == 1:
        return x
    b = x.shape[0] // num_chunks
    if b * num_chunks != x.shape[0]:
        raise ValueError(f"batch {x.shape[0]} not divisible by num_chunks {num_chunks}")
    if isinstance(inject, bool):
        if not inject:
            return x
        return jnp.tile(x[:b], (num_chunks,) + (1,) * (x.ndim - 1))
    src = jnp.tile(x[:b], (num_chunks,) + (1,) * (x.ndim - 1))
    return jnp.where(inject, src, x)


def injection_step_mask(
    timesteps: np.ndarray, threshold: float, num_inference_steps: int
) -> np.ndarray:
    """Boolean per-step injection mask from a ``pnp_*_t`` threshold.

    Reference semantics (``run_group_pnp_edit.py:35-48``): inject on the first
    ``int(num_inference_steps * threshold)`` entries of the *full* sampling
    grid. The reference additionally always injects at t == 1000
    (``pnp_utils.py:109``) — t never equals 1000 on the standard grids, so
    the special case is preserved by construction.

    Contract: ``timesteps`` is the FULL (untruncated) descending sampling
    grid — the schedule is its first ``int(num_inference_steps * threshold)``
    entries, exactly the reference's ``scheduler.timesteps[:k]`` slice.
    Callers running a truncated loop (``timesteps[t_idx:]``) slice the
    returned mask with the same ``[t_idx:]``.
    """
    timesteps = np.asarray(timesteps)
    n_inject = int(num_inference_steps * threshold)
    mask = np.zeros(len(timesteps), dtype=bool)
    mask[:n_inject] = True
    mask |= timesteps == 1000
    return mask
