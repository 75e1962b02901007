"""T5-style relative position bias for SEINE temporal attention.

Reference: ``seine/models/attention.py:930-967`` (``RelativePositionBias``) —
bucketed relative positions -> learned embedding added to attention scores
(``:813-815``). The bucketing below reproduces the T5 scheme the reference
vendors (bidirectional, num_buckets split in half for sign, log-spaced tail).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Static bucketing (positions are static under jit — frame counts are
    compile-time constants), so plain numpy."""
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)

    max_exact = num_buckets // 2
    is_small = n < max_exact

    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)

    ret += np.where(is_small, n, val_if_large)
    return ret


def relative_position_bias(
    embedding: jax.Array, q_len: int, k_len: int, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """Bias [heads, q_len, k_len] from a learned bucket embedding.

    ``embedding``: [num_buckets, heads] parameter table.
    """
    q_pos = np.arange(q_len, dtype=np.int64)
    k_pos = np.arange(k_len, dtype=np.int64)
    rel = k_pos[None, :] - q_pos[:, None]
    buckets = relative_position_bucket(rel, num_buckets=num_buckets, max_distance=max_distance)
    bias = embedding[jnp.asarray(buckets)]  # [q, k, heads]
    return jnp.transpose(bias, (2, 0, 1))
