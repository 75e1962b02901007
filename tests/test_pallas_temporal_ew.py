"""Equivalence tests for the elementwise-product temporal attention kernel
(interpret mode on CPU; the on-TPU gate covers the compiled path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyv2v_tpu.ops.pallas_short_attention import short_attention_frames
from anyv2v_tpu.ops.pallas_temporal_ew import temporal_ew_attention


def _xla_ref(q, k, v, heads, scale, bias=None):
    b, s, hw, c = q.shape
    sk = k.shape[1]
    dh = c // heads

    def sp(x):
        return np.asarray(x, np.float32).reshape(b, x.shape[1], hw, heads, dh)

    qh, kh, vh = sp(q), sp(k), sp(v)
    sc = np.einsum("biphd,bjphd->bphij", qh, kh) * scale
    if bias is not None:
        sc = sc + np.asarray(bias, np.float32)[None, None]
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("bphij,bjphd->biphd", p, vh)
    return o.reshape(b, s, hw, c)


@pytest.mark.parametrize(
    "b,s,sk,hw,heads,dh,use_bias",
    [
        (1, 16, 16, 64, 64, 8, False),   # checkpoint-true L0 class
        (2, 16, 17, 64, 8, 40, False),   # rectangular augmented keys, odd C
        (1, 16, 16, 64, 8, 64, True),    # per-head bias (SEINE T5)
        (1, 16, 24, 64, 16, 8, True),    # rectangular + bias
        (3, 8, 8, 32, 4, 16, False),     # small S, edit-like batch
    ],
)
def test_ew_matches_reference(b, s, sk, hw, heads, dh, use_bias):
    rng = np.random.RandomState(0)
    c = heads * dh
    q = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, hw, c) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, hw, c) * 0.3, jnp.float32)
    bias = (jnp.asarray(rng.randn(heads, s, sk) * 0.5, jnp.float32)
            if use_bias else None)
    scale = 1.0 / np.sqrt(dh)
    out = temporal_ew_attention(q, k, v, heads=heads, scale=scale, bias=bias)
    assert out is not None
    want = _xla_ref(q, k, v, heads, scale, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               atol=2e-2, rtol=0)


def test_ew_bias_orientation():
    """A bias favoring one key frame must shift mass to that frame's values
    (guards the [heads, S, Sk] -> [S, Sk, heads] transpose in the wrapper)."""
    heads, s, hw, dh = 4, 8, 32, 16
    c = heads * dh
    q = jnp.zeros((1, s, hw, c), jnp.float32)
    k = jnp.zeros((1, s, hw, c), jnp.float32)
    v = jnp.asarray(
        np.arange(s, dtype=np.float32)[None, :, None, None]
        * np.ones((1, s, hw, c), np.float32))
    bias = np.zeros((heads, s, s), np.float32)
    bias[:, :, 3] = 20.0  # every query attends key frame 3
    out = temporal_ew_attention(q, k, v, heads=heads, scale=1.0,
                                bias=jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-3)


def test_routing_matches_strided(monkeypatch):
    """Forcing the ew variant through short_attention_frames agrees with the
    strided/packed path on the same inputs."""
    rng = np.random.RandomState(1)
    b, s, hw, heads, dh = 2, 16, 64, 16, 8
    c = heads * dh
    q = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.float32)
    monkeypatch.setenv("ANYV2V_TEMPORAL_VARIANT", "strided")
    want = short_attention_frames(q, k, v, heads=heads)
    monkeypatch.setenv("ANYV2V_TEMPORAL_VARIANT", "ew")
    got = short_attention_frames(q, k, v, heads=heads)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)
