"""Short-KV cross-attention kernel (ops/pallas_cross_attention) vs XLA.

Interpret mode off-TPU; the model-level pallas-vs-xla equivalence test
covers the kernel on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyv2v_tpu.ops.pallas_cross_attention import (
    cross_attention_short_kv, cross_kv_is_supported)


def _ref(q, k, v, heads):
    b, sq, c = q.shape
    d = c // heads
    qh = q.reshape(b, sq, heads, d)
    kh = k.reshape(b, k.shape[1], heads, d)
    vh = v.reshape(b, v.shape[1], heads, d)
    out = jax.nn.dot_product_attention(qh, kh, vh, implementation="xla")
    return out.reshape(b, sq, c)


@pytest.mark.parametrize(
    "b,sq,sk,heads,d",
    [
        (2, 1024, 157, 5, 64),     # the i2vgen text+image context shape class
        (1, 2048, 77, 8, 64),      # SD cross-attn, even heads
        (1, 1024, 128, 1, 64),     # single head (no pairing)
        (2, 1000, 77, 2, 128),     # 128-wide heads, ragged Sq (pads)
    ],
)
def test_matches_xla(b, sq, sk, heads, d):
    rng = np.random.RandomState(0)
    c = heads * d
    q = jnp.asarray(rng.randn(b, sq, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    out = cross_attention_short_kv(q, k, v, heads=heads)
    ref = _ref(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dispatcher_routes_cross_shapes():
    from anyv2v_tpu.ops.attention import _resolve

    # on CPU everything resolves to xla; the predicate itself is
    # backend-independent
    assert cross_kv_is_supported(4096, 157, 64)
    assert cross_kv_is_supported(1024, 77, 128)
    assert not cross_kv_is_supported(256, 77, 64)      # short queries
    assert not cross_kv_is_supported(4096, 600, 64)    # K/V too long
    assert not cross_kv_is_supported(4096, 77, 96)     # unaligned head lanes
    if jax.default_backend() == "tpu":
        assert _resolve(None, 4096, 157, 64, None, None,
                        batch=16) == "pallas_cross"
        # below the row threshold short-KV shapes go to XLA, not flash
        assert _resolve(None, 1024, 157, 64, None, None, batch=16) == "xla"


def test_through_public_dispatcher():
    """multi_head_attention with backend='pallas_cross' forced."""
    from anyv2v_tpu.ops.attention import multi_head_attention

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 512, 128), jnp.float32)
    k = jnp.asarray(rng.randn(2, 77, 128), jnp.float32)
    v = jnp.asarray(rng.randn(2, 77, 128), jnp.float32)
    out = multi_head_attention(q, k, v, heads=2, backend="pallas_cross")
    ref = _ref(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forced_backend_rejects_bias_and_mask():
    """Forcing a kernel that has no bias/mask operand must raise, not
    silently drop the argument (ADVICE r1)."""
    from anyv2v_tpu.ops.attention import multi_head_attention

    q = jnp.zeros((2, 16, 32), jnp.float32)
    bias = jnp.zeros((2, 2, 16, 16), jnp.float32)
    for backend in ("pallas_short", "pallas_cross"):
        with pytest.raises(ValueError):
            multi_head_attention(q, q, q, heads=2, bias=bias, backend=backend)
        with pytest.raises(ValueError):
            multi_head_attention(q, q, q, heads=2,
                                 mask=jnp.ones((2, 2, 16, 16), bool),
                                 backend=backend)


def test_unaligned_sq_forced_backend():
    """sq=1000 (not a multiple of 8) must produce an 8-aligned block and a
    correct, fully-written output (ADVICE r1)."""
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(1, 1000, 128), jnp.float32)
    k = jnp.asarray(rng.randn(1, 77, 128), jnp.float32)
    v = jnp.asarray(rng.randn(1, 77, 128), jnp.float32)
    out = cross_attention_short_kv(q, k, v, heads=2)
    ref = _ref(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
