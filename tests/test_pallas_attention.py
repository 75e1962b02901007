"""Pallas flash attention vs XLA reference — interpret mode on the CPU mesh,
compiled on real TPU (same code path, SURVEY.md §4 kernel-test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.ops.attention import multi_head_attention
from anyv2v_tpu.ops.pallas_attention import flash_attention_bshd


def _ref(q, k, v, bias=None, scale=None):
    return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale,
                                        implementation="xla")


@pytest.mark.parametrize("sq,sk", [(128, 128), (256, 256), (100, 100), (64, 200)])
def test_flash_matches_xla(sq, sk):
    rng = np.random.RandomState(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.randn(b, sq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, sk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, sk, h, d).astype(np.float32))
    got = flash_attention_bshd(q, k, v)
    want = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4)


def test_flash_with_bias():
    rng = np.random.RandomState(1)
    b, h, s, d = 1, 2, 128, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    bias = jnp.asarray(rng.randn(b, h, s, s).astype(np.float32))
    got = flash_attention_bshd(q, k, v, bias=bias)
    want = _ref(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4)


def test_flash_custom_scale_and_bf16():
    rng = np.random.RandomState(2)
    b, h, s, d = 1, 2, 256, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32)).astype(jnp.bfloat16)
    got = flash_attention_bshd(q, k, v, scale=0.25)
    want = _ref(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                scale=0.25)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_multi_head_attention_pallas_backend():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 130, 128).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 70, 128).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 70, 128).astype(np.float32))
    got = multi_head_attention(q, k, v, heads=2, backend="pallas")
    want = multi_head_attention(q, k, v, heads=2, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4)


def test_pallas_backend_through_model_layer(monkeypatch):
    """Force backend=pallas (interpret mode on CPU) through a real
    SpatialTransformer apply and compare against the XLA backend — guards the
    model-level integration of the flash kernel, not just the kernel."""
    import os

    from anyv2v_tpu.models.layers import SpatialTransformer

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    ctx = jnp.asarray(rng.randn(2, 5, 12).astype(np.float32))
    st = SpatialTransformer(heads=2, head_dim=8, cross_attention_dim=12, groups=4)
    params = st.init(jax.random.PRNGKey(0), x, context=ctx)

    monkeypatch.setenv("ANYV2V_ATTN_BACKEND", "xla")
    want = st.apply(params, x, context=ctx)
    monkeypatch.setenv("ANYV2V_ATTN_BACKEND", "pallas")
    got = st.apply(params, x, context=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_splitkv_matches_concat_reference():
    """The split-KV kernel (ConsistI2V first-frame concat, interpret mode)
    must equal flash over the materialized concat([self, ctx]) keys —
    including padded tails on both key sources and frames > 1 sharing one
    context block per batch row."""
    from anyv2v_tpu.ops.pallas_attention import (flash_attention_bshd,
                                                 flash_attention_splitkv)

    rng = np.random.RandomState(7)
    b, f, heads, dh = 2, 3, 2, 8
    sq, sk1, sk2 = 256, 256, 200     # sk2 exercises the ctx pad mask
    q = jnp.asarray(rng.randn(b * f, sq, heads, dh).astype(np.float32))
    ks = jnp.asarray(rng.randn(b * f, sk1, heads, dh).astype(np.float32))
    vs = jnp.asarray(rng.randn(b * f, sk1, heads, dh).astype(np.float32))
    kc = jnp.asarray(rng.randn(b, sk2, heads, dh).astype(np.float32))
    vc = jnp.asarray(rng.randn(b, sk2, heads, dh).astype(np.float32))

    got = flash_attention_splitkv(q, ks, vs, kc, vc, frames=f)

    k_cat = jnp.concatenate([ks, jnp.repeat(kc, f, axis=0)], axis=1)
    v_cat = jnp.concatenate([vs, jnp.repeat(vc, f, axis=0)], axis=1)
    want = flash_attention_bshd(q, k_cat, v_cat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
