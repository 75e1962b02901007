"""Equivalence tests for the packed short-sequence attention kernel
(anyv2v_tpu/ops/pallas_short_attention.py) vs jax.nn.dot_product_attention.

Runs in interpret mode on the CPU mesh (conftest pins jax to cpu); the same
code path compiles to Mosaic on TPU (validated by the model-level
pallas-backend equivalence test and bench A/Bs recorded in PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyv2v_tpu.ops.attention import multi_head_attention
from anyv2v_tpu.ops.pallas_short_attention import short_attention_bsc


def _ref(q, k, v, heads, scale=None):
    b, s, c = q.shape
    d = c // heads
    qh = q.reshape(b, s, heads, d)
    kh = k.reshape(b, s, heads, d)
    vh = v.reshape(b, s, heads, d)
    out = jax.nn.dot_product_attention(qh, kh, vh, scale=scale,
                                       implementation="xla")
    return out.reshape(b, s, c)


@pytest.mark.parametrize(
    "b,s,heads,d",
    [
        (12, 16, 8, 64),   # i2vgen temporal: 16 frames, tile packs G=8
        (7, 17, 5, 64),    # ConsistI2V F+1=17 (padded seq), odd head count
        (3, 128, 4, 32),   # long-video 128 frames: G=1
        (2, 9, 2, 8),      # tiny arch shapes
        (130, 16, 2, 16),  # rows not a multiple of the block: row padding
    ],
)
def test_matches_xla(b, s, heads, d):
    rng = np.random.RandomState(0)
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    out = short_attention_bsc(q, k, v, heads=heads)
    ref = _ref(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def _ref_rect(q, k, v, heads, scale=None):
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    out = jax.nn.dot_product_attention(
        q.reshape(b, sq, heads, d), k.reshape(b, sk, heads, d),
        v.reshape(b, sk, heads, d), scale=scale, implementation="xla")
    return out.reshape(b, sq, c)


@pytest.mark.parametrize(
    "b,sq,sk,heads,d",
    [
        (12, 16, 24, 8, 40),   # ConsistI2V augmented window: t + 8 keys, dh 40
        (5, 16, 24, 8, 80),    # C=640 level, dh 80
        (3, 8, 16, 2, 16),     # tiny arch augmented
        (130, 16, 24, 2, 16),  # rows not a multiple of the block
        (4, 16, 24, 8, 160),   # C=1280 level: wide heads (dh 160) rectangular
        (5, 16, 32, 2, 64),    # rectangular PAIRWISE window path (dh 64,
                               #  ConsistI2V ff-concat spatial at tiny hw)
        (6, 16, 24, 16, 8),    # rectangular 16-head lane-window fori path
        (3, 17, 25, 8, 40),    # ConsistI2V F+1 frames + augmented keys
    ],
)
def test_rectangular_matches_xla(b, sq, sk, heads, d):
    rng = np.random.RandomState(7)
    c = heads * d
    q = jnp.asarray(rng.randn(b, sq, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    out = short_attention_bsc(q, k, v, heads=heads)
    ref = _ref_rect(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "b,sq,sk,heads,d",
    [
        (12, 16, 24, 8, 40),   # ConsistI2V augmented window with rel-pos bias
        (6, 16, 24, 16, 8),    # rectangular lane-window fori path with bias
    ],
)
def test_rectangular_with_per_head_bias_matches_xla(b, sq, sk, heads, d):
    """Rectangular (sk > sq) packing with a [heads, sq, sk] additive bias:
    the kernel tiles the bias to [heads, tile_q, tile_k] across the packed
    diagonal blocks (ADVICE r3 — previously only exercised at sq == sk)."""
    rng = np.random.RandomState(9)
    c = heads * d
    q = jnp.asarray(rng.randn(b, sq, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    bias = jnp.asarray(rng.randn(heads, sq, sk) * 0.5, jnp.float32)
    out = short_attention_bsc(q, k, v, heads=heads, bias=bias)
    d_ = c // heads
    ref = jax.nn.dot_product_attention(
        q.reshape(b, sq, heads, d_), k.reshape(b, sk, heads, d_),
        v.reshape(b, sk, heads, d_), bias=bias[None],
        implementation="xla").reshape(b, sq, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("s", [16, 17])
def test_wide_head_dim_160_matches_xla(s):
    # VideoLDM C=1280 temporal attention: heads=8, head_dim=160 (> 128 lanes)
    # runs the per-head tail loop at full contraction depth
    rng = np.random.RandomState(8)
    q = jnp.asarray(rng.randn(4, s, 1280), jnp.float32)
    k = jnp.asarray(rng.randn(4, s, 1280), jnp.float32)
    v = jnp.asarray(rng.randn(4, s, 1280), jnp.float32)
    out = short_attention_bsc(q, k, v, heads=8)
    ref = _ref(q, k, v, heads=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_routing_admits_augmented_and_wide_shapes(monkeypatch):
    import anyv2v_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")
    r = attn_mod._resolve
    # ConsistI2V augmented temporal window (sk = t + 8) -> packed kernel
    assert r("auto", 16, 24, 40, None, None, batch=3072, heads=8) == "pallas_short"
    # VideoLDM C=1280 temporal (heads=8, dh=160) -> per-head tail loop
    assert r("auto", 16, 16, 160, None, None, batch=192, heads=8) == "pallas_short"
    assert r("auto", 16, 24, 160, None, None, batch=192, heads=8) == "pallas_short"
    # text cross-attention (sk - sq large) must NOT hit the short kernel
    assert r("auto", 16, 77, 40, None, None, batch=3072, heads=8) != "pallas_short"
    # many-head non-packable wide splits stay off the kernel (Mosaic bound)
    assert r("auto", 16, 16, 160, None, None, batch=8, heads=64) == "xla"


def test_custom_scale():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 16, 64), jnp.float32)
    k = jnp.asarray(rng.randn(4, 16, 64), jnp.float32)
    v = jnp.asarray(rng.randn(4, 16, 64), jnp.float32)
    out = short_attention_bsc(q, k, v, heads=4, scale=0.3)
    ref = _ref(q, k, v, heads=4, scale=0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_bf16_inputs_stay_bf16():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(4, 16, 64), jnp.bfloat16)
    out = short_attention_bsc(q, q, q, heads=4)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q.astype(jnp.float32), q.astype(jnp.float32),
               q.astype(jnp.float32), heads=4)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize(
    "b,s,hw,heads,d",
    [
        (3, 16, 64, 8, 64),    # headline: strided no-transpose path
        (1, 17, 32, 5, 64),    # padded frames, odd heads
        (2, 8, 16, 2, 16),     # tiny arch
        (1, 64, 16, 4, 64),    # s_pad > 32: falls back to the packed kernel
        (1, 16, 65, 2, 16),    # hw % w != 0 (odd latent grid): packed fallback
        (2, 8, 31, 2, 16),     # hw below one pixel window
    ],
)
def test_frames_variant_matches_xla(b, s, hw, heads, d):
    from anyv2v_tpu.ops.pallas_short_attention import short_attention_frames

    rng = np.random.RandomState(4)
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    out = short_attention_frames(q, k, v, heads=heads)
    # reference: transpose to [b*hw, s, c] rows and reuse the XLA oracle
    def t(x):
        return x.transpose(0, 2, 1, 3).reshape(b * hw, s, c)
    ref = _ref(t(q), t(k), t(v), heads).reshape(b, hw, s, c).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_explicit_backend_through_dispatcher():
    """backend='pallas_short' forces the kernel through the public API."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(6, 16, 32), jnp.float32)
    k = jnp.asarray(rng.randn(6, 16, 32), jnp.float32)
    v = jnp.asarray(rng.randn(6, 16, 32), jnp.float32)
    out = multi_head_attention(q, k, v, heads=2, backend="pallas_short")
    ref = _ref(q, k, v, heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("heads,d", [(64, 5), (64, 10), (64, 20), (8, 12)])
def test_unaligned_head_dim_padding_matches_xla(heads, d):
    """Checkpoint-true i2vgen-xl head split (heads=64, head_dim=C/64 in
    {5,10,20}; diffusers issue #2011): the dispatcher zero-pads head_dim up
    to a sublane multiple with the TRUE-dim softmax scale — exact math."""
    rng = np.random.RandomState(2)
    c = heads * d
    q = jnp.asarray(rng.randn(3, 16, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 16, c), jnp.float32)
    v = jnp.asarray(rng.randn(3, 16, c), jnp.float32)
    out = multi_head_attention(q, k, v, heads=heads, backend="pallas_short")
    ref = _ref(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_unaligned_head_dim_padding_flash_and_frames():
    from anyv2v_tpu.ops.attention import temporal_attention

    rng = np.random.RandomState(3)
    heads, d = 16, 5
    c = heads * d
    # flash path (forced): long spatial sequence
    q = jnp.asarray(rng.randn(1, 1024, c), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1024, c), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1024, c), jnp.float32)
    out = multi_head_attention(q, k, v, heads=heads, backend="pallas")
    ref = _ref(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize(
    "b,s,heads,d",
    [
        (12, 16, 8, 40),   # SEINE temporal L0: heads=8, head_dim=C/8=40
        (5, 16, 8, 64),    # pairwise path with per-head masks
        (3, 9, 3, 16),     # padded seq + odd head count
    ],
)
def test_shared_head_bias_matches_xla(b, s, heads, d):
    """SEINE's T5 rel-pos temporal bias (batch-shared, per-head) folds into
    the packed kernel's precomputed mask (VERDICT r1 item 4)."""
    rng = np.random.RandomState(5)
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    bias = jnp.asarray(rng.randn(heads, s, s), jnp.float32)
    out = short_attention_bsc(q, k, v, heads=heads, bias=bias)
    qh = q.reshape(b, s, heads, d)
    kh = k.reshape(b, s, heads, d)
    vh = v.reshape(b, s, heads, d)
    ref = jax.nn.dot_product_attention(
        qh, kh, vh, bias=bias[None], implementation="xla").reshape(b, s, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_shared_head_bias_through_dispatcher():
    """multi_head_attention routes a [1, H, S, S] bias to the packed kernel
    when forced, and the result matches the XLA path (which broadcasts the
    same bias)."""
    rng = np.random.RandomState(6)
    b, s, heads, d = 6, 16, 4, 24
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    bias = jnp.asarray(rng.randn(1, heads, s, s), jnp.float32)
    out = multi_head_attention(q, k, v, heads=heads, bias=bias,
                               backend="pallas_short")
    ref = multi_head_attention(q, k, v, heads=heads, bias=bias, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_per_batch_bias_still_rejected():
    rng = np.random.RandomState(7)
    b, s, heads, d = 4, 16, 2, 16
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    bias = jnp.asarray(rng.randn(b, heads, s, s), jnp.float32)
    with pytest.raises(ValueError, match="bias"):
        multi_head_attention(q, q, q, heads=heads, bias=bias,
                             backend="pallas_short")


def test_strided_frames_bias_matches_xla():
    from anyv2v_tpu.ops.pallas_short_attention import short_attention_frames

    rng = np.random.RandomState(8)
    b, s, hw, heads, d = 2, 16, 64, 4, 16
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    bias = jnp.asarray(rng.randn(heads, s, s), jnp.float32)
    out = short_attention_frames(q, k, v, heads=heads, bias=bias)

    def t(x):
        return x.transpose(0, 2, 1, 3).reshape(b * hw, s, heads, d)

    ref = jax.nn.dot_product_attention(
        t(q), t(k), t(v), bias=jnp.tile(bias[None], (b * hw, 1, 1, 1)),
        implementation="xla",
    ).reshape(b, hw, s, c).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# G-head lane-window packing (checkpoint-true heads=64 at padded dh 8/16/32)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "b,s,heads,d",
    [
        (4, 16, 64, 8),    # i2vgen L0 temporal (dh 5 stored as 8): G=16
        (3, 16, 64, 16),   # L1 (dh 10 -> 16): G=8
        (2, 16, 64, 32),   # L2/L3 (dh 20 -> 32): G=4
        (2, 16, 32, 8),    # 2 windows at G=16
        (2, 17, 64, 8),    # padded seq through the windowed path
    ],
)
def test_window_packed_matches_xla(b, s, heads, d):
    """Wide-head-count narrow splits run G = 128/dh heads per lane window
    via a fori_loop with iota masks (no narrow Mosaic slices)."""
    rng = np.random.RandomState(11)
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    out = short_attention_bsc(q, k, v, heads=heads, scale=0.41)
    ref = _ref(q, k, v, heads, scale=0.41)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_window_packed_with_per_head_bias():
    """Per-head bias indexing stays correct when several heads share a lane
    window (mask_ref[h] with a traced in-window head index)."""
    rng = np.random.RandomState(12)
    b, s, heads, d = 3, 16, 32, 8
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    bias = jnp.asarray(rng.randn(heads, s, s), jnp.float32)
    out = short_attention_bsc(q, k, v, heads=heads, bias=bias)
    qh = q.reshape(b, s, heads, d)
    ref = jax.nn.dot_product_attention(
        qh, k.reshape(b, s, heads, d), v.reshape(b, s, heads, d),
        bias=bias[None], implementation="xla").reshape(b, s, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_window_packed_frames_variant():
    from anyv2v_tpu.ops.pallas_short_attention import short_attention_frames

    rng = np.random.RandomState(13)
    b, s, hw, heads, d = 1, 16, 32, 64, 8
    c = heads * d
    q = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, hw, c), jnp.float32)
    out = short_attention_frames(q, k, v, heads=heads, scale=5.0 ** -0.5)

    def t(x):
        return x.transpose(0, 2, 1, 3).reshape(b * hw, s, c)

    ref = _ref(t(q), t(k), t(v), heads, scale=5.0 ** -0.5).reshape(
        b, hw, s, c).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
