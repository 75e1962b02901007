"""Equivalence tests for the head-packed flash kernel
(anyv2v_tpu/ops/pallas_packed_flash.py) vs jax.nn.dot_product_attention, and
for the padded-head weight storage that feeds it.

The shape class under test is the checkpoint-true i2vgen-xl split: heads=64
with head_dim C/64 in {5, 10, 20}, stored padded to {8, 16, 32}
(diffusers issue #2011; reference call site
``i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:845-854``). Runs in interpret
mode on the CPU mesh; the identical code path compiles to Mosaic on TPU
(tests/test_tpu_equivalence.py gates it on-chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyv2v_tpu.ops.attention import (
    _window_packable,
    multi_head_attention,
    padded_head_dim,
)
from anyv2v_tpu.ops.pallas_packed_flash import (
    packed_flash_attention,
    packed_is_supported,
)


def _ref(q, k, v, heads, scale=None):
    b, sq, c = q.shape
    d = c // heads
    out = jax.nn.dot_product_attention(
        q.reshape(b, sq, heads, d), k.reshape(b, k.shape[1], heads, d),
        v.reshape(b, v.shape[1], heads, d), scale=scale, implementation="xla")
    return out.reshape(b, sq, c)


def test_padded_head_dim_rule():
    # unaligned dims pad to the next power of two (>= 8) — always divides 128
    assert padded_head_dim(5) == 8
    assert padded_head_dim(10) == 16
    assert padded_head_dim(20) == 32
    assert padded_head_dim(4) == 8
    assert padded_head_dim(2) == 8
    # aligned dims unchanged (SEINE dh=40/80/160, widehead 64, VAE 512)
    for d in (8, 16, 24, 32, 40, 64, 80, 128, 160, 512):
        assert padded_head_dim(d) == d


@pytest.mark.parametrize(
    "b,sq,sk,heads,d",
    [
        (2, 256, 256, 64, 8),     # L0-like self-attention (dh 5 -> 8)
        (2, 256, 157, 64, 8),     # cross-attention to text+image context
        (1, 384, 384, 32, 16),    # dh 10 -> 16 class
        (1, 256, 256, 16, 32),    # dh 20 -> 32 class
        (2, 300, 130, 64, 8),     # both seqs need padding
        (1, 256, 256, 32, 8),     # heads = 2 windows at G=16
    ],
)
def test_matches_xla(b, sq, sk, heads, d):
    rng = np.random.RandomState(0)
    c = heads * d
    q = jnp.asarray(rng.randn(b, sq, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    out = packed_flash_attention(q, k, v, heads=heads)
    ref = _ref(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "b,sq,sk,heads,d",
    [
        (2, 256, 256, 64, 8),     # L0-class self (wide = 16*256)
        (1, 384, 384, 32, 16),    # L1-class self
        (1, 256, 256, 16, 32),    # L2-class self
        (2, 256, 157, 64, 8),     # short-q cross with key padding
        (1, 300, 300, 64, 16),    # both seqs padded
    ],
)
def test_wide_variant_matches_xla(b, sq, sk, heads, d, monkeypatch):
    """Force the wide-KV variant (one matmul for all G heads against the
    block-packed K/V) on shapes the router may or may not pick it for."""
    monkeypatch.setenv("ANYV2V_PACKED_VARIANT", "wide")
    rng = np.random.RandomState(4)
    c = heads * d
    q = jnp.asarray(rng.randn(b, sq, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    out = packed_flash_attention(q, k, v, heads=heads)
    ref = _ref(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_whole_pipe_variant_matches_xla(monkeypatch):
    """The staggered-pipeline whole-K/V variant (A/B knob) stays exact."""
    monkeypatch.setenv("ANYV2V_PACKED_VARIANT", "whole_pipe")
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(2, 256, 512), jnp.float32)
    k = jnp.asarray(rng.randn(2, 157, 512), jnp.float32)
    v = jnp.asarray(rng.randn(2, 157, 512), jnp.float32)
    out = packed_flash_attention(q, k, v, heads=64)
    ref = _ref(q, k, v, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_custom_scale_and_bf16():
    # the checkpoint-true scale comes from the TRUE head dim (5), not the
    # padded storage dim (8)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 256, 64 * 8), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, 256, 64 * 8), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, 256, 64 * 8), jnp.bfloat16)
    scale = 5.0 ** -0.5
    out = packed_flash_attention(q, k, v, heads=64, scale=scale)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q.astype(jnp.float32), k.astype(jnp.float32),
               v.astype(jnp.float32), 64, scale=scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.06, rtol=0.06)


def test_supported_shape_gate():
    assert packed_is_supported(64, 8, 4096)
    assert packed_is_supported(64, 16, 157)
    assert packed_is_supported(40, 32, 512)   # heads*dh = 1280 % 128 == 0
    assert not packed_is_supported(5, 64, 4096)    # 5*64 % 128 != 0
    assert not packed_is_supported(64, 24, 512)    # 128 % 24 != 0
    assert not packed_is_supported(8, 8, 512)      # under one window
    assert not packed_is_supported(64, 8, 16384)   # K/V window beyond VMEM
    with pytest.raises(ValueError):
        packed_flash_attention(jnp.zeros((1, 256, 320)), jnp.zeros((1, 256, 320)),
                               jnp.zeros((1, 256, 320)), heads=5)


def test_window_packable_rule():
    assert _window_packable(64, 8) and _window_packable(64, 16)
    assert _window_packable(64, 32) and _window_packable(20, 64)
    assert not _window_packable(2, 8)       # under one window
    assert not _window_packable(8, 160)     # wide heads
    assert not _window_packable(5, 24)


def test_dispatcher_routes_packed(monkeypatch):
    """Force the packed backend through multi_head_attention and check the
    result (dispatch correctness; auto-routing is TPU-only)."""
    rng = np.random.RandomState(2)
    c = 64 * 8
    q = jnp.asarray(rng.randn(1, 256, c), jnp.float32)
    k = jnp.asarray(rng.randn(1, 157, c), jnp.float32)
    v = jnp.asarray(rng.randn(1, 157, c), jnp.float32)
    out = multi_head_attention(q, k, v, heads=64, scale=5.0 ** -0.5,
                               backend="pallas_packed")
    ref = _ref(q, k, v, 64, scale=5.0 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_packed_rejects_bias_and_mask():
    c = 64 * 8
    q = k = v = jnp.zeros((1, 256, c), jnp.float32)
    bias = jnp.zeros((1, 64, 256, 256))
    with pytest.raises(ValueError):
        multi_head_attention(q, k, v, heads=64, bias=bias,
                             backend="pallas_packed")


# ---------------------------------------------------------------------------
# Padded-head weight storage (models.layers.Attention + converter)
# ---------------------------------------------------------------------------


def test_padded_weight_storage_is_exact():
    """An Attention module with unaligned head_dim (padded storage) matches
    plain unpadded attention math when its weights come from
    pad_attention_heads on the unpadded originals."""
    from anyv2v_tpu.models.layers import Attention
    from anyv2v_tpu.utils.convert import pad_attention_heads

    heads, dh, dmodel, sq = 4, 5, 20, 12
    rng = np.random.RandomState(3)
    lin = {
        name: {"kernel": rng.randn(dmodel, heads * dh).astype(np.float32) * 0.1}
        for name in ("to_q", "to_k", "to_v")
    }
    lin["to_out"] = {
        "kernel": rng.randn(heads * dh, dmodel).astype(np.float32) * 0.1,
        "bias": rng.randn(dmodel).astype(np.float32) * 0.1,
    }
    padded = pad_attention_heads(lin, heads, dh)
    assert padded["to_q"]["kernel"].shape == (dmodel, heads * 8)
    assert padded["to_out"]["kernel"].shape == (heads * 8, dmodel)

    x = jnp.asarray(rng.randn(2, sq, dmodel), jnp.float32)
    attn = Attention(heads=heads, head_dim=dh, out_dim=dmodel)
    got = attn.apply({"params": jax.tree_util.tree_map(jnp.asarray, padded)}, x)

    # unpadded reference math
    q = x @ lin["to_q"]["kernel"]
    k = x @ lin["to_k"]["kernel"]
    v = x @ lin["to_v"]["kernel"]
    ref = _ref(q, k, v, heads, scale=dh ** -0.5)
    ref = ref @ lin["to_out"]["kernel"] + lin["to_out"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attention_module_param_shapes_padded():
    """Checkpoint-true i2vgen split: the module's own init produces padded
    projection shapes (activations born aligned, no runtime pad tensors)."""
    from anyv2v_tpu.models.layers import Attention

    attn = Attention(heads=64, head_dim=5, out_dim=320)
    params = attn.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 320)))
    assert params["params"]["to_q"]["kernel"].shape == (320, 64 * 8)
    assert params["params"]["to_out"]["kernel"].shape == (64 * 8, 320)


@pytest.mark.parametrize(
    "b,sq,sk,heads,d",
    [
        (2, 384, 157, 64, 8),     # L0 cross class (auto-routes wide_t)
        (1, 300, 130, 64, 8),     # both seqs padded, 16-row key tail mask
        (1, 384, 157, 32, 16),    # L1 cross class
        (1, 512, 77, 16, 32),     # text-only context
    ],
)
def test_wide_t_variant_matches_xla(b, sq, sk, heads, d, monkeypatch):
    """Transposed-scores wide variant (sublane-aligned key padding) for the
    short-K/V cross-attention class."""
    monkeypatch.setenv("ANYV2V_PACKED_VARIANT", "wide_t")
    rng = np.random.RandomState(6)
    c = heads * d
    q = jnp.asarray(rng.randn(b, sq, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, c), jnp.float32)
    out = packed_flash_attention(q, k, v, heads=heads)
    ref = _ref(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
