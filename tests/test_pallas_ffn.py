"""Fused feed-forward kernel (ops/pallas_ffn) vs the unfused reference math.

Runs in interpret mode off-TPU so the CPU suite covers the kernel body; the
model-level pallas-vs-xla equivalence test covers it on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyv2v_tpu.ops.pallas_ffn import ffn_is_fused, fused_ffn
from flax import linen as nn


def _ref(x, w1, b1, w2, b2, activation):
    h = x @ w1 + b1
    if activation == "geglu":
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
    else:
        h = nn.gelu(h, approximate=False)
    return h @ w2 + b2


@pytest.mark.parametrize("activation", ["geglu", "gelu"])
@pytest.mark.parametrize(
    "lead,c,mult",
    [
        ((1024,), 128, 4),        # exactly 2 row tiles
        ((4, 300), 128, 4),       # 1200 rows: needs padding to the tile
        ((2, 8, 64), 256, 4),     # 4D lead, two tiles at Tr=512
    ],
)
def test_fused_matches_reference(activation, lead, c, mult):
    rng = np.random.RandomState(0)
    inner = c * mult
    p = inner * 2 if activation == "geglu" else inner
    x = jnp.asarray(rng.randn(*lead, c), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, p) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.randn(p) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(inner, c) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

    out = fused_ffn(x, w1, b1, w2, b2, activation=activation)
    ref = _ref(x, w1, b1, w2, b2, activation)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_kernel_casts_intermediate_like_unfused():
    """The kernel stores the gate product in the input dtype between the two
    matmuls — bf16 inputs must produce bf16-quantized results, same as the
    unfused module path."""
    rng = np.random.RandomState(1)
    c, inner = 128, 512
    x = jnp.asarray(rng.randn(512, c), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(c, inner * 2) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((inner * 2,), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(inner, c) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.bfloat16)
    out = fused_ffn(x, w1, b1, w2, b2)
    assert out.dtype == jnp.bfloat16
    ref = _ref(x.astype(jnp.float32), w1.astype(jnp.float32),
               b1.astype(jnp.float32), w2.astype(jnp.float32),
               b2.astype(jnp.float32), "geglu")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.15, rtol=0.15)


def test_dispatcher_gate():
    # off-TPU the module path must never pick the kernel
    if jax.default_backend() != "tpu":
        assert not ffn_is_fused(10**6, 320)
    # shape rules beyond the backend: alignment and the row threshold
    assert (320 * 4) % 128 == 0        # C=320 eligible by alignment


def test_feedforward_module_param_tree_unchanged():
    """The fused rewrite keeps nn.Dense's exact param tree (converted
    checkpoints address ff/proj_{in,out}/{kernel,bias})."""
    from anyv2v_tpu.models.layers import FeedForward

    ff = FeedForward(dtype=jnp.float32)
    params = ff.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 64)))
    tree = params["params"]
    assert set(tree) == {"proj_in", "proj_out"}
    assert tree["proj_in"]["kernel"].shape == (64, 512)
    assert tree["proj_in"]["bias"].shape == (512,)
    assert tree["proj_out"]["kernel"].shape == (256, 64)
    assert tree["proj_out"]["bias"].shape == (64,)


def test_itemsize_gate():
    """float32 weights double the resident-VMEM footprint; the gate must
    shrink the feasible width rather than OOM at compile time (ADVICE r1)."""
    from unittest import mock

    with mock.patch("jax.default_backend", return_value="tpu"):
        assert ffn_is_fused(10**6, 768, itemsize=2)       # bf16 envelope
        assert not ffn_is_fused(10**6, 768, itemsize=4)   # fp32: 28 MB > VMEM
        assert not ffn_is_fused(10**6, 640, itemsize=4)   # 19.7 MB > envelope
        assert ffn_is_fused(10**6, 512, itemsize=4)       # 12.6 MB fits
