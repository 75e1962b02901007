"""Fused temporal conv kernel (ops/pallas_temporal_conv) vs conv_general.

Interpret mode off-TPU; the videoldm/i2vgen goldens cover the module path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyv2v_tpu.ops.pallas_temporal_conv import temporal_conv3


def _ref_conv(x, kernel, bias):
    """nn.Conv-equivalent (3,1,1) conv over [B, F, H, W, C]."""
    return jax.lax.conv_general_dilated(
        x, kernel.reshape(3, 1, 1, kernel.shape[-2], kernel.shape[-1]),
        window_strides=(1, 1, 1),
        padding=((1, 1), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias


@pytest.mark.parametrize(
    "b,f,h,w,cin,cout",
    [
        (1, 16, 8, 8, 128, 128),     # square channels
        (3, 16, 8, 8, 128, 256),     # CFG batch, widening
        (2, 8, 4, 5, 64, 64),        # ragged pixel count (pads)
        (1, 2, 4, 4, 32, 32),        # minimum frames
    ],
)
def test_matches_conv_general(b, f, h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, f, h, w, cin), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 1, 1, cin, cout) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    out = temporal_conv3(x, kernel, bias)
    ref = _ref_conv(x, kernel, bias)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_4d_token_layout():
    """[B, F, P, C] inputs (pixels already flattened) work identically."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 24, 64), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 64, 64) * 0.05, jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    out = temporal_conv3(x, kernel, bias)
    ref = _ref_conv(x[:, :, :, None, :].transpose(0, 1, 2, 3, 4).reshape(2, 4, 24, 1, 64),
                    kernel, bias).reshape(2, 4, 24, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_zero_frame_edges():
    """Frame 0 must see zeros at d=-1 and the last frame zeros at d=+1."""
    cin = 32
    x = jnp.ones((1, 3, 8, cin), jnp.float32)
    kernel = jnp.zeros((3, cin, cin), jnp.float32)
    # only the d=-1 tap is nonzero: output frame f = sum over cin of x[f-1]
    kernel = kernel.at[0].set(jnp.eye(cin))
    bias = jnp.zeros((cin,), jnp.float32)
    out = temporal_conv3(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 1]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 2]), 1.0, atol=1e-6)


def test_kernel_fits_feasibility():
    """Long-video wide-channel tiles must route to the dots fallback (the
    F=128 C=1280 shape blew the 16 MB scoped-VMEM budget in round 4)."""
    from anyv2v_tpu.ops.pallas_temporal_conv import _kernel_fits, _pixel_tile

    # headline shapes fit
    assert _kernel_fits(320, 320, 16, _pixel_tile(320, 320, 16, 4096))
    assert _kernel_fits(1280, 1280, 16, _pixel_tile(1280, 1280, 16, 256))
    # 128-frame wide channels do not, even at the minimum window
    assert not _kernel_fits(1280, 1280, 128, 8)
    # 128-frame narrow channels still fit
    assert _kernel_fits(320, 320, 128, _pixel_tile(320, 320, 128, 4096))


def test_long_video_frame_count_matches_reference_conv():
    """F=128 goes through the fallback math on CPU — same conv semantics."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 128, 4, 32), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 32, 32) * 0.05, jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)
    out = temporal_conv3(x, kernel, bias)
    ref = _ref_conv(x[:, :, :, None, :].reshape(1, 128, 4, 1, 32),
                    kernel, bias).reshape(1, 128, 4, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
