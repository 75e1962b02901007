"""VideoLDM (ConsistI2V) UNet tests: frame-axis first-frame concat semantics,
alpha-gate identity at init, rotary/sinusoidal/augmented temporal paths,
PnP flag plumbing with 4-way dual-CFG chunks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.models.unet_i2vgen import PnPFlags
from anyv2v_tpu.models.unet_videoldm import (
    AlphaTemporalResnet,
    VideoLDMUNet,
    VideoLDMUNetConfig,
    videoldm_positional_encoding,
    _first_frame_adjacent_slices,
)

TINY = VideoLDMUNetConfig(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=4,
    n_temp_heads=2,
    norm_num_groups=4,
    pnp_chunks=4,
    pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
    pnp_conv_target=(1, 1),
    dtype=jnp.float32,
)


def _args(B=4, F=2, H=16, W=16, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        sample=jnp.asarray(rng.randn(B, F, H, W, 4).astype(np.float32)),
        timestep=jnp.int32(500),
        encoder_hidden_states=jnp.asarray(rng.randn(B, 5, 16).astype(np.float32)),
        first_frame_latents=jnp.asarray(rng.randn(B, 1, H, W, 4).astype(np.float32)),
        frame_stride=jnp.int32(3),
    )


@pytest.fixture(scope="module")
def unet_and_params():
    unet = VideoLDMUNet(TINY)
    args = _args()
    params = unet.init(jax.random.PRNGKey(0), **args)
    return unet, params, args


@pytest.mark.slow
def test_output_shape_strips_conditioning_frame(unet_and_params):
    unet, params, args = unet_and_params
    out = unet.apply(params, **args)
    # F frames in -> F frames out (the internal F+1 concat frame is stripped)
    assert out.shape == args["sample"].shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_first_frame_latents_matter(unet_and_params):
    unet, params, args = unet_and_params
    out1 = unet.apply(params, **args)
    args2 = dict(args, first_frame_latents=args["first_frame_latents"] * 2.0 + 1.0)
    out2 = unet.apply(params, **args2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.slow
def test_frame_stride_is_noop_at_init_but_params_exist(unet_and_params):
    """frame_stride embedding output proj is zero-init (videoldm_unet.py:234-245)
    -> changing frame_stride must not change the output at init."""
    unet, params, args = unet_and_params
    out1 = unet.apply(params, **args)
    out2 = unet.apply(params, **dict(args, frame_stride=jnp.int32(10)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    assert "frame_stride_fc2" in params["params"]


def test_alpha_gate_identity_when_alpha_one():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 4, 8).astype(np.float32))
    layer = AlphaTemporalResnet(channels=8, groups=4)
    params = layer.init(jax.random.PRNGKey(0), x)
    # alpha initializes to 1 -> gate passes input through exactly
    np.testing.assert_allclose(np.asarray(layer.apply(params, x)), np.asarray(x),
                               atol=1e-6)
    # alpha=0 -> full temporal residual path
    p0 = jax.tree_util.tree_map(lambda a: a, params)
    p0["params"]["alpha"] = jnp.zeros((1,))
    out = layer.apply(p0, x)
    assert not np.allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.mark.slow
def test_pnp_flags_reach_targets(unet_and_params):
    unet, params, args = unet_and_params
    f, t = jnp.bool_(False), jnp.bool_(True)
    off = unet.apply(params, **args, pnp=PnPFlags(conv=f, spatial=f, temporal=f))
    on = unet.apply(params, **args, pnp=PnPFlags(conv=t, spatial=t, temporal=t))
    # source chunk (row 0 of 4) unchanged, others affected
    np.testing.assert_allclose(np.asarray(on[0]), np.asarray(off[0]), rtol=1e-4,
                               atol=1e-5)
    for row in (1, 2, 3):
        assert not np.allclose(np.asarray(on[row]), np.asarray(off[row]), atol=1e-5)


@pytest.mark.slow
def test_sinusoidal_and_non_augmented_variants():
    cfg = VideoLDMUNetConfig(
        **{**TINY.__dict__, "temp_pos_embedding": "sinusoidal",
           "augment_temporal_attention": False},
    )
    unet = VideoLDMUNet(cfg)
    args = _args(B=1)
    params = unet.init(jax.random.PRNGKey(0), **args)
    out = unet.apply(params, **args)
    assert out.shape == args["sample"].shape


def test_positional_encoding_properties():
    pe = videoldm_positional_encoding(8, 16)
    assert pe.shape == (8, 16)
    # position 0: sin terms 0, cos terms 1, interleaved
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)


def test_adjacent_slices_order_and_replicate_padding():
    # 2x2 grid, 1 channel, known values; native layout [B, 8, HW, C]
    ff = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 4, 1))  # [[0,1],[2,3]]
    out = np.asarray(_first_frame_adjacent_slices(ff, 2, 2))[0, :, :, 0]
    # pixel (0,0)=0: replicate-padded neighborhood rows:
    # [[0,0,1],[0,*,1],[2,2,3]] minus center -> [0,0,1,0,1,2,2,3]
    np.testing.assert_array_equal(out[:, 0], [0, 0, 1, 0, 1, 2, 2, 3])
    # pixel (1,1)=3: [[0,1,1],[2,*,3],[2,3,3]] -> [0,1,1,2,3,2,3,3]
    np.testing.assert_array_equal(out[:, 3], [0, 1, 1, 2, 3, 2, 3, 3])
