"""I2VGenXL-style UNet tests on a tiny config: output shape/dtype, PnP flag
plumbing (source row invariance, flags actually reach targets, one compiled
graph for all flag values), frame-count generality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.models import I2VGenUNet, I2VGenUNetConfig, PnPFlags

TINY = I2VGenUNetConfig(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=4,
    norm_num_groups=4,
    num_image_context_tokens=2,
    # with layers_per_block=1 the up blocks have 2 layers each
    pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
    pnp_conv_target=(1, 1),
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def unet_and_params():
    unet = I2VGenUNet(TINY)
    B, F, H, W = 3, 2, 16, 16  # batch of 3 = [src, uncond, cond]
    rng = np.random.RandomState(0)
    args = dict(
        sample=jnp.asarray(rng.randn(B, F, H, W, 4).astype(np.float32)),
        timestep=jnp.int32(981),
        encoder_hidden_states=jnp.asarray(rng.randn(B, 5, 16).astype(np.float32)),
        fps=jnp.int32(8),
        image_latents=jnp.asarray(rng.randn(B, F, H, W, 4).astype(np.float32)),
        image_embeddings=jnp.asarray(rng.randn(B, 1, 16).astype(np.float32)),
    )
    params = unet.init(jax.random.PRNGKey(0), **args)
    return unet, params, args


def test_output_shape(unet_and_params):
    unet, params, args = unet_and_params
    out = unet.apply(params, **args)
    assert out.shape == (3, 2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_pnp_flags_change_output_but_not_source(unet_and_params):
    unet, params, args = unet_and_params
    off = unet.apply(params, **args, pnp=PnPFlags.off())
    on = unet.apply(
        params, **args,
        pnp=PnPFlags(conv=jnp.bool_(True), spatial=jnp.bool_(True), temporal=jnp.bool_(True)),
    )
    # source third is never overwritten -> identical
    np.testing.assert_allclose(np.asarray(on[0]), np.asarray(off[0]), rtol=1e-4, atol=1e-5)
    # uncond/cond thirds are affected by injection
    assert not np.allclose(np.asarray(on[1]), np.asarray(off[1]), atol=1e-5)
    assert not np.allclose(np.asarray(on[2]), np.asarray(off[2]), atol=1e-5)


@pytest.mark.slow
def test_pnp_individual_flags_have_distinct_effects(unet_and_params):
    unet, params, args = unet_and_params
    f, t = jnp.bool_(False), jnp.bool_(True)
    outs = {
        name: np.asarray(unet.apply(params, **args, pnp=PnPFlags(conv=c, spatial=s, temporal=tm)))
        for name, (c, s, tm) in {
            "off": (f, f, f), "conv": (t, f, f), "spatial": (f, t, f), "temporal": (f, f, t)
        }.items()
    }
    for a in ["conv", "spatial", "temporal"]:
        assert not np.allclose(outs[a], outs["off"], atol=1e-5), a
    assert not np.allclose(outs["spatial"], outs["temporal"], atol=1e-5)


@pytest.mark.slow
def test_single_compilation_across_flags_and_timesteps(unet_and_params):
    unet, params, args = unet_and_params
    traces = []

    @jax.jit
    def step(params, sample, t, flag):
        traces.append(1)
        pnp = PnPFlags(conv=flag, spatial=flag, temporal=flag)
        return unet.apply(params, **{**args, "sample": sample, "timestep": t}, pnp=pnp)

    step(params, args["sample"], jnp.int32(981), jnp.bool_(True))
    step(params, args["sample"], jnp.int32(961), jnp.bool_(False))
    assert len(traces) == 1


@pytest.mark.slow
def test_different_frame_counts():
    unet = I2VGenUNet(TINY)
    rng = np.random.RandomState(1)
    for F in (1, 4):
        args = dict(
            sample=jnp.asarray(rng.randn(1, F, 16, 16, 4).astype(np.float32)),
            timestep=jnp.int32(500),
            encoder_hidden_states=jnp.asarray(rng.randn(1, 5, 16).astype(np.float32)),
            fps=jnp.int32(8),
            image_latents=jnp.asarray(rng.randn(1, F, 16, 16, 4).astype(np.float32)),
            image_embeddings=jnp.asarray(rng.randn(1, 1, 16).astype(np.float32)),
        )
        params = unet.init(jax.random.PRNGKey(0), **args)
        out = unet.apply(params, **args)
        assert out.shape == (1, F, 16, 16, 4)
