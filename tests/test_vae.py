"""VAE tests on a tiny config: shapes (x8 spatial scaling), deterministic
mode sampling, frame-batch equivalence (frames are just batch — replacing the
reference's per-frame Python loops, pipeline_i2vgen_xl.py:565-592)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.models.vae import AutoencoderKL, VAEConfig, sample_from_moments

TINY = VAEConfig(
    block_out_channels=(8, 8, 16, 16),
    layers_per_block=1,
    norm_num_groups=4,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = AutoencoderKL(TINY)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), x)
    return vae, params


def test_encode_decode_shapes(vae_and_params):
    vae, params = vae_and_params
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
    moments = vae.apply(params, x, method="encode_moments")
    assert moments.shape == (2, 4, 4, 8)  # x8 downscale, 2*4 latent channels
    z = sample_from_moments(moments)
    assert z.shape == (2, 4, 4, 4)
    recon = vae.apply(params, z, method="decode")
    assert recon.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_deterministic_vs_sampled(vae_and_params):
    vae, params = vae_and_params
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32))
    m = vae.apply(params, x, method="encode_moments")
    z_mode = sample_from_moments(m)
    z_a = sample_from_moments(m, jax.random.PRNGKey(1))
    z_b = sample_from_moments(m, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(z_mode), np.asarray(m[..., :4]))
    assert not np.allclose(np.asarray(z_a), np.asarray(z_b))


def test_frames_are_batch(vae_and_params):
    """Encoding F frames as a batch == encoding them one-by-one."""
    vae, params = vae_and_params
    frames = jnp.asarray(np.random.RandomState(2).randn(3, 32, 32, 3).astype(np.float32))
    batched = vae.apply(params, frames, method="encode_moments")
    singles = jnp.concatenate(
        [vae.apply(params, frames[i : i + 1], method="encode_moments") for i in range(3)]
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), rtol=1e-4, atol=1e-5)
