"""Pipeline tests.

1. Exact invert -> sample round-trip with a conditioning-independent stub
   model (the jitted analogue of the reference's reconstruction oracle,
   ``run_group_ddim_inversion.py:157-192``) — validates grid alignment,
   trajectory gather, CFG combine, truncation semantics end-to-end.
2. Real tiny UNet smoke: inversion + PnP edit run, produce finite output,
   single compilation across steps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.models import I2VGenUNet, I2VGenUNetConfig
from anyv2v_tpu.models.clip import CLIPTextConfig, CLIPTextModel, CLIPVisionConfig, CLIPVisionModel
from anyv2v_tpu.models.vae import AutoencoderKL, VAEConfig
from anyv2v_tpu.pipelines import I2VGenPipeline, PnPConfig
from anyv2v_tpu.schedulers import make_schedule

TINY_UNET = I2VGenUNetConfig(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=4,
    norm_num_groups=4,
    num_image_context_tokens=2,
    pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
    pnp_conv_target=(1, 1),
    dtype=jnp.float32,
)
TINY_VAE = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                     norm_num_groups=4, dtype=jnp.float32)


class _StubUNet:
    """eps depends only on (t-scaled constant), not on x or conditioning —
    makes DDIM inversion exactly invertible, isolating pipeline plumbing."""

    def apply(self, params, sample, timestep, **kw):
        return jnp.full_like(sample, 0.05)


def _tiny_pipeline(unet=None):
    F, H, W = 2, 16, 16
    rng = np.random.RandomState(0)
    text_cfg = CLIPTextConfig(vocab_size=50, hidden_size=16, intermediate_size=32,
                              num_layers=1, num_heads=2, max_position_embeddings=8,
                              eos_token_id=49, projection_dim=None)
    vis_cfg = CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                               num_heads=2, image_size=H * 8, patch_size=8,
                               projection_dim=16)
    vae = AutoencoderKL(TINY_VAE)
    text = CLIPTextModel(text_cfg)
    vision = CLIPVisionModel(vis_cfg)

    key = jax.random.PRNGKey(0)
    unet_args = dict(
        sample=jnp.zeros((1, F, H, W, 4)),
        timestep=jnp.int32(0),
        encoder_hidden_states=jnp.zeros((1, 8, 16)),
        fps=jnp.int32(8),
        image_latents=jnp.zeros((1, F, H, W, 4)),
        image_embeddings=jnp.zeros((1, 1, 16)),
    )
    if unet is None:
        unet = I2VGenUNet(TINY_UNET)
        unet_params = unet.init(key, **unet_args)
    else:
        # stub ignores its params — skip the (slow on 1-core CPU) real init
        unet_params = {}
    params = {
        "unet": unet_params,
        "vae": vae.init(key, jnp.zeros((1, H * 8, W * 8, 3))),
        "text": text.init(key, jnp.zeros((1, 8), jnp.int32)),
        "vision": vision.init(key, jnp.zeros((1, H * 8, W * 8, 3))),
    }
    pipe = I2VGenPipeline(
        unet=unet, vae=vae, text_encoder=text, vision_encoder=vision,
        schedule=make_schedule(), params=params,
    )
    frames01 = jnp.asarray(rng.rand(F, H * 8, W * 8, 3).astype(np.float32))
    return pipe, frames01, F


@pytest.fixture(scope="module")
def stub_pipe():
    return _tiny_pipeline(unet=_StubUNet())


@pytest.fixture(scope="module")
def real_pipe():
    return _tiny_pipeline()


def test_roundtrip_reconstruction_exact_with_stub(stub_pipe):
    pipe, frames01, F = stub_pipe
    latents = pipe.encode_video(frames01)
    text = jnp.zeros((1, 8, 16))
    img_lat = pipe.prepare_image_latents(frames01[0], F)
    img_emb = jnp.zeros((1, 1, 16))

    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=100)
    assert traj.shape[0] == 100 and inv_ts[0] == 1 and inv_ts[-1] == 991

    # identical conditioning across CFG rows -> eps constant -> exact recon
    out = pipe.sample_with_pnp(
        traj, inv_ts,
        text_embeds_all=jnp.tile(text, (3, 1, 1)),
        image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
        num_inference_steps=10, t_idx=0, guidance_scale=9.0,
        pnp=PnPConfig(0.2, 0.2, 0.5),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(latents), rtol=1e-4, atol=1e-4)


def test_roundtrip_with_t_idx_truncation(stub_pipe):
    pipe, frames01, F = stub_pipe
    latents = pipe.encode_video(frames01)
    text = jnp.zeros((1, 8, 16))
    img_lat = pipe.prepare_image_latents(frames01[0], F)
    img_emb = jnp.zeros((1, 1, 16))
    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb, num_inversion_steps=100)
    out = pipe.sample_with_pnp(
        traj, inv_ts,
        text_embeds_all=jnp.tile(text, (3, 1, 1)),
        image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
        num_inference_steps=10, t_idx=3, guidance_scale=9.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(latents), rtol=1e-4, atol=1e-4)


def test_grid_misalignment_raises(stub_pipe):
    pipe, frames01, F = stub_pipe
    latents = pipe.encode_video(frames01)
    text = jnp.zeros((1, 8, 16))
    img_lat = pipe.prepare_image_latents(frames01[0], F)
    img_emb = jnp.zeros((1, 1, 16))
    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb, num_inversion_steps=100)
    with pytest.raises(ValueError, match="not on the inversion grid"):
        pipe.sample_with_pnp(
            traj, inv_ts,
            text_embeds_all=jnp.tile(text, (3, 1, 1)),
            image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
            image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
            num_inference_steps=7,  # 1000/7 grid not within the 100-step grid
        )


@pytest.mark.slow
def test_real_unet_end_to_end_smoke(real_pipe):
    pipe, frames01, F = real_pipe
    latents = pipe.encode_video(frames01)
    assert latents.shape == (1, F, 16, 16, 4)

    ids = np.zeros((1, 8), np.int64)
    ids[0, 0] = 1
    ids[0, 1] = 49
    text = pipe.encode_text(jnp.asarray(ids))
    assert text.shape == (1, 8, 16)
    img_emb = pipe.encode_image_clip(jnp.asarray(
        np.random.RandomState(1).rand(1, 128, 128, 3).astype(np.float32)))
    assert img_emb.shape == (1, 1, 16)
    img_lat = pipe.prepare_image_latents(frames01[0], F)

    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb, num_inversion_steps=20)
    assert traj.shape == (20, 1, F, 16, 16, 4)
    assert np.isfinite(np.asarray(traj)).all()

    out = pipe.sample_with_pnp(
        traj, inv_ts,
        text_embeds_all=jnp.tile(text, (3, 1, 1)),
        image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
        num_inference_steps=10, t_idx=1, guidance_scale=9.0,
    )
    assert out.shape == latents.shape and np.isfinite(np.asarray(out)).all()

    video = pipe.decode_latents(out)
    assert video.shape == (F, 128, 128, 3)
    assert float(video.min()) >= 0.0 and float(video.max()) <= 1.0

    # plain sampling path (reconstruction oracle, cfg > 1)
    recon = pipe.sample(
        traj[-1],
        text_embeds_all=jnp.tile(text, (2, 1, 1)),
        image_latents_all=jnp.tile(img_lat, (2, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (2, 1, 1)),
        num_inference_steps=10, guidance_scale=9.0,
    )
    assert recon.shape == latents.shape


def test_split_scan_matches_monolithic(real_pipe):
    """The batch-2 tail (source row dropped once every injection schedule
    expires) must reproduce the monolithic batch-3 scan exactly — the CFG
    combine never reads the source eps."""
    pipe, frames01, F = real_pipe
    rng = np.random.RandomState(3)
    latents = pipe.encode_video(frames01)
    text = jnp.asarray(rng.randn(1, 8, 16) * 0.02, jnp.float32)
    img_lat = pipe.prepare_image_latents(frames01[0], F)
    img_emb = jnp.asarray(rng.randn(1, 1, 16) * 0.02, jnp.float32)
    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=20)

    kw = dict(
        text_embeds_all=jnp.concatenate(
            [text, text * 0.5, jnp.asarray(rng.randn(1, 8, 16) * 0.02,
                                           jnp.float32)]),
        image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
        num_inference_steps=10, t_idx=0, guidance_scale=9.0,
        pnp=PnPConfig(0.2, 0.2, 0.5),   # injection ends at step 5 of 10
    )
    out_split = pipe.sample_with_pnp(traj, inv_ts, **kw)
    out_mono = pipe.sample_with_pnp(traj, inv_ts, split_scan=False, **kw)
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_mono),
                               rtol=2e-5, atol=2e-5)


def test_save_grid_subsetting_roundtrip(stub_pipe):
    """SEINE-style save-grid subsetting for i2vgen inversion (VERDICT r1
    item 6; precedent ``seine/configs/ddim_inversion.yaml:31``): invert on a
    100-step grid but keep only the 50-point save grid — the 10-step
    sampling grid nests inside it, so reconstruction stays exact and the
    trajectory halves."""
    pipe, frames01, F = stub_pipe
    latents = pipe.encode_video(frames01)
    text = jnp.zeros((1, 8, 16))
    img_lat = pipe.prepare_image_latents(frames01[0], F)
    img_emb = jnp.zeros((1, 1, 16))

    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=100, num_save_steps=50,
                               chunk_steps=40)  # chunks straddle the grid
    assert traj.shape[0] == 50 and len(inv_ts) == 50
    # the 50-grid is every other 100-grid point: [11, 31, ...] leading+1
    full_ts = set(
        int(t) for t in
        __import__("anyv2v_tpu.schedulers", fromlist=["inversion_timesteps"])
        .inversion_timesteps(pipe.schedule, 100))
    assert all(int(t) in full_ts for t in inv_ts)

    out = pipe.sample_with_pnp(
        traj, inv_ts,
        text_embeds_all=jnp.tile(text, (3, 1, 1)),
        image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
        num_inference_steps=10, t_idx=0, guidance_scale=9.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(latents),
                               rtol=1e-4, atol=1e-4)


def test_host_trajectory_store_matches_device(real_pipe):
    """traj_store="host" (the reference's disk latent bus in host RAM,
    ``pipeline_i2vgen_xl.py:1424-1428``) must reproduce the device-resident
    trajectory path bit-for-bit: same grid, same edit output. The edit scan
    receives only the rows on its sampling grid, remapped."""
    from anyv2v_tpu.pipelines.common import HostTrajectory

    pipe, frames01, F = real_pipe
    rng = np.random.RandomState(7)
    latents = pipe.encode_video(frames01)
    text = jnp.asarray(rng.randn(1, 8, 16) * 0.02, jnp.float32)
    img_lat = pipe.prepare_image_latents(frames01[0], F)
    img_emb = jnp.asarray(rng.randn(1, 1, 16) * 0.02, jnp.float32)

    traj_d, ts_d = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=20, chunk_steps=8)
    traj_h, ts_h = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=20, chunk_steps=8,
                               traj_store="host")
    assert isinstance(traj_h, HostTrajectory)
    assert traj_h.shape == tuple(traj_d.shape)
    np.testing.assert_array_equal(ts_d, ts_h)
    np.testing.assert_array_equal(np.asarray(traj_d), np.asarray(traj_h))

    kw = dict(
        text_embeds_all=jnp.tile(text, (3, 1, 1)),
        image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
        num_inference_steps=10, t_idx=1, guidance_scale=9.0,
    )
    out_d = pipe.sample_with_pnp(traj_d, ts_d, **kw)
    out_h = pipe.sample_with_pnp(traj_h, ts_h, **kw)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_h))

    # recon path: __getitem__ returns a device row
    row = traj_h[len(traj_h) - 1]
    np.testing.assert_array_equal(np.asarray(row), np.asarray(traj_d[-1]))
