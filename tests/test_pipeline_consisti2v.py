"""ConsistI2V pipeline tests: cache rows carry the clean frame-0 latent,
dual-CFG modes produce correct batch layouts, frame 0 of the output is the
edited image latent, FreeInit filters apply."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from anyv2v_tpu.models.unet_videoldm import VideoLDMUNet, VideoLDMUNetConfig
from anyv2v_tpu.models.vae import AutoencoderKL, VAEConfig
from anyv2v_tpu.pipelines.consisti2v import ConsistI2VPipeline, guidance_mode
from anyv2v_tpu.pipelines import PnPConfig
from anyv2v_tpu.schedulers import make_schedule

TINY_UNET = VideoLDMUNetConfig(
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
TINY_VAE = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                     norm_num_groups=4, dtype=jnp.float32)


@pytest.fixture(scope="module")
def pipe_and_frames():
    F, H, W = 3, 16, 16
    rng = np.random.RandomState(0)
    unet = VideoLDMUNet(TINY_UNET)
    vae = AutoencoderKL(TINY_VAE)
    text_cfg = CLIPTextConfig(vocab_size=50, hidden_size=16, intermediate_size=32,
                              num_layers=1, num_heads=2, max_position_embeddings=8,
                              eos_token_id=49, projection_dim=None)
    text = CLIPTextModel(text_cfg)
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(
            key,
            sample=jnp.zeros((1, F - 1, H, W, 4)),
            timestep=jnp.int32(0),
            encoder_hidden_states=jnp.zeros((1, 8, 16)),
            first_frame_latents=jnp.zeros((1, 1, H, W, 4)),
            frame_stride=jnp.int32(3),
        ),
        "vae": vae.init(key, jnp.zeros((1, H * 8, W * 8, 3))),
        "text": text.init(key, jnp.zeros((1, 8), jnp.int32)),
    }
    pipe = ConsistI2VPipeline(unet=unet, vae=vae, text_encoder=text,
                              schedule=make_schedule(), params=params)
    frames01 = jnp.asarray(rng.rand(F, H * 8, W * 8, 3).astype(np.float32))
    return pipe, frames01, F


def test_guidance_mode_selection():
    assert guidance_mode(1.0, 1.0) is None
    assert guidance_mode(7.5, 1.0) == "text"
    assert guidance_mode(35.0, 1.2) == "both"
    assert guidance_mode(1.0, 1.2) == "both"


@pytest.mark.slow
def test_invert_cache_carries_clean_frame0(pipe_and_frames):
    pipe, frames01, F = pipe_and_frames
    latents = pipe.encode_video(frames01)
    text = jnp.zeros((1, 8, 16))
    traj, inv_ts = pipe.invert(latents, text, num_inversion_steps=20)
    # rows are [1, F, h, w, 4] and frame 0 equals the clean latent, every step
    assert traj.shape == (20, 1, F, 16, 16, 4)
    for i in (0, 10, 19):
        np.testing.assert_allclose(np.asarray(traj[i][:, :1]),
                                   np.asarray(latents[:, :1]), rtol=1e-5)
    assert np.isfinite(np.asarray(traj)).all()


@pytest.mark.parametrize("cfg_txt,cfg_img", [(1.0, 1.0), (7.5, 1.0), (35.0, 1.2)])
@pytest.mark.slow
def test_sample_with_pnp_modes(pipe_and_frames, cfg_txt, cfg_img):
    pipe, frames01, F = pipe_and_frames
    latents = pipe.encode_video(frames01)
    text = jnp.zeros((1, 8, 16))
    traj, inv_ts = pipe.invert(latents, text, num_inversion_steps=20)

    mode = guidance_mode(cfg_txt, cfg_img)
    n_text = {None: 2, "text": 3, "both": 4}[mode]
    text_all = jnp.tile(text, (n_text, 1, 1))
    edited_ff = latents[:, :1] * 1.1
    out = pipe.sample_with_pnp(
        traj, inv_ts, text_all,
        edited_ff_latent=edited_ff, src_ff_latent=latents[:, :1],
        num_inference_steps=10, t_idx=1, cfg_txt=cfg_txt, cfg_img=cfg_img,
    )
    assert out.shape == latents.shape
    # frame 0 is the edited latent, copied not generated (reference :1569)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(edited_ff[:, 0]),
                               rtol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_frameinit(pipe_and_frames):
    pipe, frames01, F = pipe_and_frames
    latents = pipe.encode_video(frames01)
    noise = jax.random.normal(jax.random.PRNGKey(0), latents.shape)
    mixed = pipe.apply_frameinit(noise, latents[:, :1], noise_level=500)
    assert mixed.shape == latents.shape
    assert not np.allclose(np.asarray(mixed), np.asarray(noise))
    assert np.isfinite(np.asarray(mixed)).all()


def test_pyoco_noise_statistics():
    """pyoco_mixed: unit marginal variance, positive inter-frame correlation
    (shared base); pyoco_progressive: AR(1) chain with coef a/sqrt(1+a^2)
    (reference prepare_latents, pipeline_video_editing.py:408-458)."""
    from anyv2v_tpu.pipelines.consisti2v import sample_video_noise

    key = jax.random.PRNGKey(0)
    shape = (1, 8, 32, 32, 4)

    for method in ("vanilla", "pyoco_mixed", "pyoco_progressive"):
        z = np.asarray(sample_video_noise(key, shape, method, noise_alpha=1.0))
        assert z.shape == shape
        assert abs(z.std() - 1.0) < 0.05, method

    mixed = np.asarray(sample_video_noise(key, shape, "pyoco_mixed", 1.0))
    f0, f1 = mixed[0, 0].ravel(), mixed[0, 4].ravel()
    corr = np.corrcoef(f0, f1)[0, 1]
    assert corr > 0.3  # alpha=1 -> shared base carries half the variance

    prog = np.asarray(sample_video_noise(key, shape, "pyoco_progressive", 1.0))
    c01 = np.corrcoef(prog[0, 3].ravel(), prog[0, 4].ravel())[0, 1]
    c04 = np.corrcoef(prog[0, 0].ravel(), prog[0, 7].ravel())[0, 1]
    assert c01 > 0.5       # adjacent frames strongly correlated
    assert c04 < c01       # correlation decays with distance

    van = np.asarray(sample_video_noise(key, shape, "vanilla", 1.0))
    cv = np.corrcoef(van[0, 0].ravel(), van[0, 1].ravel())[0, 1]
    assert abs(cv) < 0.1   # independent frames


@pytest.mark.slow
def test_plain_generation_call(pipe_and_frames):
    """Reference __call__ parity surface: plain image-to-video generation
    with pyoco noise + FreeInit, frame 0 copied from the image latent."""
    pipe, frames01, F = pipe_and_frames
    latents = pipe.encode_video(frames01)
    ff = latents[:, :1]
    text = jnp.zeros((1, 8, 16))

    out = pipe.sample(
        first_frame_latent=ff,
        text_embeds_all=jnp.concatenate([text, text, text]),  # [u, u, text]
        num_frames=F, num_inference_steps=5,
        cfg_txt=7.5, cfg_img=1.2,
        noise_sampling_method="pyoco_mixed",
        use_frameinit=True, frameinit_noise_level=500,
        key=jax.random.PRNGKey(3),
    )
    assert out.shape == latents.shape
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ff[:, 0]), rtol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_camera_motion_synthesis():
    from PIL import Image as PILImage

    from anyv2v_tpu.utils.camera import CAMERA_MOTIONS

    img = PILImage.fromarray(
        (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8))
    for name, fn in CAMERA_MOTIONS.items():
        frames = fn(img, num_frames=4, crop_width=32)
        assert len(frames) == 4, name
        assert frames[0].size[0] == 32, name
    # pan_right starts at the left edge, pan_left at the right edge
    pr = CAMERA_MOTIONS["pan_right"](img, 4, 32)
    pl = CAMERA_MOTIONS["pan_left"](img, 4, 32)
    assert np.asarray(pr[0]).mean() != np.asarray(pl[0]).mean()


def test_rescale_noise_cfg_formula():
    """Guidance rescale (arXiv:2305.08891 §3.4, reference :50-61): output std
    matches the text branch at rescale=1, unchanged at rescale=0."""
    from anyv2v_tpu.pipelines.consisti2v import rescale_noise_cfg

    rng = np.random.RandomState(0)
    cfg_noise = jnp.asarray(rng.randn(2, 3, 4, 4, 4).astype(np.float32) * 3.0)
    text_noise = jnp.asarray(rng.randn(2, 3, 4, 4, 4).astype(np.float32))
    out0 = rescale_noise_cfg(cfg_noise, text_noise, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(cfg_noise))
    out1 = rescale_noise_cfg(cfg_noise, text_noise, 1.0)
    s_text = np.asarray(text_noise).std(axis=(1, 2, 3, 4))
    s_out = np.asarray(out1).std(axis=(1, 2, 3, 4))
    np.testing.assert_allclose(s_out, s_text, rtol=1e-3)


@pytest.mark.slow
def test_split_scan_matches_monolithic(pipe_and_frames):
    """Dropping the source row for the post-injection tail is exact for
    every guidance mode (the CFG combine never reads the source eps)."""
    pipe, frames01, F = pipe_and_frames
    rng = np.random.RandomState(5)
    latents = pipe.encode_video(frames01)
    text = jnp.asarray(rng.randn(1, 8, 16) * 0.02, jnp.float32)
    traj, inv_ts = pipe.invert(latents, text, num_inversion_steps=20)
    edited_ff = latents[:, :1] * 1.1

    for cfg_txt, cfg_img in [(1.0, 1.0), (7.5, 1.0), (35.0, 1.2)]:
        mode = guidance_mode(cfg_txt, cfg_img)
        n_text = {None: 2, "text": 3, "both": 4}[mode]
        text_all = jnp.asarray(rng.randn(n_text, 8, 16) * 0.02, jnp.float32)
        kw = dict(
            traj=traj, inv_ts=inv_ts, text_embeds_all=text_all,
            edited_ff_latent=edited_ff, src_ff_latent=latents[:, :1],
            num_inference_steps=10, t_idx=1, cfg_txt=cfg_txt,
            cfg_img=cfg_img, pnp=PnPConfig(0.2, 0.2, 0.5),
        )
        out_split = pipe.sample_with_pnp(**kw)
        out_mono = pipe.sample_with_pnp(split_scan=False, **kw)
        np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_mono),
                                   rtol=2e-5, atol=2e-5)


def test_host_trajectory_store_matches_device(pipe_and_frames):
    """traj_store="host" reproduces the device path bit-for-bit (see
    I2VGenPipeline; the editor gathers only the sampling-grid rows)."""
    from anyv2v_tpu.pipelines.common import HostTrajectory

    pipe, frames01, F = pipe_and_frames
    rng = np.random.RandomState(11)
    latents = pipe.encode_video(frames01)
    text = jnp.asarray(rng.randn(1, 8, 16) * 0.02, jnp.float32)

    traj_d, ts_d = pipe.invert(latents, text, num_inversion_steps=20,
                               chunk_steps=8)
    traj_h, ts_h = pipe.invert(latents, text, num_inversion_steps=20,
                               chunk_steps=8, traj_store="host")
    assert isinstance(traj_h, HostTrajectory)
    np.testing.assert_array_equal(np.asarray(traj_d), np.asarray(traj_h))

    kw = dict(text_embeds_all=jnp.tile(text, (3, 1, 1)),
              src_ff_latent=latents[:, :1], edited_ff_latent=latents[:, :1],
              num_inference_steps=10, t_idx=1, cfg_txt=7.5, cfg_img=1.0)
    out_d = pipe.sample_with_pnp(traj_d, ts_d, **kw)
    out_h = pipe.sample_with_pnp(traj_h, ts_h, **kw)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_h))
