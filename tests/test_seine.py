"""SEINE backbone tests (VERDICT r1 items 3/5): UNet unit tests, DDPM-grid /
save-grid alignment (the t+1 cache lookup, reference
``seine/run_pnp_edit.py:180``), masked-video conditioning semantics, two-phase
pipeline smoke, and the full CLI e2e."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.models.unet_seine import SeinePnPFlags, SeineUNet, SeineUNetConfig
from anyv2v_tpu.pipelines.seine import SeinePnPConfig, ddpm_grid
from anyv2v_tpu.schedulers import make_schedule, sampling_timesteps

TINY = SeineUNetConfig(
    block_out_channels=(8, 16, 16, 16), layers_per_block=1,
    cross_attention_dim=16, num_attention_heads=2, norm_num_groups=4,
    pnp_attn_targets=((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)),
    pnp_conv_target=(1, 1), dtype=jnp.float32,
)


def _args(B=3, F=2, HW=16, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        sample=jnp.asarray(rng.randn(B, F, HW, HW, 9).astype(np.float32)),
        timestep=jnp.int32(500),
        encoder_hidden_states=jnp.asarray(rng.randn(B, 5, 16).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def unet_and_params():
    unet = SeineUNet(TINY)
    args = _args()
    params = unet.init(jax.random.PRNGKey(0), **args)
    return unet, params, args


@pytest.mark.slow
def test_seine_unet_output_shape(unet_and_params):
    unet, params, args = unet_and_params
    out = unet.apply(params, **args)
    assert out.shape == (3, 2, 16, 16, 4)   # 9-ch in -> 4-ch eps out
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_seine_pnp_families_distinct_and_source_preserved(unet_and_params):
    unet, params, args = unet_and_params
    f, t = jnp.bool_(False), jnp.bool_(True)

    def run(**kw):
        flags = SeinePnPFlags(conv=kw.get("conv", f), spatial=kw.get("spatial", f),
                              cross=kw.get("cross", f), temporal=kw.get("temporal", f))
        return np.asarray(unet.apply(params, **args, pnp=flags))

    off = run()
    for fam in ("conv", "spatial", "cross", "temporal"):
        on = run(**{fam: t})
        # source row (0) never overwritten
        np.testing.assert_allclose(on[0], off[0], rtol=1e-4, atol=1e-5)
        # edit rows affected
        assert not np.allclose(on[1], off[1], atol=1e-5), fam
        assert not np.allclose(on[2], off[2], atol=1e-5), fam


def test_ddpm_grid_and_save_grid_alignment():
    """DDPM edit grid [980, 960, ..., 0]; cache looked up at t+1 must land on
    the 250-step save grid {1, 5, ..., 997} (reference run_pnp_edit.py:180 +
    configs/ddim_inversion.yaml:30-31). Documents the injection_step_mask
    full-grid contract for the SEINE path (VERDICT r1 weak item 7)."""
    sched = make_schedule(beta_start=1e-4, beta_end=0.02, beta_schedule="linear")
    grid = ddpm_grid(sched, 50)
    assert grid[0] == 980 and grid[-1] == 0 and len(grid) == 50
    save_ts = np.sort(sampling_timesteps(sched, 250))
    lookup = grid + 1
    assert np.isin(lookup, save_ts).all()
    # t == 1000 never occurs on this grid -> the reference's special case
    # (pnp_utils.py:109) cannot fire; masks are pure step-prefix sets
    assert 1000 not in grid and 1000 not in lookup
    from anyv2v_tpu.ops.pnp import injection_step_mask

    m = injection_step_mask(grid, 0.2, 50)
    assert m[:10].all() and not m[10:].any()


def _tiny_pipeline():
    from anyv2v_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from anyv2v_tpu.models.vae import AutoencoderKL, VAEConfig
    from anyv2v_tpu.pipelines.seine import SeinePipeline

    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        norm_num_groups=4, dtype=jnp.float32)
    text_cfg = CLIPTextConfig(vocab_size=50, hidden_size=16, intermediate_size=32,
                              num_layers=1, num_heads=2, max_position_embeddings=8,
                              eos_token_id=49, projection_dim=None)
    unet = SeineUNet(TINY)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextModel(text_cfg)
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(key, **_args(B=1)),
        "vae": vae.init(key, jnp.zeros((1, 128, 128, 3))),
        "text": text.init(key, jnp.zeros((1, 8), jnp.int32)),
    }
    sched = make_schedule(beta_start=1e-4, beta_end=0.02, beta_schedule="linear")
    return SeinePipeline(unet=unet, vae=vae, text_encoder=text,
                         schedule=sched, params=params)


@pytest.mark.slow
def test_seine_masked_inputs_semantics():
    pipe = _tiny_pipeline()
    rng = np.random.RandomState(0)
    ff = jnp.asarray(rng.rand(128, 128, 3).astype(np.float32))
    mask, masked = pipe.build_masked_inputs(ff, num_frames=3)
    assert mask.shape == (1, 3, 16, 16, 1)
    assert masked.shape == (1, 3, 16, 16, 4)
    # first1 mask: frame 0 kept (0), the rest generated (1)
    assert float(mask[0, 0].max()) == 0.0
    assert float(mask[0, 1].min()) == 1.0
    # frames 1.. share the encoded-zero latent
    np.testing.assert_allclose(np.asarray(masked[0, 1]), np.asarray(masked[0, 2]))
    assert not np.allclose(np.asarray(masked[0, 0]), np.asarray(masked[0, 1]))


@pytest.mark.slow
def test_seine_two_phase_smoke():
    """invert (20 steps, save 10) -> ddpm edit (5 steps) with injection."""
    pipe = _tiny_pipeline()
    rng = np.random.RandomState(0)
    frames01 = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    latents = pipe.encode_video(frames01)
    mask, masked = pipe.build_masked_inputs(frames01[0], 2)
    text = jnp.zeros((1, 8, 16))

    traj, traj_ts = pipe.invert(latents, mask, masked, text,
                                num_inversion_steps=20, num_save_steps=10)
    assert traj.shape[0] == len(traj_ts) == 10
    assert np.isfinite(np.asarray(traj)).all()

    text3 = jnp.tile(text, (3, 1, 1))
    out = pipe.sample_with_pnp(
        traj, traj_ts, text3, mask,
        masked_edit_latent=masked * 1.1, masked_src_latent=masked,
        num_inference_steps=5, cfg_scale=4.0, sampler="ddpm",
        pnp=SeinePnPConfig(0.2, 0.2, 0.5, 0.0),
    )
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()
    video = pipe.decode_latents(out)
    assert video.shape == (2, 128, 128, 3)


@pytest.mark.slow
def test_seine_cli_two_phase_e2e(tmp_path):
    """Full public surface: inversion CLI -> provenance + cache on disk ->
    pnp edit CLI -> edited video files."""
    from PIL import Image

    from anyv2v_tpu.cli import seine_run_ddim_inversion, seine_run_pnp_edit

    # synthetic frames dir + edited first frame
    rng = np.random.RandomState(0)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(2):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(frames_dir / f"{i:05d}.png")
    edited_path = tmp_path / "edited.png"
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(edited_path)

    inv_dir = str(tmp_path / "inv")
    seine_run_ddim_inversion.main([
        "--config", "configs/seine/ddim_inversion.yaml",
        f"video_frames_path={frames_dir}",
        f"output_dir={inv_dir}",
        "model.arch=seine-tiny", "model.dtype=float32",
        "n_steps=20", "n_save_steps=10", "n_frame_to_invert=2",
        "image_size=[64,64]", "enable_recon=True",
    ])
    assert os.path.exists(os.path.join(inv_dir, "inversion_prompts.yaml"))
    assert os.path.exists(os.path.join(inv_dir, "config.yaml"))
    assert os.path.exists(os.path.join(inv_dir, "ddim_reconstruction.mp4"))
    assert any(f.startswith("ddim_latents_") for f in os.listdir(inv_dir))

    out_dir = str(tmp_path / "edit")
    seine_run_pnp_edit.main([
        "--config", "configs/seine/pnp_edit.yaml",
        f"video_frames_path={frames_dir}",
        f"ddim_inversion_dir={inv_dir}",
        f"edited_first_frame_path={edited_path}",
        f"output_dir={out_dir}",
        "model.arch=seine-tiny", "model.dtype=float32",
        "n_steps=5", "n_frames=2", "image_size=[64,64]",
        "prompt=a stylized video",
    ])
    assert os.path.exists(os.path.join(out_dir, "edited_video.mp4"))
    assert os.path.exists(os.path.join(out_dir, "frames", "00000.png"))


def test_seine_transformer_block_golden():
    """Full SEINE BasicTransformerBlock semantics vs a hand-built torch
    reference (seine/models/attention.py:439-647): spatial attn1 -> cross
    attn2 -> temporal attn_temp with T5 relative-position bias added to the
    SCALED scores (:813-815, scale applied to q before the matmul) -> GEGLU
    ff, with the temporal fold [(B F), HW, C] -> [(B HW), F, C].

    Temporal q/k are additionally rotated per head by the UNet's shared
    ``RotaryEmbedding(32)`` (seine/models/unet.py:185, applied at
    attention.py:889-891); clamped to head_dim for this tiny config, with
    the vendored rotary library as the oracle."""
    import math

    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF
    from einops import rearrange

    from anyv2v_tpu.models.unet_seine import _SeineTransformerBlock
    from anyv2v_tpu.utils import convert as C
    from tests.test_convert_golden import TAttn, TFF, sd_pref
    from tests.test_full_model_golden import _vendored_rotary

    F_, HW, Cc, CTX, HEADS = 3, 4, 8, 12, 2
    BUCKETS, MAXD = 32, 32
    ROT = _vendored_rotary()(min(32, Cc // HEADS))

    class TTemporalAttn(tnn.Module):
        """Reference TemporalAttention._attention (:860-917): scores =
        (scale*q) @ k^T + rel-pos bias, softmax, @v."""

        def __init__(self):
            super().__init__()
            self.to_q = tnn.Linear(Cc, Cc, bias=False)
            self.to_k = tnn.Linear(Cc, Cc, bias=False)
            self.to_v = tnn.Linear(Cc, Cc, bias=False)
            self.to_out = tnn.ModuleList([tnn.Linear(Cc, Cc), tnn.Dropout(0.0)])
            bias = tnn.Module()
            bias.relative_attention_bias = tnn.Embedding(BUCKETS, HEADS)
            self.time_rel_pos_bias = bias

        def _bias(self, n):
            # reference RelativePositionBias.forward (:930-967)
            q_pos = torch.arange(n)
            k_pos = torch.arange(n)
            rel = k_pos[None, :] - q_pos[:, None]
            nb = BUCKETS // 2
            ret = (rel > 0).long() * nb
            nabs = rel.abs()
            max_exact = nb // 2
            val_large = max_exact + (
                torch.log(nabs.float().clamp(min=1) / max_exact)
                / math.log(MAXD / max_exact) * (nb - max_exact)).long()
            val_large = torch.minimum(val_large, torch.full_like(val_large, nb - 1))
            bucket = ret + torch.where(nabs < max_exact, nabs, val_large)
            vals = self.time_rel_pos_bias.relative_attention_bias(bucket)
            return vals.permute(2, 0, 1)   # [heads, n, n]

        def forward(self, x):  # [(B HW), F, C]
            b, f, _ = x.shape
            scale = 1.0 / math.sqrt(Cc // HEADS)
            q = rearrange(self.to_q(x) * scale, "b f (h d) -> b h f d", h=HEADS)
            k = rearrange(self.to_k(x), "b f (h d) -> b h f d", h=HEADS)
            v = rearrange(self.to_v(x), "b f (h d) -> b h f d", h=HEADS)
            # shared rotary on q AND k (seine/models/attention.py:889-891)
            q = ROT.rotate_queries_or_keys(q)
            k = ROT.rotate_queries_or_keys(k)
            s = torch.einsum("bhid,bhjd->bhij", q, k) + self._bias(f)[None]
            p = s.softmax(-1)
            o = torch.einsum("bhij,bhjd->bhid", p, v)
            o = rearrange(o, "b h f d -> b f (h d)")
            return self.to_out[0](o)

    class TRef(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(Cc)
            self.attn1 = TAttn(Cc, Cc, HEADS, Cc // HEADS)
            self.norm2 = tnn.LayerNorm(Cc)
            self.attn2 = TAttn(Cc, CTX, HEADS, Cc // HEADS)
            self.norm_temp = tnn.LayerNorm(Cc)
            self.attn_temp = TTemporalAttn()
            self.norm3 = tnn.LayerNorm(Cc)
            self.ff = TFF(Cc)

        def forward(self, x, ctx):  # x: [(B F), HW, C] frame-major
            x = x + self.attn1(self.norm1(x))
            x = x + self.attn2(self.norm2(x), ctx)
            bf = x.shape[0]
            b = bf // F_
            h = rearrange(x, "(b f) p c -> (b p) f c", f=F_)
            h = self.attn_temp(self.norm_temp(h))
            x = x + rearrange(h, "(b p) f c -> (b f) p c", p=HW)
            x = x + self.ff(self.norm3(x))
            return x

    torch.manual_seed(3)
    t = TRef().eval()
    x = torch.randn(2 * F_, HW, Cc)
    ctx = torch.randn(2 * F_, 5, CTX)
    with torch.no_grad():
        want = t(x, ctx)

    params = {"params": C._seine_block(sd_pref(t), "m")}
    m = _SeineTransformerBlock(
        heads=HEADS, head_dim=Cc // HEADS, cross_attention_dim=CTX,
        num_frames_hint=F_, relpos_num_buckets=BUCKETS, relpos_max_distance=MAXD,
        dtype=jnp.float32, pnp_chunks=2)
    got = m.apply(jax.tree_util.tree_map(jnp.asarray, params),
                  jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=3e-5)


@pytest.mark.slow
def test_seine_split_scan_matches_monolithic():
    pipe = _tiny_pipeline()
    rng = np.random.RandomState(1)
    frames01 = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    latents = pipe.encode_video(frames01)
    mask, masked = pipe.build_masked_inputs(frames01[0], 2)
    text = jnp.zeros((1, 8, 16))
    traj, traj_ts = pipe.invert(latents, mask, masked, text,
                                num_inversion_steps=20, num_save_steps=10)
    text3 = jnp.asarray(rng.randn(3, 8, 16) * 0.02, jnp.float32)
    kw = dict(
        traj=traj, traj_ts=traj_ts, text_embeds_all=text3, mask=mask,
        masked_edit_latent=masked * 1.1, masked_src_latent=masked,
        num_inference_steps=10, cfg_scale=4.0, sampler="ddpm",
        pnp=SeinePnPConfig(0.2, 0.2, 0.5, 0.0), key=jax.random.PRNGKey(7),
    )
    out_split = pipe.sample_with_pnp(**kw)
    out_mono = pipe.sample_with_pnp(split_scan=False, **kw)
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_mono),
                               rtol=2e-5, atol=2e-5)


def test_seine_host_trajectory_store_matches_device():
    """traj_store="host" reproduces the device path bit-for-bit, including
    the per-chunk save-grid subsetting."""
    from anyv2v_tpu.pipelines.common import HostTrajectory

    pipe = _tiny_pipeline()
    rng = np.random.RandomState(5)
    frames01 = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    latents = pipe.encode_video(frames01)
    mask, masked = pipe.build_masked_inputs(frames01[0], 2)
    text = jnp.zeros((1, 8, 16))

    kw_inv = dict(num_inversion_steps=20, num_save_steps=10, chunk_steps=8)
    traj_d, ts_d = pipe.invert(latents, mask, masked, text, **kw_inv)
    traj_h, ts_h = pipe.invert(latents, mask, masked, text, **kw_inv,
                               traj_store="host")
    assert isinstance(traj_h, HostTrajectory)
    np.testing.assert_array_equal(ts_d, ts_h)
    np.testing.assert_array_equal(np.asarray(traj_d), np.asarray(traj_h))

    text3 = jnp.tile(text, (3, 1, 1))
    kw = dict(masked_edit_latent=masked * 1.1, masked_src_latent=masked,
              num_inference_steps=5, cfg_scale=4.0, sampler="ddpm",
              pnp=SeinePnPConfig(0.2, 0.2, 0.5, 0.0))
    out_d = pipe.sample_with_pnp(traj_d, ts_d, text3, mask, **kw)
    out_h = pipe.sample_with_pnp(traj_h, ts_h, text3, mask, **kw)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_h))
