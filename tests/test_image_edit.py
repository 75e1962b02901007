"""First-frame editing stage tests (SURVEY.md §2.4): Euler-family scheduler
properties, ip2p 3-term CFG pipeline smoke, CosXL EDM pipeline smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.schedulers import make_schedule
from anyv2v_tpu.schedulers.euler import (
    edm_grid,
    edm_step_v,
    euler_ancestral_grid,
    euler_ancestral_step,
    euler_scale_model_input,
)


def test_euler_ancestral_grid_properties():
    sched = make_schedule()
    g = euler_ancestral_grid(sched, 10)
    assert g.sigmas.shape == (11,)
    assert g.sigmas[-1] == 0.0
    assert np.all(np.diff(g.sigmas[:-1]) < 0)  # descending
    assert g.timesteps[0] == sched.num_train_timesteps - 1
    assert g.init_noise_sigma == pytest.approx(float(np.sqrt(g.sigmas[0] ** 2 + 1)))


def test_euler_ancestral_oracle_convergence():
    """With the exact eps for a known x0 and zero ancestral noise, the Euler
    ancestral chain lands exactly on x0 (the update contracts (x - x0) by
    sigma_down/sigma each step, reaching 0 at the terminal sigma)."""
    sched = make_schedule()
    g = euler_ancestral_grid(sched, 25)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    noise = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    x = x0 + g.sigmas[0] * noise
    for i in range(25):
        s_from, s_to = jnp.float32(g.sigmas[i]), jnp.float32(g.sigmas[i + 1])
        eps = (x - x0) / s_from
        x = euler_ancestral_step(x, eps, s_from, s_to, jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_euler_scale_model_input():
    x = jnp.ones((2, 2))
    out = euler_scale_model_input(x, jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(out), 1.0 / np.sqrt(10.0), rtol=1e-6)


def test_edm_grid_matches_cosxl_patch():
    """Log-spaced descending sigmas per cosxl/utils.py:5-17."""
    g = edm_grid(5, sigma_min=0.002, sigma_max=120.0)
    want = np.exp(np.linspace(np.log(0.002), np.log(120.0), 5))[::-1]
    np.testing.assert_allclose(g.sigmas[:-1], want, rtol=1e-6)
    assert g.sigmas[-1] == 0.0


def test_edm_step_v_reaches_denoised_at_terminal_sigma():
    """If the model outputs the ideal v for target x0, the final step
    (sigma_to = 0) lands exactly on x0."""
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    sigma = jnp.float32(0.5)
    x = x0 + sigma * jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    s2 = sigma**2 + 1.0
    c_skip = 1.0 / s2
    c_out = -sigma / jnp.sqrt(s2)
    v = (x0 - c_skip * x) / c_out
    out = edm_step_v(x, v, sigma, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_ip2p_pipeline_smoke():
    from anyv2v_tpu.utils.model_zoo import build_image_edit_pipeline

    pipe = build_image_edit_pipeline("instructpix2pix-tiny")
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    text3 = jnp.asarray(rng.randn(3, 4, 16).astype(np.float32) * 0.1)
    out = pipe.edit(image, text3, num_inference_steps=4,
                    guidance_scale=7.5, image_guidance_scale=1.5, seed=1)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # text encoder surface works
    ids = np.zeros((1, 4), np.int64); ids[0, 0] = 1
    emb = pipe.encode_text(jnp.asarray(ids))
    assert emb.shape == (1, 4, 16)


@pytest.mark.slow
def test_cosxl_pipeline_smoke():
    from anyv2v_tpu.utils.model_zoo import build_image_edit_pipeline

    pipe = build_image_edit_pipeline("cosxl-tiny")
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    text3 = jnp.asarray(rng.randn(3, 4, 16).astype(np.float32) * 0.1)
    pooled3 = jnp.asarray(rng.randn(3, 16).astype(np.float32) * 0.1)
    out = pipe.edit(image, text3, pooled3, num_inference_steps=3,
                    guidance_scale=7.0, seed=1)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_edit_image_cli_e2e(tmp_path):
    """edit_image CLI parity flow on a synthetic video, tiny arch."""
    import imageio.v3 as iio
    from anyv2v_tpu.cli import edit_image as cli
    from anyv2v_tpu.utils.io import save_video

    # synthetic 4-frame mp4 (cv2 writer; no ffmpeg in the image)
    rng = np.random.RandomState(0)
    frames01 = rng.rand(4, 64, 64, 3).astype(np.float32)
    video_path = str(tmp_path / "vid.mp4")
    save_video(frames01, video_path, fps=4)

    out_dir = str(tmp_path / "out")
    cli.main([
        "--model", "instructpix2pix", "--arch_suffix=-tiny",
        "--video_path", video_path, "--output_dir", out_dir,
        "--prompt", "make it snowy", "--num_inference_steps", "3",
    ])
    result = out_dir + "/make it snowy.png"
    import os
    assert os.path.exists(result)
    img = np.asarray(iio.imread(result))
    assert img.shape == (64, 64, 3)
    # skip-if-exists: second run must not fail
    cli.main([
        "--model", "instructpix2pix", "--arch_suffix=-tiny",
        "--video_path", video_path, "--output_dir", out_dir,
        "--prompt", "make it snowy", "--num_inference_steps", "3",
    ])


def test_sd_unet_structural_conversion():
    """SD1.5-layout torch skeleton -> convert_unet_sd -> exact tree match."""
    import torch.nn as tnn2
    from anyv2v_tpu.models.unet_sd import SDUNet, SDUNetConfig
    from tests.test_convert_golden import (TAttn, TFF, TResnet,
                                           TSpatialTransformer, sd_np)
    import torch as _torch

    ch = (8, 16, 16, 16)
    g, ctx = 4, 16
    ted = ch[0] * 4

    class Skeleton(tnn2.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn2.Conv2d(8, ch[0], 3, padding=1)
            te = tnn2.Module()
            te.linear_1 = tnn2.Linear(ch[0], ted)
            te.linear_2 = tnn2.Linear(ted, ted)
            self.time_embedding = te
            self.down_blocks = tnn2.ModuleList()
            cin = ch[0]
            for i, c in enumerate(ch):
                blk = tnn2.Module()
                blk.resnets = tnn2.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
                if i < 3:
                    blk.attentions = tnn2.ModuleList(
                        [TSpatialTransformer(c, ctx, 2, c // 2, g)])
                    down = tnn2.Module()
                    down.conv = tnn2.Conv2d(c, c, 3, stride=2, padding=1)
                    blk.downsamplers = tnn2.ModuleList([down])
                self.down_blocks.append(blk)
                cin = c
            mid = tnn2.Module()
            c = ch[-1]
            mid.resnets = tnn2.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                           TResnet(c, c, temb_dim=ted, groups=g)])
            mid.attentions = tnn2.ModuleList([TSpatialTransformer(c, ctx, 2, c // 2, g)])
            self.mid_block = mid
            rev = tuple(reversed(ch))
            stack = [ch[0]]
            for i, c in enumerate(ch):
                stack.append(c)
                if i < 3:
                    stack.append(c)
            self.up_blocks = tnn2.ModuleList()
            cur = ch[-1]
            for i, c in enumerate(rev):
                blk = tnn2.Module()
                resnets = []
                for j in range(2):
                    skip = stack.pop()
                    resnets.append(TResnet(cur + skip, c, temb_dim=ted, groups=g))
                    cur = c
                blk.resnets = tnn2.ModuleList(resnets)
                if i > 0:  # up path mirror: first up block is plain
                    blk.attentions = tnn2.ModuleList(
                        [TSpatialTransformer(c, ctx, 2, c // 2, g),
                         TSpatialTransformer(c, ctx, 2, c // 2, g)])
                if i < 3:
                    up = tnn2.Module()
                    up.conv = tnn2.Conv2d(c, c, 3, padding=1)
                    blk.upsamplers = tnn2.ModuleList([up])
                self.up_blocks.append(blk)
            self.conv_norm_out = tnn2.GroupNorm(g, ch[0], eps=1e-5)
            self.conv_out = tnn2.Conv2d(ch[0], 4, 3, padding=1)

    from anyv2v_tpu.utils import convert as C

    _torch.manual_seed(10)
    skel = Skeleton()
    converted = C.convert_unet_sd(sd_np(skel), block_out_channels=ch,
                                  layers_per_block=1, num_attention_heads=2)
    cfg = SDUNetConfig(block_out_channels=ch, layers_per_block=1,
                       cross_attention_dim=ctx, num_attention_heads=2,
                       norm_num_groups=g, dtype=jnp.float32)
    unet = SDUNet(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0),
                          sample=jnp.zeros((1, 8, 8, 8)),
                          timestep=jnp.float32(1.0),
                          encoder_hidden_states=jnp.zeros((1, 4, ctx))))
    C.assert_params_match(shapes, converted)


@pytest.mark.slow
def test_instantstyle_pipeline_smoke():
    """SDXL + canny ControlNet + style-only IP-Adapter (tiny arch): output
    shape/finiteness, ip_scale sensitivity on the target block, controlnet
    conditioning sensitivity."""
    from anyv2v_tpu.pipelines.instantstyle import canny_map
    from anyv2v_tpu.utils.model_zoo import build_instantstyle_pipeline

    pipe = build_instantstyle_pipeline("instantstyle-tiny")
    rng = np.random.RandomState(0)
    content = jnp.asarray((rng.rand(64, 64, 3) > 0.5).astype(np.float32))
    style_emb = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    text2 = jnp.asarray(rng.randn(2, 4, 16).astype(np.float32) * 0.1)
    pooled2 = jnp.asarray(rng.randn(2, 16).astype(np.float32) * 0.1)

    cm = canny_map(np.asarray(content))
    assert cm.shape == (64, 64, 3) and cm.max() <= 1.0

    out = pipe.edit_with_style(content, style_emb, text2, pooled2,
                               num_inference_steps=3, seed=1)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    # the style branch must matter: different ip_scale -> different image
    out0 = pipe.edit_with_style(content, style_emb, text2, pooled2,
                                num_inference_steps=3, seed=1, ip_scale=0.0)
    assert not np.allclose(np.asarray(out), np.asarray(out0), atol=1e-5)

    # the controlnet branch must matter too
    out_nc = pipe.edit_with_style(content, style_emb, text2, pooled2,
                                  num_inference_steps=3, seed=1,
                                  controlnet_conditioning_scale=0.0)
    assert not np.allclose(np.asarray(out), np.asarray(out_nc), atol=1e-5)


def test_resampler_and_attn_maps_and_seine_mask():
    """Small inventory surfaces: IP-Adapter-Plus Resampler shape/finiteness,
    attention-map extraction, SEINE mask modes."""
    from anyv2v_tpu.ops.attn_maps import attention_probs, attn_map_grid
    from anyv2v_tpu.pipelines.instantstyle import Resampler
    from anyv2v_tpu.pipelines.seine import seine_frame_mask

    rng = np.random.RandomState(0)
    r = Resampler(dim=16, depth=2, heads=2, head_dim=8, num_queries=4,
                  embedding_dim=8, output_dim=12)
    tokens = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    params = r.init(jax.random.PRNGKey(0), tokens)
    out = r.apply(params, tokens)
    assert out.shape == (2, 4, 12)
    assert np.isfinite(np.asarray(out)).all()

    q = jnp.asarray(rng.randn(1, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 5, 8).astype(np.float32))
    probs = attention_probs(q, k, heads=2)
    assert probs.shape == (1, 2, 16, 5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    grid = attn_map_grid(probs, 4, 4, token_idx=1)
    assert grid.shape == (1, 4, 4)

    m = np.asarray(seine_frame_mask("first1", 6, 2, 2))[0, :, 0, 0, 0]
    np.testing.assert_array_equal(m, [0, 1, 1, 1, 1, 1])
    m = np.asarray(seine_frame_mask("onelast2", 8, 2, 2))[0, :, 0, 0, 0]
    np.testing.assert_array_equal(m, [0, 0, 1, 1, 1, 1, 0, 0])
    m = np.asarray(seine_frame_mask("all", 3, 2, 2))
    assert m.min() == 1.0


def test_ip_adapter_plus_full_goldens():
    """Numeric goldens for the remaining IP-Adapter variants (VERDICT r4
    missing item 3): a torch composition of the reference's Resampler
    (``ip_adapter/resampler.py:81-147``) and MLPProjModel
    (``ip_adapter/ip_adapter.py:48-64``) vs our flax modules with
    converted weights."""
    import math

    import torch
    import torch.nn as tnn

    import anyv2v_tpu.utils.convert as C
    from anyv2v_tpu.pipelines.instantstyle import MLPProjModel, Resampler
    from tests.test_convert_golden import sd_np

    dim, depth, heads, dh, nq, emb, outd, mult = 16, 2, 2, 8, 4, 12, 20, 4
    inner = heads * dh

    class TPerceiver(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim)
            self.norm2 = tnn.LayerNorm(dim)
            self.to_q = tnn.Linear(dim, inner, bias=False)
            self.to_kv = tnn.Linear(dim, inner * 2, bias=False)
            self.to_out = tnn.Linear(inner, dim, bias=False)

        def forward(self, x, latents):
            x, latents = self.norm1(x), self.norm2(latents)
            b, l, _ = latents.shape
            q = self.to_q(latents)
            k, v = self.to_kv(torch.cat((x, latents), dim=-2)).chunk(2, -1)

            def rs(t):
                return t.view(b, -1, heads, dh).transpose(1, 2)

            q, k, v = rs(q), rs(k), rs(v)
            s = 1 / math.sqrt(math.sqrt(dh))
            w = torch.softmax(((q * s) @ (k * s).transpose(-2, -1)).float(),
                              dim=-1).to(v.dtype)
            o = (w @ v).permute(0, 2, 1, 3).reshape(b, l, -1)
            return self.to_out(o)

    class TResampler(tnn.Module):
        def __init__(self):
            super().__init__()
            self.latents = tnn.Parameter(torch.randn(1, nq, dim) / dim**0.5)
            self.proj_in = tnn.Linear(emb, dim)
            self.proj_out = tnn.Linear(dim, outd)
            self.norm_out = tnn.LayerNorm(outd)
            self.layers = tnn.ModuleList([
                tnn.ModuleList([
                    TPerceiver(),
                    tnn.Sequential(tnn.LayerNorm(dim),
                                   tnn.Linear(dim, dim * mult, bias=False),
                                   tnn.GELU(),
                                   tnn.Linear(dim * mult, dim, bias=False)),
                ]) for _ in range(depth)])

        def forward(self, x):
            latents = self.latents.repeat(x.size(0), 1, 1)
            x = self.proj_in(x)
            for attn, ff in self.layers:
                latents = attn(x, latents) + latents
                latents = ff(latents) + latents
            return self.norm_out(self.proj_out(latents))

    torch.manual_seed(3)
    skel = TResampler().eval()
    rng = np.random.RandomState(0)
    tokens = rng.randn(2, 5, emb).astype(np.float32) * 0.5
    with torch.no_grad():
        want = skel(torch.from_numpy(tokens)).numpy()

    params = C.convert_resampler(sd_np(skel), depth=depth)
    r = Resampler(dim=dim, depth=depth, heads=heads, head_dim=dh,
                  num_queries=nq, embedding_dim=emb, output_dim=outd,
                  ff_mult=mult)
    got = np.asarray(r.apply(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    class TMLP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Sequential(
                tnn.Linear(emb, emb), tnn.GELU(), tnn.Linear(emb, outd),
                tnn.LayerNorm(outd))

        def forward(self, x):
            return self.proj(x)

    torch.manual_seed(4)
    mskel = TMLP().eval()
    with torch.no_grad():
        want_m = mskel(torch.from_numpy(tokens)).numpy()
    mp = C.convert_mlp_proj(sd_np(mskel))
    m = MLPProjModel(cross_attention_dim=outd)
    got_m = np.asarray(m.apply(mp, jnp.asarray(tokens)))
    np.testing.assert_allclose(got_m, want_m, rtol=2e-5, atol=2e-5)


def test_ip_image_embeds_variants():
    """Variant dispatch of ip_image_embeds: pooled path for base/xl,
    penultimate-hidden path for plus/full with a ZERO-IMAGE (not
    zero-embedding) uncond row (``ip_adapter/ip_adapter.py:352-357``)."""
    from anyv2v_tpu.models.clip import CLIPVisionConfig, CLIPVisionModel
    from anyv2v_tpu.pipelines.instantstyle import (ImageProjModel,
                                                   MLPProjModel,
                                                   ip_image_embeds)

    rng = np.random.RandomState(1)
    vcfg = CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                            num_layers=2, num_heads=2, image_size=32,
                            patch_size=8, projection_dim=12)
    vis = CLIPVisionModel(vcfg)
    img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    vp = vis.init(jax.random.PRNGKey(0), img)

    proj = ImageProjModel(cross_attention_dim=20, num_tokens=4)
    pp = proj.init(jax.random.PRNGKey(1), jnp.zeros((1, 12)))
    cond, unc = ip_image_embeds(vis, vp, proj, pp, img, variant="xl")
    assert cond.shape == (1, 4, 20) and unc.shape == (1, 4, 20)
    assert not np.allclose(np.asarray(cond), np.asarray(unc))

    mlp = MLPProjModel(cross_attention_dim=20)
    n_tok = (32 // 8) ** 2 + 1
    mp = mlp.init(jax.random.PRNGKey(2), jnp.zeros((1, n_tok, 16)))
    cond_f, unc_f = ip_image_embeds(vis, vp, mlp, mp, img, variant="full")
    assert cond_f.shape == (1, n_tok, 20) and unc_f.shape == (1, n_tok, 20)
    # plus/full uncond runs a zero IMAGE through the encoder: the embedding
    # is NOT the zero-clip-embedding projection
    zero_emb = np.asarray(mlp.apply(mp, jnp.zeros((1, n_tok, 16))))
    assert not np.allclose(np.asarray(unc_f), zero_emb, atol=1e-4)

    with pytest.raises(ValueError):
        ip_image_embeds(vis, vp, mlp, mp, img, variant="bogus")
