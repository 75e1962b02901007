"""FULL-model forward goldens: composed torch oracles vs the flax UNets.

Round-1 verdict item 1: block-level goldens leave cross-block wiring (skip
ordering, embedding add points, context concat order, frame-0 strip) covered
only by shape tests. Here each backbone's complete UNet forward runs against
a torch composition written in the diffusers/reference idiom (channels-first,
skip tuples, repeat_interleave), reusing the per-block torch modules already
golden-tested in tests/test_convert_golden.py. Weights flow through the real
converters, so key maps are exercised end-to-end too.

Reference call semantics:
- i2vgen-xl: diffusers ``I2VGenXLUNet.forward`` as observed at
  ``i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:845-854``.
- ConsistI2V: ``consisti2v/consisti2v/models/videoldm_unet.py:687-1023``.
- SEINE: ``seine/models/unet.py:366-511``.
- SD1.5 (image editing): diffusers ``UNet2DConditionModel``.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from anyv2v_tpu.utils import convert as C
from test_convert_golden import (
    TAttn,
    TBasicBlock,
    TFF,
    TResnet,
    TSpatialTransformer,
    TTempConv,
    TTemporalTransformer,
    sd_np,
    t2j,
)


def tsinusoid(ts, dim, max_period=10000.0, flip=True):
    """torch mirror of diffusers Timesteps (flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    emb = torch.exp(exponent / half)[None, :] * ts.float()[:, None]
    parts = [torch.cos(emb), torch.sin(emb)] if flip else [torch.sin(emb), torch.cos(emb)]
    return torch.cat(parts, dim=-1)


def fold_t(x, f):
    """[B, C, F, H, W] -> [(B F), C, H, W] (reference frame fold,
    videoldm_unet.py:720 / seine/models/resnet.py:14-22)."""
    b, c, _, h, w = x.shape
    return x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)


def unfold_t(x, f):
    bf, c, h, w = x.shape
    return x.reshape(bf // f, f, c, h, w).permute(0, 2, 1, 3, 4)


def apply_tempconv(conv, x, f):
    """TTempConv takes [B, C, F, H, W]; x arrives frame-folded."""
    return fold_t(conv(unfold_t(x, f)), f)


# ---------------------------------------------------------------------------
# i2vgen-xl
# ---------------------------------------------------------------------------


class TI2VGenUNet(tnn.Module):
    """Composed torch I2VGenXLUNet (diffusers 0.26 layout + forward), tiny.

    heads is a FIXED count per block (head_dim = C // heads), matching the
    checkpoint-true head semantics (diffusers issue #2011) that
    ``I2VGenUNetConfig.num_attention_heads`` implements.
    """

    def __init__(self, ch=(8, 16, 16, 16), g=4, ctx_dim=16, heads=2,
                 n_img_tokens=2):
        super().__init__()
        self.ch, self.g, self.ctx_dim, self.heads = ch, g, ctx_dim, heads
        self.n_img_tokens = n_img_tokens
        ted = ch[0] * 4
        self.conv_in = tnn.Conv2d(8, ch[0], 3, padding=1)
        # transformer_in: 8 heads of dim == the head-count value (diffusers
        # TransformerTemporalModel(num_attention_heads=8, attention_head_dim=heads))
        self.transformer_in = TTemporalTransformer(ch[0], 8, heads, groups=g)
        te = tnn.Module()
        te.linear_1 = tnn.Linear(ch[0], ted)
        te.linear_2 = tnn.Linear(ted, ted)
        self.time_embedding = te
        self.fps_embedding = tnn.Sequential(
            tnn.Linear(ch[0], ted), tnn.SiLU(), tnn.Linear(ted, ted))
        self.image_latents_proj_in = tnn.Sequential(
            tnn.Conv2d(4, 16, 3, padding=1), tnn.SiLU(),
            tnn.Conv2d(16, 16, 3, padding=1), tnn.SiLU(),
            tnn.Conv2d(16, 4, 3, padding=1))
        enc = tnn.Module()
        enc.norm1 = tnn.LayerNorm(4)
        enc.attn1 = TAttn(4, 4, 2, 4)
        gelu_ff = tnn.Module()
        net0 = tnn.Module()
        net0.proj = tnn.Linear(4, 16)
        net = tnn.ModuleList([net0, tnn.Dropout(0.0), tnn.Linear(16, 4)])
        gelu_ff.net = net
        enc.ff = gelu_ff
        self.image_latents_temporal_encoder = enc
        self.image_latents_context_embedding = tnn.Sequential(
            tnn.Conv2d(4, 32, 3, padding=1), tnn.SiLU(),
            tnn.AdaptiveAvgPool2d((32, 32)),
            tnn.Conv2d(32, 64, 3, stride=2, padding=1), tnn.SiLU(),
            tnn.Conv2d(64, ctx_dim, 3, stride=2, padding=1))
        self.context_embedding = tnn.Sequential(
            tnn.Linear(ctx_dim, ted * 4), tnn.SiLU(),
            tnn.Linear(ted * 4, ctx_dim * n_img_tokens))
        self.down_blocks = tnn.ModuleList()
        cin = ch[0]
        for i, c in enumerate(ch):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
            blk.temp_convs = tnn.ModuleList([TTempConv(c, g)])
            if i < 3:
                blk.attentions = tnn.ModuleList(
                    [TSpatialTransformer(c, ctx_dim, heads, c // heads, g)])
                blk.temp_attentions = tnn.ModuleList(
                    [TTemporalTransformer(c, heads, c // heads, g)])
                down = tnn.Module()
                down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([down])
            self.down_blocks.append(blk)
            cin = c
        mid = tnn.Module()
        c = ch[-1]
        mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                      TResnet(c, c, temb_dim=ted, groups=g)])
        mid.temp_convs = tnn.ModuleList([TTempConv(c, g), TTempConv(c, g)])
        mid.attentions = tnn.ModuleList(
            [TSpatialTransformer(c, ctx_dim, heads, c // heads, g)])
        mid.temp_attentions = tnn.ModuleList(
            [TTemporalTransformer(c, heads, c // heads, g)])
        self.mid_block = mid
        rev = tuple(reversed(ch))
        stack = [ch[0]]
        for i, c in enumerate(ch):
            stack.append(c)
            if i < 3:
                stack.append(c)
        self.up_blocks = tnn.ModuleList()
        cur = ch[-1]
        for i, c in enumerate(rev):
            blk = tnn.Module()
            resnets, tconvs = [], []
            for j in range(2):
                skip = stack.pop()
                resnets.append(TResnet(cur + skip, c, temb_dim=ted, groups=g))
                tconvs.append(TTempConv(c, g))
                cur = c
            blk.resnets = tnn.ModuleList(resnets)
            blk.temp_convs = tnn.ModuleList(tconvs)
            if i > 0:
                blk.attentions = tnn.ModuleList(
                    [TSpatialTransformer(c, ctx_dim, heads, c // heads, g)
                     for _ in range(2)])
                blk.temp_attentions = tnn.ModuleList(
                    [TTemporalTransformer(c, heads, c // heads, g)
                     for _ in range(2)])
            if i < 3:
                up = tnn.Module()
                up.conv = tnn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([up])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, sample, timestep, text, fps, image_latents, image_emb):
        b, _, f, h, w = sample.shape
        ch0 = self.ch[0]
        ted_in = tsinusoid(timestep.expand(b), ch0)
        te = self.time_embedding
        t_emb = te.linear_2(tF.silu(te.linear_1(ted_in)))
        fps_emb = self.fps_embedding(tsinusoid(fps.expand(b), ch0))
        emb = (t_emb + fps_emb).repeat_interleave(f, dim=0)

        # context: [text, 64 local image tokens, N global image tokens]
        z = self.image_latents_context_embedding(image_latents[:, :, 0])
        local = z.permute(0, 2, 3, 1).reshape(b, -1, self.ctx_dim)
        gtok = self.context_embedding(image_emb).view(b, self.n_img_tokens,
                                                      self.ctx_dim)
        context = torch.cat([text, local, gtok], dim=1).repeat_interleave(f, 0)

        # image-latent local path: per-frame proj + per-pixel temporal encoder
        il = fold_t(image_latents, f)
        il = self.image_latents_proj_in(il)
        il = (il.reshape(b, f, 4, h, w).permute(0, 3, 4, 1, 2)
              .reshape(b * h * w, f, 4))
        e = self.image_latents_temporal_encoder
        il = il + e.attn1(e.norm1(il))
        il = il + e.ff.net[2](tF.gelu(e.ff.net[0].proj(il)))
        il = il.reshape(b, h, w, f, 4).permute(0, 4, 3, 1, 2)

        x = self.conv_in(fold_t(torch.cat([sample, il], dim=1), f))
        x = self.transformer_in(x, num_frames=f)
        skips = [x]
        for blk in self.down_blocks:
            for j in range(len(blk.resnets)):
                x = blk.resnets[j](x, emb)
                x = apply_tempconv(blk.temp_convs[j], x, f)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, context)
                    x = blk.temp_attentions[j](x, num_frames=f)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)
        m = self.mid_block
        x = apply_tempconv(m.temp_convs[0], m.resnets[0](x, emb), f)
        x = m.attentions[0](x, context)
        x = m.temp_attentions[0](x, num_frames=f)
        x = apply_tempconv(m.temp_convs[1], m.resnets[1](x, emb), f)
        for i, blk in enumerate(self.up_blocks):
            for j in range(len(blk.resnets)):
                x = torch.cat([x, skips.pop()], dim=1)
                x = blk.resnets[j](x, emb)
                x = apply_tempconv(blk.temp_convs[j], x, f)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, context)
                    x = blk.temp_attentions[j](x, num_frames=f)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0].conv(
                    tF.interpolate(x, scale_factor=2, mode="nearest"))
        x = self.conv_out(tF.silu(self.conv_norm_out(x)))
        return unfold_t(x, f)


@pytest.mark.slow
def test_i2vgen_full_unet_forward_golden():
    from anyv2v_tpu.models.unet_i2vgen import I2VGenUNet, I2VGenUNetConfig

    torch.manual_seed(11)
    ch = (8, 16, 16, 16)
    skel = TI2VGenUNet(ch=ch).eval()
    b, f, h = 1, 2, 32
    sample = torch.randn(b, 4, f, h, h)
    image_latents = torch.randn(b, 4, f, h, h)
    text = torch.randn(b, 5, 16)
    image_emb = torch.randn(b, 1, 16)
    with torch.no_grad():
        want = skel(sample, torch.tensor([981]), text, torch.tensor([8]),
                    image_latents, image_emb)

    converted = C.convert_unet_i2vgen(sd_np(skel), block_out_channels=ch,
                                      layers_per_block=1)
    cfg = I2VGenUNetConfig(block_out_channels=ch, layers_per_block=1,
                           cross_attention_dim=16, attention_head_dim=4,
                           num_attention_heads=2, norm_num_groups=4,
                           num_image_context_tokens=2, dtype=jnp.float32)
    unet = I2VGenUNet(cfg)
    got = unet.apply(
        jax.tree_util.tree_map(jnp.asarray, converted),
        sample=t2j(sample),
        timestep=jnp.int32(981),
        encoder_hidden_states=jnp.asarray(text.numpy()),
        fps=jnp.int32(8),
        image_latents=t2j(image_latents),
        image_embeddings=jnp.asarray(image_emb.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=2e-3,
                               atol=2e-3)
