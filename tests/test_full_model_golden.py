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
                                      layers_per_block=1,
                                      num_attention_heads=2)
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


# ---------------------------------------------------------------------------
# ConsistI2V VideoLDM UNet
# ---------------------------------------------------------------------------


def _vendored_rotary():
    import sys as _sys
    from test_convert_golden import _install_stubs

    _install_stubs()
    _sys.path.insert(0, "/root/reference/consisti2v")
    try:
        from consisti2v.models.rotary_embedding import RotaryEmbedding
    finally:
        _sys.path.pop(0)
    return RotaryEmbedding


class TVLCondBlock(tnn.Module):
    """BasicConditionalTransformerBlock params (forward composed by the
    owning TVideoLDMUNet helpers)."""

    def __init__(self, c, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(c)
        self.attn1 = TAttn(c, c, heads, c // heads)
        self.norm2 = tnn.LayerNorm(c)
        self.attn2 = TAttn(c, ctx_dim, heads, c // heads)
        self.norm3 = tnn.LayerNorm(c)
        self.ff = TFF(c)


class TVLSpatial(tnn.Module):
    def __init__(self, c, ctx_dim, heads, g):
        super().__init__()
        self.norm = tnn.GroupNorm(g, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c)   # SD2.x use_linear_projection
        self.transformer_blocks = tnn.ModuleList([TVLCondBlock(c, ctx_dim, heads)])
        self.proj_out = tnn.Linear(c, c)


class TVLTempo(tnn.Module):
    def __init__(self, c, ctx_dim, heads, g):
        super().__init__()
        self.norm = tnn.GroupNorm(g, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c)
        self.transformer_blocks = tnn.ModuleList([TVLCondBlock(c, ctx_dim, heads)])
        self.proj_out = tnn.Linear(c, c)
        self.alpha = tnn.Parameter(torch.rand(1) * 0.8 + 0.1)


class TVLAlphaRes(tnn.Module):
    def __init__(self, c, g, ted):
        super().__init__()
        self.norm1 = tnn.GroupNorm(g, c, eps=1e-6)
        self.conv1 = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = tnn.Linear(ted, c)  # vestigial in reference
        self.norm2 = tnn.GroupNorm(g, c, eps=1e-6)
        self.conv2 = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.alpha = tnn.Parameter(torch.rand(1) * 0.8 + 0.1)

    def forward(self, x, f):  # x: [(b f), c, h, w]
        x5 = unfold_t(x, f)
        h = self.conv1(tF.silu(self.norm1(x5)))
        h = self.conv2(tF.silu(self.norm2(h)))
        out = x5 + h
        a = self.alpha.clamp(0, 1)
        return fold_t(a * x5 + (1 - a) * out, f)


class TVideoLDMUNet(tnn.Module):
    """Composed torch VideoLDMUNet3DConditionModel (reference layout +
    forward: videoldm_unet.py:687-1023, videoldm_unet_blocks.py:495-545,
    videoldm_transformer_blocks.py:448-545, videoldm_attention.py:552-807)."""

    def __init__(self, ch=(8, 16, 16, 16), g=4, ctx_dim=16, sp_hd=8,
                 n_temp=2, mode="concat"):
        super().__init__()
        self.ch, self.g, self.mode = ch, g, mode
        self.n_temp = n_temp
        ted = ch[0] * 4
        RotaryEmbedding = _vendored_rotary()
        self._rot = {c: RotaryEmbedding(c // 2) for c in set(ch)}
        self.conv_in = tnn.Conv2d(4, ch[0], 3, padding=1)
        for name in ("time_embedding", "frame_stride_embedding"):
            m = tnn.Module()
            m.linear_1 = tnn.Linear(ch[0], ted)
            m.linear_2 = tnn.Linear(ted, ted)
            setattr(self, name, m)
        self.down_blocks = tnn.ModuleList()
        cin = ch[0]
        for i, c in enumerate(ch):
            blk = tnn.Module()
            if mode == "conv2d":
                blk.first_frame_conv = tnn.Conv2d(4, cin, 1)
            blk.resnets = tnn.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
            blk.conv3ds = tnn.ModuleList([TVLAlphaRes(c, g, ted)])
            if i < 3:
                blk.attentions = tnn.ModuleList([TVLSpatial(c, ctx_dim, c // sp_hd, g)])
                blk.tempo_attns = tnn.ModuleList([TVLTempo(c, ctx_dim, n_temp, g)])
                down = tnn.Module()
                down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([down])
            self.down_blocks.append(blk)
            cin = c
        mid = tnn.Module()
        c = ch[-1]
        if mode == "conv2d":
            mid.first_frame_conv = tnn.Conv2d(4, c, 1)
        mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                      TResnet(c, c, temb_dim=ted, groups=g)])
        mid.conv3ds = tnn.ModuleList([TVLAlphaRes(c, g, ted), TVLAlphaRes(c, g, ted)])
        mid.attentions = tnn.ModuleList([TVLSpatial(c, ctx_dim, c // sp_hd, g)])
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
            if mode == "conv2d":
                blk.first_frame_conv = tnn.Conv2d(4, cur, 1)
            resnets, c3ds = [], []
            for j in range(2):
                skip = stack.pop()
                resnets.append(TResnet(cur + skip, c, temb_dim=ted, groups=g))
                c3ds.append(TVLAlphaRes(c, g, ted))
                cur = c
            blk.resnets = tnn.ModuleList(resnets)
            blk.conv3ds = tnn.ModuleList(c3ds)
            if i > 0:
                blk.attentions = tnn.ModuleList(
                    [TVLSpatial(c, ctx_dim, c // sp_hd, g) for _ in range(2)])
                blk.tempo_attns = tnn.ModuleList(
                    [TVLTempo(c, ctx_dim, n_temp, g) for _ in range(2)])
            if i < 3:
                up = tnn.Module()
                up.conv = tnn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([up])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    # ---- forward helpers (reference semantics) ----

    def _spatial(self, tr, x, ctx, f):
        bf, c, h, w = x.shape
        res = x
        y = tr.norm(x).permute(0, 2, 3, 1).reshape(bf, h * w, c)
        y = tr.proj_in(y)
        blk = tr.transformer_blocks[0]
        hn = blk.norm1(y)
        b = bf // f
        # first-frame K/V concat (videoldm_transformer_blocks.py:479-489)
        ff = hn.view(b, f, h * w, c)[:, 0].repeat_interleave(f, dim=0)
        kv = torch.cat([hn, ff], dim=1)
        y = y + blk.attn1(hn, kv)
        y = y + blk.attn2(blk.norm2(y), ctx)
        y = y + blk.ff(blk.norm3(y))
        y = tr.proj_out(y)
        return y.reshape(bf, h, w, c).permute(0, 3, 1, 2) + res

    def _temporal_attn(self, attn, x, f, rot, adj=None, ctx=None):
        """TemporalConditionalAttention.forward + RotaryEmbAttnProcessor2_0
        (videoldm_attention.py:566-807)."""
        bt, hw, c = x.shape
        b = bt // f
        x = x.view(b, f, hw, c).permute(0, 2, 1, 3).reshape(b * hw, f, c)
        key_pos = None
        if ctx is not None:
            enc = ctx[::f].repeat_interleave(hw, dim=0)
        elif adj is not None:
            enc = torch.cat([x, adj], dim=1)
            key_pos = torch.cat([torch.arange(f),
                                 torch.zeros(adj.shape[1], dtype=torch.long)])
        else:
            enc = x
        q, k, v = attn.to_q(x), attn.to_k(enc), attn.to_v(enc)
        q = rot.rotate_queries_or_keys(q.unsqueeze(1)).squeeze(1)
        if ctx is None and adj is None:
            k = rot.rotate_queries_or_keys(k.unsqueeze(1)).squeeze(1)
        elif key_pos is not None:
            k = rot.rotate_queries_or_keys(k.unsqueeze(1), seq_pos=key_pos).squeeze(1)
        heads, hd = attn.heads, attn.head_dim
        qh = q.view(-1, f, heads, hd).transpose(1, 2)
        kh = k.view(-1, enc.shape[1], heads, hd).transpose(1, 2)
        vh = v.view(-1, enc.shape[1], heads, hd).transpose(1, 2)
        o = tF.scaled_dot_product_attention(qh, kh, vh)
        o = o.transpose(1, 2).reshape(-1, f, heads * hd)
        o = attn.to_out[0](o)
        return o.view(b, hw, f, c).permute(0, 2, 1, 3).reshape(bt, hw, c)

    def _tempo(self, tr, x, ctx, f):
        bf, c, h, w = x.shape
        input_states = x
        rot = self._rot[c]
        y = tr.norm(x).permute(0, 2, 3, 1).reshape(bf, h * w, c)
        y = tr.proj_in(y)
        blk = tr.transformer_blocks[0]
        hn = blk.norm1(y)
        # augmented keys: 8-neighborhood of the first frame, replicate-padded
        # (videoldm_transformer_blocks.py:490-504)
        b = bf // f
        ffh = hn.view(b, f, h * w, c)[:, 0].view(b, h, w, c).permute(0, 3, 1, 2)
        padded = tF.pad(ffh, (1, 1, 1, 1), "replicate")
        windows = padded.unfold(2, 3, 1).unfold(3, 3, 1)
        mask = torch.tensor([[1, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=torch.bool)
        adj = windows[:, :, :, :, mask]                    # [b, c, h, w, 8]
        adj = adj.permute(0, 2, 3, 4, 1).reshape(b * h * w, 8, c)
        y = y + self._temporal_attn(blk.attn1, hn, f, rot, adj=adj)
        y = y + self._temporal_attn(blk.attn2, blk.norm2(y), f, rot, ctx=ctx)
        y = y + blk.ff(blk.norm3(y))
        y = tr.proj_out(y)
        out = y.reshape(bf, h, w, c).permute(0, 3, 1, 2) + input_states
        a = tr.alpha.clamp(0, 1)
        return a * input_states + (1 - a) * out

    def _ff_inject(self, conv, x, ff_lat, f):
        bf, c, h, w = x.shape
        ff = ff_lat.squeeze(2)
        if ff.shape[2] != h:
            ff = tF.interpolate(ff, scale_factor=h / ff.shape[2], mode="nearest")
        ff = conv(ff)
        xv = unfold_t(x, f).clone()
        xv[:, :, 0] = ff
        return fold_t(xv, f)

    def forward(self, sample, timestep, text, ff_lat, frame_stride):
        sample = torch.cat([ff_lat, sample], dim=2)  # videoldm_unet.py:712-714
        b, _, f, h, w = sample.shape
        ch0 = self.ch[0]
        te, fe = self.time_embedding, self.frame_stride_embedding
        t_emb = te.linear_2(tF.silu(te.linear_1(tsinusoid(timestep.expand(b), ch0))))
        fs_emb = fe.linear_2(tF.silu(fe.linear_1(
            tsinusoid(frame_stride.expand(b), ch0))))
        emb = (t_emb + fs_emb).repeat_interleave(f, dim=0)
        ctx = text.repeat_interleave(f, dim=0)

        x = self.conv_in(fold_t(sample, f))
        skips = [x]
        for blk in self.down_blocks:
            if self.mode == "conv2d":
                x = self._ff_inject(blk.first_frame_conv, x, ff_lat, f)
            for j in range(len(blk.resnets)):
                x = blk.resnets[j](x, emb)
                x = blk.conv3ds[j](x, f)
                if hasattr(blk, "attentions"):
                    x = self._spatial(blk.attentions[j], x, ctx, f)
                    x = self._tempo(blk.tempo_attns[j], x, ctx, f)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)
        m = self.mid_block
        if self.mode == "conv2d":
            x = self._ff_inject(m.first_frame_conv, x, ff_lat, f)
        x = m.conv3ds[0](m.resnets[0](x, emb), f)
        x = self._spatial(m.attentions[0], x, ctx, f)
        x = m.conv3ds[1](m.resnets[1](x, emb), f)
        for i, blk in enumerate(self.up_blocks):
            if self.mode == "conv2d":
                x = self._ff_inject(blk.first_frame_conv, x, ff_lat, f)
            for j in range(len(blk.resnets)):
                x = torch.cat([x, skips.pop()], dim=1)
                x = blk.resnets[j](x, emb)
                x = blk.conv3ds[j](x, f)
                if hasattr(blk, "attentions"):
                    x = self._spatial(blk.attentions[j], x, ctx, f)
                    x = self._tempo(blk.tempo_attns[j], x, ctx, f)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0].conv(
                    tF.interpolate(x, scale_factor=2, mode="nearest"))
        x = self.conv_out(tF.silu(self.conv_norm_out(x)))
        return unfold_t(x, f)[:, :, 1:]  # strip frame 0 (:1022-1023)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["concat", "conv2d"])
def test_videoldm_full_unet_forward_golden(mode):
    from anyv2v_tpu.models.unet_videoldm import VideoLDMUNet, VideoLDMUNetConfig

    torch.manual_seed(12)
    ch = (8, 16, 16, 16)
    skel = TVideoLDMUNet(ch=ch, mode=mode).eval()
    b, f0, h = 1, 2, 16
    sample = torch.randn(b, 4, f0, h, h)
    ff_lat = torch.randn(b, 4, 1, h, h)
    text = torch.randn(b, 5, 16)
    with torch.no_grad():
        want = skel(sample, torch.tensor([981]), text, ff_lat, torch.tensor([3]))

    converted = C.convert_unet_videoldm(sd_np(skel), block_out_channels=ch,
                                        layers_per_block=1)
    cfg = VideoLDMUNetConfig(block_out_channels=ch, layers_per_block=1,
                             cross_attention_dim=16, attention_head_dim=8,
                             n_temp_heads=2, norm_num_groups=4,
                             first_frame_condition_mode=mode,
                             dtype=jnp.float32)
    unet = VideoLDMUNet(cfg)
    got = unet.apply(
        jax.tree_util.tree_map(jnp.asarray, converted),
        sample=t2j(sample),
        timestep=jnp.int32(981),
        encoder_hidden_states=jnp.asarray(text.numpy()),
        first_frame_latents=t2j(ff_lat),
        frame_stride=jnp.int32(3),
    )
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=2e-3,
                               atol=2e-3)


# ---------------------------------------------------------------------------
# SEINE UNet3D
# ---------------------------------------------------------------------------


class TSeineTemporalAttn(tnn.Module):
    """Reference TemporalAttention (seine/models/attention.py:797-917):
    scaled q, shared rotary on q AND k per head (:889-891), T5 rel-pos bias
    added to scores (:894-898)."""

    def __init__(self, c, heads, rot, buckets=32, maxd=32):
        super().__init__()
        self.heads, self.hd, self.rot = heads, c // heads, rot
        self.buckets, self.maxd = buckets, maxd
        self.to_q = tnn.Linear(c, c, bias=False)
        self.to_k = tnn.Linear(c, c, bias=False)
        self.to_v = tnn.Linear(c, c, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c), tnn.Dropout(0.0)])
        bias = tnn.Module()
        bias.relative_attention_bias = tnn.Embedding(buckets, heads)
        self.time_rel_pos_bias = bias

    def _bias(self, n):
        q_pos, k_pos = torch.arange(n), torch.arange(n)
        rel = k_pos[None, :] - q_pos[:, None]
        nb = self.buckets // 2
        ret = (rel > 0).long() * nb
        nabs = rel.abs()
        max_exact = nb // 2
        val_large = max_exact + (
            torch.log(nabs.float().clamp(min=1) / max_exact)
            / math.log(self.maxd / max_exact) * (nb - max_exact)).long()
        val_large = torch.minimum(val_large, torch.full_like(val_large, nb - 1))
        bucket = ret + torch.where(nabs < max_exact, nabs, val_large)
        vals = self.time_rel_pos_bias.relative_attention_bias(bucket)
        return vals.permute(2, 0, 1)

    def forward(self, x):  # [(B HW), F, C]
        f = x.shape[1]
        scale = self.hd ** -0.5
        q = (self.to_q(x) * scale).view(-1, f, self.heads, self.hd).transpose(1, 2)
        k = self.to_k(x).view(-1, f, self.heads, self.hd).transpose(1, 2)
        v = self.to_v(x).view(-1, f, self.heads, self.hd).transpose(1, 2)
        q = self.rot.rotate_queries_or_keys(q)
        k = self.rot.rotate_queries_or_keys(k)
        s = torch.einsum("bhid,bhjd->bhij", q, k) + self._bias(f)[None]
        p = (s - s.amax(-1, keepdim=True)).softmax(-1)
        o = torch.einsum("bhij,bhjd->bhid", p, v)
        return self.to_out[0](o.transpose(1, 2).reshape(-1, f, self.heads * self.hd))


class TSeineBlock(tnn.Module):
    """BasicTransformerBlock: attn1 -> attn2 -> attn_temp -> ff
    (seine/models/attention.py:568-647)."""

    def __init__(self, c, ctx_dim, heads, rot):
        super().__init__()
        self.norm1 = tnn.LayerNorm(c)
        self.attn1 = TAttn(c, c, heads, c // heads)
        self.norm2 = tnn.LayerNorm(c)
        self.attn2 = TAttn(c, ctx_dim, heads, c // heads)
        self.norm_temp = tnn.LayerNorm(c)
        self.attn_temp = TSeineTemporalAttn(c, heads, rot)
        self.norm3 = tnn.LayerNorm(c)
        self.ff = TFF(c)

    def forward(self, x, ctx, f):  # x: [(B F), HW, C]
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        hw = x.shape[1]
        h = (x.view(-1, f, hw, x.shape[-1]).transpose(1, 2)
             .reshape(-1, f, x.shape[-1]))
        h = h + self.attn_temp(self.norm_temp(h))
        x = (h.view(-1, hw, f, x.shape[-1]).transpose(1, 2)
             .reshape(-1, hw, x.shape[-1]))
        x = x + self.ff(self.norm3(x))
        return x


class TSeineTransformer(tnn.Module):
    """Transformer3DModel (conv proj, seine/models/attention.py:314-436)."""

    def __init__(self, c, ctx_dim, heads, g, rot):
        super().__init__()
        self.norm = tnn.GroupNorm(g, c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, c, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TSeineBlock(c, ctx_dim, heads, rot)])
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x, ctx, f):  # x frame-folded [(B F), C, H, W]
        bf, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(bf, h * w, c)
        y = self.transformer_blocks[0](y, ctx, f)
        y = y.reshape(bf, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class TSeineUNet(tnn.Module):
    """Composed torch SEINE UNet3DConditionModel (reference layout + forward:
    seine/models/unet.py:366-511, unet_blocks.py:145-657, attention.py)."""

    def __init__(self, ch=(8, 16, 16, 16), g=4, ctx_dim=16, heads=2):
        super().__init__()
        self.ch, self.g = ch, g
        ted = ch[0] * 4
        RotaryEmbedding = _vendored_rotary()
        # one shared RotaryEmbedding(32) in the reference (unet.py:185);
        # clamped to the tiny head_dim here, so one instance per channel size
        self._rot = {c: RotaryEmbedding(min(32, c // heads)) for c in set(ch)}
        self.conv_in = tnn.Conv2d(9, ch[0], 3, padding=1)
        te = tnn.Module()
        te.linear_1 = tnn.Linear(ch[0], ted)
        te.linear_2 = tnn.Linear(ted, ted)
        self.time_embedding = te
        self.down_blocks = tnn.ModuleList()
        cin = ch[0]
        for i, c in enumerate(ch):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
            if i < 3:
                blk.attentions = tnn.ModuleList(
                    [TSeineTransformer(c, ctx_dim, heads, g, self._rot[c])])
                down = tnn.Module()
                down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([down])
            self.down_blocks.append(blk)
            cin = c
        mid = tnn.Module()
        c = ch[-1]
        mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                      TResnet(c, c, temb_dim=ted, groups=g)])
        mid.attentions = tnn.ModuleList(
            [TSeineTransformer(c, ctx_dim, heads, g, self._rot[c])])
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
            resnets = []
            for j in range(2):
                skip = stack.pop()
                resnets.append(TResnet(cur + skip, c, temb_dim=ted, groups=g))
                cur = c
            blk.resnets = tnn.ModuleList(resnets)
            if i > 0:
                blk.attentions = tnn.ModuleList(
                    [TSeineTransformer(c, ctx_dim, heads, g, self._rot[c])
                     for _ in range(2)])
            if i < 3:
                up = tnn.Module()
                up.conv = tnn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([up])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, sample, timestep, text):
        b, _, f, h, w = sample.shape
        te = self.time_embedding
        t_emb = te.linear_2(tF.silu(te.linear_1(
            tsinusoid(timestep.expand(b), self.ch[0]))))
        emb = t_emb.repeat_interleave(f, dim=0)
        ctx = text.repeat_interleave(f, dim=0)

        x = self.conv_in(fold_t(sample, f))
        skips = [x]
        for blk in self.down_blocks:
            for j in range(len(blk.resnets)):
                x = blk.resnets[j](x, emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx, f)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)
        m = self.mid_block
        x = m.resnets[0](x, emb)
        x = m.attentions[0](x, ctx, f)
        x = m.resnets[1](x, emb)
        for blk in self.up_blocks:
            for j in range(len(blk.resnets)):
                x = torch.cat([x, skips.pop()], dim=1)
                x = blk.resnets[j](x, emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx, f)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0].conv(
                    tF.interpolate(x, scale_factor=2, mode="nearest"))
        x = self.conv_out(tF.silu(self.conv_norm_out(x)))
        return unfold_t(x, f)


@pytest.mark.slow
def test_seine_full_unet_forward_golden():
    from anyv2v_tpu.models.unet_seine import SeineUNet, SeineUNetConfig

    torch.manual_seed(13)
    ch = (8, 16, 16, 16)
    skel = TSeineUNet(ch=ch).eval()
    b, f, h = 1, 2, 16
    sample = torch.randn(b, 9, f, h, h)
    text = torch.randn(b, 5, 16)
    with torch.no_grad():
        want = skel(sample, torch.tensor([981]), text)

    converted = C.convert_unet_seine(sd_np(skel), block_out_channels=ch,
                                     layers_per_block=1)
    cfg = SeineUNetConfig(block_out_channels=ch, layers_per_block=1,
                          cross_attention_dim=16, num_attention_heads=2,
                          norm_num_groups=4, dtype=jnp.float32)
    unet = SeineUNet(cfg)
    # flax layout: [B, F, h, w, 9]
    got = unet.apply(
        jax.tree_util.tree_map(jnp.asarray, converted),
        sample=t2j(sample),
        timestep=jnp.int32(981),
        encoder_hidden_states=jnp.asarray(text.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=2e-3,
                               atol=2e-3)


# ---------------------------------------------------------------------------
# SD1.5 (first-frame image editing: InstructPix2Pix / MagicBrush)
# ---------------------------------------------------------------------------


class TSDUNet(tnn.Module):
    """Composed torch UNet2DConditionModel in the SD1.5 ip2p layout
    (in_channels=8; diffusers semantics — ref usage
    black_box_image_edit/instructpix2pix.py:44-53)."""

    def __init__(self, ch=(8, 16, 16, 16), g=4, ctx_dim=16, heads=2):
        super().__init__()
        self.ch, self.g = ch, g
        ted = ch[0] * 4
        self.conv_in = tnn.Conv2d(8, ch[0], 3, padding=1)
        te = tnn.Module()
        te.linear_1 = tnn.Linear(ch[0], ted)
        te.linear_2 = tnn.Linear(ted, ted)
        self.time_embedding = te
        self.down_blocks = tnn.ModuleList()
        cin = ch[0]
        for i, c in enumerate(ch):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
            if i < 3:
                blk.attentions = tnn.ModuleList(
                    [TSpatialTransformer(c, ctx_dim, heads, c // heads, g)])
                down = tnn.Module()
                down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([down])
            self.down_blocks.append(blk)
            cin = c
        mid = tnn.Module()
        c = ch[-1]
        mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                      TResnet(c, c, temb_dim=ted, groups=g)])
        mid.attentions = tnn.ModuleList(
            [TSpatialTransformer(c, ctx_dim, heads, c // heads, g)])
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
            resnets = []
            for j in range(2):
                skip = stack.pop()
                resnets.append(TResnet(cur + skip, c, temb_dim=ted, groups=g))
                cur = c
            blk.resnets = tnn.ModuleList(resnets)
            if i > 0:
                blk.attentions = tnn.ModuleList(
                    [TSpatialTransformer(c, ctx_dim, heads, c // heads, g)
                     for _ in range(2)])
            if i < 3:
                up = tnn.Module()
                up.conv = tnn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([up])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, sample, timestep, text):
        b = sample.shape[0]
        te = self.time_embedding
        emb = te.linear_2(tF.silu(te.linear_1(
            tsinusoid(timestep.expand(b), self.ch[0]))))
        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            for j in range(len(blk.resnets)):
                x = blk.resnets[j](x, emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, text)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)
        m = self.mid_block
        x = m.resnets[0](x, emb)
        x = m.attentions[0](x, text)
        x = m.resnets[1](x, emb)
        for blk in self.up_blocks:
            for j in range(len(blk.resnets)):
                x = torch.cat([x, skips.pop()], dim=1)
                x = blk.resnets[j](x, emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, text)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0].conv(
                    tF.interpolate(x, scale_factor=2, mode="nearest"))
        return self.conv_out(tF.silu(self.conv_norm_out(x)))


@pytest.mark.slow
def test_sd_full_unet_forward_golden():
    from anyv2v_tpu.models.unet_sd import SDUNet, SDUNetConfig

    torch.manual_seed(14)
    ch = (8, 16, 16, 16)
    skel = TSDUNet(ch=ch).eval()
    b, h = 2, 16
    sample = torch.randn(b, 8, h, h)
    text = torch.randn(b, 5, 16)
    with torch.no_grad():
        want = skel(sample, torch.tensor([981]), text)

    converted = C.convert_unet_sd(sd_np(skel), block_out_channels=ch,
                                  layers_per_block=1, num_attention_heads=2)
    cfg = SDUNetConfig(block_out_channels=ch, layers_per_block=1,
                       cross_attention_dim=16, num_attention_heads=2,
                       norm_num_groups=4, dtype=jnp.float32)
    unet = SDUNet(cfg)
    got = unet.apply(
        jax.tree_util.tree_map(jnp.asarray, converted),
        sample=t2j(sample),
        timestep=jnp.float32(981.0),
        encoder_hidden_states=jnp.asarray(text.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=2e-3,
                               atol=2e-3)
