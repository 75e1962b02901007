"""Golden tests for the torch->flax weight converters (SURVEY.md §2.9 item 8).

diffusers is not installed in this image, so the oracles are:
- hand-built torch modules replicating diffusers semantics exactly (resnet,
  temporal conv, spatial/temporal transformers, the full VAE) — torch (CPU)
  IS installed;
- the vendored reference modules where importable (rotary_embedding,
  SEINE RelativePositionBias) via minimal import stubs.

Each test: random-init the torch module, state_dict() -> numpy -> converter
-> flax apply, compare outputs elementwise. This validates the key maps, the
transposes, AND the flax modules' numerics in one shot.
"""

import math
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from anyv2v_tpu.utils import convert as C


def sd_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def sd_pref(module, prefix="m"):
    """state dict with a synthetic parent prefix so block converters
    (which take a dotted prefix) can address a bare module."""
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


def t2j(x):
    """torch NCHW/NCFHW -> flax channels-last."""
    x = x.detach().numpy()
    if x.ndim == 4:
        return jnp.asarray(x.transpose(0, 2, 3, 1))
    if x.ndim == 5:
        return jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    return jnp.asarray(x)


# ---------------------------------------------------------------------------
# torch reference modules (diffusers semantics)
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    """diffusers ResnetBlock2D, default config."""

    def __init__(self, cin, cout, temb_dim=None, groups=4, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = tnn.Linear(temb_dim, cout)
        else:
            self.time_emb_proj = None
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb=None):
        h = self.conv1(tF.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(tF.silu(temb))[:, :, None, None]
        h = self.conv2(tF.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class TTempConv(tnn.Module):
    """diffusers TemporalConvLayer (4 conv stages, identity residual)."""

    def __init__(self, c, groups=4):
        super().__init__()
        k, p = (3, 1, 1), (1, 0, 0)
        self.conv1 = tnn.Sequential(tnn.GroupNorm(groups, c), tnn.SiLU(),
                                    tnn.Conv3d(c, c, k, padding=p))
        for name in ("conv2", "conv3", "conv4"):
            setattr(self, name, tnn.Sequential(
                tnn.GroupNorm(groups, c), tnn.SiLU(), tnn.Dropout(0.0),
                tnn.Conv3d(c, c, k, padding=p)))

    def forward(self, x):  # x: [B, C, F, H, W]
        return x + self.conv4(self.conv3(self.conv2(self.conv1(x))))


class TAttn(tnn.Module):
    """diffusers Attention: to_q/k/v (no bias), to_out = [Linear, Dropout]."""

    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim), tnn.Dropout(0.0)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, _ = x.shape
        q = self.to_q(x).view(b, s, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], self.heads, self.head_dim).transpose(1, 2)
        o = tF.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, -1)
        return self.to_out[0](o)


class TFF(tnn.Module):
    """diffusers FeedForward(geglu): net.0 = GEGLU(proj), net.2 = Linear."""

    def __init__(self, dim, mult=4):
        super().__init__()

        class GEGLU(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Linear(dim, dim * mult * 2)

            def forward(self, x):
                h, gate = self.proj(x).chunk(2, dim=-1)
                return h * tF.gelu(gate)

        self.net = tnn.ModuleList([GEGLU(), tnn.Dropout(0.0), tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TBasicBlock(tnn.Module):
    """diffusers BasicTransformerBlock (self + cross + geglu ff)."""

    def __init__(self, dim, ctx_dim, heads, head_dim, double_self=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttn(dim, dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttn(dim, dim if double_self else ctx_dim, heads, head_dim)
        self.double_self = double_self
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFF(dim)

    def forward(self, x, ctx=None):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), None if self.double_self else ctx)
        x = x + self.ff(self.norm3(x))
        return x


class TSpatialTransformer(tnn.Module):
    """diffusers Transformer2DModel with conv projections."""

    def __init__(self, c, ctx_dim, heads, head_dim, groups=4):
        super().__init__()
        inner = heads * head_dim
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, inner, 1)
        self.transformer_blocks = tnn.ModuleList([TBasicBlock(inner, ctx_dim, heads, head_dim)])
        self.proj_out = tnn.Conv2d(inner, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        y = self.transformer_blocks[0](y, ctx)
        y = y.reshape(b, h, w, -1).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class TTemporalTransformer(tnn.Module):
    """diffusers TransformerTemporalModel: linear projections, frames as
    tokens per pixel, double self-attention block."""

    def __init__(self, c, heads, head_dim, groups=4):
        super().__init__()
        inner = heads * head_dim
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, inner)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(inner, None, heads, head_dim, double_self=True)])
        self.proj_out = tnn.Linear(inner, c)

    def forward(self, x, num_frames):  # x: [(B F), C, H, W]
        bf, c, h, w = x.shape
        b = bf // num_frames
        res = x
        y = self.norm(x)
        y = y.permute(0, 2, 3, 1).reshape(bf, h * w, c)
        y = y.reshape(b, num_frames, h * w, c).permute(0, 2, 1, 3).reshape(
            b * h * w, num_frames, c)
        y = self.proj_in(y)
        y = self.transformer_blocks[0](y)
        y = self.proj_out(y)
        y = y.reshape(b, h * w, num_frames, c).permute(0, 2, 1, 3).reshape(bf, h * w, c)
        y = y.reshape(bf, h, w, c).permute(0, 3, 1, 2)
        return y + res


# ---------------------------------------------------------------------------
# block-level golden tests
# ---------------------------------------------------------------------------


def test_resnet_with_temb_golden():
    from anyv2v_tpu.models.layers import ResnetBlock2D

    torch.manual_seed(0)
    t = TResnet(8, 16, temb_dim=12).eval()
    x = torch.randn(2, 8, 6, 6)
    temb = torch.randn(2, 12)
    want = t(x, temb)

    params = {"params": C._resnet(sd_pref(t), "m")}
    m = ResnetBlock2D(16, groups=4)
    got = m.apply(jax.tree_util.tree_map(jnp.asarray, params), t2j(x), jnp.asarray(temb.numpy()))
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=1e-4, atol=2e-5)


def test_temporal_conv_golden():
    from anyv2v_tpu.models.layers import TemporalConvLayer

    torch.manual_seed(1)
    t = TTempConv(8).eval()
    x = torch.randn(2, 8, 3, 4, 4)  # [B, C, F, H, W]
    want = t(x)
    params = {"params": C._temp_conv(sd_pref(t), "m")}
    m = TemporalConvLayer(8, groups=4)
    got = m.apply(jax.tree_util.tree_map(jnp.asarray, params), t2j(x))
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=1e-4, atol=2e-5)


def test_spatial_transformer_golden():
    from anyv2v_tpu.models.layers import SpatialTransformer

    torch.manual_seed(2)
    t = TSpatialTransformer(8, 12, heads=2, head_dim=4).eval()
    x = torch.randn(2, 8, 4, 4)
    ctx = torch.randn(2, 5, 12)
    want = t(x, ctx)
    params = {"params": C._spatial_transformer(sd_pref(t), "m", heads=2,
                                               head_dim=4)}
    m = SpatialTransformer(heads=2, head_dim=4, cross_attention_dim=12, groups=4)
    got = m.apply(jax.tree_util.tree_map(jnp.asarray, params), t2j(x),
                  context=jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), t2j(want), rtol=1e-4, atol=2e-5)


def test_temporal_transformer_golden():
    from anyv2v_tpu.models.layers import TemporalTransformer

    torch.manual_seed(3)
    F = 3
    t = TTemporalTransformer(8, heads=2, head_dim=4).eval()
    x = torch.randn(2 * F, 8, 4, 4)
    want = t(x, num_frames=F)
    params = {"params": C._temporal_transformer(sd_pref(t), "m", heads=2,
                                                head_dim=4)}
    m = TemporalTransformer(heads=2, head_dim=4, cross_attention_dim=8, groups=4)
    # flax side takes [B, F, H, W, C]
    xj = t2j(x).reshape(2, F, 4, 4, 8)
    got = m.apply(jax.tree_util.tree_map(jnp.asarray, params), xj)
    np.testing.assert_allclose(np.asarray(got).reshape(2 * F, 4, 4, 8),
                               t2j(want), rtol=1e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# full VAE golden
# ---------------------------------------------------------------------------


class TVaeAttn(tnn.Module):
    def __init__(self, c, groups=4):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c), tnn.Dropout(0.0)])

    def forward(self, x):  # [B, C, H, W] -> attn output (no residual)
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = tF.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o)
        return o.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TVaeMid(tnn.Module):
    def __init__(self, c, groups=4):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(c, c, groups=groups, eps=1e-6),
                                       TResnet(c, c, groups=groups, eps=1e-6)])
        self.attentions = tnn.ModuleList([TVaeAttn(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = x + self.attentions[0](x)
        return self.resnets[1](x)


class TVaeDown(tnn.Module):
    def __init__(self, cin, cout, n_layers, add_down, groups=4):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout, groups=groups, eps=1e-6)
             for j in range(n_layers)])
        if add_down:
            down = tnn.Module()
            down.conv = tnn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = tnn.ModuleList([down])
        else:
            self.downsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = tF.pad(x, (0, 1, 0, 1))  # diffusers VAE: right/bottom pad
            x = self.downsamplers[0].conv(x)
        return x


class TVaeUp(tnn.Module):
    def __init__(self, cin, cout, n_layers, add_up, groups=4):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout, groups=groups, eps=1e-6)
             for j in range(n_layers)])
        if add_up:
            up = tnn.Module()
            up.conv = tnn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = tnn.ModuleList([up])
        else:
            self.upsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = tF.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TVAE(tnn.Module):
    """diffusers AutoencoderKL, tiny: channels (8, 8, 16, 16), 1 layer/blk."""

    CH = (8, 8, 16, 16)

    def __init__(self, ch=None, g=4):
        super().__init__()
        ch = ch or self.CH
        self.ch = ch
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, ch[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList([
            TVaeDown(ch[max(i - 1, 0)], ch[i], 1, add_down=i < 3, groups=g)
            for i in range(4)
        ])
        enc.mid_block = TVaeMid(ch[-1], g)
        enc.conv_norm_out = tnn.GroupNorm(g, ch[-1], eps=1e-6)
        enc.conv_out = tnn.Conv2d(ch[-1], 8, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(8, 8, 1)
        self.post_quant_conv = tnn.Conv2d(4, 4, 1)
        dec = tnn.Module()
        rev = tuple(reversed(ch))
        dec.conv_in = tnn.Conv2d(4, rev[0], 3, padding=1)
        dec.mid_block = TVaeMid(rev[0], g)
        dec.up_blocks = tnn.ModuleList([
            TVaeUp(rev[max(i - 1, 0)], rev[i], 2, add_up=i < 3, groups=g)
            for i in range(4)
        ])
        dec.conv_norm_out = tnn.GroupNorm(g, rev[-1], eps=1e-6)
        dec.conv_out = tnn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

    def encode(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            x = blk(x)
        x = e.mid_block(x)
        x = e.conv_out(tF.silu(e.conv_norm_out(x)))
        return self.quant_conv(x)

    def decode(self, z):
        d = self.decoder
        z = self.post_quant_conv(z)
        x = d.conv_in(z)
        x = d.mid_block(x)
        for blk in d.up_blocks:
            x = blk(x)
        return d.conv_out(tF.silu(d.conv_norm_out(x)))


def test_vae_golden_encode_decode():
    from anyv2v_tpu.models.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(4)
    t = TVAE().eval()
    sd = sd_np(t)
    params = C.convert_vae(sd, block_out_channels=TVAE.CH, layers_per_block=1)
    m = AutoencoderKL(VAEConfig(block_out_channels=TVAE.CH, layers_per_block=1,
                                norm_num_groups=4, dtype=jnp.float32))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want_moments = t.encode(x)
    got_moments = m.apply(params, t2j(x), method="encode_moments")
    np.testing.assert_allclose(np.asarray(got_moments), t2j(want_moments),
                               rtol=1e-4, atol=3e-5)

    z = torch.randn(2, 4, 4, 4)
    with torch.no_grad():
        want_img = t.decode(z)
    got_img = m.apply(params, t2j(z), method="decode")
    np.testing.assert_allclose(np.asarray(got_img), t2j(want_img),
                               rtol=1e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# vendored-module goldens (rotary, T5 rel-pos) via import stubs
# ---------------------------------------------------------------------------


def _install_stubs():
    import types

    if "beartype" not in sys.modules:
        bt = types.ModuleType("beartype")
        bt.beartype = lambda f: f
        bt_typing = types.ModuleType("beartype.typing")
        import typing

        for name in ("Literal", "Union", "Optional", "Tuple", "List", "Callable"):
            setattr(bt_typing, name, getattr(typing, name))
        bt.typing = bt_typing
        sys.modules["beartype"] = bt
        sys.modules["beartype.typing"] = bt_typing


def test_rotary_golden_vs_vendored():
    """Our ops.rotary vs the reference's vendored rotary_embedding_torch
    (consisti2v/consisti2v/models/rotary_embedding.py), including the
    RotaryEmbedding(dim=inner//2) partial-rotation convention and seq_pos
    override used for first-frame keys (videoldm_attention.py:588-599)."""
    _install_stubs()
    sys.path.insert(0, "/root/reference/consisti2v")
    try:
        from consisti2v.models.rotary_embedding import RotaryEmbedding
    finally:
        sys.path.pop(0)

    from anyv2v_tpu.ops.rotary import apply_rotary, rotary_angles, rotary_freqs

    torch.manual_seed(5)
    inner = 16
    rot_dim = inner // 2
    rot = RotaryEmbedding(rot_dim)
    x = torch.randn(2, 4, 5, inner)  # [b, heads, seq, dim] per reference usage

    with torch.no_grad():
        want = rot.rotate_queries_or_keys(x)

    freqs = jnp.asarray(rotary_freqs(rot_dim))
    pos = jnp.arange(5, dtype=jnp.float32)
    xj = jnp.asarray(x.numpy())
    got = xj.at[..., :rot_dim].set(
        apply_rotary(xj[..., :rot_dim], rotary_angles(pos, freqs)))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)

    # seq_pos override: zero positions leave the content unrotated at pos 0
    with torch.no_grad():
        want0 = rot.rotate_queries_or_keys(x, seq_pos=torch.zeros(5, dtype=torch.long))
    got0 = xj.at[..., :rot_dim].set(
        apply_rotary(xj[..., :rot_dim], rotary_angles(jnp.zeros(5), freqs)))
    np.testing.assert_allclose(np.asarray(got0), want0.numpy(), rtol=1e-5, atol=1e-5)


def test_t5_relpos_golden_vs_vendored():
    """Our ops.relpos vs SEINE's RelativePositionBias
    (seine/models/attention.py:930-967) with the buckets/max_distance the
    reference uses (32/32)."""
    import importlib.util

    # import just the RelativePositionBias class by executing its source in a
    # namespace with the needed names (the full module needs diffusers)
    import inspect
    src = open("/root/reference/seine/models/attention.py").read()
    start = src.index("class RelativePositionBias")
    cls_src = src[start:]
    ns = {"torch": torch, "nn": tnn, "math": math}
    from einops import rearrange
    ns["rearrange"] = rearrange
    exec(compile(cls_src, "relpos_ref", "exec"), ns)
    RefBias = ns["RelativePositionBias"]

    from anyv2v_tpu.ops.relpos import relative_position_bias

    torch.manual_seed(6)
    heads, buckets, maxd, n = 4, 32, 32, 9
    ref = RefBias(heads=heads, num_buckets=buckets, max_distance=maxd)
    with torch.no_grad():
        want = ref(n, device="cpu")  # [heads, n, n]

    table = jnp.asarray(ref.relative_attention_bias.weight.detach().numpy())
    got = relative_position_bias(table, n, n, num_buckets=buckets, max_distance=maxd)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# full-UNet structural checks: converted tree == module tree (keys + shapes)
# ---------------------------------------------------------------------------


def _zeros_sd(keys_shapes):
    return {k: np.zeros(s, np.float32) for k, s in keys_shapes.items()}


@pytest.mark.slow
def test_i2vgen_unet_structural_conversion():
    """Build a torch I2VGenXLUNet skeleton (diffusers module layout, tiny
    sizes), convert its state dict, and require exact key/shape agreement
    with the flax module's init tree."""
    from anyv2v_tpu.models.unet_i2vgen import I2VGenUNet, I2VGenUNetConfig

    ch = (8, 16, 16, 16)
    g, ctx_dim, heads, hd = 4, 16, 2, 4
    ted = ch[0] * 4

    class Skeleton(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn.Conv2d(8, ch[0], 3, padding=1)
            self.transformer_in = TTemporalTransformer(ch[0], 8, hd, groups=g)
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
            # the temporal encoder FF is plain gelu (not geglu): net.0 = GELU
            # wrapper with .proj Linear(dim, inner), net.2 = Linear(inner, dim)
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
                tnn.Linear(ted * 4, ctx_dim * 2))
            self.down_blocks = tnn.ModuleList()
            cin = ch[0]
            for i, c in enumerate(ch):
                blk = tnn.Module()
                blk.resnets = tnn.ModuleList([TResnet(cin if j == 0 else c, c,
                                                      temb_dim=ted, groups=g)
                                              for j in range(1)])
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
            # up path: channels mirror the flax loop (rev with skip concat)
            rev = tuple(reversed(ch))
            self.up_blocks = tnn.ModuleList()
            skip_chs = []  # emulate the skip stack to size resnet inputs
            stack = [ch[0]]
            cin2 = ch[0]
            for i, c in enumerate(ch):
                for j in range(1):
                    stack.append(c)
                if i < 3:
                    stack.append(c)
            cur = ch[-1]
            for i, c in enumerate(rev):
                blk = tnn.Module()
                resnets = []
                for j in range(2):
                    skip = stack.pop()
                    resnets.append(TResnet(cur + skip, c, temb_dim=ted, groups=g))
                    cur = c
                blk.resnets = tnn.ModuleList(resnets)
                blk.temp_convs = tnn.ModuleList([TTempConv(c, g), TTempConv(c, g)])
                if i > 0:
                    blk.attentions = tnn.ModuleList(
                        [TSpatialTransformer(c, ctx_dim, heads, c // heads, g)] * 1)
                    blk.temp_attentions = tnn.ModuleList(
                        [TTemporalTransformer(c, heads, c // heads, g)])
                    # two layers (layers_per_block+1 = 2) share attn count=2
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

    torch.manual_seed(7)
    skel = Skeleton()
    converted = C.convert_unet_i2vgen(sd_np(skel), block_out_channels=ch,
                                      layers_per_block=1,
                                      attention_head_dim=4)

    cfg = I2VGenUNetConfig(block_out_channels=ch, layers_per_block=1,
                           cross_attention_dim=ctx_dim, attention_head_dim=4,
                           norm_num_groups=g, num_image_context_tokens=2,
                           dtype=jnp.float32)
    unet = I2VGenUNet(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            sample=jnp.zeros((1, 2, 16, 16, 4)),
            timestep=jnp.int32(0),
            encoder_hidden_states=jnp.zeros((1, 4, ctx_dim)),
            fps=jnp.int32(8),
            image_latents=jnp.zeros((1, 2, 16, 16, 4)),
            image_embeddings=jnp.zeros((1, 1, ctx_dim)),
        ))
    C.assert_params_match(shapes, converted)


@pytest.mark.slow
def test_videoldm_unet_structural_conversion():
    """Torch skeleton following the vendored VideoLDMUNet3DConditionModel
    layout (resnets/conv3ds/attentions/tempo_attns,
    videoldm_unet_blocks.py:438-492) -> convert -> exact tree match."""
    from anyv2v_tpu.models.unet_videoldm import VideoLDMUNet, VideoLDMUNetConfig

    ch = (8, 16, 16, 16)
    g, ctx_dim, hd, n_temp = 4, 16, 4, 2
    ted = ch[0] * 4

    class TAlphaResnet(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm1 = tnn.GroupNorm(g, c, eps=1e-6)
            self.conv1 = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
            self.time_emb_proj = tnn.Linear(ted, c)  # vestigial in reference
            self.norm2 = tnn.GroupNorm(g, c, eps=1e-6)
            self.conv2 = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
            self.alpha = tnn.Parameter(torch.ones(1))

    class TCondBlock(tnn.Module):
        def __init__(self, c_inner, cross):
            super().__init__()
            self.norm1 = tnn.LayerNorm(c_inner)
            self.attn1 = TAttn(c_inner, c_inner, 2, c_inner // 2)
            self.norm2 = tnn.LayerNorm(c_inner)
            self.attn2 = TAttn(c_inner, cross, 2, c_inner // 2)
            self.norm3 = tnn.LayerNorm(c_inner)
            self.ff = TFF(c_inner)

    class TSpatial(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(g, c, eps=1e-6)
            self.proj_in = tnn.Linear(c, c)     # SD2.x linear projection path
            self.transformer_blocks = tnn.ModuleList([TCondBlock(c, ctx_dim)])
            self.proj_out = tnn.Linear(c, c)

    class TTempo(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(g, c, eps=1e-6)
            self.proj_in = tnn.Linear(c, c)
            self.transformer_blocks = tnn.ModuleList([TCondBlock(c, ctx_dim)])
            self.proj_out = tnn.Linear(c, c)
            self.alpha = tnn.Parameter(torch.ones(1))

    class Skeleton(tnn.Module):
        def __init__(self):
            super().__init__()
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
                blk.resnets = tnn.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
                blk.conv3ds = tnn.ModuleList([TAlphaResnet(c)])
                if i < 3:
                    blk.attentions = tnn.ModuleList([TSpatial(c)])
                    blk.tempo_attns = tnn.ModuleList([TTempo(c)])
                    down = tnn.Module()
                    down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                    blk.downsamplers = tnn.ModuleList([down])
                self.down_blocks.append(blk)
                cin = c
            mid = tnn.Module()
            c = ch[-1]
            mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                          TResnet(c, c, temb_dim=ted, groups=g)])
            mid.conv3ds = tnn.ModuleList([TAlphaResnet(c), TAlphaResnet(c)])
            mid.attentions = tnn.ModuleList([TSpatial(c)])
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
                blk.conv3ds = tnn.ModuleList([TAlphaResnet(c), TAlphaResnet(c)])
                if i > 0:
                    blk.attentions = tnn.ModuleList([TSpatial(c), TSpatial(c)])
                    blk.tempo_attns = tnn.ModuleList([TTempo(c), TTempo(c)])
                if i < 3:
                    up = tnn.Module()
                    up.conv = tnn.Conv2d(c, c, 3, padding=1)
                    blk.upsamplers = tnn.ModuleList([up])
                self.up_blocks.append(blk)
            self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
            self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    torch.manual_seed(8)
    skel = Skeleton()
    converted = C.convert_unet_videoldm(sd_np(skel), block_out_channels=ch,
                                        layers_per_block=1)

    cfg = VideoLDMUNetConfig(block_out_channels=ch, layers_per_block=1,
                             cross_attention_dim=ctx_dim, attention_head_dim=hd,
                             n_temp_heads=n_temp, norm_num_groups=g,
                             dtype=jnp.float32)
    unet = VideoLDMUNet(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            sample=jnp.zeros((1, 2, 16, 16, 4)),
            timestep=jnp.int32(0),
            encoder_hidden_states=jnp.zeros((1, 4, ctx_dim)),
            first_frame_latents=jnp.zeros((1, 1, 16, 16, 4)),
            frame_stride=jnp.int32(3),
        ))
    C.assert_params_match(shapes, converted)


@pytest.mark.slow
def test_seine_unet_structural_conversion():
    """Torch skeleton following seine/models layout (attn1/attn2/attn_temp,
    time_rel_pos_bias embedding) -> convert -> exact tree match."""
    from anyv2v_tpu.models.unet_seine import SeineUNet, SeineUNetConfig

    ch = (8, 16, 16, 16)
    g, ctx_dim, heads = 4, 16, 2
    ted = ch[0] * 4

    class TSeineBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm1 = tnn.LayerNorm(c)
            self.attn1 = TAttn(c, c, heads, c // heads)
            self.norm2 = tnn.LayerNorm(c)
            self.attn2 = TAttn(c, ctx_dim, heads, c // heads)
            self.norm_temp = tnn.LayerNorm(c)
            self.attn_temp = TAttn(c, c, heads, c // heads)
            bias = tnn.Module()
            bias.relative_attention_bias = tnn.Embedding(32, heads)
            self.attn_temp.time_rel_pos_bias = bias
            self.norm3 = tnn.LayerNorm(c)
            self.ff = TFF(c)

    class TSeineTransformer(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(g, c, eps=1e-6)
            self.proj_in = tnn.Conv2d(c, c, 1)
            self.transformer_blocks = tnn.ModuleList([TSeineBlock(c)])
            self.proj_out = tnn.Conv2d(c, c, 1)

    class Skeleton(tnn.Module):
        def __init__(self):
            super().__init__()
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
                    blk.attentions = tnn.ModuleList([TSeineTransformer(c)])
                    down = tnn.Module()
                    down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                    blk.downsamplers = tnn.ModuleList([down])
                self.down_blocks.append(blk)
                cin = c
            mid = tnn.Module()
            c = ch[-1]
            mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                          TResnet(c, c, temb_dim=ted, groups=g)])
            mid.attentions = tnn.ModuleList([TSeineTransformer(c)])
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
                        [TSeineTransformer(c), TSeineTransformer(c)])
                if i < 3:
                    up = tnn.Module()
                    up.conv = tnn.Conv2d(c, c, 3, padding=1)
                    blk.upsamplers = tnn.ModuleList([up])
                self.up_blocks.append(blk)
            self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
            self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    torch.manual_seed(9)
    skel = Skeleton()
    converted = C.convert_unet_seine(sd_np(skel), block_out_channels=ch,
                                     layers_per_block=1)

    cfg = SeineUNetConfig(block_out_channels=ch, layers_per_block=1,
                          cross_attention_dim=ctx_dim, num_attention_heads=heads,
                          norm_num_groups=g, dtype=jnp.float32)
    unet = SeineUNet(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            sample=jnp.zeros((1, 2, 16, 16, 9)),
            timestep=jnp.int32(0),
            encoder_hidden_states=jnp.zeros((1, 4, ctx_dim)),
        ))
    C.assert_params_match(shapes, converted)


@pytest.mark.slow
def test_controlnet_structural_conversion():
    """Torch ControlNetModel skeleton (SDXL layout) -> convert_controlnet ->
    exact tree match with models.controlnet.ControlNet."""
    from anyv2v_tpu.models.controlnet import ControlNet
    from anyv2v_tpu.models.unet_sd import SDUNetConfig

    ch = (8, 16, 16)
    g, ctx = 4, 16
    ted = ch[0] * 4
    pooled, add_dim = 16, 8
    depth = (1, 1, 2)
    cross = (False, True, True)

    class Skeleton(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn.Conv2d(4, ch[0], 3, padding=1)
            for name in ("time_embedding", "add_embedding"):
                m = tnn.Module()
                m.linear_1 = tnn.Linear(ch[0] if name == "time_embedding"
                                        else pooled + 6 * add_dim, ted)
                m.linear_2 = tnn.Linear(ted, ted)
                setattr(self, name, m)
            ce = tnn.Module()
            ce.conv_in = tnn.Conv2d(3, 16, 3, padding=1)
            ce.blocks = tnn.ModuleList([
                tnn.Conv2d(16, 16, 3, padding=1), tnn.Conv2d(16, 32, 3, 2, 1),
                tnn.Conv2d(32, 32, 3, padding=1), tnn.Conv2d(32, 96, 3, 2, 1),
                tnn.Conv2d(96, 96, 3, padding=1), tnn.Conv2d(96, 256, 3, 2, 1),
            ])
            ce.conv_out = tnn.Conv2d(256, ch[0], 3, padding=1)
            self.controlnet_cond_embedding = ce
            self.down_blocks = tnn.ModuleList()
            cin = ch[0]
            cdowns = [tnn.Conv2d(ch[0], ch[0], 1)]
            for i, c in enumerate(ch):
                blk = tnn.Module()
                blk.resnets = tnn.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
                if cross[i]:
                    t = TSpatialTransformer(c, ctx, 2, c // 2, g)
                    t.transformer_blocks = tnn.ModuleList(
                        [TBasicBlock(c, ctx, 2, c // 2) for _ in range(depth[i])])
                    blk.attentions = tnn.ModuleList([t])
                cdowns.append(tnn.Conv2d(c, c, 1))
                if i < 2:
                    down = tnn.Module()
                    down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                    blk.downsamplers = tnn.ModuleList([down])
                    cdowns.append(tnn.Conv2d(c, c, 1))
                self.down_blocks.append(blk)
                cin = c
            self.controlnet_down_blocks = tnn.ModuleList(cdowns)
            mid = tnn.Module()
            c = ch[-1]
            mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                          TResnet(c, c, temb_dim=ted, groups=g)])
            t = TSpatialTransformer(c, ctx, 2, c // 2, g)
            t.transformer_blocks = tnn.ModuleList(
                [TBasicBlock(c, ctx, 2, c // 2) for _ in range(depth[-1])])
            mid.attentions = tnn.ModuleList([t])
            self.mid_block = mid
            self.controlnet_mid_block = tnn.Conv2d(c, c, 1)

    torch.manual_seed(11)
    skel = Skeleton()
    from anyv2v_tpu.utils import convert as C2

    converted = C2.convert_controlnet(sd_np(skel), block_out_channels=ch,
                                      layers_per_block=1,
                                      cross_attn_blocks=cross,
                                      transformer_depth=depth)
    cfg = SDUNetConfig(in_channels=4, block_out_channels=ch, layers_per_block=1,
                       cross_attention_dim=ctx, num_attention_heads=(2, 2, 2),
                       transformer_depth=depth, cross_attn_blocks=cross,
                       norm_num_groups=g, addition_embed="sdxl",
                       addition_time_embed_dim=add_dim,
                       projection_class_embeddings_input_dim=pooled + 6 * add_dim,
                       dtype=jnp.float32)
    cn = ControlNet(cfg)
    shapes = jax.eval_shape(
        lambda: cn.init(jax.random.PRNGKey(0),
                        sample=jnp.zeros((1, 8, 8, 4)),
                        timestep=jnp.float32(1.0),
                        encoder_hidden_states=jnp.zeros((1, 4, ctx)),
                        controlnet_cond=jnp.zeros((1, 64, 64, 3)),
                        added_text_embeds=jnp.zeros((1, pooled)),
                        added_time_ids=jnp.zeros((1, 6))))
    C2.assert_params_match(shapes, converted)


def test_ip_adapter_conversion_targets_style_block():
    """Synthetic ip-adapter state dict -> target-block-only ip trees whose
    indices follow diffusers' attn_processors order (down, mid, up; attn2 at
    odd positions), merged into an SDUNet tree with ip_adapter_targets."""
    from anyv2v_tpu.models.unet_sd import SDUNet, SDUNetConfig
    from anyv2v_tpu.utils import convert as C2

    ch = (8, 16, 16)
    depth = (1, 1, 2)
    cross = (False, True, True)
    ctx = 16
    order = C2.sdxl_attn2_order(ch, 1, cross, depth)
    # synthesize ip weights for every attn2
    ip_sd = {
        "image_proj": {
            "proj.weight": np.zeros((4 * ctx, 8), np.float32),
            "proj.bias": np.zeros((4 * ctx,), np.float32),
            "norm.weight": np.ones((ctx,), np.float32),
            "norm.bias": np.zeros((ctx,), np.float32),
        },
        "ip_adapter": {},
    }
    for pos, (kind, i, j, k) in enumerate(order):
        idx = 2 * pos + 1
        c = ch[-1] if kind in ("mid",) else (ch[i] if kind == "down"
                                             else tuple(reversed(ch))[i])
        ip_sd["ip_adapter"][f"{idx}.to_k_ip.weight"] = np.full((c, ctx), pos,
                                                               np.float32)
        ip_sd["ip_adapter"][f"{idx}.to_v_ip.weight"] = np.full((c, ctx), pos,
                                                               np.float32)

    proj, per_block = C2.convert_ip_adapter(
        ip_sd, target_blocks=("up_0_attn_1",), block_out_channels=ch,
        layers_per_block=1, cross_attn_blocks=cross, transformer_depth=depth)
    assert set(per_block) == {"up_0_attn_1"}
    assert set(per_block["up_0_attn_1"]) == {"blocks_0", "blocks_1"}
    # index bookkeeping: the up_0_attn_1 entries are the ones at their
    # positions in the traversal order
    expected_pos = [p for p, o in enumerate(order)
                    if o[0] == "up" and o[1] == 0 and o[2] == 1]
    got = per_block["up_0_attn_1"]["blocks_0"]["attn2"]["to_k_ip"]["kernel"]
    assert got[0, 0] == expected_pos[0]

    # merged tree matches the ip-enabled flax module structurally
    unet_cfg = SDUNetConfig(
        in_channels=4, block_out_channels=ch, layers_per_block=1,
        cross_attention_dim=ctx, num_attention_heads=(2, 2, 2),
        transformer_depth=depth, cross_attn_blocks=cross, norm_num_groups=4,
        addition_embed="sdxl", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 48,
        ip_adapter_targets=("up_0_attn_1",), dtype=jnp.float32)
    unet = SDUNet(unet_cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0),
                          sample=jnp.zeros((1, 8, 8, 4)),
                          timestep=jnp.float32(1.0),
                          encoder_hidden_states=jnp.zeros((1, 4, ctx)),
                          added_text_embeds=jnp.zeros((1, 16)),
                          added_time_ids=jnp.zeros((1, 6)),
                          ip_tokens=jnp.zeros((1, 4, ctx))))
    flat = C2.tree_shapes(shapes)
    ip_keys = [k for k in flat if "to_k_ip" in k or "to_v_ip" in k]
    assert sorted(ip_keys) == sorted(
        f"params/up_0_attn_1/blocks_{k}/attn2/{n}/kernel"
        for k in (0, 1) for n in ("to_k_ip", "to_v_ip"))


@pytest.mark.slow
def test_convert_checkpoint_cli_end_to_end(tmp_path):
    """Synthesize a complete fake i2vgen-xl snapshot dir (torch modules in
    diffusers layout, tiny sizes) -> convert_checkpoint CLI (with structural
    validation) -> build_i2vgen_pipeline(init=npz) -> run invert + PnP edit
    on the CONVERTED weights, and golden-check the text encoder against the
    HF source model."""
    import json

    from safetensors.numpy import save_file

    transformers = pytest.importorskip("transformers")

    ch = (16, 32, 32, 32)
    g, ctx, ted = 8, 32, 64

    class Skeleton(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn.Conv2d(8, ch[0], 3, padding=1)
            self.transformer_in = TTemporalTransformer(ch[0], 8, 8, groups=g)
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
            net0 = tnn.Module(); net0.proj = tnn.Linear(4, 16)
            gelu_ff.net = tnn.ModuleList([net0, tnn.Dropout(0.0), tnn.Linear(16, 4)])
            enc.ff = gelu_ff
            self.image_latents_temporal_encoder = enc
            self.image_latents_context_embedding = tnn.Sequential(
                tnn.Conv2d(4, 32, 3, padding=1), tnn.SiLU(),
                tnn.AdaptiveAvgPool2d((32, 32)),
                tnn.Conv2d(32, 64, 3, stride=2, padding=1), tnn.SiLU(),
                tnn.Conv2d(64, ctx, 3, stride=2, padding=1))
            self.context_embedding = tnn.Sequential(
                tnn.Linear(ctx, ted * 4), tnn.SiLU(),
                tnn.Linear(ted * 4, ctx * 2))   # 2 image context tokens
            self.down_blocks = tnn.ModuleList()
            cin = ch[0]
            for i, c in enumerate(ch):
                blk = tnn.Module()
                blk.resnets = tnn.ModuleList([TResnet(cin, c, temb_dim=ted, groups=g)])
                blk.temp_convs = tnn.ModuleList([TTempConv(c, g)])
                if i < 3:
                    blk.attentions = tnn.ModuleList(
                        [TSpatialTransformer(c, ctx, 8, c // 8, g)])
                    blk.temp_attentions = tnn.ModuleList(
                        [TTemporalTransformer(c, 8, c // 8, g)])
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
            mid.attentions = tnn.ModuleList([TSpatialTransformer(c, ctx, 8, c // 8, g)])
            mid.temp_attentions = tnn.ModuleList([TTemporalTransformer(c, 8, c // 8, g)])
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
                blk.temp_convs = tnn.ModuleList([TTempConv(c, g), TTempConv(c, g)])
                if i > 0:
                    blk.attentions = tnn.ModuleList(
                        [TSpatialTransformer(c, ctx, 8, c // 8, g) for _ in range(2)])
                    blk.temp_attentions = tnn.ModuleList(
                        [TTemporalTransformer(c, 8, c // 8, g) for _ in range(2)])
                if i < 3:
                    up = tnn.Module()
                    up.conv = tnn.Conv2d(c, c, 3, padding=1)
                    blk.upsamplers = tnn.ModuleList([up])
                self.up_blocks.append(blk)
            self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
            self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    torch.manual_seed(12)
    src = tmp_path / "snapshot"
    # unet
    (src / "unet").mkdir(parents=True)
    unet_t = Skeleton()
    save_file({k: np.ascontiguousarray(v) for k, v in sd_np(unet_t).items()},
              str(src / "unet" / "diffusion_pytorch_model.safetensors"))
    (src / "unet" / "config.json").write_text(json.dumps({
        "block_out_channels": list(ch), "layers_per_block": 1,
        "attention_head_dim": 8, "cross_attention_dim": ctx,
        "norm_num_groups": g}))
    # vae (i2vgen-tiny VAEConfig: (16,16,32,32), 1 layer, groups 8)
    (src / "vae").mkdir()
    vae_t = TVAE(ch=(16, 16, 32, 32), g=8)
    save_file({k: np.ascontiguousarray(v) for k, v in sd_np(vae_t).items()},
              str(src / "vae" / "diffusion_pytorch_model.safetensors"))
    (src / "vae" / "config.json").write_text(json.dumps({
        "block_out_channels": [16, 16, 32, 32], "layers_per_block": 1}))
    # text encoder (transformers, matching i2vgen-tiny text cfg)
    (src / "text_encoder").mkdir()
    hf_text = transformers.CLIPTextModel(transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="gelu")).eval()
    save_file({k: np.ascontiguousarray(v) for k, v in sd_np(hf_text).items()},
              str(src / "text_encoder" / "model.safetensors"))
    (src / "text_encoder" / "config.json").write_text(
        json.dumps({"num_hidden_layers": 2}))
    # image encoder
    (src / "image_encoder").mkdir()
    hf_vis = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=224, patch_size=32,
            projection_dim=32, hidden_act="gelu")).eval()
    save_file({k: np.ascontiguousarray(v) for k, v in sd_np(hf_vis).items()},
              str(src / "image_encoder" / "model.safetensors"))
    (src / "image_encoder" / "config.json").write_text(
        json.dumps({"num_hidden_layers": 2}))

    # --- convert via the CLI (validation on: block_out_channels etc. from
    #     the fake config.json must produce a tree matching the flax module)
    from anyv2v_tpu.cli import convert_checkpoint

    out_npz = str(tmp_path / "i2v_tiny.npz")
    convert_checkpoint.main(["--backbone", "i2vgen-xl", "--src", str(src),
                             "--out", out_npz])
    assert os.path.exists(out_npz)

    # --- build from the converted npz and RUN the two-phase flow -----------
    from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline

    pipe = build_i2vgen_pipeline(arch="i2vgen-tiny", init=out_npz,
                                 dtype=jnp.float32)
    # converted text encoder must match the HF source exactly
    ids = np.zeros((1, 8), np.int64); ids[0, 0] = 49406; ids[0, 1] = 49407
    with torch.no_grad():
        want = hf_text(torch.from_numpy(np.pad(ids, ((0, 0), (0, 69)),
                                               constant_values=0))
                       ).last_hidden_state.numpy()[:, :8]
    got = np.asarray(pipe.encode_text(jnp.asarray(
        np.pad(ids, ((0, 0), (0, 69)), constant_values=0))))[:, :8]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    rng2 = np.random.RandomState(0)
    frames01 = jnp.asarray(rng2.rand(2, 128, 128, 3).astype(np.float32))
    latents = pipe.encode_video(frames01)
    text = pipe.encode_text(jnp.zeros((1, 8), jnp.int32))
    img_lat = pipe.prepare_image_latents(frames01[0], 2)
    img_emb = pipe.encode_image_clip(jnp.asarray(
        rng2.rand(1, 224, 224, 3).astype(np.float32)))
    traj, inv_ts = pipe.invert(latents, text, img_lat, img_emb,
                               num_inversion_steps=10)
    out = pipe.sample_with_pnp(
        traj, inv_ts,
        text_embeds_all=jnp.tile(text, (3, 1, 1)),
        image_latents_all=jnp.tile(img_lat, (3, 1, 1, 1, 1)),
        image_embeds_all=jnp.tile(img_emb, (3, 1, 1)),
        num_inference_steps=5, t_idx=1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_convert_seine_checkpoint_end_to_end(tmp_path):
    """SEINE conversion path: SD1.4-style snapshot dir (vae + text_encoder)
    plus a torch-pickled seine.pt whose weights live under the "ema" key
    (reference seine/run_ddim_inversion.py:77) -> npz -> SeinePipeline runs
    the masked two-phase flow on the converted weights."""
    import json

    from safetensors.numpy import save_file

    transformers = pytest.importorskip("transformers")

    # reuse the SEINE structural skeleton at seine-tiny sizes
    ch = (8, 16, 16, 16)
    g, ctx, heads = 4, 16, 2
    ted = ch[0] * 4

    class TSeineBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm1 = tnn.LayerNorm(c)
            self.attn1 = TAttn(c, c, heads, c // heads)
            self.norm2 = tnn.LayerNorm(c)
            self.attn2 = TAttn(c, ctx, heads, c // heads)
            self.norm_temp = tnn.LayerNorm(c)
            self.attn_temp = TAttn(c, c, heads, c // heads)
            bias = tnn.Module()
            bias.relative_attention_bias = tnn.Embedding(32, heads)
            self.attn_temp.time_rel_pos_bias = bias
            self.norm3 = tnn.LayerNorm(c)
            self.ff = TFF(c)

    class TSeineTransformer(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(g, c, eps=1e-6)
            self.proj_in = tnn.Conv2d(c, c, 1)
            self.transformer_blocks = tnn.ModuleList([TSeineBlock(c)])
            self.proj_out = tnn.Conv2d(c, c, 1)

    class Skeleton(tnn.Module):
        def __init__(self):
            super().__init__()
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
                    blk.attentions = tnn.ModuleList([TSeineTransformer(c)])
                    down = tnn.Module()
                    down.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                    blk.downsamplers = tnn.ModuleList([down])
                self.down_blocks.append(blk)
                cin = c
            mid = tnn.Module()
            c = ch[-1]
            mid.resnets = tnn.ModuleList([TResnet(c, c, temb_dim=ted, groups=g),
                                          TResnet(c, c, temb_dim=ted, groups=g)])
            mid.attentions = tnn.ModuleList([TSeineTransformer(c)])
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
                        [TSeineTransformer(c), TSeineTransformer(c)])
                if i < 3:
                    up = tnn.Module()
                    up.conv = tnn.Conv2d(c, c, 3, padding=1)
                    blk.upsamplers = tnn.ModuleList([up])
                self.up_blocks.append(blk)
            self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
            self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    torch.manual_seed(13)
    skel = Skeleton()
    ckpt = tmp_path / "seine.pt"
    torch.save({"ema": skel.state_dict(), "other": {"junk": 1}}, str(ckpt))

    sd_dir = tmp_path / "sd14"
    (sd_dir / "vae").mkdir(parents=True)
    vae_t = TVAE(ch=(8, 8, 16, 16), g=4)
    save_file({k: np.ascontiguousarray(v) for k, v in sd_np(vae_t).items()},
              str(sd_dir / "vae" / "diffusion_pytorch_model.safetensors"))
    (sd_dir / "vae" / "config.json").write_text(json.dumps(
        {"block_out_channels": [8, 8, 16, 16], "layers_per_block": 1}))
    (sd_dir / "text_encoder").mkdir()
    hf_text = transformers.CLIPTextModel(transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu")).eval()
    save_file({k: np.ascontiguousarray(v) for k, v in sd_np(hf_text).items()},
              str(sd_dir / "text_encoder" / "model.safetensors"))
    (sd_dir / "text_encoder" / "config.json").write_text(
        json.dumps({"num_hidden_layers": 1}))

    from anyv2v_tpu.utils.convert import convert_seine_checkpoint
    from anyv2v_tpu.utils.model_zoo import save_params

    params, meta = convert_seine_checkpoint(str(sd_dir), str(ckpt),
                                            block_out_channels=ch,
                                            layers_per_block=1)
    out_npz = str(tmp_path / "seine_tiny.npz")
    save_params(out_npz, params, meta=meta)

    from anyv2v_tpu.utils.model_zoo import build_seine_pipeline

    pipe = build_seine_pipeline(arch="seine-tiny", init=out_npz)
    rng2 = np.random.RandomState(0)
    frames01 = jnp.asarray(rng2.rand(2, 64, 64, 3).astype(np.float32))
    latents = pipe.encode_video(frames01)
    mask, masked = pipe.build_masked_inputs(frames01[0], 2)
    text = pipe.encode_text(jnp.zeros((1, 8), jnp.int32))
    traj, ts = pipe.invert(latents, mask, masked, text,
                           num_inversion_steps=10, num_save_steps=10)
    assert np.isfinite(np.asarray(traj)).all()
