"""Minimal torch replicas of the SD UNet / ControlNet / VAE architectures.

Golden oracles for editanything_tpu/models/{unet,controlnet,vae}.py,
hand-built (diffusers is not installed in this image) from the published
architecture the reference uses:

- UNet blocks: /root/reference/ldm/modules/diffusionmodules/openaimodel.py
  :162-410 (ResBlock/SpatialTransformer), consumed via diffusers pipelines
- ControlNet: /root/reference/cldm/cldm.py:48-305 +
  utils/stable_diffusion_controlnet.py:665-815 (ControlNetModel2 with 2-D
  scale maps and guess mode)
- VAE: /root/reference/ldm/modules/diffusionmodules/model.py:41-152 +
  ldm/models/autoencoder.py:13

Module/attribute names follow the diffusers state-dict layout, which is the
naming scheme editanything_tpu's param trees mirror — so these replicas
exercise checkpoints/convert.py::diffusers_to_tree on every key.
Inference-only (dropout identity); fp32.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


def timestep_embedding(t, dim, flip_sin_to_cos=True, shift=0.0):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32)
                      / (half - shift))
    args = t.float()[:, None] * freqs[None]
    if flip_sin_to_cos:
        return torch.cat([args.cos(), args.sin()], dim=-1)
    return torch.cat([args.sin(), args.cos()], dim=-1)


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, query_dim, context_dim=None, heads=8, bias=False):
        super().__init__()
        context_dim = context_dim or query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, query_dim, bias=bias)
        self.to_k = nn.Linear(context_dim, query_dim, bias=bias)
        self.to_v = nn.Linear(context_dim, query_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(query_dim, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, c = x.shape
        h = self.heads
        q = self.to_q(x).view(b, n, h, c // h).transpose(1, 2)
        k = self.to_k(context).view(b, -1, h, c // h).transpose(1, 2)
        v = self.to_v(context).view(b, -1, h, c // h).transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
        out = attn.softmax(-1) @ v
        out = out.transpose(1, 2).reshape(b, n, c)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads=heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, context_dim, heads=heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList(
            [GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim)])

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff.net[2](self.ff.net[0](self.norm3(x)))


class Transformer2DModel(nn.Module):
    def __init__(self, channels, context_dim, heads, depth=1,
                 use_linear=False, groups=32):
        super().__init__()
        self.use_linear = use_linear
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        if use_linear:
            self.proj_in = nn.Linear(channels, channels)
            self.proj_out = nn.Linear(channels, channels)
        else:
            self.proj_in = nn.Conv2d(channels, channels, 1)
            self.proj_out = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            BasicTransformerBlock(channels, context_dim, heads)
            for _ in range(depth))

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        hidden = self.norm(x)
        if self.use_linear:
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
            hidden = self.proj_in(hidden)
        else:
            hidden = self.proj_in(hidden)
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            hidden = blk(hidden, context)
        if self.use_linear:
            hidden = self.proj_out(hidden)
            hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
            hidden = self.proj_out(hidden)
        return hidden + res


class Downsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, layers, attn, context_dim,
                 heads, use_linear, groups, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            ResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, temb_ch,
                          groups) for i in range(layers))
        if attn:
            self.attentions = nn.ModuleList(
                Transformer2DModel(out_ch, context_dim, heads,
                                   use_linear=use_linear, groups=groups)
                for _ in range(layers))
        if downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])


class _UpBlock(nn.Module):
    def __init__(self, prev_out, out_ch, skip_ch, temb_ch, layers, attn,
                 context_dim, heads, use_linear, groups, upsample):
        super().__init__()
        self.resnets = nn.ModuleList()
        for i in range(layers + 1):
            res_skip = skip_ch if i == layers else out_ch
            rin = prev_out if i == 0 else out_ch
            self.resnets.append(
                ResnetBlock2D(rin + res_skip, out_ch, temb_ch, groups))
        if attn:
            self.attentions = nn.ModuleList(
                Transformer2DModel(out_ch, context_dim, heads,
                                   use_linear=use_linear, groups=groups)
                for _ in range(layers + 1))
        if upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_ch, context_dim, heads, use_linear, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(ch, ch, temb_ch, groups),
            ResnetBlock2D(ch, ch, temb_ch, groups)])
        self.attentions = nn.ModuleList([Transformer2DModel(
            ch, context_dim, heads, use_linear=use_linear, groups=groups)])

    def forward(self, h, temb, context):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h, context)
        return self.resnets[1](h, temb)


class _TimeEmbedding(nn.Module):
    def __init__(self, c0, temb_ch):
        super().__init__()
        self.linear_1 = nn.Linear(c0, temb_ch)
        self.linear_2 = nn.Linear(temb_ch, temb_ch)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(t)))


class UNetReplica(nn.Module):
    """diffusers-layout UNet2DCondition with ControlNet residual inputs."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(8, 16), layers_per_block=2,
                 context_dim=16, heads=(2, 2), use_linear=False,
                 groups=4, down_block_types=("CrossAttnDownBlock2D",
                                             "DownBlock2D"),
                 up_block_types=("UpBlock2D", "CrossAttnUpBlock2D")):
        super().__init__()
        c0 = block_out_channels[0]
        temb = c0 * 4
        self.c0 = c0
        self.layers_per_block = layers_per_block
        self.conv_in = nn.Conv2d(in_channels, c0, 3, padding=1)
        self.time_embedding = _TimeEmbedding(c0, temb)
        self.down_blocks = nn.ModuleList()
        in_ch = c0
        for i, (bo, bt) in enumerate(zip(block_out_channels,
                                         down_block_types)):
            self.down_blocks.append(_DownBlock(
                in_ch, bo, temb, layers_per_block,
                bt == "CrossAttnDownBlock2D", context_dim, heads[i],
                use_linear, groups,
                downsample=i < len(block_out_channels) - 1))
            in_ch = bo
        cm = block_out_channels[-1]
        self.mid_block = _MidBlock(cm, temb, context_dim, heads[-1],
                                   use_linear, groups)
        rev = list(reversed(block_out_channels))
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i, bt in enumerate(up_block_types):
            out_ch = rev[i]
            skip = rev[min(i + 1, len(rev) - 1)]
            self.up_blocks.append(_UpBlock(
                prev, out_ch, skip, temb, layers_per_block,
                bt == "CrossAttnUpBlock2D", context_dim,
                heads[len(rev) - 1 - i], use_linear, groups,
                upsample=i < len(up_block_types) - 1))
            prev = out_ch
        self.conv_norm_out = nn.GroupNorm(groups, c0)
        self.conv_out = nn.Conv2d(c0, out_channels, 3, padding=1)

    def _encode(self, sample, temb, context):
        h = self.conv_in(sample)
        residuals = [h]
        for blk in self.down_blocks:
            attns = getattr(blk, "attentions", None)
            for li, resnet in enumerate(blk.resnets):
                h = resnet(h, temb)
                if attns is not None:
                    h = attns[li](h, context)
                residuals.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                residuals.append(h)
        return h, residuals

    def forward(self, sample, timesteps, context,
                down_block_residuals=None, mid_block_residual=None):
        temb = self.time_embedding(
            timestep_embedding(timesteps, self.c0))
        h, residuals = self._encode(sample, temb, context)
        h = self.mid_block(h, temb, context)
        if down_block_residuals is not None:
            residuals = [r + c for r, c in zip(residuals,
                                               down_block_residuals)]
        if mid_block_residual is not None:
            h = h + mid_block_residual
        for blk in self.up_blocks:
            attns = getattr(blk, "attentions", None)
            for li, resnet in enumerate(blk.resnets):
                skip = residuals.pop()
                h = torch.cat([h, skip], dim=1)
                h = resnet(h, temb)
                if attns is not None:
                    h = attns[li](h, context)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        h = F.silu(self.conv_norm_out(h))
        return self.conv_out(h)


class _CondEmbedding(nn.Module):
    def __init__(self, cond_ch, chans, c0):
        super().__init__()
        self.conv_in = nn.Conv2d(cond_ch, chans[0], 3, padding=1)
        blocks = []
        for i in range(len(chans) - 1):
            blocks.append(nn.Conv2d(chans[i], chans[i], 3, padding=1))
            blocks.append(nn.Conv2d(chans[i], chans[i + 1], 3, padding=1,
                                    stride=2))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(chans[-1], c0, 3, padding=1)
        nn.init.zeros_(self.conv_out.weight)
        nn.init.zeros_(self.conv_out.bias)

    def forward(self, cond):
        h = F.silu(self.conv_in(cond))
        for b in self.blocks:
            h = F.silu(b(h))
        return self.conv_out(h)


class ControlNetReplica(nn.Module):
    """ControlNetModel2 semantics: UNet encoder + hint + zero convs,
    scalar / 2-D-map conditioning scale, guess mode."""

    def __init__(self, unet: UNetReplica, cond_ch=3,
                 cond_chans=(4, 8), block_out_channels=(8, 16),
                 layers_per_block=2):
        super().__init__()
        self.unet_shell = unet          # encoder weights are shared refs
        self.conv_in = unet.conv_in
        self.time_embedding = unet.time_embedding
        self.down_blocks = unet.down_blocks
        self.mid_block = unet.mid_block
        c0 = block_out_channels[0]
        self.controlnet_cond_embedding = _CondEmbedding(
            cond_ch, cond_chans, c0)
        zero = []
        zero.append(nn.Conv2d(c0, c0, 1))
        for i, bo in enumerate(block_out_channels):
            for _ in range(layers_per_block):
                zero.append(nn.Conv2d(bo, bo, 1))
            if i < len(block_out_channels) - 1:
                zero.append(nn.Conv2d(bo, bo, 1))
        self.controlnet_down_blocks = nn.ModuleList(zero)
        cm = block_out_channels[-1]
        self.controlnet_mid_block = nn.Conv2d(cm, cm, 1)

    def state_dict_standalone(self):
        """state dict without the unet_shell alias prefix (the diffusers
        checkpoint layout)."""
        return {k: v for k, v in self.state_dict().items()
                if not k.startswith("unet_shell.")}

    def forward(self, sample, timesteps, context, cond,
                conditioning_scale=1.0, scale_map=None, guess_mode=False):
        u = self.unet_shell
        temb = self.time_embedding(timestep_embedding(timesteps, u.c0))
        hint = self.controlnet_cond_embedding(cond)
        h = self.conv_in(sample) + hint
        residuals = [h]
        for blk in self.down_blocks:
            attns = getattr(blk, "attentions", None)
            for li, resnet in enumerate(blk.resnets):
                h = resnet(h, temb)
                if attns is not None:
                    h = attns[li](h, context)
                residuals.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                residuals.append(h)
        h = self.mid_block(h, temb, context)
        down = [z(r) for z, r in zip(self.controlnet_down_blocks,
                                     residuals)]
        mid = self.controlnet_mid_block(h)
        if guess_mode:
            scales = torch.logspace(-1, 0, len(down) + 1)
            scales = scales * conditioning_scale
            down = [r * s for r, s in zip(down, scales[:-1])]
            mid = mid * scales[-1]
        else:
            down = [r * conditioning_scale for r in down]
            mid = mid * conditioning_scale
        if scale_map is not None:
            m = scale_map[None, None].float()
            down = [r * F.interpolate(m, r.shape[-2:], mode="bilinear",
                                      align_corners=True) for r in down]
            mid = mid * F.interpolate(m, mid.shape[-2:], mode="bilinear",
                                      align_corners=True)
        return down, mid


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

class VAEAttention(nn.Module):
    def __init__(self, ch, groups=4):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        hidden = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, -1, c)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        attn = (q @ k.transpose(-2, -1)) * c ** -0.5
        out = attn.softmax(-1) @ v
        out = self.to_out[0](out).reshape(b, h, w, c).permute(0, 3, 1, 2)
        return out + res


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock2D(ch, ch, None, groups, eps=1e-6),
                                      ResnetBlock2D(ch, ch, None, groups, eps=1e-6)])
        self.attentions = nn.ModuleList([VAEAttention(ch, groups)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class _VAEEncoder(nn.Module):
    def __init__(self, in_ch, chans, layers, z, groups):
        super().__init__()
        self.conv_in = nn.Conv2d(in_ch, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = chans[0]
        for i, bo in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                ResnetBlock2D(ch if li == 0 else bo, bo, None, groups, eps=1e-6)
                for li in range(layers))
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(bo)])
            self.down_blocks.append(blk)
            ch = bo
        self.mid_block = _VAEMid(ch, groups)
        self.conv_norm_out = nn.GroupNorm(groups, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, 2 * z, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class _VAEDecoder(nn.Module):
    def __init__(self, out_ch, chans, layers, z, groups):
        super().__init__()
        rev = list(reversed(chans))
        self.conv_in = nn.Conv2d(z, rev[0], 3, padding=1)
        self.mid_block = _VAEMid(rev[0], groups)
        self.up_blocks = nn.ModuleList()
        ch = rev[0]
        for i, bo in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                ResnetBlock2D(ch if li == 0 else bo, bo, None, groups, eps=1e-6)
                for li in range(layers + 1))
            ch = bo
            if i < len(rev) - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(bo)])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], out_ch, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class VAEReplica(nn.Module):
    def __init__(self, in_ch=3, out_ch=3, chans=(8, 16), layers=2, z=4,
                 groups=4):
        super().__init__()
        self.encoder = _VAEEncoder(in_ch, chans, layers, z, groups)
        self.decoder = _VAEDecoder(out_ch, chans, layers, z, groups)
        self.quant_conv = nn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = nn.Conv2d(z, z, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
