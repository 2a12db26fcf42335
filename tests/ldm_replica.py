"""torch modules with the reference's EXACT ldm/cldm state-dict naming.

These exist as *naming oracles* for checkpoints/ldm.py: their
`state_dict()` reproduces, key for key, the layouts the reference loads
(UNetModel /root/reference/ldm/modules/diffusionmodules/openaimodel.py:412,
cldm ControlNet /root/reference/cldm/cldm.py:48-163, AutoencoderKL
ldm/models/autoencoder.py:13 + diffusionmodules/model.py, and open_clip's
text tower as consumed by FrozenOpenCLIPEmbedder
ldm/modules/encoders/modules.py:134-193). Only the text tower carries a
forward (its in_proj fusion + penultimate-layer semantics are numeric);
UNet/ControlNet/VAE numerics are covered by loading the SAME weights into
the diffusers-layout replicas (sd_replica.py) through the key maps.
"""

from collections import OrderedDict

import torch
import torch.nn as nn

from sd_replica import Transformer2DModel  # ldm SpatialTransformer naming


class LDMResBlock(nn.Module):
    """openaimodel.py:162-236 naming: in_layers / emb_layers / out_layers
    Sequentials, skip_connection."""

    def __init__(self, in_ch, out_ch, temb_ch, groups=4):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(groups, in_ch), nn.SiLU(),
            nn.Conv2d(in_ch, out_ch, 3, padding=1))
        self.emb_layers = nn.Sequential(nn.SiLU(),
                                        nn.Linear(temb_ch, out_ch))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(groups, out_ch), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv2d(out_ch, out_ch, 3, padding=1))
        if in_ch != out_ch:
            self.skip_connection = nn.Conv2d(in_ch, out_ch, 1)


class LDMDownsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1)


class LDMUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)


class LDMUNetReplica(nn.Module):
    """openaimodel.py UNetModel skeleton: time_embed, input_blocks (with the
    conv_in at index 0 and downsamples at (b+1)(L+1)), middle_block,
    output_blocks (L+1 resnets per level, upsample appended to the level's
    last block), out."""

    def __init__(self, model_channels=32, channel_mult=(1, 2),
                 num_res_blocks=2, context_dim=48, heads=2, groups=8,
                 use_linear=False, in_channels=4, out_channels=4,
                 attn_levels=(True, False)):
        super().__init__()
        temb = model_channels * 4
        self.model_channels = model_channels
        self.time_embed = nn.Sequential(
            nn.Linear(model_channels, temb), nn.SiLU(),
            nn.Linear(temb, temb))
        self.input_blocks = nn.ModuleList([nn.Sequential(
            nn.Conv2d(in_channels, model_channels, 3, padding=1))])
        chs = [model_channels]
        ch = model_channels
        for level, mult in enumerate(channel_mult):
            out = model_channels * mult
            for _ in range(num_res_blocks):
                layers = [LDMResBlock(ch, out, temb, groups)]
                ch = out
                if attn_levels[level]:
                    layers.append(Transformer2DModel(
                        ch, context_dim, heads, use_linear=use_linear,
                        groups=groups))
                self.input_blocks.append(nn.Sequential(*layers))
                chs.append(ch)
            if level != len(channel_mult) - 1:
                self.input_blocks.append(nn.Sequential(LDMDownsample(ch)))
                chs.append(ch)
        self.middle_block = nn.Sequential(
            LDMResBlock(ch, ch, temb, groups),
            Transformer2DModel(ch, context_dim, heads,
                               use_linear=use_linear, groups=groups),
            LDMResBlock(ch, ch, temb, groups))
        self.output_blocks = nn.ModuleList()
        for level, mult in reversed(list(enumerate(channel_mult))):
            out = model_channels * mult
            for i in range(num_res_blocks + 1):
                ich = chs.pop()
                layers = [LDMResBlock(ch + ich, out, temb, groups)]
                ch = out
                if attn_levels[level]:
                    layers.append(Transformer2DModel(
                        ch, context_dim, heads, use_linear=use_linear,
                        groups=groups))
                if level != 0 and i == num_res_blocks:
                    layers.append(LDMUpsample(ch))
                self.output_blocks.append(nn.Sequential(*layers))
        self.out = nn.Sequential(
            nn.GroupNorm(groups, ch), nn.SiLU(),
            nn.Conv2d(ch, out_channels, 3, padding=1))


class LDMControlNetReplica(nn.Module):
    """cldm/cldm.py:48-163 ControlNet: UNet encoder copy + zero_convs
    (Sequential-wrapped -> `.0` suffix) + input_hint_block conv stack +
    middle_block_out."""

    def __init__(self, model_channels=32, channel_mult=(1, 2),
                 num_res_blocks=2, context_dim=48, heads=2, groups=8,
                 use_linear=False, hint_channels=3,
                 hint_chans=(4, 8, 8, 8), attn_levels=(True, False)):
        super().__init__()
        shell = LDMUNetReplica(model_channels, channel_mult, num_res_blocks,
                               context_dim, heads, groups, use_linear,
                               attn_levels=attn_levels)
        self.time_embed = shell.time_embed
        self.input_blocks = shell.input_blocks
        self.middle_block = shell.middle_block

        zero = [nn.Sequential(nn.Conv2d(model_channels, model_channels, 1))]
        ch = model_channels
        for level, mult in enumerate(channel_mult):
            ch = model_channels * mult
            for _ in range(num_res_blocks):
                zero.append(nn.Sequential(nn.Conv2d(ch, ch, 1)))
            if level != len(channel_mult) - 1:
                zero.append(nn.Sequential(nn.Conv2d(ch, ch, 1)))
        self.zero_convs = nn.ModuleList(zero)

        c = hint_chans
        hint = [nn.Conv2d(hint_channels, c[0], 3, padding=1), nn.SiLU()]
        for i in range(len(c) - 1):
            hint += [nn.Conv2d(c[i], c[i], 3, padding=1), nn.SiLU(),
                     nn.Conv2d(c[i], c[i + 1], 3, padding=1, stride=2),
                     nn.SiLU()]
        hint.append(nn.Conv2d(c[-1], model_channels, 3, padding=1))
        self.input_hint_block = nn.Sequential(*hint)
        cm = model_channels * channel_mult[-1]
        self.middle_block_out = nn.Sequential(nn.Conv2d(cm, cm, 1))


# ---------------------------------------------------------------------------
# VAE (ldm/modules/diffusionmodules/model.py Encoder/Decoder naming)
# ---------------------------------------------------------------------------

class _LDMVAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch, groups=4):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.nin_shortcut = nn.Conv2d(in_ch, out_ch, 1)


class _LDMAttnBlock(nn.Module):
    """model.py:152-177: 1x1-conv q/k/v/proj_out."""

    def __init__(self, ch, groups=4):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.q = nn.Conv2d(ch, ch, 1)
        self.k = nn.Conv2d(ch, ch, 1)
        self.v = nn.Conv2d(ch, ch, 1)
        self.proj_out = nn.Conv2d(ch, ch, 1)


class _LDMMid(nn.Module):
    def __init__(self, ch, groups=4):
        super().__init__()
        self.block_1 = _LDMVAEResnet(ch, ch, groups)
        self.attn_1 = _LDMAttnBlock(ch, groups)
        self.block_2 = _LDMVAEResnet(ch, ch, groups)


class _LDMDownLevel(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, downsample):
        super().__init__()
        self.block = nn.ModuleList(
            _LDMVAEResnet(in_ch if i == 0 else out_ch, out_ch, groups)
            for i in range(layers))
        if downsample:
            self.downsample = nn.Module()
            self.downsample.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2)


class _LDMUpLevel(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, upsample):
        super().__init__()
        self.block = nn.ModuleList(
            _LDMVAEResnet(in_ch if i == 0 else out_ch, out_ch, groups)
            for i in range(layers + 1))
        if upsample:
            self.upsample = nn.Module()
            self.upsample.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)


class LDMVAEReplica(nn.Module):
    """first_stage_model naming; decoder `up` stored in RESOLUTION order
    (up.0 = highest resolution) but executed reversed, model.py:185-215."""

    def __init__(self, chans=(8, 8, 8, 16), layers=1, z=4, groups=4,
                 in_ch=3, out_ch=3):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(in_ch, chans[0], 3, padding=1)
        enc.down = nn.ModuleList()
        c = chans[0]
        for i, bo in enumerate(chans):
            enc.down.append(_LDMDownLevel(c, bo, layers, groups,
                                          downsample=i < len(chans) - 1))
            c = bo
        enc.mid = _LDMMid(c, groups)
        enc.norm_out = nn.GroupNorm(groups, c, eps=1e-6)
        enc.conv_out = nn.Conv2d(c, 2 * z, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        rev = list(reversed(chans))
        dec.conv_in = nn.Conv2d(z, rev[0], 3, padding=1)
        dec.mid = _LDMMid(rev[0], groups)
        ups = [None] * len(chans)
        c = rev[0]
        for k, bo in enumerate(rev):     # k = execution order (deep first)
            i_level = len(chans) - 1 - k  # ldm storage index
            ups[i_level] = _LDMUpLevel(c, bo, layers, groups,
                                       upsample=i_level != 0)
            c = bo
        dec.up = nn.ModuleList(ups)
        dec.norm_out = nn.GroupNorm(groups, c, eps=1e-6)
        dec.conv_out = nn.Conv2d(c, out_ch, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = nn.Conv2d(z, z, 1)


# ---------------------------------------------------------------------------
# open_clip text tower (FrozenOpenCLIPEmbedder's `.model`), WITH forward
# ---------------------------------------------------------------------------

class _OpenCLIPResblock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads)   # fused in_proj_weight
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(d, 4 * d)), ("gelu", nn.GELU()),
            ("c_proj", nn.Linear(4 * d, d))]))

    def forward(self, x, attn_mask):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False,
                          attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class LDMOpenCLIPTextReplica(nn.Module):
    """open_clip CLIP text side as the reference's state dict stores it
    (token_embedding / positional_embedding / transformer.resblocks.N /
    ln_final) with FrozenOpenCLIPEmbedder's penultimate-layer forward."""

    def __init__(self, vocab=100, d=32, layers=3, heads=4, ctx=8):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, d)
        self.positional_embedding = nn.Parameter(torch.randn(ctx, d) * 0.02)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            _OpenCLIPResblock(d, heads) for _ in range(layers))
        self.ln_final = nn.LayerNorm(d)
        # buffers the real checkpoint carries that converters must ignore
        self.register_buffer("attn_mask", torch.zeros(ctx, ctx))
        self.text_projection = nn.Parameter(torch.randn(d, d) * 0.02)
        self.logit_scale = nn.Parameter(torch.tensor(1.0))

    @torch.no_grad()
    def encode_penultimate(self, tokens):
        """modules.py:176-189: run all but the LAST resblock, then
        ln_final — the SD2.x conditioning output."""
        x = self.token_embedding(tokens) + self.positional_embedding[
            : tokens.shape[1]]
        x = x.permute(1, 0, 2)
        n = x.shape[0]
        mask = torch.full((n, n), float("-inf")).triu(1)
        for r in list(self.transformer.resblocks)[:-1]:
            x = r(x, mask)
        x = x.permute(1, 0, 2)
        return self.ln_final(x)
