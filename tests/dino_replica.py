"""Minimal torch replica of the official GroundingDINO architecture.

Written from the published architecture spec (IDEA-Research GroundingDINO,
the model the reference drives at
/root/reference/sam2groundingdino_edit.py:64-75 with config
/root/reference/utils/GroundingDINO_SwinT_OGC.py) to serve as the golden
oracle for editanything_tpu/models/groundingdino.py:

- module/attribute names reproduce the official checkpoint key layout
  (backbone.0.*, bert.*, transformer.encoder.layers.N.self_attn.*, ...)
  so checkpoints/detectors.py::dino_to_tree is exercised on every key
- forward math follows the official model: detection Swin, HF BERT with
  per-phrase position ids + block-diagonal masks, BiAttentionBlock fusion
  (pre-LN rebasing the residual, layer-scale gammas), text enhancer with
  sine position embeddings, MSDeformAttn via grid_sample, two-stage
  'standard' query selection, (y,x,w,h) sine query positions, shared
  bbox_embed refinement, final heads on LayerNormed states.

Only inference behavior is replicated (dropout/droppath are identity).
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


# ---------------------------------------------------------------------------
# detection Swin
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class WindowAttention(nn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.window = window
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = coords.flatten(1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0)
        rel = rel + (window - 1)
        idx = rel[:, :, 0] * (2 * window - 1) + rel[:, :, 1]
        self.register_buffer("relative_position_index", idx)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.heads, n, n) \
                + mask[None, :, None]
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


def _window_partition(x, w):
    b, h, ww, c = x.shape
    x = x.view(b, h // w, w, ww // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(wins, w, b, h, ww):
    x = wins.view(b, h // w, ww // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


class SwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.window = window
        self.shift = shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, window, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.H = self.W = None

    def forward(self, x, attn_mask):
        b, _, c = x.shape
        h, w = self.H, self.W
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        pad_b = (self.window - h % self.window) % self.window
        pad_r = (self.window - w % self.window) % self.window
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = h + pad_b, w + pad_r
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            mask = attn_mask
        else:
            mask = None
        wins = _window_partition(x, self.window)
        wins = self.attn(wins, mask)
        x = _window_reverse(wins, self.window, b, hp, wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = x[:, :h, :w].reshape(b, h * w, c)
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, h, w):
        b, _, c = x.shape
        x = x.view(b, h, w, c)
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        nh, nw = x.shape[1], x.shape[2]
        x = x.reshape(b, nh * nw, 4 * c)
        return self.reduction(self.norm(x)), nh, nw


class SwinStage(nn.Module):
    def __init__(self, dim, depth, heads, window, downsample):
        super().__init__()
        self.window = window
        self.blocks = nn.ModuleList([
            SwinBlock(dim, heads, window, 0 if i % 2 == 0 else window // 2)
            for i in range(depth)])
        self.downsample = PatchMerging(dim) if downsample else None

    def forward(self, x, h, w):
        ws = self.window
        hp = int(np.ceil(h / ws)) * ws
        wp = int(np.ceil(w / ws)) * ws
        img = torch.zeros((1, hp, wp, 1))
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -ws // 2), slice(-ws // 2, None)):
            for vs in (slice(0, -ws), slice(-ws, -ws // 2),
                       slice(-ws // 2, None)):
                img[:, hs, vs] = cnt
                cnt += 1
        mw = _window_partition(img, ws).view(-1, ws * ws)
        attn_mask = mw[:, None] - mw[:, :, None]
        attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0) \
            .masked_fill(attn_mask == 0, 0.0)
        for blk in self.blocks:
            blk.H, blk.W = h, w
            x = blk(x, attn_mask)
        if self.downsample is not None:
            xd, nh, nw = self.downsample(x, h, w)
            return x, h, w, xd, nh, nw
        return x, h, w, x, h, w


class PatchEmbed(nn.Module):
    def __init__(self, patch, in_ch, dim):
        super().__init__()
        self.patch = patch
        self.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        _, _, h, w = x.shape
        if w % self.patch:
            x = F.pad(x, (0, self.patch - w % self.patch))
        if h % self.patch:
            x = F.pad(x, (0, 0, 0, self.patch - h % self.patch))
        x = self.proj(x)
        wh, ww = x.shape[2], x.shape[3]
        x = self.norm(x.flatten(2).transpose(1, 2))
        return x, wh, ww


class SwinReplica(nn.Module):
    def __init__(self, embed_dim, depths, heads, window, out_indices):
        super().__init__()
        self.out_indices = out_indices
        self.patch_embed = PatchEmbed(4, 3, embed_dim)
        self.layers = nn.ModuleList()
        for i, d in enumerate(depths):
            self.layers.append(SwinStage(
                embed_dim * 2 ** i, d, heads[i], window,
                downsample=i < len(depths) - 1))
        for i in out_indices:
            self.add_module(f"norm{i}", nn.LayerNorm(embed_dim * 2 ** i))

    def forward(self, x):
        x, h, w = self.patch_embed(x)
        outs = []
        for i, layer in enumerate(self.layers):
            x_out, oh, ow, x, h, w = layer(x, h, w)
            if i in self.out_indices:
                y = getattr(self, f"norm{i}")(x_out)
                outs.append(y.view(1, oh, ow, -1).permute(0, 3, 1, 2))
        return outs


# ---------------------------------------------------------------------------
# MSDeformAttn (grid_sample core, the official pure-torch fallback math)
# ---------------------------------------------------------------------------

class MSDeformAttn(nn.Module):
    def __init__(self, d, levels, heads, points):
        super().__init__()
        self.levels, self.heads, self.points = levels, heads, points
        self.sampling_offsets = nn.Linear(d, heads * levels * points * 2)
        self.attention_weights = nn.Linear(d, heads * levels * points)
        self.value_proj = nn.Linear(d, d)
        self.output_proj = nn.Linear(d, d)

    def forward(self, query, refs, value, shapes):
        """query (1, Lq, D); refs (1, Lq, L, 2|4); value (1, Lin, D)."""
        _, lq, d = query.shape
        h_, p_ = self.heads, self.points
        dh = d // h_
        v = self.value_proj(value).view(1, -1, h_, dh)
        offs = self.sampling_offsets(query).view(1, lq, h_, self.levels,
                                                 p_, 2)
        w = self.attention_weights(query).view(1, lq, h_,
                                               self.levels * p_)
        w = w.softmax(-1).view(1, lq, h_, self.levels, p_)
        if refs.shape[-1] == 2:
            norm = torch.tensor([[wd, hh] for hh, wd in shapes],
                                dtype=torch.float32)
            loc = refs[:, :, None, :, None] \
                + offs / norm[None, None, None, :, None]
        else:
            loc = refs[:, :, None, :, None, :2] \
                + offs / p_ * refs[:, :, None, :, None, 2:] * 0.5
        out = []
        start = 0
        for li, (hh, wd) in enumerate(shapes):
            vl = v[0, start:start + hh * wd].permute(1, 2, 0) \
                .reshape(h_, dh, hh, wd)
            start += hh * wd
            grid = 2 * loc[0, :, :, li] - 1            # (Lq, H, P, 2)
            grid = grid.permute(1, 0, 2, 3)            # (H, Lq, P, 2)
            out.append(F.grid_sample(vl, grid, mode="bilinear",
                                     padding_mode="zeros",
                                     align_corners=False))
        stacked = torch.stack(out, dim=-2)             # (H, dh, Lq, L, P)
        wt = w[0].permute(1, 0, 2, 3)[:, None]         # (H, 1, Lq, L, P)
        res = (stacked * wt).sum((-1, -2))             # (H, dh, Lq)
        res = res.permute(2, 0, 1).reshape(1, lq, d)
        return self.output_proj(res)


# ---------------------------------------------------------------------------
# fusion / text enhancer / encoder / decoder layers
# ---------------------------------------------------------------------------

class BiMultiHeadAttention(nn.Module):
    def __init__(self, v_dim, l_dim, embed_dim, num_heads):
        super().__init__()
        self.heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.v_proj = nn.Linear(v_dim, embed_dim)
        self.l_proj = nn.Linear(l_dim, embed_dim)
        self.values_v_proj = nn.Linear(v_dim, embed_dim)
        self.values_l_proj = nn.Linear(l_dim, embed_dim)
        self.out_v_proj = nn.Linear(embed_dim, v_dim)
        self.out_l_proj = nn.Linear(embed_dim, l_dim)

    def _shape(self, x, n):
        return x.view(1, n, self.heads, self.head_dim) \
            .permute(0, 2, 1, 3).reshape(self.heads, n, self.head_dim)

    def forward(self, v, l, attention_mask_l=None):
        nv, nl = v.shape[1], l.shape[1]
        q = self._shape(self.v_proj(v) * self.scale, nv)
        k = self._shape(self.l_proj(l), nl)
        vv = self._shape(self.values_v_proj(v), nv)
        vl = self._shape(self.values_l_proj(l), nl)
        attn = torch.bmm(q, k.transpose(1, 2))        # (H, Nv, Nl)
        attn = attn.clamp(-50000, 50000)
        attn_t = attn.transpose(1, 2)
        attn_l = (attn_t - attn_t.max(dim=-1, keepdim=True)[0]) \
            .clamp(-50000, 50000)
        attn_l = attn_l.softmax(-1)
        if attention_mask_l is not None:
            attn = attn.masked_fill(
                attention_mask_l[None, None, :], float("-inf"))
        attn_v = attn.softmax(-1)
        ov = torch.bmm(attn_v, vl).permute(1, 0, 2).reshape(1, nv, -1)
        ol = torch.bmm(attn_l, vv).permute(1, 0, 2).reshape(1, nl, -1)
        return self.out_v_proj(ov), self.out_l_proj(ol)


class BiAttentionBlock(nn.Module):
    def __init__(self, d, embed_dim, heads):
        super().__init__()
        self.layer_norm_v = nn.LayerNorm(d)
        self.layer_norm_l = nn.LayerNorm(d)
        self.attn = BiMultiHeadAttention(d, d, embed_dim, heads)
        self.gamma_v = nn.Parameter(1e-4 * torch.ones(d))
        self.gamma_l = nn.Parameter(1e-4 * torch.ones(d))

    def forward(self, v, l, attention_mask_l=None):
        v = self.layer_norm_v(v)
        l = self.layer_norm_l(l)
        dv, dl = self.attn(v, l, attention_mask_l=attention_mask_l)
        return v + self.gamma_v * dv, l + self.gamma_l * dl


class TextEnhancerLayer(nn.Module):
    def __init__(self, d, heads, ffn):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.nhead = heads

    def forward(self, src, src_mask, pos):
        """src (T, 1, D); src_mask (T, T) True = blocked; pos (T, 1, D)."""
        q = k = src + pos
        src2 = self.self_attn(q, k, value=src, attn_mask=src_mask)[0]
        src = self.norm1(src + src2)
        src2 = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + src2)


class DeformableEncoderLayer(nn.Module):
    def __init__(self, d, ffn, levels, heads, points):
        super().__init__()
        self.self_attn = MSDeformAttn(d, levels, heads, points)
        self.norm1 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, src, pos, refs, shapes):
        src2 = self.self_attn(src + pos, refs, src, shapes)
        src = self.norm1(src + src2)
        src2 = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + src2)


class DeformableDecoderLayer(nn.Module):
    def __init__(self, d, ffn, levels, heads, points):
        super().__init__()
        self.cross_attn = MSDeformAttn(d, levels, heads, points)
        self.norm1 = nn.LayerNorm(d)
        self.ca_text = nn.MultiheadAttention(d, heads)
        self.catext_norm = nn.LayerNorm(d)
        self.self_attn = nn.MultiheadAttention(d, heads)
        self.norm2 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, query_pos, refs, memory, shapes, memory_text,
                text_pad_mask):
        """tgt (Q, 1, D) seq-first; refs (1, Q, L, 4)."""
        q = k = tgt + query_pos
        tgt2 = self.self_attn(q, k, tgt)[0]
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.ca_text(tgt + query_pos, memory_text, memory_text,
                            key_padding_mask=text_pad_mask)[0]
        tgt = self.catext_norm(tgt + tgt2)
        tgt2 = self.cross_attn((tgt + query_pos).transpose(0, 1), refs,
                               memory, shapes).transpose(0, 1)
        tgt = self.norm1(tgt + tgt2)
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2)


class MLP(nn.Module):
    def __init__(self, in_dim, hidden, out_dim, num_layers):
        super().__init__()
        dims = [in_dim] + [hidden] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(dims[i], dims[i + 1] if i < num_layers - 1 else
                      hidden) for i in range(num_layers - 1))
        self.layers.append(nn.Linear(hidden, out_dim))

    def forward(self, x):
        for i, lin in enumerate(self.layers):
            x = lin(x) if i == len(self.layers) - 1 else F.relu(lin(x))
        return x


# ---------------------------------------------------------------------------
# positional encodings (official formulas)
# ---------------------------------------------------------------------------

def pos_sine_hw(h, w, d, temperature):
    npf = d // 2
    y = torch.arange(1, h + 1, dtype=torch.float32)[:, None].expand(h, w)
    x = torch.arange(1, w + 1, dtype=torch.float32)[None].expand(h, w)
    y = y / (h + 1e-6) * 2 * math.pi
    x = x / (w + 1e-6) * 2 * math.pi
    dim_t = temperature ** (2 * (torch.arange(npf) // 2).float() / npf)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack((px[:, :, 0::2].sin(), px[:, :, 1::2].cos()),
                     dim=3).flatten(2)
    py = torch.stack((py[:, :, 0::2].sin(), py[:, :, 1::2].cos()),
                     dim=3).flatten(2)
    return torch.cat((py, px), dim=2)                  # (H, W, D)


def sine_embed_1d(pos, num_pos_feats=256, temperature=10000.0):
    dim_t = temperature ** (2 * (torch.arange(num_pos_feats) // 2).float()
                            / num_pos_feats)
    x = pos.float()[:, None] * 2 * math.pi / dim_t
    return torch.stack((x[:, 0::2].sin(), x[:, 1::2].cos()),
                       dim=2).flatten(1)


def box_sine_embed(boxes, d, temperature=10000.0):
    npf = d // 2
    dim_t = temperature ** (2 * (torch.arange(npf) // 2).float() / npf)

    def emb(c):
        e = c[:, None] * 2 * math.pi / dim_t
        return torch.stack((e[:, 0::2].sin(), e[:, 1::2].cos()),
                           dim=2).flatten(1)

    return torch.cat([emb(boxes[:, 1]), emb(boxes[:, 0]),
                      emb(boxes[:, 2]), emb(boxes[:, 3])], dim=-1)


def inverse_sigmoid(x, eps=1e-3):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


# ---------------------------------------------------------------------------
# transformer + full model
# ---------------------------------------------------------------------------

class Encoder(nn.Module):
    def __init__(self, d, ffn, levels, heads, points, n_layers):
        super().__init__()
        self.layers = nn.ModuleList(
            DeformableEncoderLayer(d, ffn, levels, heads, points)
            for _ in range(n_layers))
        self.text_layers = nn.ModuleList(
            TextEnhancerLayer(d, max(heads // 2, 1), ffn // 2)
            for _ in range(n_layers))
        self.fusion_layers = nn.ModuleList(
            BiAttentionBlock(d, ffn // 2, max(heads // 2, 1))
            for _ in range(n_layers))

    def forward(self, src, pos, refs, shapes, txt, text_pad, block_mask,
                pos_text):
        for i in range(len(self.layers)):
            src, txt = self.fusion_layers[i](src, txt,
                                             attention_mask_l=text_pad)
            txt = self.text_layers[i](
                txt.transpose(0, 1), ~block_mask,
                pos_text.transpose(0, 1)).transpose(0, 1)
            src = self.layers[i](src, pos, refs, shapes)
        return src, txt


class Decoder(nn.Module):
    def __init__(self, d, ffn, levels, heads, points, n_layers):
        super().__init__()
        self.layers = nn.ModuleList(
            DeformableDecoderLayer(d, ffn, levels, heads, points)
            for _ in range(n_layers))
        self.norm = nn.LayerNorm(d)
        self.ref_point_head = MLP(2 * d, d, d, 2)
        self.bbox_embed = None                    # tied by the top module

    def forward(self, tgt, refpoints_unsig, memory, shapes, txt, text_pad):
        d = tgt.shape[-1]
        levels = len(shapes)
        output = tgt.transpose(0, 1)              # (Q, 1, D)
        refs = refpoints_unsig.sigmoid()          # (Q, 4)
        ref_list = [refs]
        intermediate = []
        for i, layer in enumerate(self.layers):
            sine = box_sine_embed(refs, d)
            qpos = self.ref_point_head(sine)[:, None]
            refs_in = refs[None, :, None].expand(1, refs.shape[0],
                                                 levels, 4)
            output = layer(output, qpos, refs_in, memory, shapes,
                           txt.transpose(0, 1), text_pad)
            delta = self.bbox_embed[i](output[:, 0])
            refs = (delta + inverse_sigmoid(refs)).sigmoid().detach()
            ref_list.append(refs)
            intermediate.append(self.norm(output)[:, 0])
        return intermediate, ref_list


class Transformer(nn.Module):
    def __init__(self, d, ffn, levels, heads, points, enc_layers,
                 dec_layers, num_queries):
        super().__init__()
        self.num_queries = num_queries
        self.level_embed = nn.Parameter(torch.zeros(levels, d))
        self.encoder = Encoder(d, ffn, levels, heads, points, enc_layers)
        self.decoder = Decoder(d, ffn, levels, heads, points, dec_layers)
        self.tgt_embed = nn.Embedding(num_queries, d)
        self.enc_output = nn.Linear(d, d)
        self.enc_output_norm = nn.LayerNorm(d)
        self.enc_out_bbox_embed = MLP(d, d, 4, 3)

    @staticmethod
    def _proposals(shapes):
        props = []
        for lvl, (h, w) in enumerate(shapes):
            gy, gx = torch.meshgrid(
                (torch.arange(h, dtype=torch.float32) + 0.5) / h,
                (torch.arange(w, dtype=torch.float32) + 0.5) / w,
                indexing="ij")
            wh = torch.full((h, w, 2), 0.05 * 2.0 ** lvl)
            props.append(torch.cat(
                [gx[..., None], gy[..., None], wh], -1).view(-1, 4))
        return torch.cat(props, 0)

    def forward(self, srcs, txt, text_pad, block_mask, pos_text,
                temperature):
        d = srcs[0].shape[1]
        shapes = [(s.shape[2], s.shape[3]) for s in srcs]
        flat, poss = [], []
        for lvl, s in enumerate(srcs):
            h, w = s.shape[2], s.shape[3]
            flat.append(s.flatten(2).transpose(1, 2))
            pe = pos_sine_hw(h, w, d, temperature).view(-1, d)
            poss.append(pe + self.level_embed[lvl])
        src = torch.cat(flat, 1)                  # (1, sumHW, D)
        pos = torch.cat(poss, 0)[None]

        centers = []
        for h, w in shapes:
            gy, gx = torch.meshgrid(
                (torch.arange(h, dtype=torch.float32) + 0.5) / h,
                (torch.arange(w, dtype=torch.float32) + 0.5) / w,
                indexing="ij")
            centers.append(torch.stack([gx.reshape(-1),
                                        gy.reshape(-1)], -1))
        centers = torch.cat(centers, 0)
        refs = centers[None, :, None].expand(1, -1, len(shapes), 2)

        memory, memory_text = self.encoder(src, pos, refs, shapes, txt,
                                           text_pad, block_mask, pos_text)

        props = self._proposals(shapes)
        valid = ((props > 0.01) & (props < 0.99)).all(-1)
        unsig = torch.log(props / (1 - props))
        unsig = unsig.masked_fill(~valid[:, None], float("inf"))
        mem = memory[0].masked_fill(~valid[:, None], 0.0)
        mem = self.enc_output_norm(self.enc_output(mem))

        cls = mem @ memory_text[0].t()
        cls = cls.masked_fill(text_pad[None], float("-inf"))
        scores = cls.max(-1)[0]
        top = torch.topk(scores, self.num_queries)[1]
        ref_unsig = (self.enc_out_bbox_embed(mem) + unsig)[top].detach()
        tgt = self.tgt_embed.weight[None]

        hs, ref_list = self.decoder(tgt, ref_unsig, memory, shapes,
                                    memory_text, text_pad[None])
        return hs, ref_list, memory_text


class ContrastiveEmbed(nn.Module):
    def forward(self, x, txt, text_pad):
        res = x @ txt.t()
        return res.masked_fill(text_pad[None], float("-inf"))


class TinyDINOReplica(nn.Module):
    """Full tiny GroundingDINO with official checkpoint key layout."""

    def __init__(self, *, swin_dim=8, swin_depths=(2, 1, 1, 1),
                 swin_heads=(1, 2, 2, 2), swin_window=4,
                 bert_cfg=None, d=16, heads=2, ffn=32, levels=4, points=2,
                 enc_layers=1, dec_layers=1, num_queries=12,
                 gn_groups=4, pe_temperature=20.0):
        super().__init__()
        from transformers import BertConfig as HFBertConfig
        from transformers import BertModel
        self.pe_temperature = pe_temperature
        self.backbone = nn.ModuleList([SwinReplica(
            swin_dim, swin_depths, swin_heads, swin_window, (1, 2, 3))])
        self.bert = BertModel(bert_cfg or HFBertConfig(
            vocab_size=200, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, type_vocab_size=2))
        bert_hidden = self.bert.config.hidden_size
        self.feat_map = nn.Linear(bert_hidden, d)
        dims = [swin_dim * 2, swin_dim * 4, swin_dim * 8]
        projs = [nn.Sequential(nn.Conv2d(c, d, 1),
                               nn.GroupNorm(gn_groups, d)) for c in dims]
        projs.append(nn.Sequential(nn.Conv2d(dims[-1], d, 3, 2, 1),
                                   nn.GroupNorm(gn_groups, d)))
        self.input_proj = nn.ModuleList(projs)
        self.transformer = Transformer(d, ffn, levels, heads, points,
                                       enc_layers, dec_layers, num_queries)
        shared = MLP(d, d, 4, 3)
        self.bbox_embed = nn.ModuleList([shared] * dec_layers)
        self.transformer.decoder.bbox_embed = self.bbox_embed

    def forward(self, pixels, ids, mask, self_mask, pos_ids):
        """pixels (1, 3, H, W); ids/mask/pos_ids (1, T); self_mask (1,T,T)."""
        d = self.feat_map.out_features
        out = self.bert(input_ids=ids, attention_mask=self_mask.float(),
                        position_ids=pos_ids)
        txt = self.feat_map(out.last_hidden_state)       # (1, T, D)
        text_pad = ~mask[0]
        pos_text = sine_embed_1d(pos_ids[0], d)[None]

        feats = self.backbone[0](pixels)
        srcs = [self.input_proj[i](f) for i, f in enumerate(feats)]
        srcs.append(self.input_proj[len(feats)](feats[-1]))

        hs, ref_list, memory_text = self.transformer(
            srcs, txt, text_pad, self_mask[0], pos_text,
            self.pe_temperature)
        final_hs = hs[-1]
        final_ref = ref_list[-2]                         # reference[:-1][-1]
        delta = self.bbox_embed[-1](final_hs)
        boxes = (delta + inverse_sigmoid(final_ref)).sigmoid()
        logits = ContrastiveEmbed()(final_hs, memory_text[0], text_pad)
        return {"logits": logits, "boxes": boxes}
