"""Compact torch replica of SAM (ViT encoder + prompt encoder + mask
decoder) in the OFFICIAL module/parameter layout, used as a parity oracle
for models/sam.py and the sam_to_tree checkpoint converter.

Behavioral spec: the published segment-anything architecture
(facebookresearch/segment-anything, modeling/{image_encoder,prompt_encoder,
mask_decoder,transformer}.py), which the reference consumes as a pip
package (/root/reference/editany_lora.py:82-95). Hand-built like
tests/sd_replica.py / tests/dino_replica.py: same math and state-dict
naming, none of the upstream scaffolding.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm2d(nn.Module):
    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))
        self.bias = nn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):                      # (B, C, H, W)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MLPBlock(nn.Module):
    def __init__(self, dim, mlp_dim):
        super().__init__()
        self.lin1 = nn.Linear(dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, dim)

    def forward(self, x):
        return self.lin2(F.gelu(self.lin1(x)))


# ---------------------------------------------------------------------------
# Image encoder (ViT with windowed decomposed-rel-pos attention)
# ---------------------------------------------------------------------------

def _get_rel_pos(q_size, k_size, rel_pos):
    # max_rel_dist == 2*size-1 here (q_size == k_size throughout)
    coords_q = torch.arange(q_size)[:, None]
    coords_k = torch.arange(k_size)[None, :]
    rel = coords_q - coords_k + (k_size - 1)
    return rel_pos[rel.long()]


class EncAttention(nn.Module):
    def __init__(self, dim, num_heads, input_size):
        super().__init__()
        self.num_heads = num_heads
        hd = dim // num_heads
        self.scale = hd ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(torch.zeros(2 * input_size - 1, hd))
        self.rel_pos_w = nn.Parameter(torch.zeros(2 * input_size - 1, hd))

    def forward(self, x):                      # (B, H, W, C)
        b, h, w, c = x.shape
        qkv = self.qkv(x).reshape(b, h * w, 3, self.num_heads, -1) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * self.num_heads, h * w, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        # decomposed rel pos (not scaled by 1/sqrt(d))
        rh = _get_rel_pos(h, h, self.rel_pos_h)
        rw = _get_rel_pos(w, w, self.rel_pos_w)
        rq = q.reshape(b * self.num_heads, h, w, -1)
        rel_h = torch.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = attn.view(-1, h, w, h, w) + rel_h[..., :, None] \
            + rel_w[..., None, :]
        attn = attn.view(-1, h * w, h * w).softmax(-1)
        x = (attn @ v).view(b, self.num_heads, h, w, -1) \
            .permute(0, 2, 3, 1, 4).reshape(b, h, w, -1)
        return self.proj(x)


def window_partition(x, win):
    b, h, w, c = x.shape
    ph, pw = (win - h % win) % win, (win - w % win) % win
    x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // win, win, wp // win, win, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c), (hp, wp)


def window_unpartition(x, win, hw_pad, hw):
    hp, wp = hw_pad
    h, w = hw
    b = x.shape[0] // (hp * wp // win // win)
    x = x.view(b, hp // win, wp // win, win, win, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)[:, :h, :w]


class EncBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, window_size, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = EncAttention(
            dim, num_heads, window_size if window_size else input_size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))
        self.window_size = window_size

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            hw = (x.shape[1], x.shape[2])
            x, pad_hw = window_partition(x, self.window_size)
            x = self.attn(x)
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        else:
            x = self.attn(x)
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class ImageEncoderViT(nn.Module):
    def __init__(self, img_size, patch_size, embed_dim, depth, num_heads,
                 mlp_ratio, out_chans, window_size, global_attn_indexes):
        super().__init__()
        e = img_size // patch_size
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, patch_size,
                                          patch_size)
        self.pos_embed = nn.Parameter(torch.zeros(1, e, e, embed_dim))
        self.blocks = nn.ModuleList([
            EncBlock(embed_dim, num_heads, mlp_ratio,
                     0 if i in global_attn_indexes else window_size, e)
            for i in range(depth)])
        self.neck = nn.Sequential(
            nn.Conv2d(embed_dim, out_chans, 1, bias=False),
            LayerNorm2d(out_chans),
            nn.Conv2d(out_chans, out_chans, 3, padding=1, bias=False),
            LayerNorm2d(out_chans))

    def forward(self, x):                      # (B, 3, S, S)
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Prompt encoder (points only — the paths the rebuild drives)
# ---------------------------------------------------------------------------

class PromptEncoder(nn.Module):
    def __init__(self, embed_dim, image_embedding_size, input_image_size):
        super().__init__()
        self.embed_dim = embed_dim
        self.input_image_size = input_image_size
        self.image_embedding_size = image_embedding_size
        self.pe_layer = nn.Module()
        self.pe_layer.register_buffer(
            "positional_encoding_gaussian_matrix",
            torch.randn(2, embed_dim // 2))
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, embed_dim) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, embed_dim)
        self.no_mask_embed = nn.Embedding(1, embed_dim)
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, 4, 2, 2), LayerNorm2d(4), nn.GELU(),
            nn.Conv2d(4, 16, 2, 2), LayerNorm2d(16), nn.GELU(),
            nn.Conv2d(16, embed_dim, 1))

    def _pe(self, coords):                     # coords in [0, 1]
        c = 2 * coords - 1
        c = c @ self.pe_layer.positional_encoding_gaussian_matrix
        c = 2 * np.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], -1)

    def embed_points(self, points, labels):    # (B, P, 2) pixel, (B, P)
        points = points + 0.5
        coords = points / self.input_image_size
        pe = self._pe(coords)
        pe[labels == -1] = 0.0
        pe[labels == -1] += self.not_a_point_embed.weight[0]
        for lbl in range(4):
            pe[labels == lbl] += self.point_embeddings[lbl].weight[0]
        return pe

    def dense_pe(self):
        e = self.image_embedding_size
        grid = torch.ones(e, e)
        y = (grid.cumsum(0) - 0.5) / e
        x = (grid.cumsum(1) - 0.5) / e
        return self._pe(torch.stack([x, y], -1)) \
            .permute(2, 0, 1).unsqueeze(0)     # (1, D, e, e)


# ---------------------------------------------------------------------------
# Two-way transformer + mask decoder
# ---------------------------------------------------------------------------

class DecAttention(nn.Module):
    def __init__(self, embedding_dim, num_heads, downsample_rate=1):
        super().__init__()
        inner = embedding_dim // downsample_rate
        self.num_heads = num_heads
        self.q_proj = nn.Linear(embedding_dim, inner)
        self.k_proj = nn.Linear(embedding_dim, inner)
        self.v_proj = nn.Linear(embedding_dim, inner)
        self.out_proj = nn.Linear(inner, embedding_dim)

    def _heads(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, c // self.num_heads) \
            .transpose(1, 2)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        q, k, v = self._heads(q), self._heads(k), self._heads(v)
        attn = q @ k.transpose(-2, -1) / math.sqrt(q.shape[-1])
        out = attn.softmax(-1) @ v
        b, h, n, d = out.shape
        return self.out_proj(out.transpose(1, 2).reshape(b, n, h * d))


class TwoWayAttentionBlock(nn.Module):
    def __init__(self, embedding_dim, num_heads, mlp_dim,
                 skip_first_layer_pe):
        super().__init__()
        self.self_attn = DecAttention(embedding_dim, num_heads)
        self.norm1 = nn.LayerNorm(embedding_dim)
        self.cross_attn_token_to_image = DecAttention(
            embedding_dim, num_heads, 2)
        self.norm2 = nn.LayerNorm(embedding_dim)
        self.mlp = nn.Module()
        self.mlp.lin1 = nn.Linear(embedding_dim, mlp_dim)
        self.mlp.lin2 = nn.Linear(mlp_dim, embedding_dim)
        self.norm3 = nn.LayerNorm(embedding_dim)
        self.norm4 = nn.LayerNorm(embedding_dim)
        self.cross_attn_image_to_token = DecAttention(
            embedding_dim, num_heads, 2)
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.norm2(queries)
        queries = queries + self.mlp.lin2(F.relu(self.mlp.lin1(queries)))
        queries = self.norm3(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    def __init__(self, depth, embedding_dim, num_heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            TwoWayAttentionBlock(embedding_dim, num_heads, mlp_dim,
                                 skip_first_layer_pe=(i == 0))
            for i in range(depth)])
        self.final_attn_token_to_image = DecAttention(
            embedding_dim, num_heads, 2)
        self.norm_final_attn = nn.LayerNorm(embedding_dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        # (B, C, H, W) -> (B, HW, C)
        b, c, h, w = image_embedding.shape
        image_embedding = image_embedding.flatten(2).permute(0, 2, 1)
        image_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries, keys = point_embedding, image_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class MLP(nn.Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
        super().__init__()
        dims = [input_dim] + [hidden_dim] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [output_dim]))

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < len(self.layers) - 1 else layer(x)
        return x


class MaskDecoder(nn.Module):
    def __init__(self, transformer_dim, num_heads, mlp_dim,
                 num_multimask_outputs=3, iou_head_hidden_dim=None):
        super().__init__()
        self.num_mask_tokens = num_multimask_outputs + 1
        self.transformer = TwoWayTransformer(2, transformer_dim, num_heads,
                                             mlp_dim)
        self.iou_token = nn.Embedding(1, transformer_dim)
        self.mask_tokens = nn.Embedding(self.num_mask_tokens,
                                        transformer_dim)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(transformer_dim, transformer_dim // 4, 2, 2),
            LayerNorm2d(transformer_dim // 4), nn.GELU(),
            nn.ConvTranspose2d(transformer_dim // 4, transformer_dim // 8,
                               2, 2), nn.GELU())
        self.output_hypernetworks_mlps = nn.ModuleList([
            MLP(transformer_dim, transformer_dim, transformer_dim // 8, 3)
            for _ in range(self.num_mask_tokens)])
        self.iou_prediction_head = MLP(
            transformer_dim, iou_head_hidden_dim or transformer_dim,
            self.num_mask_tokens, 3)

    def predict_masks(self, image_embeddings, image_pe,
                      sparse_prompt_embeddings, dense_prompt_embeddings):
        out_tokens = torch.cat([self.iou_token.weight,
                                self.mask_tokens.weight], 0)
        out_tokens = out_tokens.unsqueeze(0).expand(
            sparse_prompt_embeddings.size(0), -1, -1)
        tokens = torch.cat((out_tokens, sparse_prompt_embeddings), 1)

        src = torch.repeat_interleave(image_embeddings, tokens.shape[0], 0)
        src = src + dense_prompt_embeddings
        pos_src = torch.repeat_interleave(image_pe, tokens.shape[0], 0)
        b, c, h, w = src.shape

        hs, src = self.transformer(src, pos_src, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens]

        src = src.transpose(1, 2).view(b, c, h, w)
        upscaled = self.output_upscaling(src)
        hyper_in = torch.stack([
            self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
            for i in range(self.num_mask_tokens)], 1)
        b, c2, h2, w2 = upscaled.shape
        masks = (hyper_in @ upscaled.view(b, c2, h2 * w2)) \
            .view(b, -1, h2, w2)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred


class Sam(nn.Module):
    """Container matching the official checkpoint's top-level naming."""

    def __init__(self, img_size=64, patch_size=8, embed_dim=32, depth=2,
                 num_heads=2, global_attn_indexes=(1,), window_size=4,
                 out_chans=16, mlp_ratio=4.0, decoder_heads=8,
                 decoder_mlp_dim=32):
        super().__init__()
        e = img_size // patch_size
        self.image_encoder = ImageEncoderViT(
            img_size, patch_size, embed_dim, depth, num_heads, mlp_ratio,
            out_chans, window_size, global_attn_indexes)
        self.prompt_encoder = PromptEncoder(out_chans, e, img_size)
        self.mask_decoder = MaskDecoder(out_chans, decoder_heads,
                                        decoder_mlp_dim)
