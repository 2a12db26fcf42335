"""Segment Anything Model (ViT image encoder + prompt encoder + mask decoder).

The reference consumes SAM from the external `segment_anything` pip package
(init at /root/reference/editany_lora.py:82-95; grid auto-masks :522-525;
click predictor :527-543; box prompts sam2vlpart_edit.py:150-159). This is a
from-scratch functional JAX implementation of the same architecture so those
call sites can be served TPU-natively:

- ImageEncoderViT: 16x16 patch embed, abs pos embed, windowed ViT blocks
  with decomposed relative position attention, global-attn blocks at fixed
  indices, 256-ch neck. 1024^2 input -> (64, 64, 256) embedding.
- PromptEncoder: random-Fourier positional encoding, learned point/box/
  no-mask embeddings, mask-input conv stack.
- MaskDecoder: two-way transformer (token<->image cross attention),
  3+1 mask tokens with hypernetwork heads, IoU prediction head, 4x
  transposed-conv upscaling -> (256, 256) mask logits.

Param tree keys mirror the official SAM checkpoint
(image_encoder.blocks.N.attn.qkv / prompt_encoder.point_embeddings.K /
mask_decoder.transformer.layers.N...) so checkpoint conversion is a pure
tensor-layout rename. TPU-first notes: all attention runs through
core.layers.attention (Pallas flash path for the 4096-token global blocks),
everything static-shape, window partition via reshape/transpose only.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.core import layers as L


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768                  # ViT-B; H: 1280
    depth: int = 12                       # ViT-B; H: 32
    num_heads: int = 12                   # ViT-B; H: 16
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    mlp_ratio: float = 4.0
    out_chans: int = 256
    # prompt/decoder
    prompt_embed_dim: int = 256
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048

    @property
    def embedding_size(self) -> int:
        return self.img_size // self.patch_size     # 64


def sam_vit_b() -> SAMConfig:
    return SAMConfig()


def sam_vit_l() -> SAMConfig:
    return SAMConfig(embed_dim=1024, depth=24, num_heads=16,
                     global_attn_indexes=(5, 11, 17, 23))


def sam_vit_h() -> SAMConfig:
    return SAMConfig(embed_dim=1280, depth=32, num_heads=16,
                     global_attn_indexes=(7, 15, 23, 31))


# ---------------------------------------------------------------------------
# LayerNorm2d (channel-wise LN over NHWC maps, torch SAM's LayerNorm2d)
# ---------------------------------------------------------------------------

def layer_norm_2d(params, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["weight"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def init_layer_norm_2d(c, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ---------------------------------------------------------------------------
# Image encoder
# ---------------------------------------------------------------------------

def init_image_encoder(key, cfg: SAMConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, cfg.depth * 8 + 16))
    nxt = lambda: next(ks)
    d = cfg.embed_dim
    e = cfg.embedding_size
    mlp = int(d * cfg.mlp_ratio)

    blocks = {}
    for i in range(cfg.depth):
        win = 0 if i in cfg.global_attn_indexes else cfg.window_size
        size = e if win == 0 else win
        blocks[str(i)] = {
            "norm1": L.init_layer_norm(d, dtype),
            "attn": {
                "qkv": L.init_linear(nxt(), d, 3 * d, dtype),
                "proj": L.init_linear(nxt(), d, d, dtype),
                "rel_pos_h": jnp.zeros((2 * size - 1, d // cfg.num_heads), dtype),
                "rel_pos_w": jnp.zeros((2 * size - 1, d // cfg.num_heads), dtype),
            },
            "norm2": L.init_layer_norm(d, dtype),
            "mlp": {"lin1": L.init_linear(nxt(), d, mlp, dtype),
                    "lin2": L.init_linear(nxt(), mlp, d, dtype)},
        }
    return {
        "patch_embed": {"proj": L.init_conv2d(nxt(), 3, d, cfg.patch_size, dtype)},
        "pos_embed": jnp.zeros((1, e, e, d), dtype),
        "blocks": blocks,
        "neck": {
            "0": {"kernel": jax.random.normal(nxt(), (1, 1, d, cfg.out_chans),
                                              dtype) * 0.02},
            "1": init_layer_norm_2d(cfg.out_chans, dtype),
            "2": {"kernel": jax.random.normal(nxt(), (3, 3, cfg.out_chans,
                                                      cfg.out_chans), dtype) * 0.02},
            "3": init_layer_norm_2d(cfg.out_chans, dtype),
        },
    }


def _rel_pos_bias(rel_pos, q_size, k_size):
    """(2*size-1, hd) table -> (q, k, hd) gathered relative embeddings."""
    coords_q = jnp.arange(q_size)[:, None]
    coords_k = jnp.arange(k_size)[None, :]
    rel = coords_q - coords_k + (k_size - 1)
    return rel_pos[rel]                                  # (q, k, hd)


def _rel_pos_augmented_qkv(p, x, num_heads):
    """Fold the decomposed rel-pos bias INTO the QK contraction.

    torch SAM (segment_anything image_encoder add_decomposed_rel_pos)
    computes logits[q,(kr,kc)] = q.k/sqrt(d) + bias_h[q,kr] + bias_w[q,kc]
    with bias_h = q.rel_pos_h, bias_w = q.rel_pos_w. That is exactly an
    augmented contraction:
        q' = [q/sqrt(d), bias_h[q,:], bias_w[q,:]]     (d + h + w)
        k' = [k,         onehot(kr),  onehot(kc)]
        logits = q'.k'
    so the MXU does the bias add: no (N, N) bias materialization, no
    per-row masked-lane extraction in the flash kernel. For the 14x14
    windows d' = 80+28 = 108 <= 128 — free under the existing lane
    padding (windowed ViT-H block measured 2.28 -> 1.61 ms); the 64x64
    global layers pay one extra 128-lane chunk (3.90 -> 3.17 ms).

    Returns q_aug, k_aug (B, nh, N, d+h+w) and v (B, nh, N, d)."""
    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = L.linear(p["qkv"], x.reshape(b, h * w, c))     # (B, N, 3C)
    qkv = qkv.reshape(b, h * w, 3, num_heads, hd)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]

    scale = 1.0 / math.sqrt(hd)
    rh = _rel_pos_bias(p["rel_pos_h"], h, h).astype(jnp.float32)  # (h, h, hd)
    rw = _rel_pos_bias(p["rel_pos_w"], w, w).astype(jnp.float32)  # (w, w, hd)
    qf = q.reshape(b, num_heads, h, w, hd).astype(jnp.float32)
    bias_h = jnp.einsum("bxhwd,hkd->bxhwk", qf, rh
                        ).reshape(b, num_heads, h * w, h)
    bias_w = jnp.einsum("bxhwd,wkd->bxhwk", qf, rw
                        ).reshape(b, num_heads, h * w, w)
    q_aug = jnp.concatenate(
        [q.astype(jnp.float32) * scale, bias_h, bias_w], -1).astype(x.dtype)

    n = h * w
    key_r = jnp.arange(n) // w
    key_c = jnp.arange(n) % w
    onehot = jnp.concatenate(
        [(key_r[:, None] == jnp.arange(h)[None]).astype(x.dtype),
         (key_c[:, None] == jnp.arange(w)[None]).astype(x.dtype)], -1)
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(onehot[None, None],
                             (b, num_heads, n, h + w))], -1)
    return q_aug, k_aug, v


def _attention_with_rel_pos(p, x, num_heads, rel_hw):
    """x: (B, H, W, C). Windowed or global attention with decomposed rel pos
    via the augmented contraction (materializing-logits XLA path)."""
    b, h, w, c = x.shape
    q_aug, k_aug, v = _rel_pos_augmented_qkv(p, x, num_heads)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q_aug, k_aug,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return L.linear(p["proj"], out)


def _attention_with_rel_pos_flash(p, x, num_heads):
    """Global-layer variant through the flash kernel: the (N, N) logits
    matrix (1 GB fp32 at 64^2 tokens x 16 heads) never materializes, and
    the rel-pos bias rides the augmented q/k lanes (core/flash_attention.py
    flash_attention supports dqk > dv)."""
    from editanything_tpu.core import flash_attention as FA
    b, h, w, c = x.shape
    q_aug, k_aug, v = _rel_pos_augmented_qkv(p, x, num_heads)
    out = FA.flash_attention(q_aug, k_aug, v, scale=1.0)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return L.linear(p["proj"], out)


def _use_rel_pos_flash(h, w):
    from editanything_tpu.core.flash_attention import (_DISABLED, _INTERPRET,
                                                       _on_tpu)
    # kv streams block-wise through the kernel's innermost grid dim, so any
    # detect resolution fits VMEM (2048px -> 128x128 grid, reference UI
    # slider max, /root/reference/editany_demo.py:249-255)
    return (not _DISABLED and (_on_tpu() or _INTERPRET)
            and 1024 <= h * w and h == w)


def _window_partition(x, win):
    b, h, w, c = x.shape
    pad_h = (win - h % win) % win
    pad_w = (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def _window_unpartition(x, win, hw_pad, hw):
    hp, wp = hw_pad
    h, w = hw
    b = x.shape[0] // (hp // win * (wp // win))
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _encoder_block(p, x, cfg: SAMConfig, window: int):
    shortcut = x
    x = L.layer_norm(p["norm1"], x)
    if window > 0:
        xw, hw_pad = _window_partition(x, window)
        xw = _attention_with_rel_pos(p["attn"], xw, cfg.num_heads, window)
        x = _window_unpartition(xw, window, hw_pad, (shortcut.shape[1],
                                                     shortcut.shape[2]))
    else:
        if _use_rel_pos_flash(x.shape[1], x.shape[2]):
            x = _attention_with_rel_pos_flash(p["attn"], x, cfg.num_heads)
        else:
            x = _attention_with_rel_pos(p["attn"], x, cfg.num_heads, 0)
    x = shortcut + x
    h = L.layer_norm(p["norm2"], x)
    h = L.linear(p["mlp"]["lin1"], h)
    h = L.gelu(h)
    h = L.linear(p["mlp"]["lin2"], h)
    return x + h


def _patch_embed(p, x, patch: int):
    """Stride-`patch` patch projection as space-to-depth + matmul. The
    direct conv form has 3 input channels — a catastrophic MXU shape
    (contraction dim 3 padded to 128); regrouping to (p*p*3 = 768) @ 1280
    is the same linear map and measured 1.53 -> 0.10 ms at ViT-H 1024^2."""
    b, h, w, c = x.shape
    hp, wp = h // patch, w // patch
    xr = x.reshape(b, hp, patch, wp, patch, c)
    xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, patch * patch * c)
    kern = p["kernel"].reshape(patch * patch * c, -1)   # HWIO flat == xr
    out = jnp.einsum("bhwi,io->bhwo", xr, kern.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["bias"].astype(x.dtype)


def image_encoder(params, cfg: SAMConfig, x):
    """(B, 1024, 1024, 3) normalized pixels -> (B, 64, 64, 256) embeddings."""
    p = params
    h = _patch_embed(p["patch_embed"]["proj"], x, cfg.patch_size)
    h = h + p["pos_embed"].astype(h.dtype)
    for i in range(cfg.depth):
        win = 0 if i in cfg.global_attn_indexes else cfg.window_size
        h = _encoder_block(p["blocks"][str(i)], h, cfg, win)
    h = L.conv2d({"kernel": p["neck"]["0"]["kernel"]}, h, padding=0)
    h = layer_norm_2d(p["neck"]["1"], h)
    h = L.conv2d({"kernel": p["neck"]["2"]["kernel"]}, h, padding=1)
    h = layer_norm_2d(p["neck"]["3"], h)
    return h


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------

def init_prompt_encoder(key, cfg: SAMConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16))
    nxt = lambda: next(ks)
    d = cfg.prompt_embed_dim
    return {
        "pe_layer": {"positional_encoding_gaussian_matrix":
                     jax.random.normal(nxt(), (2, d // 2), jnp.float32)},
        "point_embeddings": {str(i): {"weight": jax.random.normal(
            nxt(), (1, d), dtype) * 0.02} for i in range(4)},
        "not_a_point_embed": {"weight": jax.random.normal(
            nxt(), (1, d), dtype) * 0.02},
        "no_mask_embed": {"weight": jax.random.normal(
            nxt(), (1, d), dtype) * 0.02},
        # mask-input downscaling convs (rarely used; kept for parity)
        "mask_downscaling": {
            "0": L.init_conv2d(nxt(), 1, 4, 2, dtype),
            "1": init_layer_norm_2d(4, dtype),
            "3": L.init_conv2d(nxt(), 4, 16, 2, dtype),
            "4": init_layer_norm_2d(16, dtype),
            "6": L.init_conv2d(nxt(), 16, d, 1, dtype),
        },
    }


def _pe_encode(pe_params, coords):
    """coords in [0,1]^2, shape (..., 2) -> (..., D) random-Fourier PE."""
    gauss = pe_params["positional_encoding_gaussian_matrix"]
    c = 2.0 * coords.astype(jnp.float32) - 1.0
    proj = (2.0 * np.pi) * (c @ gauss)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def dense_positional_encoding(params, cfg: SAMConfig):
    """(1, 64, 64, D) image-grid PE for the decoder."""
    e = cfg.embedding_size
    ys = (jnp.arange(e, dtype=jnp.float32) + 0.5) / e
    xs = (jnp.arange(e, dtype=jnp.float32) + 0.5) / e
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (e,e,2)
    return _pe_encode(params["pe_layer"], grid)[None]


def encode_points(params, cfg: SAMConfig, coords, labels):
    """coords: (B, P, 2) pixel coords in [0, img_size); labels (B, P):
    1 pos, 0 neg, -1 pad, 2/3 box corners. -> (B, P, D) sparse embeddings."""
    norm = (coords.astype(jnp.float32) + 0.5) / cfg.img_size
    pe = _pe_encode(params["pe_layer"], norm)
    # label-conditional additive embeddings, fully vectorized
    add = jnp.zeros_like(pe)
    for lbl, key in ((0, "0"), (1, "1"), (2, "2"), (3, "3")):
        w = params["point_embeddings"][key]["weight"][0].astype(pe.dtype)
        add = add + jnp.where(labels[..., None] == lbl, w, 0.0)
    nap = params["not_a_point_embed"]["weight"][0].astype(pe.dtype)
    return jnp.where(labels[..., None] == -1, nap, pe + add)


def no_mask_dense_embedding(params, cfg: SAMConfig, batch: int):
    w = params["no_mask_embed"]["weight"][0]
    e = cfg.embedding_size
    return jnp.broadcast_to(w[None, None, None, :], (batch, e, e, w.shape[0]))


# ---------------------------------------------------------------------------
# Mask decoder (two-way transformer)
# ---------------------------------------------------------------------------

def _init_attn(key, d, kv_d=None, downsample=1, dtype=jnp.float32):
    kv_d = kv_d or d
    inner = d // downsample
    ks = jax.random.split(key, 4)
    return {
        "q_proj": L.init_linear(ks[0], d, inner, dtype),
        "k_proj": L.init_linear(ks[1], kv_d, inner, dtype),
        "v_proj": L.init_linear(ks[2], kv_d, inner, dtype),
        "out_proj": L.init_linear(ks[3], inner, d, dtype),
    }


def _mlp_params(key, dims, dtype=jnp.float32):
    ks = jax.random.split(key, len(dims) - 1)
    return {"layers": {str(i): L.init_linear(ks[i], dims[i], dims[i + 1], dtype)
                       for i in range(len(dims) - 1)}}


def _mlp(params, x, act=jax.nn.relu, sigmoid_output=False):
    n = len(params["layers"])
    for i in range(n):
        x = L.linear(params["layers"][str(i)], x)
        if i < n - 1:
            x = act(x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def init_mask_decoder(key, cfg: SAMConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)
    d = cfg.prompt_embed_dim
    nm = cfg.num_multimask_outputs + 1

    layers = {}
    for i in range(cfg.decoder_depth):
        layers[str(i)] = {
            "self_attn": _init_attn(nxt(), d, dtype=dtype),
            "norm1": L.init_layer_norm(d, dtype),
            "cross_attn_token_to_image": _init_attn(nxt(), d, downsample=2,
                                                    dtype=dtype),
            "norm2": L.init_layer_norm(d, dtype),
            "mlp": {"lin1": L.init_linear(nxt(), d, cfg.decoder_mlp_dim, dtype),
                    "lin2": L.init_linear(nxt(), cfg.decoder_mlp_dim, d, dtype)},
            "norm3": L.init_layer_norm(d, dtype),
            "cross_attn_image_to_token": _init_attn(nxt(), d, downsample=2,
                                                    dtype=dtype),
            "norm4": L.init_layer_norm(d, dtype),
        }
    return {
        "transformer": {
            "layers": layers,
            "final_attn_token_to_image": _init_attn(nxt(), d, downsample=2,
                                                    dtype=dtype),
            "norm_final_attn": L.init_layer_norm(d, dtype),
        },
        "iou_token": {"weight": jax.random.normal(nxt(), (1, d), dtype) * 0.02},
        "mask_tokens": {"weight": jax.random.normal(nxt(), (nm, d), dtype) * 0.02},
        "output_upscaling": {
            "0": {"kernel": jax.random.normal(nxt(), (2, 2, d, d // 4),
                                              dtype) * 0.02,
                  "bias": jnp.zeros((d // 4,), dtype)},
            "1": init_layer_norm_2d(d // 4, dtype),
            "3": {"kernel": jax.random.normal(nxt(), (2, 2, d // 4, d // 8),
                                              dtype) * 0.02,
                  "bias": jnp.zeros((d // 8,), dtype)},
        },
        "output_hypernetworks_mlps": {
            str(i): _mlp_params(nxt(), [d, d, d, d // 8], dtype)
            for i in range(nm)},
        # official: MLP(transformer_dim, iou_head_hidden_dim=256,
        # num_mask_tokens, iou_head_depth=3) — 3 linear layers. All released
        # SAM variants have prompt_embed_dim == iou_head_hidden_dim == 256.
        "iou_prediction_head": _mlp_params(nxt(), [d, d, d, nm], dtype),
    }


def _decoder_attention(p, q, k, v, num_heads):
    b, nq, _ = q.shape
    qh = L.linear(p["q_proj"], q)
    kh = L.linear(p["k_proj"], k)
    vh = L.linear(p["v_proj"], v)
    inner = qh.shape[-1]
    hd = inner // num_heads
    qh = qh.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = kh.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    vh = vh.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    out = L.attention_reference(qh, kh, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, inner)
    return L.linear(p["out_proj"], out)


def _two_way_block(p, queries, keys, query_pe, key_pe, num_heads,
                   skip_first_layer_pe):
    if skip_first_layer_pe:
        # official SAM REPLACES queries here (no residual add):
        # segment_anything/modeling/transformer.py TwoWayAttentionBlock
        queries = _decoder_attention(p["self_attn"], queries,
                                     queries, queries, num_heads)
    else:
        q = queries + query_pe
        attn = _decoder_attention(p["self_attn"], q, q, queries, num_heads)
        queries = queries + attn
    queries = L.layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _decoder_attention(p["cross_attn_token_to_image"],
                                           q, k, keys, num_heads)
    queries = L.layer_norm(p["norm2"], queries)

    h = L.linear(p["mlp"]["lin1"], queries)
    h = jax.nn.relu(h)
    queries = queries + L.linear(p["mlp"]["lin2"], h)
    queries = L.layer_norm(p["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _decoder_attention(p["cross_attn_image_to_token"],
                                     k, q, queries, num_heads)
    keys = L.layer_norm(p["norm4"], keys)
    return queries, keys


def mask_decoder(params, cfg: SAMConfig, image_embedding, image_pe,
                 sparse_prompts, dense_prompts, *, twoway_packed=None):
    """Predict masks for a batch of prompts against one image embedding.

    image_embedding: (1, 64, 64, 256); sparse_prompts: (B, P, 256);
    dense_prompts: (B, 64, 64, 256) — or (1, 64, 64, 256) to mark the
    image-side input as identical for every prompt in the batch, which
    routes the whole two-way transformer through the VMEM-resident Pallas
    kernel (core/kernels.py sam_twoway; exact same math). The AMG's
    3072-point grid decode uses this: its dense prompt is always the
    no-mask embedding. `twoway_packed`: pre-stacked kernel weights
    (kernels.pack_twoway) for callers invoking this inside a scan.
    Returns (mask_logits (B, 4, 256, 256), iou_pred (B, 4)).
    """
    p = params
    d = cfg.prompt_embed_dim
    b = sparse_prompts.shape[0]
    nm = cfg.num_multimask_outputs + 1
    shared = dense_prompts.shape[0] == 1 and b > 1

    tokens = jnp.concatenate([
        jnp.broadcast_to(p["iou_token"]["weight"][None], (b, 1, d)),
        jnp.broadcast_to(p["mask_tokens"]["weight"][None], (b, nm, d)),
        sparse_prompts], axis=1)

    e = cfg.embedding_size
    kb = 1 if shared else b
    src = jnp.broadcast_to(image_embedding, (kb, e, e, d)) + dense_prompts
    src = src.reshape(kb, e * e, d)
    pos1 = image_pe.reshape(1, e * e, d)

    from editanything_tpu.core import kernels as K
    use_twoway_kernel = (dense_prompts.shape[0] == 1
                         and not K._DISABLED
                         and (K._INTERPRET
                              or (K._on_tpu() and K._big_vmem())))
    if use_twoway_kernel:
        # whole two-way transformer as one VMEM-resident Pallas program
        # (core/kernels.py sam_twoway); src is prompt-independent here so
        # the kernel streams only tokens per prompt. `twoway_packed` lets
        # scan-body callers (the AMG) hoist the weight stacking.
        queries, keys = K.sam_twoway(p["transformer"], src, pos1, tokens,
                                     heads=cfg.decoder_heads,
                                     packed=twoway_packed)
    else:
        if shared:
            src = jnp.broadcast_to(src, (b, e * e, d))
        pos = jnp.broadcast_to(pos1, (b, e * e, d))
        queries, keys = tokens, src
        for i in range(cfg.decoder_depth):
            queries, keys = _two_way_block(
                p["transformer"]["layers"][str(i)], queries, keys, tokens,
                pos, cfg.decoder_heads, skip_first_layer_pe=(i == 0))
        q = queries + tokens
        k = keys + pos
        queries = queries + _decoder_attention(
            p["transformer"]["final_attn_token_to_image"], q, k, keys,
            cfg.decoder_heads)
        queries = L.layer_norm(p["transformer"]["norm_final_attn"], queries)

    iou_token_out = queries[:, 0]
    mask_tokens_out = queries[:, 1:1 + nm]

    hyper = jnp.stack([
        _mlp(p["output_hypernetworks_mlps"][str(i)], mask_tokens_out[:, i])
        for i in range(nm)], axis=1)                # (B, nm, 32)
    # upscale 64 -> 256 (2x stride-2 transposed convs + LN + GELU) and the
    # hypernetwork mask products, fused in one VMEM-resident Pallas kernel
    # (XLA fallback off-TPU / non-standard widths — core/kernels.py)
    from editanything_tpu.core.kernels import sam_upscale_hyper
    masks = sam_upscale_hyper(keys, p["output_upscaling"], hyper)
    iou_pred = _mlp(p["iou_prediction_head"], iou_token_out)
    return masks, iou_pred


def init_sam(key, cfg: SAMConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "image_encoder": init_image_encoder(k1, cfg, dtype),
        "prompt_encoder": init_prompt_encoder(k2, cfg, dtype),
        "mask_decoder": init_mask_decoder(k3, cfg, dtype),
    }


# preprocessing constants (SAM's pixel normalization)
PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess(image_hwc_uint8, cfg: SAMConfig):
    """uint8 HWC image (already resized so long side = img_size) ->
    padded normalized (1, S, S, 3)."""
    x = (image_hwc_uint8.astype(jnp.float32) - PIXEL_MEAN) / PIXEL_STD
    h, w = x.shape[0], x.shape[1]
    x = jnp.pad(x, ((0, cfg.img_size - h), (0, cfg.img_size - w), (0, 0)))
    return x[None]
