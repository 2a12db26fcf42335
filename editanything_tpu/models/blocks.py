"""Shared UNet/VAE building blocks (diffusers param naming, NHWC compute).

Behavioral spec being re-implemented (reference, for parity checking):
- ResBlock: /root/reference/ldm/modules/diffusionmodules/openaimodel.py:162
- SpatialTransformer/BasicTransformerBlock: ldm/modules/attention.py:246-341
- Up/Downsample: openaimodel.py:90,133
- VAE ResnetBlock/AttnBlock: ldm/modules/diffusionmodules/model.py:90,152

Param trees are nested dicts whose joined keys match diffusers module names
(e.g. resnet: norm1/conv1/time_emb_proj/norm2/conv2/conv_shortcut), so the
torch->JAX converter in editanything_tpu/checkpoints is a pure renaming of
tensor layouts, with no architectural mapping table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editanything_tpu.core import layers as L
from editanything_tpu.core.kernels import group_norm_silu


# ---------------------------------------------------------------------------
# ResNet block (time-conditioned)
# ---------------------------------------------------------------------------

def init_resnet_block(key, in_ch, out_ch, temb_ch=None, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": L.init_group_norm(in_ch, dtype),
        "conv1": L.init_conv2d(ks[0], in_ch, out_ch, 3, dtype),
        "norm2": L.init_group_norm(out_ch, dtype),
        "conv2": L.init_conv2d(ks[1], out_ch, out_ch, 3, dtype),
    }
    if temb_ch:
        p["time_emb_proj"] = L.init_linear(ks[2], temb_ch, out_ch, dtype)
    if in_ch != out_ch:
        p["conv_shortcut"] = L.init_conv2d(ks[3], in_ch, out_ch, 1, dtype)
    return p


def resnet_block(params, x, temb=None, *, num_groups=32, eps=1e-5):
    """GroupNorm-SiLU-Conv x2 with additive time embedding and skip.

    eps: 1e-5 in the UNet (GroupNorm32, openaimodel), 1e-6 in the VAE
    (model.py:47 Normalize).

    On real TPU the whole block dispatches to the fused Pallas kernel
    (core.kernels.resnet_fused: one HBM read/write of the activation,
    convs as 9 shifted MXU matmuls); otherwise the composed ops below."""
    from editanything_tpu.core import kernels
    trow = None
    if temb is not None and "time_emb_proj" in params:
        trow = L.linear(params["time_emb_proj"], L.silu(temb))
    fused = kernels.resnet_fused(params, x, trow, num_groups=num_groups,
                                 eps=eps)
    if fused is not None:
        return fused
    h = group_norm_silu(params["norm1"], x, num_groups=num_groups, eps=eps)
    h = L.conv2d(params["conv1"], h, padding=1)
    if trow is not None:
        h = h + trow[:, None, None, :].astype(h.dtype)
    h = group_norm_silu(params["norm2"], h, num_groups=num_groups, eps=eps)
    h = L.conv2d(params["conv2"], h, padding=1)
    if "conv_shortcut" in params:
        x = L.conv2d(params["conv_shortcut"], x, padding=0)
    return x + h


# ---------------------------------------------------------------------------
# Transformer block (self-attn + cross-attn + GEGLU FF)
# ---------------------------------------------------------------------------

def init_attention(key, query_dim, context_dim=None, dtype=jnp.float32):
    context_dim = context_dim or query_dim
    ks = jax.random.split(key, 4)
    return {
        "to_q": L.init_linear(ks[0], query_dim, query_dim, dtype, bias=False),
        "to_k": L.init_linear(ks[1], context_dim, query_dim, dtype, bias=False),
        "to_v": L.init_linear(ks[2], context_dim, query_dim, dtype, bias=False),
        "to_out": {"0": L.init_linear(ks[3], query_dim, query_dim, dtype)},
    }


def project_kv(params, context):
    """The cross-attention K/V projections of one attention layer. For a
    denoise loop the text context is step-invariant, so callers compute
    this ONCE per edit and pass the result as `kv=` (XLA does not hoist
    these matmuls out of `lax.scan` bodies)."""
    return (L.linear(params["to_k"], context),
            L.linear(params["to_v"], context))


def attention_layer(params, x, context=None, *, heads, context_mask=None,
                    kv=None):
    """Multi-head attention over (B, N, C) with optional cross context.

    QKV projections hit the MXU as single big matmuls — for SELF attention
    the three projections fuse into one (C, 3C) matmul (to_q/to_k/to_v are
    bias-free, so concatenating the weights is exact; the concat is
    loop-invariant and hoisted by XLA). The core runs through the Pallas
    flash kernel (core.flash_attention.dispatch).
    `context_mask`: boolean (.., 1, M) — False keys are excluded from the
    softmax (used by reference-only control to mask bank tokens).
    `kv`: optional precomputed (k, v) from `project_kv` (loop-invariant
    cross-attention context hoisted out of the denoise scan)."""
    b, n, c = x.shape
    if kv is not None:
        q = L.linear(params["to_q"], x)
        k, v = kv
        k = k.astype(x.dtype)
        v = v.astype(x.dtype)
    elif context is None:
        w_qkv = jnp.concatenate([params["to_q"]["kernel"],
                                 params["to_k"]["kernel"],
                                 params["to_v"]["kernel"]], axis=1)
        qkv = x @ w_qkv.astype(x.dtype)
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    else:
        q = L.linear(params["to_q"], x)
        k = L.linear(params["to_k"], context)
        v = L.linear(params["to_v"], context)
    d = c // heads
    q = q.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    out = L.attention(q, k, v, mask=context_mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return L.linear(params["to_out"]["0"], out)


def init_transformer_block(key, dim, context_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "norm1": L.init_layer_norm(dim, dtype),
        "attn1": init_attention(ks[0], dim, None, dtype),
        "norm2": L.init_layer_norm(dim, dtype),
        "attn2": init_attention(ks[1], dim, context_dim, dtype),
        "norm3": L.init_layer_norm(dim, dtype),
        "ff": {"net": {
            "0": {"proj": L.init_linear(ks[2], dim, dim * 8, dtype)},  # GEGLU
            "2": L.init_linear(ks[3], dim * 4, dim, dtype),
        }},
    }


def transformer_block(params, x, context, *, heads, ref=None,
                      attn_weight=0.0, hw=None, kv=None):
    """ref/attn_weight/hw: reference-only control hook on the self-attn
    (engine/refctrl.py; reference stable_diffusion_reference.py:335-440).
    kv: precomputed cross-attention (k, v) for attn2 (see project_kv)."""
    norm_x = L.layer_norm(params["norm1"], x)
    if ref is not None and ref.attn_active(attn_weight):
        if ref.mode == "write":
            ref.write_attn(norm_x, hw)
            a = attention_layer(params["attn1"], norm_x, heads=heads)
        else:
            a = ref.read_attn(params["attn1"], norm_x, hw, heads,
                              attention_layer)
    else:
        a = attention_layer(params["attn1"], norm_x, heads=heads)
    x = x + a
    x = x + attention_layer(params["attn2"], L.layer_norm(params["norm2"], x),
                            context, heads=heads, kv=kv)
    h = L.geglu(params["ff"]["net"]["0"]["proj"],
                L.layer_norm(params["norm3"], x))
    x = x + L.linear(params["ff"]["net"]["2"], h)
    return x


def init_spatial_transformer(key, channels, context_dim, *, depth=1,
                             use_linear=False, dtype=jnp.float32):
    ks = jax.random.split(key, depth + 2)
    if use_linear:
        proj_in = L.init_linear(ks[0], channels, channels, dtype)
        proj_out = L.init_linear(ks[1], channels, channels, dtype)
    else:
        proj_in = L.init_conv2d(ks[0], channels, channels, 1, dtype)
        proj_out = L.init_conv2d(ks[1], channels, channels, 1, dtype)
    return {
        "norm": L.init_group_norm(channels, dtype),
        "proj_in": proj_in,
        "transformer_blocks": {
            str(i): init_transformer_block(ks[i + 2], channels, context_dim, dtype)
            for i in range(depth)
        },
        "proj_out": proj_out,
    }


def init_spatial_kv(params, context):
    """project_kv for every transformer block of one spatial transformer."""
    return {i: project_kv(params["transformer_blocks"][i]["attn2"], context)
            for i in params["transformer_blocks"]}


def spatial_transformer(params, x, context, *, heads, use_linear=False,
                        num_groups=32, ref=None, attn_weight=0.0, kv=None):
    """Flatten NHWC -> (B, H*W, C), run transformer blocks, residual add.

    kv: optional {block_index: (k, v)} of precomputed cross-attention
    context projections (init_spatial_kv)."""
    b, h, w, c = x.shape
    residual = x
    # eps 1e-6: ldm/modules/attention.py:88-89 Normalize; single-pass
    # Pallas GroupNorm (no activation) instead of the multi-pass XLA form
    hidden = group_norm_silu(params["norm"], x, num_groups=num_groups,
                             eps=1e-6, apply_silu=False)
    if use_linear:
        hidden = hidden.reshape(b, h * w, c)
        hidden = L.linear(params["proj_in"], hidden)
    else:
        hidden = L.conv2d(params["proj_in"], hidden, padding=0)
        hidden = hidden.reshape(b, h * w, c)
    for i in range(len(params["transformer_blocks"])):
        hidden = transformer_block(params["transformer_blocks"][str(i)],
                                   hidden, context, heads=heads, ref=ref,
                                   attn_weight=attn_weight, hw=(h, w),
                                   kv=kv[str(i)] if kv else None)
    if use_linear:
        hidden = L.linear(params["proj_out"], hidden)
        hidden = hidden.reshape(b, h, w, c)
    else:
        hidden = hidden.reshape(b, h, w, c)
        hidden = L.conv2d(params["proj_out"], hidden, padding=0)
    return hidden + residual


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------

def init_downsample(key, channels, dtype=jnp.float32):
    return {"conv": L.init_conv2d(key, channels, channels, 3, dtype)}


def downsample(params, x):
    # stride-2 conv with asymmetric (0,1) padding, matching torch
    # Conv2d(stride=2, padding=1) on even sizes
    return L.conv2d(params["conv"], x, stride=2, padding=[(1, 1), (1, 1)])


def init_upsample(key, channels, dtype=jnp.float32):
    return {"conv": L.init_conv2d(key, channels, channels, 3, dtype)}


def upsample(params, x):
    # 2x nearest as broadcast+reshape: bit-identical to jax.image.resize
    # "nearest" (verified on chip) without its gather lowering
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    x = x.reshape(b, h * 2, w * 2, c)
    return L.conv2d(params["conv"], x, padding=1)


# ---------------------------------------------------------------------------
# VAE attention block (single-head, diffusers `Attention` naming)
# ---------------------------------------------------------------------------

def init_vae_attention(key, channels, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": L.init_group_norm(channels, dtype),
        "to_q": L.init_linear(ks[0], channels, channels, dtype),
        "to_k": L.init_linear(ks[1], channels, channels, dtype),
        "to_v": L.init_linear(ks[2], channels, channels, dtype),
        "to_out": {"0": L.init_linear(ks[3], channels, channels, dtype)},
    }


def vae_attention(params, x, *, num_groups=32):
    b, h, w, c = x.shape
    residual = x
    # eps 1e-6: ldm/modules/diffusionmodules/model.py:46-47 Normalize
    hidden = L.group_norm(params["group_norm"], x, num_groups=num_groups,
                          eps=1e-6)
    hidden = hidden.reshape(b, h * w, c)
    q = L.linear(params["to_q"], hidden)[:, None]
    k = L.linear(params["to_k"], hidden)[:, None]
    v = L.linear(params["to_v"], hidden)[:, None]
    out = L.attention(q, k, v)[:, 0]
    out = L.linear(params["to_out"]["0"], out).reshape(b, h, w, c)
    return out + residual
