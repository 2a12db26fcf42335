"""ControlNet — trainable UNet-encoder copy with hint embedding + zero convs.

Behavioral spec (not code) from the reference:
- architecture: /root/reference/cldm/cldm.py:48-305 (`ControlNet` module:
  input_hint_block 8-conv stack, per-block zero convs, 13 residuals)
- the diffusers-style fork with **2-D conditioning-scale maps**:
  /root/reference/utils/stable_diffusion_controlnet.py:665-815
  (`ControlNetModel2.forward`): a scalar scale multiplies every residual;
  a (H, W) map is bilinearly resized to each residual's spatial size and
  multiplied per-pixel (:785-802); guess mode scales residuals by
  logspace(0.1 -> 1.0) (:778-783).

TPU-first: shares `models.unet`'s encoder/mid functions (same param naming),
so a ControlNet is literally a UNet-encoder param tree + small extras; the
whole thing jits into the denoise step with no Python in the loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from editanything_tpu.core import layers as L
from editanything_tpu.models import blocks as B
from editanything_tpu.models import unet as U
from editanything_tpu.models.config import ControlNetConfig


def init_controlnet(key, cfg: ControlNetConfig, dtype=jnp.float32):
    ucfg = cfg.unet
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)

    unet_params = U.init_unet(nxt(), ucfg, dtype)
    params = {
        "conv_in": unet_params["conv_in"],
        "time_embedding": unet_params["time_embedding"],
        "down_blocks": unet_params["down_blocks"],
        "mid_block": unet_params["mid_block"],
    }

    # hint embedding: conv stack 3 -> 16 -> 32 -> 96 -> 256 -> zero-conv(320)
    emb = {"conv_in": L.init_conv2d(nxt(), cfg.conditioning_channels,
                                    cfg.conditioning_embedding_channels[0], 3, dtype)}
    blocks = {}
    chans = cfg.conditioning_embedding_channels
    for i in range(len(chans) - 1):
        blocks[str(2 * i)] = L.init_conv2d(nxt(), chans[i], chans[i], 3, dtype)
        blocks[str(2 * i + 1)] = L.init_conv2d(nxt(), chans[i], chans[i + 1], 3, dtype)
    emb["blocks"] = blocks
    emb["conv_out"] = L.init_conv2d(
        nxt(), chans[-1], ucfg.block_out_channels[0], 3, dtype, zero=True)
    params["controlnet_cond_embedding"] = emb

    # zero convs: one per down residual (12) + mid
    down_zero = {}
    idx = 0
    out_ch = ucfg.block_out_channels[0]
    down_zero[str(idx)] = L.init_conv2d(nxt(), out_ch, out_ch, 1, dtype, zero=True)
    idx += 1
    for bi, bo in enumerate(ucfg.block_out_channels):
        for _ in range(ucfg.layers_per_block):
            down_zero[str(idx)] = L.init_conv2d(nxt(), bo, bo, 1, dtype, zero=True)
            idx += 1
        if bi < len(ucfg.block_out_channels) - 1:
            down_zero[str(idx)] = L.init_conv2d(nxt(), bo, bo, 1, dtype, zero=True)
            idx += 1
    params["controlnet_down_blocks"] = down_zero
    cm = ucfg.block_out_channels[-1]
    params["controlnet_mid_block"] = L.init_conv2d(nxt(), cm, cm, 1, dtype,
                                                   zero=True)
    return params


def _hint_embedding(params, cond):
    """Downsampling conv stack: (B, H, W, 3) image-space hint -> (B, H/8, W/8, 320)."""
    emb = params["controlnet_cond_embedding"]
    h = L.silu(L.conv2d(emb["conv_in"], cond, padding=1))
    n = len(emb["blocks"])
    for i in range(0, n, 2):
        h = L.silu(L.conv2d(emb["blocks"][str(i)], h, padding=1))
        h = L.silu(L.conv2d(emb["blocks"][str(i + 1)], h, stride=2,
                            padding=[(1, 1), (1, 1)]))
    return L.conv2d(emb["conv_out"], h, padding=1)


def _resize_corners(img, h, w):
    """Bilinear resize with align_corners=True semantics (torch
    F.interpolate(..., align_corners=True)): output pixel i samples
    source coordinate i*(in-1)/(out-1), corners map to corners.
    img: (B, Hi, Wi) -> (B, h, w)."""
    b, hi, wi = img.shape
    if (hi, wi) == (h, w):
        return img
    sy = (h - 1) / (hi - 1) if hi > 1 else 1.0
    sx = (w - 1) / (wi - 1) if wi > 1 else 1.0
    return jax.image.scale_and_translate(
        img, (b, h, w), (1, 2),
        scale=jnp.asarray([sy, sx], jnp.float32),
        translation=jnp.asarray([0.5 - 0.5 * sy, 0.5 - 0.5 * sx],
                                jnp.float32),
        method="linear", antialias=False)


def _scale_residual(res, scale, scale_map):
    """Apply scalar and/or per-pixel conditioning scale to one residual.

    scale_map: (B, Hm, Wm) image-space map, bilinearly resized
    (align_corners=True, matching the reference's F.interpolate call) to
    the residual's spatial dims (ControlNetModel2.forward:785-802)."""
    out = res * jnp.asarray(scale, res.dtype)
    if scale_map is not None:
        b, h, w, _ = res.shape
        m = _resize_corners(scale_map.astype(jnp.float32), h, w)
        out = out * m[..., None].astype(res.dtype)
    return out


def context_kv(params, cfg: ControlNetConfig, context):
    """Precompute the encoder+mid cross-attention (k, v) projections —
    the ControlNet twin of unet.context_kv (down.* / mid keys only)."""
    kv = {}
    for bi, blk in params["down_blocks"].items():
        for li in blk.get("attentions", {}):
            kv[f"down.{bi}.{li}"] = B.init_spatial_kv(
                blk["attentions"][li], context)
    kv["mid"] = B.init_spatial_kv(params["mid_block"]["attentions"]["0"],
                                  context)
    return kv


def apply(params, cfg: ControlNetConfig, sample, timesteps,
          encoder_hidden_states, controlnet_cond, *,
          conditioning_scale=1.0,
          conditioning_scale_map: Optional[jnp.ndarray] = None,
          guess_mode: bool = False, ref=None, hint_embedding=None,
          ctx_kv=None):
    """Returns (down_residuals tuple(12), mid_residual).

    `controlnet_cond`: (B, H*8, W*8, 3) image-space condition in [0, 1].
    `hint_embedding`: precomputed `_hint_embedding` output — the hint conv
    stack is loop-invariant across denoise steps, so callers hoist it out
    of the scan (engine/denoise.py) instead of re-encoding the full-res
    condition image every step like the reference does.
    `ref`: refctrl.RefState — the reference hooks the LAST (inpaint)
    ControlNet's blocks too (stable_diffusion_reference.py:999-1032).
    """
    from editanything_tpu.engine import refctrl
    ucfg = cfg.unet
    temb = U.time_embed(params, ucfg, timesteps, sample.dtype)
    g = ucfg.norm_num_groups
    n_down = len(ucfg.block_out_channels)
    ctx_kv = ctx_kv or {}
    attn_w = refctrl.controlnet_attn_weights(cfg) if ref is not None else None

    if hint_embedding is not None:
        hint = hint_embedding.astype(sample.dtype)
    else:
        hint = _hint_embedding(params, controlnet_cond.astype(sample.dtype))

    # encoder path with hint added after conv_in
    h = L.conv2d(params["conv_in"], sample, padding=1)
    h = h + hint
    residuals = [h]
    for bi in range(n_down):
        blk = params["down_blocks"][str(bi)]
        has_attn = "attentions" in blk
        heads = ucfg.heads_for_block(bi)
        for li in range(ucfg.layers_per_block):
            h = B.resnet_block(blk["resnets"][str(li)], h, temb, num_groups=g)
            if has_attn:
                h = B.spatial_transformer(
                    blk["attentions"][str(li)], h, encoder_hidden_states,
                    heads=heads, use_linear=ucfg.use_linear_projection,
                    num_groups=g, ref=ref,
                    kv=ctx_kv.get(f"down.{bi}.{li}"),
                    attn_weight=attn_w[f"down.{bi}.{li}"] if attn_w else 0.0)
            else:
                h = U._gn_hook(ref, h, refctrl.gn_weight_down(bi, n_down))
            residuals.append(h)
        if "downsamplers" in blk:
            h = B.downsample(blk["downsamplers"]["0"], h)
            residuals.append(h)
    h = U.middle(params, ucfg, h, temb, encoder_hidden_states, ref=ref,
                 attn_w=attn_w, ctx_kv=ctx_kv)

    down = [L.conv2d(params["controlnet_down_blocks"][str(i)], r, padding=0)
            for i, r in enumerate(residuals)]
    mid = L.conv2d(params["controlnet_mid_block"], h, padding=0)

    if guess_mode:
        # logspace(0.1 -> 1.0) over the 13 residuals, weakest at the shallow
        # blocks (reference :778-783)
        scales = jnp.logspace(-1.0, 0.0, len(down) + 1)
        down = [r * s for r, s in zip(down, scales[:-1])]
        mid = mid * scales[-1]

    down = tuple(_scale_residual(r, conditioning_scale, conditioning_scale_map)
                 for r in down)
    mid = _scale_residual(mid, conditioning_scale, conditioning_scale_map)
    return down, mid


def multi_controlnet_apply(param_list, cfg_list, sample, timesteps,
                           encoder_hidden_states, cond_list, scale_list,
                           scale_map_list=None, guess_mode=False, ref=None,
                           hint_embeddings=None, ctx_kvs=None):
    """Sum residual stacks from several ControlNets (the reference's
    MultiControlNet path: SAM control + inpaint control,
    editany_lora.py:814-882). `ref` is applied to the LAST net only
    (reference `model.nets[-1]`, stable_diffusion_reference.py:999)."""
    scale_map_list = scale_map_list or [None] * len(param_list)
    hint_embeddings = hint_embeddings or [None] * len(param_list)
    ctx_kvs = ctx_kvs or [None] * len(param_list)
    down_acc, mid_acc = None, None
    n = len(param_list)
    for i, (p, c, cond, s, smap) in enumerate(zip(
            param_list, cfg_list, cond_list, scale_list, scale_map_list)):
        down, mid = apply(p, c, sample, timesteps, encoder_hidden_states,
                          cond, conditioning_scale=s,
                          conditioning_scale_map=smap, guess_mode=guess_mode,
                          ref=ref if i == n - 1 else None,
                          hint_embedding=hint_embeddings[i],
                          ctx_kv=ctx_kvs[i])
        if down_acc is None:
            down_acc, mid_acc = list(down), mid
        else:
            down_acc = [a + b for a, b in zip(down_acc, down)]
            mid_acc = mid_acc + mid
    return tuple(down_acc), mid_acc
