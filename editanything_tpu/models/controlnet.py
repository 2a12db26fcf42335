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

import os

import jax
import jax.numpy as jnp
import numpy as np

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
    """Downsampling conv stack: (B, H, W, 3) image-space hint -> (B, H/8, W/8, 320).

    Dispatch: above _HINT_ONESHOT_MAX px the one-shot stack's low-channel
    activations blow up under TPU lane tiling (16 channels pad to 128 ->
    8x HBM: two ~8 GB buffers at 4096^2, the round-4 tile-bucket OOM), so
    huge hints route through the bit-exact tiled stack below."""
    h, w = cond.shape[1:3]
    if max(h, w) <= _HINT_ONESHOT_MAX or h % 8 or w % 8:
        return _hint_embedding_oneshot(params, cond)
    return _hint_embedding_tiled(params, cond)


def _hint_embedding_oneshot(params, cond):
    emb = params["controlnet_cond_embedding"]
    h = L.silu(L.conv2d(emb["conv_in"], cond, padding=1))
    n = len(emb["blocks"])
    for i in range(0, n, 2):
        h = L.silu(L.conv2d(emb["blocks"][str(i)], h, padding=1))
        h = L.silu(L.conv2d(emb["blocks"][str(i + 1)], h, stride=2,
                            padding=[(1, 1), (1, 1)]))
    return L.conv2d(emb["conv_out"], h, padding=1)


# one-shot hint stack validated on chip up to 2048^2 (~2 GB lane-padded
# activations); beyond that the tiled stack is required to fit HBM.
_HINT_ONESHOT_MAX = int(os.environ.get("EA_HINT_ONESHOT_MAX", "2048"))


def _hint_embedding_tiled(params, cond, tile: int = 512, halo: int = 32):
    """Bit-exact tiled `_hint_embedding` for huge hints (4096^2+ refine).

    Runs the stack over square tiles extended by a `halo` wider than the
    stack's receptive-field radius (23 input px: conv_in contributes 1,
    each s1/s2 pair 1+1 at its scale over scales 1/2/4), zeroing
    out-of-image halo rows/cols after every conv so the zero state the
    global computation's SAME padding implies is reproduced inside each
    tile. The cropped tile interior is then exactly the one-shot result
    (overlapping clamped tiles overwrite each other with identical
    values). One lax.scan -> one tile-program compile; activations stay
    O(tile^2) instead of O(image^2).
    """
    emb = params["controlnet_cond_embedding"]
    b, H, W, c = cond.shape
    th, tw = min(tile, H), min(tile, W)
    from editanything_tpu.models.vae import _tile_starts
    pos = np.asarray([(y, x) for y in _tile_starts(H, th, th)
                      for x in _tile_starts(W, tw, tw)], np.int32)
    condp = jnp.pad(cond, [(0, 0), (halo, halo), (halo, halo), (0, 0)])
    eh, ew = th + 2 * halo, tw + 2 * halo

    def stack(x, y0, x0):
        def masked(h_, scale):
            # tile-local row j at this scale sits at global input
            # coordinate (t0 - halo) + j*scale; zero everything outside
            # [0, H)x[0, W) (== the global stack's implicit zero state)
            hj = jax.lax.broadcasted_iota(jnp.int32, (h_.shape[1], 1), 0)
            wj = jax.lax.broadcasted_iota(jnp.int32, (1, h_.shape[2]), 1)
            ok = (((y0 - halo) + hj * scale >= 0)
                  & ((y0 - halo) + hj * scale < H)
                  & ((x0 - halo) + wj * scale >= 0)
                  & ((x0 - halo) + wj * scale < W))
            return h_ * ok[None, :, :, None].astype(h_.dtype)

        h_ = masked(L.silu(L.conv2d(emb["conv_in"], x, padding=1)), 1)
        scale = 1
        n = len(emb["blocks"])
        for i in range(0, n, 2):
            h_ = masked(L.silu(L.conv2d(emb["blocks"][str(i)], h_,
                                        padding=1)), scale)
            h_ = L.silu(L.conv2d(emb["blocks"][str(i + 1)], h_, stride=2,
                                 padding=[(1, 1), (1, 1)]))
            scale *= 2
            h_ = masked(h_, scale)
        return L.conv2d(emb["conv_out"], h_, padding=1)

    crop = halo // 8
    cout = emb["conv_out"]["kernel"].shape[-1]

    def body(canvas, yx):
        y0, x0 = yx[0], yx[1]
        xt = jax.lax.dynamic_slice(condp, (0, y0, x0, 0), (b, eh, ew, c))
        out = stack(xt, y0, x0)
        out = jax.lax.dynamic_slice(
            out, (0, crop, crop, 0), (b, th // 8, tw // 8, cout))
        canvas = jax.lax.dynamic_update_slice(
            canvas, out, (0, y0 // 8, x0 // 8, 0))
        return canvas, None

    canvas = jnp.zeros((b, H // 8, W // 8, cout), cond.dtype)
    canvas, _ = jax.lax.scan(body, canvas, jnp.asarray(pos))
    return canvas


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
