"""SD UNet (4-ch txt2img & 9-ch inpaint) — functional, diffusers param layout.

Re-implements the denoising UNet the reference drives through diffusers
pipelines (legacy source: /root/reference/ldm/modules/diffusionmodules/
openaimodel.py:412 `UNetModel`; consumed at
utils/stable_diffusion_controlnet_inpaint.py:1617-1624). Residual-injection
hooks accept ControlNet residual stacks the same way diffusers'
`down_block_additional_residuals` / `mid_block_additional_residual` do
(ControlledUnetModel semantics, /root/reference/cldm/cldm.py:22-45).

TPU-first details: NHWC activations, bf16-friendly (norm statistics fp32 via
core.layers), attention through the Pallas flash kernel, and a fully static
module graph — block structure is unrolled at trace time from the config, so
the whole model jits into one XLA computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editanything_tpu.core import layers as L
from editanything_tpu.core.kernels import group_norm_silu
from editanything_tpu.engine import refctrl
from editanything_tpu.models import blocks as B
from editanything_tpu.models.config import UNetConfig


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _down_block_channels(cfg: UNetConfig):
    """(in_ch, out_ch) per down block."""
    chans = []
    out = cfg.block_out_channels[0]
    for i, bo in enumerate(cfg.block_out_channels):
        chans.append((out, bo))
        out = bo
    return chans


def init_unet(key, cfg: UNetConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 512))
    nxt = lambda: next(ks)
    temb = cfg.time_embed_dim
    c0 = cfg.block_out_channels[0]

    params = {
        "conv_in": L.init_conv2d(nxt(), cfg.in_channels, c0, 3, dtype),
        "time_embedding": {
            "linear_1": L.init_linear(nxt(), c0, temb, dtype),
            "linear_2": L.init_linear(nxt(), temb, temb, dtype),
        },
        "down_blocks": {},
        "mid_block": {},
        "up_blocks": {},
        "conv_norm_out": L.init_group_norm(c0, dtype),
        "conv_out": L.init_conv2d(nxt(), c0, cfg.out_channels, 3, dtype),
    }

    # ---- down blocks
    for bi, ((in_ch, out_ch), btype) in enumerate(
            zip(_down_block_channels(cfg), cfg.down_block_types)):
        blk = {"resnets": {}, }
        has_attn = btype == "CrossAttnDownBlock2D"
        if has_attn:
            blk["attentions"] = {}
        for li in range(cfg.layers_per_block):
            rin = in_ch if li == 0 else out_ch
            blk["resnets"][str(li)] = B.init_resnet_block(
                nxt(), rin, out_ch, temb, dtype)
            if has_attn:
                blk["attentions"][str(li)] = B.init_spatial_transformer(
                    nxt(), out_ch, cfg.cross_attention_dim,
                    use_linear=cfg.use_linear_projection, dtype=dtype)
        if bi < len(cfg.block_out_channels) - 1:
            blk["downsamplers"] = {"0": B.init_downsample(nxt(), out_ch, dtype)}
        params["down_blocks"][str(bi)] = blk

    # ---- mid
    cm = cfg.block_out_channels[-1]
    params["mid_block"] = {
        "resnets": {
            "0": B.init_resnet_block(nxt(), cm, cm, temb, dtype),
            "1": B.init_resnet_block(nxt(), cm, cm, temb, dtype),
        },
        "attentions": {"0": B.init_spatial_transformer(
            nxt(), cm, cfg.cross_attention_dim,
            use_linear=cfg.use_linear_projection, dtype=dtype)},
    }

    # ---- up blocks
    rev = list(reversed(cfg.block_out_channels))
    prev_out = rev[0]
    for bi, btype in enumerate(cfg.up_block_types):
        out_ch = rev[bi]
        in_skip_ch = rev[min(bi + 1, len(rev) - 1)]
        blk = {"resnets": {}}
        has_attn = btype == "CrossAttnUpBlock2D"
        if has_attn:
            blk["attentions"] = {}
        for li in range(cfg.layers_per_block + 1):
            res_skip = in_skip_ch if li == cfg.layers_per_block else out_ch
            rin = prev_out if li == 0 else out_ch
            blk["resnets"][str(li)] = B.init_resnet_block(
                nxt(), rin + res_skip, out_ch, temb, dtype)
            if has_attn:
                blk["attentions"][str(li)] = B.init_spatial_transformer(
                    nxt(), out_ch, cfg.cross_attention_dim,
                    use_linear=cfg.use_linear_projection, dtype=dtype)
        if bi < len(cfg.up_block_types) - 1:
            blk["upsamplers"] = {"0": B.init_upsample(nxt(), out_ch, dtype)}
        params["up_blocks"][str(bi)] = blk
        prev_out = out_ch

    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def time_embed(params, cfg: UNetConfig, timesteps, dtype):
    t = L.timestep_embedding(
        timesteps, cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        downscale_freq_shift=cfg.freq_shift, dtype=dtype)
    t = L.linear(params["time_embedding"]["linear_1"], t)
    t = L.linear(params["time_embedding"]["linear_2"], L.silu(t))
    return t


def _gn_hook(ref, h, weight: float):
    """Reference-only AdaIN hook after a plain-block resnet
    (engine/refctrl.py; reference stable_diffusion_reference.py:645-700)."""
    if ref is None or not ref.gn_active(weight):
        return h
    if ref.mode == "write":
        ref.write_gn(h)
        return h
    return ref.read_gn(h)


def context_kv(params, cfg: UNetConfig, context):
    """Precompute every cross-attention (k, v) projection of the context.

    The text context is invariant across denoise steps; hoisting these
    ~32 small matmuls out of the `lax.scan` body removes their per-step
    dispatch + weight-fetch cost (XLA does not LICM them out of while
    loops). Keys mirror the attn_w paths: down.{bi}.{li} / mid / up.{bi}.{li}.
    Pass the result as `apply(..., ctx_kv=...)`; omitted entries fall back
    to in-step projection."""
    kv = {}
    for bi, blk in params["down_blocks"].items():
        for li in blk.get("attentions", {}):
            kv[f"down.{bi}.{li}"] = B.init_spatial_kv(
                blk["attentions"][li], context)
    kv["mid"] = B.init_spatial_kv(params["mid_block"]["attentions"]["0"],
                                  context)
    for bi, blk in params["up_blocks"].items():
        for li in blk.get("attentions", {}):
            kv[f"up.{bi}.{li}"] = B.init_spatial_kv(
                blk["attentions"][li], context)
    return kv


def encode(params, cfg: UNetConfig, sample, temb, context, *, ref=None,
           attn_w=None, ctx_kv=None):
    """conv_in + down path. Returns (hidden, residuals list of 12)."""
    g = cfg.norm_num_groups
    n_down = len(cfg.block_out_channels)
    ctx_kv = ctx_kv or {}
    h = L.conv2d(params["conv_in"], sample, padding=1)
    residuals = [h]
    for bi in range(n_down):
        blk = params["down_blocks"][str(bi)]
        has_attn = "attentions" in blk
        heads = cfg.heads_for_block(bi)
        for li in range(cfg.layers_per_block):
            h = B.resnet_block(blk["resnets"][str(li)], h, temb, num_groups=g)
            if has_attn:
                h = B.spatial_transformer(
                    blk["attentions"][str(li)], h, context, heads=heads,
                    use_linear=cfg.use_linear_projection, num_groups=g,
                    ref=ref, kv=ctx_kv.get(f"down.{bi}.{li}"),
                    attn_weight=attn_w[f"down.{bi}.{li}"] if attn_w else 0.0)
            else:
                # AdaIN hook: plain DownBlock2D only, gn_weight 1 - bi/n
                # (reference :931-935 + hacked_DownBlock2D_forward)
                h = _gn_hook(ref, h, refctrl.gn_weight_down(bi, n_down))
            residuals.append(h)
        if "downsamplers" in blk:
            h = B.downsample(blk["downsamplers"]["0"], h)
            residuals.append(h)
    return h, residuals


def middle(params, cfg: UNetConfig, h, temb, context, *, ref=None,
           attn_w=None, ctx_kv=None):
    g = cfg.norm_num_groups
    mid = params["mid_block"]
    heads = cfg.heads_for_block(len(cfg.block_out_channels) - 1)
    h = B.resnet_block(mid["resnets"]["0"], h, temb, num_groups=g)
    h = B.spatial_transformer(mid["attentions"]["0"], h, context, heads=heads,
                              use_linear=cfg.use_linear_projection,
                              num_groups=g, ref=ref,
                              kv=(ctx_kv or {}).get("mid"),
                              attn_weight=attn_w["mid"] if attn_w else 0.0)
    h = B.resnet_block(mid["resnets"]["1"], h, temb, num_groups=g)
    # AdaIN hook wraps the whole mid block, gn_weight 0
    # (reference hacked_mid_forward :479-530)
    return _gn_hook(ref, h, 0.0)


def decode(params, cfg: UNetConfig, h, residuals, temb, context, *, ref=None,
           attn_w=None, ctx_kv=None):
    g = cfg.norm_num_groups
    residuals = list(residuals)
    n_up = len(cfg.up_block_types)
    ctx_kv = ctx_kv or {}
    for bi in range(n_up):
        blk = params["up_blocks"][str(bi)]
        has_attn = "attentions" in blk
        heads = cfg.heads_for_block(n_up - 1 - bi)
        for li in range(cfg.layers_per_block + 1):
            skip = residuals.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = B.resnet_block(blk["resnets"][str(li)], h, temb, num_groups=g)
            if has_attn:
                h = B.spatial_transformer(
                    blk["attentions"][str(li)], h, context, heads=heads,
                    use_linear=cfg.use_linear_projection, num_groups=g,
                    ref=ref, kv=ctx_kv.get(f"up.{bi}.{li}"),
                    attn_weight=attn_w[f"up.{bi}.{li}"] if attn_w else 0.0)
            else:
                # plain UpBlock2D, gn_weight bi/n (reference :937-941)
                h = _gn_hook(ref, h, refctrl.gn_weight_up(bi, n_up))
        if "upsamplers" in blk:
            h = B.upsample(blk["upsamplers"]["0"], h)
    h = group_norm_silu(params["conv_norm_out"], h, num_groups=g)
    return L.conv2d(params["conv_out"], h, padding=1)


def apply(params, cfg: UNetConfig, sample, timesteps, encoder_hidden_states,
          *, down_block_residuals=None, mid_block_residual=None, ref=None,
          ctx_kv=None):
    """UNet forward: (B,H,W,C_in) latents -> (B,H,W,C_out) prediction.

    `down_block_residuals` (tuple of 12) and `mid_block_residual` carry
    ControlNet outputs; multi-ControlNet callers pre-sum their stacks.
    `ref`: refctrl.RefState for reference-only control (write/read pass).
    `ctx_kv`: precomputed cross-attention projections (see context_kv).
    """
    attn_w = refctrl.unet_attn_weights(cfg) if ref is not None else None
    temb = time_embed(params, cfg, timesteps, sample.dtype)
    h, residuals = encode(params, cfg, sample, temb, encoder_hidden_states,
                          ref=ref, attn_w=attn_w, ctx_kv=ctx_kv)
    h = middle(params, cfg, h, temb, encoder_hidden_states, ref=ref,
               attn_w=attn_w, ctx_kv=ctx_kv)
    if down_block_residuals is not None:
        residuals = [r + c.astype(r.dtype)
                     for r, c in zip(residuals, down_block_residuals)]
    if mid_block_residual is not None:
        h = h + mid_block_residual.astype(h.dtype)
    return decode(params, cfg, h, residuals, temb, encoder_hidden_states,
                  ref=ref, attn_w=attn_w, ctx_kv=ctx_kv)
