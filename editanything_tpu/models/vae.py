"""AutoencoderKL — SD's VAE, functional NHWC (diffusers param layout).

Behavioral spec: /root/reference/ldm/models/autoencoder.py:13-92
(encode -> DiagonalGaussianDistribution, decode) with the conv Encoder/
Decoder of ldm/modules/diffusionmodules/model.py (GroupNorm+SiLU ResnetBlocks,
mid attention block). Latent scaling 0.18215 (cldm_v21.yaml:63).

The reference needs VAE slicing / CPU offload to fit
(stable_diffusion_controlnet_inpaint.py:454-461); on TPU the whole model runs
in HBM and XLA fuses the norm/act chains — no slicing machinery.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from editanything_tpu.core import layers as L
from editanything_tpu.core.kernels import group_norm_silu
from editanything_tpu.models import blocks as B
from editanything_tpu.models.config import VAEConfig


def init_vae(key, cfg: VAEConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 256))
    nxt = lambda: next(ks)
    cbs = cfg.block_out_channels
    zc = cfg.latent_channels

    # ---- encoder
    enc = {"conv_in": L.init_conv2d(nxt(), cfg.in_channels, cbs[0], 3, dtype),
           "down_blocks": {}, "mid_block": {}}
    ch = cbs[0]
    for bi, bo in enumerate(cbs):
        blk = {"resnets": {}}
        for li in range(cfg.layers_per_block):
            blk["resnets"][str(li)] = B.init_resnet_block(
                nxt(), ch if li == 0 else bo, bo, None, dtype)
        if bi < len(cbs) - 1:
            blk["downsamplers"] = {"0": B.init_downsample(nxt(), bo, dtype)}
        enc["down_blocks"][str(bi)] = blk
        ch = bo
    enc["mid_block"] = {
        "resnets": {"0": B.init_resnet_block(nxt(), ch, ch, None, dtype),
                    "1": B.init_resnet_block(nxt(), ch, ch, None, dtype)},
        "attentions": {"0": B.init_vae_attention(nxt(), ch, dtype)},
    }
    enc["conv_norm_out"] = L.init_group_norm(ch, dtype)
    enc["conv_out"] = L.init_conv2d(nxt(), ch, 2 * zc, 3, dtype)

    # ---- decoder
    dec = {"conv_in": L.init_conv2d(nxt(), zc, cbs[-1], 3, dtype),
           "mid_block": {
               "resnets": {"0": B.init_resnet_block(nxt(), cbs[-1], cbs[-1], None, dtype),
                           "1": B.init_resnet_block(nxt(), cbs[-1], cbs[-1], None, dtype)},
               "attentions": {"0": B.init_vae_attention(nxt(), cbs[-1], dtype)},
           },
           "up_blocks": {}}
    rev = list(reversed(cbs))
    ch = rev[0]
    for bi, bo in enumerate(rev):
        blk = {"resnets": {}}
        for li in range(cfg.layers_per_block + 1):
            blk["resnets"][str(li)] = B.init_resnet_block(
                nxt(), ch if li == 0 else bo, bo, None, dtype)
            ch = bo
        if bi < len(rev) - 1:
            blk["upsamplers"] = {"0": B.init_upsample(nxt(), bo, dtype)}
        dec["up_blocks"][str(bi)] = blk
    dec["conv_norm_out"] = L.init_group_norm(rev[-1], dtype)
    dec["conv_out"] = L.init_conv2d(nxt(), rev[-1], cfg.out_channels, 3, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": L.init_conv2d(nxt(), 2 * zc, 2 * zc, 1, dtype),
        "post_quant_conv": L.init_conv2d(nxt(), zc, zc, 1, dtype),
    }


class GaussianPosterior(NamedTuple):
    """DiagonalGaussianDistribution (reference:
    ldm/modules/distributions/distributions.py:24-92)."""
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, key):
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        logvar = jnp.clip(self.logvar, -30.0, 20.0)
        var = jnp.exp(logvar)
        return 0.5 * jnp.sum(self.mean**2 + var - 1.0 - logvar,
                             axis=tuple(range(1, self.mean.ndim)))


def encode(params, cfg: VAEConfig, x) -> GaussianPosterior:
    """(B, H, W, 3) in [-1, 1] -> posterior over (B, H/8, W/8, 4) latents."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    h = L.conv2d(enc["conv_in"], x, padding=1)
    for bi in range(len(cfg.block_out_channels)):
        blk = enc["down_blocks"][str(bi)]
        for li in range(cfg.layers_per_block):
            h = B.resnet_block(blk["resnets"][str(li)], h, num_groups=g, eps=1e-6)
        if "downsamplers" in blk:
            h = B.downsample(blk["downsamplers"]["0"], h)
    mid = enc["mid_block"]
    h = B.resnet_block(mid["resnets"]["0"], h, num_groups=g, eps=1e-6)
    h = B.vae_attention(mid["attentions"]["0"], h, num_groups=g)
    h = B.resnet_block(mid["resnets"]["1"], h, num_groups=g, eps=1e-6)
    h = group_norm_silu(enc["conv_norm_out"], h, num_groups=g, eps=1e-6)
    h = L.conv2d(enc["conv_out"], h, padding=1)
    h = L.conv2d(params["quant_conv"], h, padding=0)
    mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=-1)
    return GaussianPosterior(mean, logvar)


def decode(params, cfg: VAEConfig, z):
    """(B, h, w, 4) latents (unscaled) -> (B, 8h, 8w, 3) image in [-1, 1]."""
    g = cfg.norm_num_groups
    dec = params["decoder"]
    h = L.conv2d(params["post_quant_conv"], z, padding=0)
    h = L.conv2d(dec["conv_in"], h, padding=1)
    mid = dec["mid_block"]
    h = B.resnet_block(mid["resnets"]["0"], h, num_groups=g, eps=1e-6)
    h = B.vae_attention(mid["attentions"]["0"], h, num_groups=g)
    h = B.resnet_block(mid["resnets"]["1"], h, num_groups=g, eps=1e-6)
    for bi in range(len(cfg.block_out_channels)):
        blk = dec["up_blocks"][str(bi)]
        for li in range(cfg.layers_per_block + 1):
            h = B.resnet_block(blk["resnets"][str(li)], h, num_groups=g, eps=1e-6)
        if "upsamplers" in blk:
            h = B.upsample(blk["upsamplers"]["0"], h)
    h = group_norm_silu(dec["conv_norm_out"], h, num_groups=g, eps=1e-6)
    return L.conv2d(dec["conv_out"], h, padding=1)


def encode_to_latents(params, cfg: VAEConfig, x, key=None):
    """Image -> scaled latents (mode if no key), the pipelines' entry."""
    post = encode(params, cfg, x)
    z = post.mode() if key is None else post.sample(key)
    return z * cfg.scaling_factor


def decode_from_latents(params, cfg: VAEConfig, z):
    return decode(params, cfg, z / cfg.scaling_factor)
