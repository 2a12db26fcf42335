"""AutoencoderKL — SD's VAE, functional NHWC (diffusers param layout).

Behavioral spec: /root/reference/ldm/models/autoencoder.py:13-92
(encode -> DiagonalGaussianDistribution, decode) with the conv Encoder/
Decoder of ldm/modules/diffusionmodules/model.py (GroupNorm+SiLU ResnetBlocks,
mid attention block). Latent scaling 0.18215 (cldm_v21.yaml:63).

The reference needs VAE slicing / CPU offload to fit
(stable_diffusion_controlnet_inpaint.py:454-461); on TPU the whole model runs
in HBM up to 2048^2 with XLA fusing the norm/act chains. Beyond that (the UI
tile-refine slider reaches 8192, editany_demo.py:241-247) the decoder
activations alone exceed HBM (~16 GB at 4096^2), so `encode_tiled` /
`decode_tiled` below run the model over overlapping tiles inside one jitted
lax.scan (one compile of the tile program) and blend the overlaps with a
separable linear ramp — the TPU analog of diffusers' enable_vae_tiling. Tiling
also collapses the mid-block attention from quadratic in the full image to
quadratic in a tile (262144-token -> 16384-token sequences at 4096^2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


# ---- tiled encode/decode (the reference's vae-slicing analog) -------------

def _tile_starts(size: int, tile: int, stride: int):
    """Static start offsets covering [0, size) with full-size tiles; the
    last tile is clamped to end exactly at `size` (never out of bounds)."""
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def _ramp(tile_px: int, ov_px: int) -> np.ndarray:
    """1-D blend profile: linear ramp over the overlap at both ends, 1 in
    the interior. Normalizing by the accumulated weight sum makes border
    tiles exact (single-cover regions divide out)."""
    r = np.ones((tile_px,), np.float32)
    if ov_px > 0:
        ramp = (np.arange(ov_px, dtype=np.float32) + 1.0) / (ov_px + 1.0)
        r[:ov_px] = ramp
        r[tile_px - ov_px:] = ramp[::-1]
    return r


def _blend_weight(th_px: int, tw_px: int, ov_h_px: int, ov_w_px: int):
    """(th, tw, 1) separable pyramid built per-dimension so non-square
    tiles (wide/tall panoramas where one dim fits one-shot) blend
    correctly."""
    return jnp.asarray(_ramp(th_px, ov_h_px)[:, None]
                       * _ramp(tw_px, ov_w_px)[None, :])[..., None]


def _tile_plan(h: int, w: int, tile: int, overlap: int):
    """Per-dimension tile sizes/overlaps/starts. A dimension that fits the
    tile is covered by ONE clamped tile with no ramp (the other dim may
    still be tiled — the non-square panorama case)."""
    th, tw = min(tile, h), min(tile, w)
    ov_h = overlap if h > th else 0
    ov_w = overlap if w > tw else 0
    pos = np.asarray([(y, x) for y in _tile_starts(h, th, th - ov_h)
                      for x in _tile_starts(w, tw, tw - ov_w)], np.int32)
    return th, tw, ov_h, ov_w, pos


def _scale_factor(cfg: VAEConfig) -> int:
    return 2 ** (len(cfg.block_out_channels) - 1)


def decode_tiled(params, cfg: VAEConfig, z, tile: int = 128,
                 overlap: int = 32):
    """Tiled `decode`: (B, h, w, zc) latents -> (B, f*h, f*w, 3) image.

    `tile`/`overlap` are in LATENT pixels. One lax.scan over static tile
    offsets — decode compiles once for the tile shape; tiles accumulate
    ramp-weighted into an fp32 canvas that is normalized at the end.
    Per-tile GroupNorm statistics differ from a one-shot decode (inherent
    to tiled VAE, same as diffusers'); the overlap blend hides the seams.
    """
    b, h, w, c = z.shape
    if h <= tile and w <= tile:
        return decode(params, cfg, z)
    f = _scale_factor(cfg)
    th, tw, ov_h, ov_w, pos = _tile_plan(h, w, tile, overlap)
    wt = _blend_weight(th * f, tw * f, ov_h * f, ov_w * f)
    out_dtype = jax.eval_shape(
        lambda p, zz: decode(p, cfg, zz), params,
        jax.ShapeDtypeStruct((b, th, tw, c), z.dtype)).dtype

    def body(carry, yx):
        canvas, wsum = carry
        zt = jax.lax.dynamic_slice(z, (0, yx[0], yx[1], 0),
                                   (b, th, tw, c))
        img = decode(params, cfg, zt).astype(jnp.float32) * wt
        oy, ox = yx[0] * f, yx[1] * f
        cur = jax.lax.dynamic_slice(canvas, (0, oy, ox, 0), img.shape)
        canvas = jax.lax.dynamic_update_slice(canvas, cur + img,
                                              (0, oy, ox, 0))
        curw = jax.lax.dynamic_slice(wsum, (oy, ox, 0), wt.shape)
        wsum = jax.lax.dynamic_update_slice(wsum, curw + wt, (oy, ox, 0))
        return (canvas, wsum), None

    canvas = jnp.zeros((b, h * f, w * f, cfg.out_channels), jnp.float32)
    wsum = jnp.zeros((h * f, w * f, 1), jnp.float32)
    (canvas, wsum), _ = jax.lax.scan(body, (canvas, wsum), jnp.asarray(pos))
    return (canvas / wsum).astype(out_dtype)


def encode_tiled(params, cfg: VAEConfig, x, tile: int = 1024,
                 overlap: int = 256) -> GaussianPosterior:
    """Tiled `encode`; `tile`/`overlap` in IMAGE pixels (multiples of the
    2^levels scale factor). Posterior mean/logvar maps blend in latent
    space with the same ramp scheme as decode_tiled."""
    b, h, w, c = x.shape
    if h <= tile and w <= tile:
        return encode(params, cfg, x)
    f = _scale_factor(cfg)
    if tile % f or overlap % f or h % f or w % f:
        raise ValueError(f"tile/overlap/image dims must be multiples of {f}")
    th, tw, ov_h, ov_w, pos = _tile_plan(h, w, tile, overlap)
    wt = _blend_weight(th // f, tw // f, ov_h // f, ov_w // f)

    def acc(canvas, val, oy, ox):
        cur = jax.lax.dynamic_slice(canvas, (0, oy, ox, 0), val.shape)
        return jax.lax.dynamic_update_slice(canvas, cur + val,
                                            (0, oy, ox, 0))

    def body(carry, yx):
        mean_c, lv_c, wsum = carry
        xt = jax.lax.dynamic_slice(x, (0, yx[0], yx[1], 0), (b, th, tw, c))
        post = encode(params, cfg, xt)
        oy, ox = yx[0] // f, yx[1] // f
        mean_c = acc(mean_c, post.mean * wt, oy, ox)
        lv_c = acc(lv_c, post.logvar * wt, oy, ox)
        curw = jax.lax.dynamic_slice(wsum, (oy, ox, 0), wt.shape)
        wsum = jax.lax.dynamic_update_slice(wsum, curw + wt, (oy, ox, 0))
        return (mean_c, lv_c, wsum), None

    lh, lw = h // f, w // f
    zeros = jnp.zeros((b, lh, lw, cfg.latent_channels), jnp.float32)
    wsum = jnp.zeros((lh, lw, 1), jnp.float32)
    (mean_c, lv_c, wsum), _ = jax.lax.scan(
        body, (zeros, zeros, wsum), jnp.asarray(pos))
    return GaussianPosterior(mean_c / wsum, lv_c / wsum)


def encode_to_latents(params, cfg: VAEConfig, x, key=None, *,
                      tile=None, overlap: int = 256):
    """Image -> scaled latents (mode if no key), the pipelines' entry.
    tile (image px) switches to the tiled encoder for >2048^2 inputs."""
    post = (encode(params, cfg, x) if tile is None
            else encode_tiled(params, cfg, x, tile=tile, overlap=overlap))
    z = post.mode() if key is None else post.sample(key)
    return z * cfg.scaling_factor


def decode_from_latents(params, cfg: VAEConfig, z, *, tile=None,
                        overlap: int = 32):
    """tile (latent px) switches to the tiled decoder for >256^2 latents."""
    z = z / cfg.scaling_factor
    if tile is None:
        return decode(params, cfg, z)
    return decode_tiled(params, cfg, z, tile=tile, overlap=overlap)
