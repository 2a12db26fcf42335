"""Swin Transformer backbone + FPN — functional JAX (NHWC).

Behavioral spec: /root/reference/vlpart/swintransformer.py (Swin-B + FPN
for VLPart, :463-733; same architecture at -T scale is GroundingDINO's
visual backbone per utils/GroundingDINO_SwinT_OGC.py). Re-implemented
from the published architecture:

- windowed W-MSA/SW-MSA with relative position bias, window shift via
  roll, shifted-window attention masks computed at trace time (shapes are
  static under jit; detection runs at bucketed resolutions)
- PatchMerging between stages (2x2 concat -> LN -> 4C->2C linear)
- per-out-stage LayerNorm, NHWC feature maps {swin0..swin3}
- FPN: 1x1 lateral + 3x3 output convs, top-down nearest upsampling, sum
  fuse, LastLevelMaxPool P6 (detectron2 FPN semantics)

TPU notes: window partition is pure reshape/transpose (layout-friendly);
attention runs through core.layers.attention (Pallas-eligible); no
stochastic depth at inference (drop_path is identity here — detection is
inference-only in EditAnything).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.core import layers as L


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 128                      # Swin-B (T: 96)
    depths: Tuple[int, ...] = (2, 2, 18, 2)   # (T: (2, 2, 6, 2))
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2 ** i)


def swin_base() -> SwinConfig:
    return SwinConfig()


def swin_tiny() -> SwinConfig:
    return SwinConfig(embed_dim=96, depths=(2, 2, 6, 2),
                      num_heads=(3, 6, 12, 24))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_window_attn(key, dim, heads, window, dtype):
    ks = jax.random.split(key, 3)
    n_bias = (2 * window - 1) ** 2
    return {
        "qkv": L.init_linear(ks[0], dim, dim * 3, dtype),
        "proj": L.init_linear(ks[1], dim, dim, dtype),
        "relative_position_bias_table": jax.random.normal(
            ks[2], (n_bias, heads), dtype) * 0.02,
    }


def _init_block(key, dim, heads, window, mlp_ratio, dtype):
    ks = jax.random.split(key, 3)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": L.init_layer_norm(dim, dtype),
        "attn": _init_window_attn(ks[0], dim, heads, window, dtype),
        "norm2": L.init_layer_norm(dim, dtype),
        "mlp": {"fc1": L.init_linear(ks[1], dim, hidden, dtype),
                "fc2": L.init_linear(ks[2], hidden, dim, dtype)},
    }


def init_swin(key, cfg: SwinConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 8 + sum(cfg.depths) * 2 + 8))
    nxt = lambda: next(ks)
    params = {
        "patch_embed": {
            "proj": L.init_conv2d(nxt(), cfg.in_chans, cfg.embed_dim,
                                  cfg.patch_size, dtype),
            "norm": L.init_layer_norm(cfg.embed_dim, dtype),
        },
        "layers": {},
    }
    for i, depth in enumerate(cfg.depths):
        dim = cfg.stage_dim(i)
        stage = {"blocks": {}}
        for b in range(depth):
            stage["blocks"][str(b)] = _init_block(
                nxt(), dim, cfg.num_heads[i], cfg.window_size,
                cfg.mlp_ratio, dtype)
        if i < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": L.init_layer_norm(4 * dim, dtype),
                "reduction": L.init_linear(nxt(), 4 * dim, 2 * dim, dtype,
                                           bias=False),
            }
        params["layers"][str(i)] = stage
    for i in cfg.out_indices:
        params[f"norm{i}"] = L.init_layer_norm(cfg.stage_dim(i), dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _rel_pos_index(window: int) -> np.ndarray:
    """(W^2, W^2) indices into the (2W-1)^2 bias table (standard Swin)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))           # (2, W, W)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                       # (N, N)


def _window_partition(x, w):
    """(B, H, W, C) -> (B*nH*nW, w*w, C); H, W divisible by w."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_merge(x, w, b, h, ww):
    c = x.shape[-1]
    x = x.reshape(b, h // w, ww // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, c)


def _shift_mask(h, w, window, shift) -> np.ndarray:
    """Attention mask for SW-MSA: (num_windows, N, N) boolean
    (True = attend), computed at trace time."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, h // window, window, w // window, window, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    return win[:, None, :] == win[:, :, None]                # (nW, N, N)


def _window_attention(params, x, heads, window, mask=None):
    """x: (nWB, N, C); mask: (nW, N, N) or None."""
    nwb, n, c = x.shape
    qkv = L.linear(params["qkv"], x).reshape(nwb, n, 3, heads, c // heads)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    bias = params["relative_position_bias_table"][
        jnp.asarray(_rel_pos_index(window))]                 # (N, N, H)
    bias = bias.transpose(2, 0, 1)[None]                     # (1, H, N, N)

    scale = (c // heads) ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        logits = logits.reshape(nwb // nw, nw, heads, n, n)
        logits = jnp.where(jnp.asarray(mask)[None, :, None], logits,
                           jnp.finfo(jnp.float32).min)
        logits = logits.reshape(nwb, heads, n, n)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return L.linear(params["proj"], out)


def _swin_block(params, x, hw, heads, window, shift):
    """x: (B, H*W, C) with H, W from hw (unpadded)."""
    h, w = hw
    b, _, c = x.shape
    res = x
    x = L.layer_norm(params["norm1"], x).reshape(b, h, w, c)

    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r

    use_shift = shift > 0 and (hp > window or wp > window)
    if use_shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(hp, wp, window, shift)
    else:
        mask = None

    wins = _window_partition(x, window)
    wins = _window_attention(params["attn"], wins, heads, window, mask)
    x = _window_merge(wins, window, b, hp, wp)

    if use_shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :h, :w]
    x = res + x.reshape(b, h * w, c)

    res = x
    y = L.layer_norm(params["norm2"], x)
    y = L.gelu(L.linear(params["mlp"]["fc1"], y))
    x = res + L.linear(params["mlp"]["fc2"], y)
    return x


def _patch_merging(params, x, hw):
    """(B, H*W, C) -> (B, ceil(H/2)*ceil(W/2), 2C)."""
    h, w = hw
    b, _, c = x.shape
    x = x.reshape(b, h, w, c)
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    nh, nw = x.shape[1], x.shape[2]
    x = x.reshape(b, nh * nw, 4 * c)
    x = L.layer_norm(params["norm"], x)
    return L.linear(params["reduction"], x), (nh, nw)


def apply(params, cfg: SwinConfig, pixels) -> Dict[str, jnp.ndarray]:
    """(B, H, W, 3) -> {'swin{i}': (B, H/2^(2+i), W/2^(2+i), C_i)}."""
    p = params["patch_embed"]
    ps = cfg.patch_size
    h0, w0 = pixels.shape[1], pixels.shape[2]
    pad_b = (ps - h0 % ps) % ps
    pad_r = (ps - w0 % ps) % ps
    if pad_b or pad_r:
        pixels = jnp.pad(pixels, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    x = L.conv2d(p["proj"], pixels, stride=ps, padding="VALID")
    b, h, w, c = x.shape
    x = L.layer_norm(p["norm"], x.reshape(b, h * w, c))

    outs = {}
    hw = (h, w)
    for i, depth in enumerate(cfg.depths):
        stage = params["layers"][str(i)]
        heads = cfg.num_heads[i]
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            x = _swin_block(stage["blocks"][str(bi)], x, hw, heads,
                            cfg.window_size, shift)
        if i in cfg.out_indices:
            y = L.layer_norm(params[f"norm{i}"], x)
            outs[f"swin{i}"] = y.reshape(b, hw[0], hw[1], cfg.stage_dim(i))
        if "downsample" in stage:
            x, hw = _patch_merging(stage["downsample"], x, hw)
    return outs


# ---------------------------------------------------------------------------
# FPN (detectron2 semantics: lateral 1x1 + output 3x3, top-down sum,
# LastLevelMaxPool)
# ---------------------------------------------------------------------------

def init_fpn(key, in_dims: Sequence[int], out_channels: int = 256,
             dtype=jnp.float32):
    ks = iter(jax.random.split(key, len(in_dims) * 2 + 2))
    return {
        "lateral": {str(i): L.init_conv2d(next(ks), d, out_channels, 1, dtype)
                    for i, d in enumerate(in_dims)},
        "output": {str(i): L.init_conv2d(next(ks), out_channels,
                                         out_channels, 3, dtype)
                   for i in range(len(in_dims))},
    }


def fpn_apply(params, feats: Sequence[jnp.ndarray], *,
              extra_maxpool: bool = True) -> Dict[str, jnp.ndarray]:
    """feats: fine->coarse. Returns {'p2'..'p5', 'p6'} (stride 4..64)."""
    n = len(feats)
    laterals = [L.conv2d(params["lateral"][str(i)], f, padding=0)
                for i, f in enumerate(feats)]
    for i in range(n - 2, -1, -1):
        b, h, w, c = laterals[i].shape
        up = jax.image.resize(laterals[i + 1], (b, h, w, c),
                              method="nearest")
        laterals[i] = laterals[i] + up
    outs = {f"p{i + 2}": L.conv2d(params["output"][str(i)], laterals[i],
                                  padding=1)
            for i in range(n)}
    if extra_maxpool:
        top = outs[f"p{n + 1}"]
        outs[f"p{n + 2}"] = jax.lax.reduce_window(
            top, -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "SAME")
    return outs
