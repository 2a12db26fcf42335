"""Reference-only control (cross-image drag) — functionalized write/read banks.

Behavioral spec: /root/reference/utils/stable_diffusion_reference.py
(`redefine_ref_model` :287-1088) — the torch version monkey-patches every
`BasicTransformerBlock.forward` in the UNet and the last (inpaint)
ControlNet, plus the mid/plain-Down/plain-Up blocks, with mutable bank
lists and a MODE flag flipped between a "write" pass over noised reference
latents and the real "read" pass each denoising step
(stable_diffusion_controlnet_inpaint.py:1562-1605).

JAX design (SURVEY.md section 7 "hard parts" item 2): the banks are an
explicit pytree produced by the write pass and consumed positionally by the
read pass — both passes live inside the same compiled scan step, so banks
never materialize beyond XLA intermediates. torch's variable-length
boolean-mask gathers (`x[this_ref_mask]`) become fixed-shape masked
reductions and attention-bias exclusions:

- attention hook (reference :335-440): write saves the pre-attn hidden
  states (token grid + ref-mask validity); read FFT-mixes ref magnitudes
  into the current features (`add_freq_feature` :58-93), runs
  self-attention with concat(ref bank) as extra context (invalid ref
  tokens masked out of the softmax instead of gathered away), and blends a
  plain-self-attn recompute into the CFG-uncond rows by `style_fidelity`
- AdaIN hook (:485-700 + `mix_norm_feature` :136-175): write records
  masked mean/var per resnet output; read renormalizes the INPAINT-mask
  region only to the reference statistics, same style-fidelity gating
- gating: per-block attn weights are rank/len over transformer blocks
  sorted by channel width descending (:903-906); GN weights mid=0,
  down 1->0, up 0->1 (:931-945); hooks are enabled statically at trace
  time (python-float comparisons), so no dynamic branches reach XLA
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RefConfig:
    """Static reference-control parameters (hashable, part of the jit key)."""
    reference_attn: bool = True
    reference_adain: bool = False
    attention_auto_weight: float = 1.0    # hook active if this > attn_weight
    gn_auto_weight: float = 1.0           # hook active if this >= gn_weight
    style_fidelity: float = 0.5
    ref_scale: float = 0.0                # FFT magnitude mix ratio
    do_cfg: bool = True                   # read-pass batch is [uncond; cond]


# ---------------------------------------------------------------------------
# math (reference stable_diffusion_reference.py:58-175)
# ---------------------------------------------------------------------------

def add_freq_feature(ref_nhwc, target_nhwc, ref_ratio: float):
    """FFT magnitude mixing: target keeps its phase, magnitudes blend
    (1-r)*target + r*ref. fp32 throughout (fp16/bf16 FFT drifts)."""
    dt = target_nhwc.dtype
    f1 = jnp.fft.fftn(ref_nhwc.astype(jnp.float32), axes=(1, 2))
    f2 = jnp.fft.fftn(target_nhwc.astype(jnp.float32), axes=(1, 2))
    mag = jnp.abs(f2) * (1.0 - ref_ratio) + jnp.abs(f1) * ref_ratio
    mixed = mag * jnp.exp(1j * jnp.angle(f2))
    return jnp.real(jnp.fft.ifftn(mixed, axes=(1, 2))).astype(dt)


def mix_ref_feature(target_nhwc, ref_fea, ref_ratio: float, tile_cfg: bool):
    """ref_fea from the (uncond-free) write pass; tiled x2 when the read
    batch is a CFG pair (reference :108-133)."""
    if tile_cfg:
        ref_fea = jnp.concatenate([ref_fea, ref_fea], axis=0)
    return add_freq_feature(ref_fea, target_nhwc, ref_ratio)


def masked_mean_var(x_nhwc, mask_hw1):
    """Mean/var over the masked spatial region, per (batch, channel).
    mask: (1 or B, H, W, 1) in {0,1}. Returns ((B,1,1,C), (B,1,1,C))."""
    m = mask_hw1.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0)
    xf = x_nhwc.astype(jnp.float32) * m
    mean = jnp.sum(xf, axis=(1, 2), keepdims=True) / cnt
    var = jnp.sum(m * (x_nhwc.astype(jnp.float32) - mean) ** 2,
                  axis=(1, 2), keepdims=True) / cnt
    return mean, var


def mix_norm_feature(x_nhwc, inpaint_mask, ref_mean, ref_var,
                     cfg: RefConfig, eps: float = 1e-6):
    """Masked AdaIN: renormalize the inpaint region to reference statistics
    (reference :136-175). ref_mean/var come from the B-batch write pass and
    are tiled for the CFG pair; CFG-uncond rows keep the original feature
    inside the style-fidelity branch."""
    b = x_nhwc.shape[0]
    m = _resize_mask(inpaint_mask, x_nhwc.shape[1], x_nhwc.shape[2])
    mean, var = masked_mean_var(x_nhwc, m)
    std = jnp.sqrt(jnp.maximum(var, eps))
    if cfg.do_cfg:
        ref_mean = jnp.concatenate([ref_mean, ref_mean], axis=0)
        ref_var = jnp.concatenate([ref_var, ref_var], axis=0)
    ref_std = jnp.sqrt(jnp.maximum(ref_var, eps))
    xf = x_nhwc.astype(jnp.float32)
    x_uc = ((xf - mean) / std) * ref_std + ref_mean
    if cfg.do_cfg and cfg.style_fidelity > 0:
        is_uncond = (jnp.arange(b) < b // 2)[:, None, None, None]
        x_c = jnp.where(is_uncond, xf, x_uc)
    else:
        x_c = x_uc
    mixed = cfg.style_fidelity * x_c + (1.0 - cfg.style_fidelity) * x_uc
    out = xf * (1.0 - m) + mixed * m
    return out.astype(x_nhwc.dtype)


def _resize_mask(mask, h, w):
    """(B?, Hm, Wm, 1) -> (B?, h, w, 1), nearest (torch F.interpolate
    default used by the reference)."""
    b = mask.shape[0]
    return jax.image.resize(mask.astype(jnp.float32), (b, h, w, 1),
                            method="nearest")


# ---------------------------------------------------------------------------
# static gating weights
# ---------------------------------------------------------------------------

def attn_weights(dims_in_traversal_order: Tuple[int, ...]) -> List[float]:
    """attn_weight per transformer block: rank/len over blocks sorted by
    channel dim DESCENDING, stable within equal dims (reference :903-917).
    Input: channel dims in model traversal order; output aligned to it."""
    n = len(dims_in_traversal_order)
    order = sorted(range(n), key=lambda i: -dims_in_traversal_order[i])
    w = [0.0] * n
    for rank, i in enumerate(order):
        w[i] = rank / float(n)
    return w


def unet_attn_weights(cfg) -> Dict[str, float]:
    """Traversal-keyed attn weights for a UNetConfig: keys
    'down.{bi}.{li}', 'mid', 'up.{bi}.{li}'."""
    keys, dims = [], []
    for bi, bt in enumerate(cfg.down_block_types):
        if bt == "CrossAttnDownBlock2D":
            for li in range(cfg.layers_per_block):
                keys.append(f"down.{bi}.{li}")
                dims.append(cfg.block_out_channels[bi])
    keys.append("mid")
    dims.append(cfg.block_out_channels[-1])
    rev = list(reversed(cfg.block_out_channels))
    for bi, bt in enumerate(cfg.up_block_types):
        if bt == "CrossAttnUpBlock2D":
            for li in range(cfg.layers_per_block + 1):
                keys.append(f"up.{bi}.{li}")
                dims.append(rev[bi])
    w = attn_weights(tuple(dims))
    return dict(zip(keys, w))


def controlnet_attn_weights(cfg) -> Dict[str, float]:
    """Same, for a ControlNet (down path + mid only)."""
    u = cfg.unet
    keys, dims = [], []
    for bi, bt in enumerate(u.down_block_types):
        if bt == "CrossAttnDownBlock2D":
            for li in range(u.layers_per_block):
                keys.append(f"down.{bi}.{li}")
                dims.append(u.block_out_channels[bi])
    keys.append("mid")
    dims.append(u.block_out_channels[-1])
    w = attn_weights(tuple(dims))
    return dict(zip(keys, w))


def gn_weight_down(bi: int, n_down: int) -> float:
    return 1.0 - bi / float(n_down)


def gn_weight_up(bi: int, n_up: int) -> float:
    return bi / float(n_up)


# ---------------------------------------------------------------------------
# RefState — the bank carrier threaded through model applies
# ---------------------------------------------------------------------------

class RefState:
    """Write mode: hooks append to `banks`. Read mode: hooks consume
    positionally (traversal order is deterministic and identical between
    the two passes of a step). Purely trace-time Python; the banks are
    ordinary traced arrays."""

    def __init__(self, cfg: RefConfig, mode: str,
                 ref_mask=None, inpaint_mask=None,
                 banks: Optional[Dict[str, list]] = None):
        assert mode in ("write", "read")
        self.cfg = cfg
        self.mode = mode
        self.ref_mask = ref_mask            # (1|B, h_lat, w_lat, 1) float
        self.inpaint_mask = inpaint_mask    # (1|B, h_lat, w_lat, 1) float
        self.banks = banks if banks is not None else {
            "attn_fea": [], "attn_bank": [],
            "gn_fea": [], "gn_mean": [], "gn_var": []}
        self._idx = {k: 0 for k in self.banks}

    def reader(self) -> "RefState":
        return RefState(self.cfg, "read", ref_mask=self.ref_mask,
                        inpaint_mask=self.inpaint_mask, banks=self.banks)

    def _pop(self, key: str):
        v = self.banks[key][self._idx[key]]
        self._idx[key] += 1
        return v

    # -- attention hook ------------------------------------------------------

    def attn_active(self, weight: float) -> bool:
        return (self.cfg.reference_attn
                and self.cfg.attention_auto_weight > weight)

    def write_attn(self, norm_tokens, hw: Tuple[int, int]):
        """norm_tokens: (B, N, C) pre-attn hidden states of the REF pass."""
        b, n, c = norm_tokens.shape
        h, w = hw
        grid = norm_tokens.reshape(b, h, w, c)
        m = _resize_mask(self.ref_mask, h, w)
        self.banks["attn_fea"].append(grid * m.astype(grid.dtype))
        # fixed-shape "gathered" tokens: full grid + validity (the softmax
        # bias in read_attn excludes invalid positions exactly like the
        # torch boolean gather)
        self.banks["attn_bank"].append(
            (grid.reshape(b, n, c), (m.reshape(1, -1) > 0.5)[0]))

    def read_attn(self, attn_params, norm_tokens, hw: Tuple[int, int],
                  heads: int, attention_fn):
        """Returns the hooked self-attention output (B2, N, C) where B2 is
        the CFG-doubled read batch."""
        cfgr = self.cfg
        b2, n, c = norm_tokens.shape
        h, w = hw
        fea = self._pop("attn_fea")
        grid = norm_tokens.reshape(b2, h, w, c)
        freq = mix_ref_feature(grid, fea, cfgr.ref_scale,
                               tile_cfg=cfgr.do_cfg).reshape(b2, n, c)

        bank_tokens, bank_valid = self._pop("attn_bank")
        if cfgr.do_cfg:
            bank_tokens = jnp.concatenate([bank_tokens, bank_tokens], axis=0)
        context = jnp.concatenate(
            [freq, bank_tokens.astype(freq.dtype)], axis=1)
        ctx_mask = jnp.concatenate(
            [jnp.ones((n,), bool), bank_valid], axis=0)[None, None, None, :]

        attn_uc = attention_fn(attn_params, freq, context, heads=heads,
                               context_mask=ctx_mask)
        if cfgr.do_cfg and cfgr.style_fidelity > 0:
            plain = attention_fn(attn_params, norm_tokens, None, heads=heads)
            is_uncond = (jnp.arange(b2) < b2 // 2)[:, None, None]
            attn_c = jnp.where(is_uncond, plain, attn_uc)
        else:
            attn_c = attn_uc
        return (cfgr.style_fidelity * attn_c.astype(jnp.float32)
                + (1.0 - cfgr.style_fidelity) * attn_uc.astype(jnp.float32)
                ).astype(norm_tokens.dtype)

    # -- AdaIN (GN) hook -------------------------------------------------------

    def gn_active(self, weight: float) -> bool:
        return (self.cfg.reference_adain
                and self.cfg.gn_auto_weight >= weight)

    def write_gn(self, x_nhwc):
        m = _resize_mask(self.ref_mask, x_nhwc.shape[1], x_nhwc.shape[2])
        self.banks["gn_fea"].append(x_nhwc * m.astype(x_nhwc.dtype))
        mean, var = masked_mean_var(x_nhwc, m)
        self.banks["gn_mean"].append(mean)
        self.banks["gn_var"].append(var)

    def read_gn(self, x_nhwc):
        fea = self._pop("gn_fea")
        x = mix_ref_feature(x_nhwc, fea, self.cfg.ref_scale,
                            tile_cfg=self.cfg.do_cfg)
        return mix_norm_feature(x, self.inpaint_mask,
                                self._pop("gn_mean"), self._pop("gn_var"),
                                self.cfg)
