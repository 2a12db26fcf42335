"""Functional NN primitives (TPU-first: NHWC, bf16 compute, fp32 statistics).

Every layer is a pure function ``layer(params, x, ...)`` over a params pytree
(nested dicts of jnp arrays). No module classes, no mutable state: this keeps
models trivially `jit`/`pjit`-able, keeps parameter trees directly mappable to
torch/diffusers checkpoints (see editanything_tpu/checkpoints), and lets
sharding be expressed as tree-path rules.

Conventions
-----------
- Activations: NHWC (TPU-native conv layout).
- Conv kernels: HWIO. Linear kernels: (in, out).
- Normalization statistics always in float32, output cast back to input dtype.
- ``attention`` dispatches to the Pallas flash kernel on TPU and a pure-XLA
  reference elsewhere (CPU tests / interpreters).

Reference behavior being re-implemented (cited for parity checking, not code):
- GroupNorm+SiLU conv stacks: /root/reference/ldm/modules/diffusionmodules/model.py:41-48
- attention cores: /root/reference/ldm/modules/attention.py:163-243
- timestep embedding: /root/reference/ldm/modules/diffusionmodules/util.py:154
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers (used for training / random smoke tests; checkpoints overwrite)
# ---------------------------------------------------------------------------

def init_conv2d(key, in_ch: int, out_ch: int, kernel_size: int = 3,
                dtype=jnp.float32, zero: bool = False):
    """Conv param dict. `zero=True` gives ControlNet zero-conv init."""
    if zero:
        kernel = jnp.zeros((kernel_size, kernel_size, in_ch, out_ch), dtype)
    else:
        fan_in = in_ch * kernel_size * kernel_size
        std = 1.0 / math.sqrt(fan_in)
        kernel = jax.random.uniform(
            key, (kernel_size, kernel_size, in_ch, out_ch), dtype, -std, std)
    return {"kernel": kernel, "bias": jnp.zeros((out_ch,), dtype)}


def init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32,
                zero: bool = False, bias: bool = True):
    if zero:
        kernel = jnp.zeros((in_dim, out_dim), dtype)
    else:
        std = 1.0 / math.sqrt(in_dim)
        kernel = jax.random.uniform(key, (in_dim, out_dim), dtype, -std, std)
    p = {"kernel": kernel}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_group_norm(num_ch: int, dtype=jnp.float32):
    return {"scale": jnp.ones((num_ch,), dtype), "bias": jnp.zeros((num_ch,), dtype)}


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------

import os as _os

# 3x3 stride-1 convs as 9 shifted matmuls: each tap is one
# (B*H*W, Cin) @ (Cin, Cout) MXU matmul accumulated in fp32 — an
# alternative lowering to XLA's native conv. Mathematically the same
# contraction. Default ON on TPU as of round 4: the bench/unet_ab.py
# on-chip A/B measured SD1.5 UNet fwd (CFG b2) 27.8 -> 19.3 ms and
# ControlNet 8.8 -> 7.0 ms with this lowering (PROFILE.md "conv lowering
# decision"); EA_CONV9=0/1 forces it off/on (tests pin both paths).
_CONV9_ENV = _os.environ.get("EA_CONV9")


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _conv9_enabled() -> bool:
    if _CONV9_ENV is not None:
        return _CONV9_ENV == "1"
    from editanything_tpu.core.kernels import _on_tpu
    return _on_tpu()


def _conv9_wins(xshape, kshape) -> bool:
    """Static-shape crossover, measured on chip (PROFILE.md "conv lowering
    decision" probes): the 9-shift lowering wins at small M = B*H*W
    (0.5-0.8x native at the CFG-batch-2 latency operating point: every
    UNet/CN conv qualifies there); native conv wins back for M >= 32768
    (1.7-3.4x against 9-shift at throughput batches, VAE-decoder pixel
    resolutions, and high-res tile latents)."""
    return xshape[0] * xshape[1] * xshape[2] <= 16384


def _conv2d_9shift(kernel, x):
    """3x3/stride-1/pad-1 conv as 9 shifted (M, Cin)@(Cin, Cout) matmuls,
    accumulated in fp32, one cast at the end."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            s = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, w, cin))
            y = jax.lax.dot_general(
                s.reshape(b * h * w, cin), kernel[dy, dx].astype(x.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return acc.reshape(b, h, w, cout).astype(x.dtype)


def conv2d(params, x, *, stride: int = 1, padding="SAME",
           feature_group_count: int = 1):
    """2-D convolution, NHWC x HWIO -> NHWC.

    `padding` may be "SAME"/"VALID", an int (symmetric), or explicit pairs.
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    kernel = params["kernel"]
    if (_conv9_enabled() and stride == 1 and feature_group_count == 1
            and kernel.shape[:2] == (3, 3)
            and padding in ("SAME", [(1, 1), (1, 1)])
            and (_CONV9_ENV == "1" or _conv9_wins(x.shape, kernel.shape))):
        y = _conv2d_9shift(kernel, x)
    else:
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=feature_group_count,
        )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def linear(params, x):
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    """CLIP's gelu variant: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(params, x):
    """Gated GELU used by SD transformer FFNs: proj to 2*d, gate with gelu."""
    h = linear(params, x)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * gelu(gate)


def group_norm(params, x, *, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC (normalizes over H, W and channels-in-group).

    Statistics in fp32 regardless of activation dtype.
    """
    orig_dtype = x.dtype
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_silu(params, x, *, num_groups: int = 32, eps: float = 1e-5):
    """Fused GroupNorm + SiLU.

    On TPU this routes to the Pallas fused kernel for supported shapes
    (editanything_tpu/core/kernels.py); elsewhere it composes the reference
    ops (XLA fuses the SiLU into the normalization epilogue anyway).
    """
    from editanything_tpu.core import kernels
    return kernels.group_norm_silu(params, x, num_groups=num_groups, eps=eps)


def layer_norm(params, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def timestep_embedding(timesteps, dim: int, *, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0,
                       dtype=jnp.float32):
    """Sinusoidal timestep embeddings.

    Matches diffusers `get_timestep_embedding` semantics (which SD UNets use:
    flip_sin_to_cos=True, downscale_freq_shift=0). The legacy LDM variant
    (/root/reference/ldm/modules/diffusionmodules/util.py:154) corresponds to
    flip_sin_to_cos=False, downscale_freq_shift=1.
    """
    timesteps = jnp.asarray(timesteps)
    if timesteps.ndim == 0:
        timesteps = timesteps[None]
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb.astype(dtype)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def attention_reference(q, k, v, *, scale: Optional[float] = None, mask=None):
    """Pure-XLA scaled dot-product attention. Shapes: (B, H, N, D)/(B, H, M, D).

    Softmax in fp32 (matches the reference's fp32-upcast option,
    /root/reference/ldm/modules/attention.py:180-186).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention(q, k, v, *, scale: Optional[float] = None, mask=None):
    """Scaled dot-product attention, (B, H, N, D).

    Dispatches to the Pallas flash-attention kernel on TPU for unmasked
    attention with seq lengths worth tiling; otherwise the XLA reference.
    """
    from editanything_tpu.core import flash_attention
    return flash_attention.dispatch(q, k, v, scale=scale, mask=mask)
