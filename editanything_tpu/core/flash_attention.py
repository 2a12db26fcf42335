"""Pallas TPU flash attention.

Replaces the reference's CUDA xformers memory-efficient attention
(/root/reference/ldm/modules/attention.py:216-243 and every
``enable_xformers_memory_efficient_attention()`` call site) with a TPU-native
online-softmax kernel.

Design
------
- Shapes: q (B, H, N, D), k/v (B, H, M, D). D and N/M are zero-padded to
  lane/sublane multiples outside the kernel (XLA pads cheaply; the kernel sees
  aligned tiles only). Padded keys are masked with -inf logits.
- Grid: (B*H, N/BLOCK_N, M/BLOCK_M) with the kv dimension innermost. Each
  program sees one q tile and ONE kv tile; the classic (m, l, acc)
  online-softmax carry lives in fp32 VMEM scratch that persists across the
  sequential kv grid steps. Pallas double-buffers the kv tile DMAs from HBM,
  so VMEM use is O(block) regardless of sequence length — SD1.5/2.1 UNet
  self-attention (N = M = 4096 @ 64x64 latents, D = 40..160), SAM ViT at any
  detect resolution (N = 16384 @ 2048px) and the 1024^2+ tile passes all run
  without a full-KV-in-VMEM cap.

Dispatch falls back to the pure-XLA reference for tiny problems (cross-attn
with M = 77), explicit masks, and non-TPU backends.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too, but guard for safety
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# Block defaults tuned on v5e: (512, 1024) reaches 28 TFLOP/s useful on the
# SD 64x64-latent self-attention (vs 16 at (256, 256), 12 for XLA reference)
# and 33 at the 16384-token tile pass; raw incl. the d->128 lane padding is
# ~131 TFLOP/s (PROFILE.md). Small N/M clamp the blocks down anyway.
BLOCK_N = 512
BLOCK_M = 1024
_NEG_INF = -1e30

# Interpreter mode lets CPU tests exercise the kernel (tests/conftest.py sets
# EA_PALLAS_INTERPRET=1 under the virtual CPU mesh).
import os  # noqa: E402

_INTERPRET = os.environ.get("EA_PALLAS_INTERPRET", "0") == "1"
_DISABLED = os.environ.get("EA_DISABLE_PALLAS", "0") == "1"
# Mosaic pads head_dim to 128 lanes; below this head dim the padding waste
# can make XLA attention competitive — tunable for benching.
_MIN_HEAD_DIM = int(os.environ.get("EA_FLASH_MIN_D", "0"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, kv_len: int, block_m: int):
    """One (q tile, kv tile) step; kv tiles arrive via the innermost grid dim.

    Matmuls run in the STORAGE dtype (bf16 in production) with fp32
    accumulation — upcasting inputs to fp32 would force multi-pass fp32
    MXU matmuls, measured ~3x slower end-to-end. Softmax statistics stay
    fp32 in VMEM scratch that persists across the sequential kv steps."""
    j = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                      # (BN, D) storage dtype
    k = k_ref[0]                                      # (BM, D)
    v = v_ref[0]
    bn = q.shape[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # (BN, BM) fp32
    # mask out zero-padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, block_m), 1)
    valid = (col + j * block_m) < kv_len
    logits = jnp.where(valid, logits, _NEG_INF)

    # scratch rows are lane-replicated; reduce back to a column on read
    m_prev = jnp.max(m_scr[:], axis=-1, keepdims=True)       # (BN, 1)
    l_prev = jnp.max(l_scr[:], axis=-1, keepdims=True)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)                              # (BN, BM)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nkv - 1)
    def _():
        o_ref[0] = (acc / l_new).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_n", "block_m"))
def flash_attention(q, k, v, *, scale: Optional[float] = None,
                    block_n: int = BLOCK_N, block_m: int = BLOCK_M):
    """Flash attention for (B, H, N, D) tensors, no mask (full bidirectional).

    q/k may be DEEPER than v (dqk > dv): callers fold additive logit biases
    into the contraction by augmenting q with bias columns and k with
    one-hot selectors (SAM rel-pos, models/sam.py) — the output depth
    follows v."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, n, d = q.shape
    m = k.shape[2]
    dv = v.shape[3]

    block_n = min(block_n, _round_up(n, 128))
    block_m = min(block_m, _round_up(m, 128))
    n_pad = _round_up(n, block_n)
    m_pad = _round_up(m, block_m)
    d_pad = _round_up(d, 128)
    dv_pad = _round_up(dv, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - m), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad - m), (0, dv_pad - dv)))
    qp = qp.reshape(b * h, n_pad, d_pad)
    kp = kp.reshape(b * h, m_pad, d_pad)
    vp = vp.reshape(b * h, m_pad, dv_pad)

    grid = (b * h, n_pad // block_n, m_pad // block_m)
    kernel = functools.partial(_flash_kernel, scale=scale, kv_len=m,
                               block_m=block_m)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda i, j, kj: (i, j, 0)),
            pl.BlockSpec((1, block_m, d_pad), lambda i, j, kj: (i, kj, 0)),
            pl.BlockSpec((1, block_m, dv_pad), lambda i, j, kj: (i, kj, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, dv_pad),
                               lambda i, j, kj: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, dv_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_n, 128), jnp.float32),
            pltpu.VMEM((block_n, 128), jnp.float32),
            pltpu.VMEM((block_n, dv_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * m * (d + dv),
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * n * m,
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp)
    out = out.reshape(b, h, n_pad, dv_pad)
    return out[:, :, :n, :dv]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# kv streams block-wise from HBM, so VMEM use is O(block) regardless of
# sequence length — no KV-size cap needed (was 8 MB before the 3-D grid).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale)


def _flash_diff_fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale), (q, k, v)


def _flash_diff_bwd(scale, res, g):
    # backward recomputes through the XLA reference attention (rematerialized
    # softmax; the Pallas kernel has no transpose rule). Same recompute
    # strategy as flash-attention backward, done by XLA.
    from editanything_tpu.core.layers import attention_reference
    q, k, v = res
    _, vjp = jax.vjp(
        lambda qq, kk, vv: attention_reference(qq, kk, vv, scale=scale),
        q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def dispatch(q, k, v, *, scale: Optional[float] = None, mask=None):
    """Route to the Pallas kernel when profitable, else the XLA reference."""
    from editanything_tpu.core.layers import attention_reference

    n, d = q.shape[-2], q.shape[-1]
    if (_DISABLED or mask is not None or not (_on_tpu() or _INTERPRET)
            or n < 128 or d < _MIN_HEAD_DIM):
        return attention_reference(q, k, v, scale=scale, mask=mask)
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_diff(q, k, v, scale)
