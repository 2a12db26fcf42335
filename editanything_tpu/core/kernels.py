"""Fused Pallas TPU kernels for the diffusion hot path.

The UNet/VAE are chains of GroupNorm -> SiLU -> Conv (reference:
/root/reference/ldm/modules/diffusionmodules/model.py:41-48 `Normalize` +
`nonlinearity`). The conv lands on the MXU via XLA; the norm+activation is
HBM-bandwidth-bound, so we fuse GroupNorm statistics + affine + SiLU into one
VMEM-resident Pallas kernel (one HBM read, one HBM write per activation).

Layout note: activations are NHWC with C in the lane dimension. Group
statistics are computed as per-channel (H, W) reductions followed by a tiny
(G, C/G) regroup on the channel vector — every large op keeps C in lanes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = os.environ.get("EA_PALLAS_INTERPRET", "0") == "1"
_DISABLED = os.environ.get("EA_DISABLE_PALLAS", "0") == "1"


_GN_ROWS = int(os.environ.get("EA_GN_ROWS", "8"))


def _row_chunk(h: int) -> int:
    for r in (_GN_ROWS, 8, 4, 2):
        if r and h % r == 0:
            return r
    return 1


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
                    eps: float, apply_silu: bool):
    """Single-HBM-pass GroupNorm+SiLU for one image.

    The (H, W, C) block stays in VMEM in its storage dtype; fp32 statistics
    and the normalize are computed over row chunks so no full-size fp32
    temporary is ever materialized (that's what OOM'd VMEM in the naive
    version). Group<->channel mappings are one-hot matmuls: Mosaic has no
    1-D (C,)->(G, C/G) vector reshape.
    """
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    g = num_groups
    cg = c // g
    denom = h * w * cg
    rows = _row_chunk(h)
    n_chunks = h // rows

    def stats_body(i, carry):
        s, ss = carry
        xa = x_ref[0, pl.ds(i * rows, rows)].astype(jnp.float32)  # (R, W, C)
        s = s + jnp.sum(xa, axis=(0, 1), keepdims=True)[0]
        ss = ss + jnp.sum(xa * xa, axis=(0, 1), keepdims=True)[0]
        return s, ss

    ch_sum, ch_sq = jax.lax.fori_loop(
        0, n_chunks, stats_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)))

    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = ((ch_ids // cg) == grp_ids).astype(jnp.float32)  # (C, G)

    grp_sum = jnp.dot(ch_sum, onehot, preferred_element_type=jnp.float32)
    grp_sq = jnp.dot(ch_sq, onehot, preferred_element_type=jnp.float32)
    mean_g = grp_sum / denom                                  # (1, G)
    var_g = grp_sq / denom - mean_g * mean_g

    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    rstd_c = jax.lax.rsqrt(
        jnp.dot(var_g, onehot.T, preferred_element_type=jnp.float32) + eps)

    scale = scale_ref[:].astype(jnp.float32) * rstd_c         # (1, C)
    bias = bias_ref[:].astype(jnp.float32) - mean_c * scale   # (1, C)

    def norm_body(i, _):
        xa = x_ref[0, pl.ds(i * rows, rows)].astype(jnp.float32)
        y = xa * scale + bias
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * rows, rows)] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


@functools.cache
def _vmem_bytes() -> int:
    """Per-core VMEM of the local device. v4/v5e/v5p/v6e have 128 MiB;
    v2/v3 (and unknown kinds) get the conservative 16 MiB so the fused
    kernel dispatches to the XLA fallback instead of VMEM-OOMing."""
    try:
        kind = jax.local_devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover
        return 16 * 1024 * 1024
    big = ("v4", "v5", "v6", "v5 lite", "v5e", "v5p", "v6e", "v6 lite")
    if any(t in kind for t in big):
        return 128 * 1024 * 1024
    return 16 * 1024 * 1024


def _vmem_limit_bytes() -> int:
    # leave ~1/4 headroom for Mosaic's own temporaries
    return (_vmem_bytes() * 3) // 4


def _max_block_bytes() -> int:
    """Largest (H, W, C) image block the fused kernel accepts. In + out
    blocks are double-buffered by the pipeline, so ~4 residents of this
    size must fit under the scoped-VMEM limit; 12 MiB on a 128 MiB part
    covers the 64x64x960-channel SD up-block activations (~8 MB)."""
    return _vmem_limit_bytes() // 8


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu"))
def _gn_silu_pallas(x, scale, bias, num_groups: int, eps: float,
                    apply_silu: bool):
    n, h, w, c = x.shape
    scale = scale.reshape(1, c)
    bias = bias.reshape(1, c)
    kernel = functools.partial(_gn_silu_kernel, num_groups=num_groups,
                               eps=eps, apply_silu=apply_silu)
    from jax.experimental.pallas import tpu as pltpu
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=_INTERPRET,
    )(x, scale, bias)


def _big_vmem() -> bool:
    """True when the local part has the 128 MiB VMEM the SAM decode
    kernels' working sets (keys + packed weights + f32 intermediates,
    ~30 MB at ViT-H scale) were sized for; small/unknown parts take the
    XLA fallback instead of VMEM-OOMing at Mosaic compile time."""
    return _vmem_bytes() >= 64 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _gn_silu_reference(scale, bias, x, num_groups, eps, apply_silu):
    from editanything_tpu.core import layers
    y = layers.group_norm({"scale": scale, "bias": bias}, x,
                          num_groups=num_groups, eps=eps)
    return jax.nn.silu(y) if apply_silu else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_silu(scale, bias, x, num_groups, eps, apply_silu):
    return _gn_silu_pallas(x, scale, bias, num_groups, eps, apply_silu)


def _gn_silu_fwd(scale, bias, x, num_groups, eps, apply_silu):
    # forward through the Pallas kernel; save primals for the backward
    return _gn_silu(scale, bias, x, num_groups, eps, apply_silu), \
        (scale, bias, x)


def _gn_silu_bwd(num_groups, eps, apply_silu, res, g):
    # backward recomputes through the XLA reference (the Pallas kernel has
    # no transpose rule; training is memory-bound on convs anyway)
    scale, bias, x = res
    _, vjp = jax.vjp(
        lambda s, b, xx: _gn_silu_reference(s, b, xx, num_groups, eps,
                                            apply_silu), scale, bias, x)
    return vjp(g)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def _erf(x):
    """erf for Mosaic (no erf/erfc primitive): Abramowitz & Stegun 7.1.26,
    |error| <= 1.5e-7 — orders of magnitude below the bf16 rounding of the
    surrounding matmuls."""
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    """Exact (erf-based) GELU, matching jax.nn.gelu(approximate=False) up
    to the _erf approximation error (~1e-7)."""
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _sam_upscale_kernel(src_ref, w1_ref, b1_ref, lnw_ref, lnb_ref, w2_ref,
                        b2_ref, h_ref, o_ref, *, eps: float):
    """Fused SAM mask-decoder upscale + hypernetwork products, one point
    per grid step, everything resident in VMEM.

    The stride-2 2x2 transposed convs are per-input-pixel matmuls (each
    input pixel independently emits its 2x2 output tile), so the whole
    chain convT1 -> LayerNorm2d -> GELU -> convT2 -> GELU -> hypernetwork
    einsum is position-order-independent: no pixel-shuffle relayouts are
    needed in VMEM; the caller unscrambles the (di,dj,di2,dj2) subgrids
    with one cheap XLA transpose.

    src_ref (1, 4096, 256): per-point image keys.
    w1_ref (4, 256, 64):    convT1 kernel, leading dim = (di*2+dj).
    b1/lnw/lnb (1, 64):     convT1 bias, LayerNorm2d affine.
    w2_ref (64, 128):       convT2 kernel as (c1) x (di2,dj2,o2).
    b2_ref (1, 128):        convT2 bias tiled over the 4 (di2,dj2) groups.
    h_ref (1, 4*nm, 128):   selection (x) hyper matrix: row g*nm+t holds
                            hyper[t] in lanes [g*32, g*32+32).
    o_ref (1, 4, 4*nm, 4096): per-(di,dj) mask products.
    """
    x = src_ref[0]
    b1 = b1_ref[0].astype(jnp.float32)
    lnw = lnw_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    hyp = h_ref[0].astype(x.dtype)
    w2 = w2_ref[:].astype(x.dtype)
    for k in range(4):
        y = jnp.dot(x, w1_ref[k].astype(x.dtype),
                    preferred_element_type=jnp.float32) + b1   # (4096, 64)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
        y = (y - mu) * jax.lax.rsqrt(var + eps) * lnw + lnb
        y = _gelu_exact(y)
        z = jnp.dot(y.astype(x.dtype), w2,
                    preferred_element_type=jnp.float32) + b2   # (4096, 128)
        z = _gelu_exact(z)
        m = jax.lax.dot_general(hyp, z.astype(x.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, k] = m.astype(o_ref.dtype)                    # (4nm, 4096)


@functools.partial(jax.jit, static_argnames=("eps",))
def _sam_upscale_pallas(src, w1, b1, lnw, lnb, w2, b2, hsel, eps: float):
    n, npix, c = src.shape
    nm16 = hsel.shape[1]
    kernel = functools.partial(_sam_upscale_kernel, eps=eps)
    from jax.experimental.pallas import tpu as pltpu
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, npix, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((4, c, c // 4), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c // 4), lambda i: (0, 0)),
            pl.BlockSpec((1, c // 4), lambda i: (0, 0)),
            pl.BlockSpec((1, c // 4), lambda i: (0, 0)),
            pl.BlockSpec((c // 4, c // 2), lambda i: (0, 0)),
            pl.BlockSpec((1, c // 2), lambda i: (0, 0)),
            pl.BlockSpec((1, nm16, c // 2), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, nm16, npix), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 4, nm16, npix), src.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=_INTERPRET,
    )(src, w1, b1, lnw, lnb, w2, b2, hsel)


def sam_upscale_hyper(src, up_params, hyper, eps: float = 1e-6):
    """Fused mask-decoder output path: per-point transposed-conv upscale
    64->256 + hypernetwork mask products (models/sam.py mask_decoder tail;
    official SAM MaskDecoder.predict_masks). Returns (B, nm, 256, 256).

    src: (B, 4096, 256) transformer image outputs. up_params: the
    'output_upscaling' tree {0: convT, 1: LayerNorm2d, 3: convT}.
    hyper: (B, nm, 32) hypernetwork outputs.

    The XLA path materializes ~0.6 GB of HBM intermediates per 256-point
    batch (h1 128^2 x 64, h2 256^2 x 32 + gelu/LN passes); the Pallas
    kernel keeps the whole chain in VMEM. Forward-only (SAM is never
    trained here); off-TPU falls back to the XLA ops.
    """
    b, npix, c = src.shape
    e = int(npix ** 0.5)
    nm = hyper.shape[1]
    k1 = up_params["0"]["kernel"]                 # (2, 2, 256, 64)
    b1 = up_params["0"]["bias"]
    k2 = up_params["3"]["kernel"]                 # (2, 2, 64, 32)
    b2 = up_params["3"]["bias"]

    use_kernel = (not _DISABLED and (_INTERPRET or (_on_tpu() and _big_vmem()))
                  and c == 256 and npix % 256 == 0)
    if not use_kernel:
        from editanything_tpu.models.sam import layer_norm_2d
        from editanything_tpu.core import layers as L
        src_img = src.reshape(b, e, e, c)
        # torch ConvTranspose2d == jax conv_transpose with spatially FLIPPED
        # taps (jax treats the kernel as a forward-conv kernel); flip so the
        # output matches the official SAM decoder exactly
        h = jax.lax.conv_transpose(src_img,
                                   k1[::-1, ::-1].astype(src.dtype), (2, 2),
                                   "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + b1.astype(h.dtype)
        h = layer_norm_2d(up_params["1"], h, eps=eps)
        h = L.gelu(h)
        h = jax.lax.conv_transpose(h, k2[::-1, ::-1].astype(h.dtype),
                                   (2, 2), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + b2.astype(h.dtype)
        h = L.gelu(h)
        return jnp.einsum("bnc,bhwc->bnhw", hyper, h.astype(hyper.dtype))

    # torch ConvTranspose2d semantics: out tile (di,dj) of input pixel i
    # is src[i] @ K[di,dj] directly (no flip — unlike jax conv_transpose,
    # whose forward-conv kernel convention the XLA fallback above corrects
    # by flipping taps)
    w1 = k1.reshape(4, c, c // 4)                 # (di*2+dj, c, o)
    w2 = k2.transpose(2, 0, 1, 3).reshape(c // 4, c // 2)
    b2p = jnp.tile(b2, 4).reshape(1, c // 2)
    # selection (x) hyper: H[g*nm+t, g*32+o] = hyper[t, o]
    eye4 = jnp.eye(4, dtype=hyper.dtype)
    hsel = jnp.einsum("gh,bto->bgtho", eye4, hyper)
    hsel = hsel.reshape(b, 4 * nm, c // 2)

    o = _sam_upscale_pallas(src, w1, b1.reshape(1, -1),
                            up_params["1"]["weight"].reshape(1, -1),
                            up_params["1"]["bias"].reshape(1, -1),
                            w2, b2p, hsel, eps)
    # o[b, (di,dj), (di2,dj2,t), (i,j)] -> masks[b, t, 4i+2di+di2, 4j+2dj+dj2]
    o = o.reshape(b, 2, 2, 2, 2, nm, e, e)
    o = o.transpose(0, 5, 6, 1, 3, 7, 2, 4)
    return o.reshape(b, nm, 4 * e, 4 * e)


def _twoway_kernel(src_ref, tok_ref, pe_ref, wself_ref, bself_ref,
                   wselfo_ref, bselfo_ref, wcross_ref, bcross_ref,
                   wcrosso_ref, bcrosso_ref, wmlp1_ref, bmlp1_ref,
                   wmlp2_ref, bmlp2_ref, norms_ref, kout_ref, qout_ref, *,
                   heads: int, n_tokens: int):
    """SAM's whole two-way transformer for ONE prompt, VMEM-resident.

    The XLA path materializes ~30 MB of HBM intermediates per prompt (the
    per-prompt (4096, 256) image keys flow through 2.5 blocks of
    projections, residual adds and LayerNorms); here keys live in VMEM for
    the full depth — HBM traffic drops to src-in + keys/queries-out.

    Multi-head attention uses the masked-lane trick: scores for head h are
    (q * mask_h) @ k^T (one full-width matmul per head — ~8x the useful
    attention-core FLOPs, but the cores are <5% of the kernel's work and
    this avoids 16-lane slicing relayouts).

    Ref packing (built in sam_twoway): wself (L, 3, d, d) q/k/v;
    wcross (2L+1, 3, d, d/2) for [t2i_0, i2t_0, t2i_1, i2t_1, final_t2i];
    norms (4L+1, 2, d); tok_ref is both the initial queries and the
    query positional term (official SAM query_pe = point_embedding).
    Rows >= n_tokens of tok_ref are zero padding, masked out of every
    attention where tokens are keys.
    """
    dt = src_ref.dtype
    f32 = jnp.float32
    tp = tok_ref.shape[1]
    tokens0 = tok_ref[0].astype(f32)                   # (TP, d)
    keys = src_ref[0]                                  # (M, d) dt
    pe = pe_ref[...].astype(f32)                       # (M, d)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    tok_key_bias = jnp.where(col_ids < n_tokens, 0.0, -1e30)

    def linear(x, w, b):
        return jnp.dot(x.astype(dt), w.astype(dt),
                       preferred_element_type=f32) + b.astype(f32)

    def ln(x, wb):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * \
            wb[0].astype(f32) + wb[1].astype(f32)

    def mh_attn(qx, kx, vx, key_bias=None):
        nq, inner = qx.shape
        hd = inner // heads
        scale = 1.0 / (hd ** 0.5)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, inner), 1)
        out = jnp.zeros((nq, inner), f32)
        for h in range(heads):
            m = ((ids >= h * hd) & (ids < (h + 1) * hd)).astype(f32)
            s = jax.lax.dot_general(
                (qx * m).astype(dt), kx.astype(dt),
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            s = s * scale
            if key_bias is not None:
                s = s + key_bias
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = out + jnp.dot(p.astype(dt), (vx * m).astype(dt),
                                preferred_element_type=f32)
        return out

    q = tokens0
    n_layers = wself_ref.shape[0]
    for l in range(n_layers):
        # --- token self-attention
        if l == 0:
            # skip_first_layer_pe: REPLACES queries, no residual
            a = mh_attn(linear(q, wself_ref[0, 0], bself_ref[0, 0]),
                        linear(q, wself_ref[0, 1], bself_ref[0, 1]),
                        linear(q, wself_ref[0, 2], bself_ref[0, 2]),
                        tok_key_bias)
            q = linear(a, wselfo_ref[0], bselfo_ref[0])
        else:
            qpe = q + tokens0
            a = mh_attn(linear(qpe, wself_ref[l, 0], bself_ref[l, 0]),
                        linear(qpe, wself_ref[l, 1], bself_ref[l, 1]),
                        linear(q, wself_ref[l, 2], bself_ref[l, 2]),
                        tok_key_bias)
            q = q + linear(a, wselfo_ref[l], bselfo_ref[l])
        q = ln(q, norms_ref[4 * l + 0])

        # --- cross attention token -> image
        ci = 2 * l
        qpe = q + tokens0
        kpe = keys.astype(f32) + pe
        a = mh_attn(linear(qpe, wcross_ref[ci, 0], bcross_ref[ci, 0]),
                    linear(kpe, wcross_ref[ci, 1], bcross_ref[ci, 1]),
                    linear(keys, wcross_ref[ci, 2], bcross_ref[ci, 2]))
        q = q + linear(a, wcrosso_ref[ci], bcrosso_ref[ci])
        q = ln(q, norms_ref[4 * l + 1])

        # --- token MLP (ReLU)
        h1 = jnp.maximum(linear(q, wmlp1_ref[l], bmlp1_ref[l]), 0.0)
        q = q + linear(h1, wmlp2_ref[l], bmlp2_ref[l])
        q = ln(q, norms_ref[4 * l + 2])

        # --- cross attention image -> token
        qpe = q + tokens0
        kpe = keys.astype(f32) + pe
        a = mh_attn(linear(kpe, wcross_ref[ci + 1, 0], bcross_ref[ci + 1, 0]),
                    linear(qpe, wcross_ref[ci + 1, 1], bcross_ref[ci + 1, 1]),
                    linear(q, wcross_ref[ci + 1, 2], bcross_ref[ci + 1, 2]),
                    tok_key_bias)
        keys_new = keys.astype(f32) + linear(a, wcrosso_ref[ci + 1],
                                             bcrosso_ref[ci + 1])
        keys = ln(keys_new, norms_ref[4 * l + 3]).astype(dt)

    # --- final token -> image attention + norm
    fi = 2 * n_layers
    qpe = q + tokens0
    kpe = keys.astype(f32) + pe
    a = mh_attn(linear(qpe, wcross_ref[fi, 0], bcross_ref[fi, 0]),
                linear(kpe, wcross_ref[fi, 1], bcross_ref[fi, 1]),
                linear(keys, wcross_ref[fi, 2], bcross_ref[fi, 2]))
    q = q + linear(a, wcrosso_ref[fi], bcrosso_ref[fi])
    q = ln(q, norms_ref[4 * n_layers])

    kout_ref[0] = keys
    qout_ref[0] = q.astype(dt)


def _pack_twoway_params(tp, n_layers):
    """transformer param tree -> stacked arrays for the kernel."""
    def attn_w(a):
        return (jnp.stack([a["q_proj"]["kernel"], a["k_proj"]["kernel"],
                           a["v_proj"]["kernel"]]),
                jnp.stack([a["q_proj"]["bias"], a["k_proj"]["bias"],
                           a["v_proj"]["bias"]]),
                a["out_proj"]["kernel"], a["out_proj"]["bias"])

    wself, bself, wselfo, bselfo = [], [], [], []
    wcross, bcross, wcrosso, bcrosso = [], [], [], []
    wmlp1, bmlp1, wmlp2, bmlp2, norms = [], [], [], [], []
    for l in range(n_layers):
        lay = tp["layers"][str(l)]
        w, b, wo, bo = attn_w(lay["self_attn"])
        wself.append(w); bself.append(b)
        wselfo.append(wo); bselfo.append(bo)
        for name in ("cross_attn_token_to_image", "cross_attn_image_to_token"):
            w, b, wo, bo = attn_w(lay[name])
            wcross.append(w); bcross.append(b)
            wcrosso.append(wo); bcrosso.append(bo)
        wmlp1.append(lay["mlp"]["lin1"]["kernel"])
        bmlp1.append(lay["mlp"]["lin1"]["bias"])
        wmlp2.append(lay["mlp"]["lin2"]["kernel"])
        bmlp2.append(lay["mlp"]["lin2"]["bias"])
        for j in range(1, 5):
            norms.append(jnp.stack([lay[f"norm{j}"]["scale"],
                                    lay[f"norm{j}"]["bias"]]))
    w, b, wo, bo = attn_w(tp["final_attn_token_to_image"])
    wcross.append(w); bcross.append(b)
    wcrosso.append(wo); bcrosso.append(bo)
    norms.append(jnp.stack([tp["norm_final_attn"]["scale"],
                            tp["norm_final_attn"]["bias"]]))
    return tuple(jnp.stack(a) for a in
                 (wself, bself, wselfo, bselfo, wcross, bcross, wcrosso,
                  bcrosso, wmlp1, bmlp1, wmlp2, bmlp2, norms))


@functools.partial(jax.jit, static_argnames=("heads", "n_tokens"))
def _twoway_pallas(src, tokens_padded, pe, packed, heads: int,
                   n_tokens: int):
    b, tp, d = tokens_padded.shape
    m = src.shape[1]
    kernel = functools.partial(_twoway_kernel, heads=heads,
                               n_tokens=n_tokens)
    from jax.experimental.pallas import tpu as pltpu
    const = lambda *nd: pl.BlockSpec(nd, lambda i: (0,) * len(nd))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            const(1, m, d),                              # src (shared)
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0)),
            const(m, d),                                 # image pe
        ] + [const(*w.shape) for w in packed],
        out_specs=[
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d), src.dtype),
            jax.ShapeDtypeStruct((b, tp, d), src.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=_INTERPRET,
    )(src, tokens_padded, pe, *packed)


def pack_twoway(transformer_params):
    """Pre-stack the two-way transformer weights for `sam_twoway`. Callers
    that invoke the kernel inside a scan (the AMG's batched decode) hoist
    this OUT of the scan body — the stacking is ~5-8 MB of copies that XLA
    does not reliably loop-invariant-hoist out of while loops."""
    return _pack_twoway_params(transformer_params,
                               len(transformer_params["layers"]))


def sam_twoway(transformer_params, src1, image_pe, tokens, *, heads: int,
               packed=None):
    """Fused SAM two-way transformer (models/sam.py mask_decoder; official
    segment_anything TwoWayTransformer). Forward-only.

    src1: (1, M, d) image keys SHARED by every prompt (image embedding +
    no-mask dense embedding — the AMG / point-predictor case).
    tokens: (B, T, d) output+prompt tokens (also the query positional term).
    Returns (queries (B, T, d), keys (B, M, d)).
    """
    b, t, d = tokens.shape
    tp = max(8, -(-t // 8) * 8)
    tokens_p = jnp.pad(tokens, ((0, 0), (0, tp - t), (0, 0)))
    if packed is None:
        packed = pack_twoway(transformer_params)
    kout, qout = _twoway_pallas(src1, tokens_p, image_pe[0], packed,
                                heads, t)
    return qout[:, :t], kout


# ---------------------------------------------------------------------------
# Fused ResNet block (GN -> SiLU -> conv3x3 -> +temb -> GN -> SiLU -> conv3x3
# -> +shortcut) — the SD UNet/ControlNet hot block as ONE VMEM-resident
# kernel. The up3 profiler drill (PROFILE.md) measured the composed XLA
# resnet at 2-3x its equivalent-matmul roofline at CFG batch 2; this kernel
# reads the activation from HBM once, keeps both normalized intermediates in
# VMEM scratch, and runs each conv as 9 tap matmuls on the FLATTENED (H*W, C)
# activation: tap (dy, dx) is a circular sublane roll by dy*W+dx plus an
# iota validity mask (zero-padding semantics), then one (HW, Cin)@(Cin, Cout)
# MXU contraction. No unaligned slices, no in-kernel reshapes — every op is
# a full-array roll/select or a 2-D matmul (Mosaic-friendly by design; a
# first draft with haloed scratch + off-tile slices wedged the remote
# compile service, see git history).
# ---------------------------------------------------------------------------


def _rn_group_stats(ch_sum, ch_sq, c, g, denom, eps, scale_p, bias_p):
    """Channel sums -> per-channel fused scale/bias via one-hot regroup."""
    cg = c // g
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = ((ch_ids // cg) == grp_ids).astype(jnp.float32)      # (C, G)
    grp_sum = jnp.dot(ch_sum, onehot, preferred_element_type=jnp.float32)
    grp_sq = jnp.dot(ch_sq, onehot, preferred_element_type=jnp.float32)
    mean_g = grp_sum / denom
    var_g = grp_sq / denom - mean_g * mean_g
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    rstd_c = jax.lax.rsqrt(
        jnp.dot(var_g, onehot.T, preferred_element_type=jnp.float32) + eps)
    scale = scale_p.astype(jnp.float32) * rstd_c                  # (1, C)
    bias = bias_p.astype(jnp.float32) - mean_c * scale
    return scale, bias


def _resnet_kernel(x_ref, gn1s_ref, gn1b_ref, w1_ref, b1_ref, trow_ref,
                   gn2s_ref, gn2b_ref, w2_ref, b2_ref, wsc_ref, bsc_ref,
                   o_ref, xn_scr, hn_scr, *, h: int, w: int,
                   num_groups: int, eps: float, has_shortcut: bool):
    """One image per grid step, activations flattened to (H*W, C).

    x_ref (1, H*W, Cin) -> o_ref (1, H*W, Cout). trow_ref (1, 1, Cout) is
    the image's time-embedding projection (linear(silu(temb)), computed in
    XLA — a per-image block; the kernel reads trow_ref[0]). xn/hn scratch
    hold the normalized+SiLU activations."""
    from jax.experimental.pallas import tpu as pltpu
    hw = h * w
    cout = o_ref.shape[2]
    f32 = jnp.float32

    ridx = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    ycoord = ridx // w
    xcoord = ridx - ycoord * w

    def conv9(src_ref, w_ref):
        """3x3 zero-padded conv of the flattened src: 9 (roll, mask,
        matmul) taps accumulated in fp32."""
        acc = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                tap = src_ref[:]
                off = dy * w + dx
                if off:
                    # static-shift jnp.roll lowers to slice+concat, which
                    # Mosaic supports for bf16 (tpu.dynamic_rotate — what
                    # pltpu.roll emits even for static shifts — is
                    # 32-bit-only on this toolchain, measured on chip)
                    tap = jnp.roll(tap, -off, axis=0)
                valid = (ycoord + dy >= 0) & (ycoord + dy < h) \
                    & (xcoord + dx >= 0) & (xcoord + dx < w)
                tap = jnp.where(valid, tap, jnp.zeros_like(tap))
                y = jnp.dot(tap, w_ref[(dy + 1) * 3 + (dx + 1)].astype(tap.dtype),
                            preferred_element_type=f32)
                acc = y if acc is None else acc + y
        return acc

    # --- GN1 -> SiLU -> xn
    xa = x_ref[0].astype(f32)
    s1 = jnp.sum(xa, axis=0, keepdims=True)
    q1 = jnp.sum(xa * xa, axis=0, keepdims=True)
    cin = x_ref.shape[2]
    sc1, bi1 = _rn_group_stats(s1, q1, cin, num_groups,
                               hw * (cin // num_groups), eps,
                               gn1s_ref[:], gn1b_ref[:])
    y1 = xa * sc1 + bi1
    xn_scr[:] = (y1 * jax.nn.sigmoid(y1)).astype(xn_scr.dtype)

    # --- conv1 + bias + temb -> GN2 -> SiLU -> hn
    hacc = conv9(xn_scr, w1_ref) \
        + (trow_ref[0].astype(f32) + b1_ref[:].astype(f32))
    s2 = jnp.sum(hacc, axis=0, keepdims=True)
    q2 = jnp.sum(hacc * hacc, axis=0, keepdims=True)
    sc2, bi2 = _rn_group_stats(s2, q2, cout, num_groups,
                               hw * (cout // num_groups), eps,
                               gn2s_ref[:], gn2b_ref[:])
    y2 = hacc * sc2 + bi2
    hn_scr[:] = (y2 * jax.nn.sigmoid(y2)).astype(hn_scr.dtype)

    # --- conv2 + bias + shortcut -> out
    out = conv9(hn_scr, w2_ref) + b2_ref[:].astype(f32)
    if has_shortcut:
        out = out + jnp.dot(x_ref[0], wsc_ref[0].astype(x_ref.dtype),
                            preferred_element_type=f32) \
            + bsc_ref[:].astype(f32)
    else:
        out = out + xa
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                             "has_shortcut"))
def _resnet_pallas(x, gn1s, gn1b, w1, b1, trow, gn2s, gn2b, w2, b2, wsc,
                   bsc, num_groups, eps, has_shortcut):
    n, h, w, cin = x.shape
    cout = w2.shape[-1]
    hw = h * w
    kernel = functools.partial(_resnet_kernel, h=h, w=w,
                               num_groups=num_groups, eps=eps,
                               has_shortcut=has_shortcut)
    from jax.experimental.pallas import tpu as pltpu
    row = lambda c: pl.BlockSpec((1, c), lambda i: (0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, cin), lambda i: (i, 0, 0)),
            row(cin), row(cin),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
            row(cout),
            # per-image temb row, carried 3-D so the (sublane, lane) block
            # dims are (1, cout) == the trailing array dims for any n
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
            row(cout), row(cout),
            pl.BlockSpec((9, cout, cout), lambda i: (0, 0, 0)),
            row(cout),
            pl.BlockSpec((1, cin, cout), lambda i: (0, 0, 0)),
            row(cout),
        ],
        out_specs=pl.BlockSpec((1, hw, cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hw, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hw, cin), x.dtype),
            pltpu.VMEM((hw, cout), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=_INTERPRET,
    )(x.reshape(n, hw, cin), gn1s, gn1b, w1, b1,
      trow.reshape(n, 1, cout), gn2s, gn2b, w2, b2, wsc, bsc)
    return out.reshape(n, h, w, cout)


def _resnet_reference(params, x, trow, num_groups, eps):
    """The composed XLA ops (used off-TPU and as the custom_vjp backward)."""
    from editanything_tpu.core import layers as L
    h = group_norm_silu(params["norm1"], x, num_groups=num_groups, eps=eps)
    h = L.conv2d(params["conv1"], h, padding=1)
    if trow is not None:
        h = h + trow[:, None, None, :].astype(h.dtype)
    h = group_norm_silu(params["norm2"], h, num_groups=num_groups, eps=eps)
    h = L.conv2d(params["conv2"], h, padding=1)
    if "conv_shortcut" in params:
        x = L.conv2d(params["conv_shortcut"], x, padding=0)
    return x + h


def _rn_flat(params, trow):
    """Flatten the resnet param tree to the kernel's operand list."""
    w1 = params["conv1"]["kernel"]
    cin, cout = w1.shape[2], w1.shape[3]
    has_sc = "conv_shortcut" in params
    wsc = params["conv_shortcut"]["kernel"].reshape(1, cin, cout) \
        if has_sc else jnp.zeros((1, cin, cout), w1.dtype)
    bsc = params["conv_shortcut"]["bias"].reshape(1, cout) \
        if has_sc else jnp.zeros((1, cout), w1.dtype)
    return (params["norm1"]["scale"].reshape(1, cin),
            params["norm1"]["bias"].reshape(1, cin),
            w1.reshape(9, cin, cout),
            params["conv1"]["bias"].reshape(1, cout),
            trow,
            params["norm2"]["scale"].reshape(1, cout),
            params["norm2"]["bias"].reshape(1, cout),
            params["conv2"]["kernel"].reshape(9, cout, cout),
            params["conv2"]["bias"].reshape(1, cout),
            wsc, bsc), has_sc


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _resnet_diff(params, x, trow, num_groups, eps):
    flat, has_sc = _rn_flat(params, trow)
    return _resnet_pallas(x, *flat, num_groups=num_groups, eps=eps,
                          has_shortcut=has_sc)


def _resnet_diff_fwd(params, x, trow, num_groups, eps):
    return _resnet_diff(params, x, trow, num_groups, eps), (params, x, trow)


def _resnet_diff_bwd(num_groups, eps, res, g):
    params, x, trow = res
    _, vjp = jax.vjp(
        lambda p, xx, t: _resnet_reference(p, xx, t, num_groups, eps),
        params, x, trow)
    return vjp(g)


_resnet_diff.defvjp(_resnet_diff_fwd, _resnet_diff_bwd)


# The fused kernel's peak residency: x block + both (HW, C) scratches +
# out (double-buffered) + the tap weight stacks + the fp32 full-array
# temporaries of the conv/GN phases (x as fp32, one rolled tap, the fp32
# conv accumulator). Gate on the total staying comfortably under the
# scoped-VMEM limit.
def _resnet_vmem_need(h, w, cin, cout, itemsize):
    hw = h * w
    act = (2 * hw * cin + 3 * hw * cout) * itemsize
    wts = (9 * cin * cout + 9 * cout * cout + cin * cout) * itemsize
    f32_tmp = 4 * hw * (max(cin, cout) + cout)
    return act + wts + f32_tmp


# Opt-in (EA_RESNET_FUSED=1), a REJECTED default (round 4): the kernel
# compiles cleanly on chip now (3-58 s/shape) and wins its microbenchmark
# 6x, but the whole-model A/B showed the pure-XLA 9-shift conv lowering
# (core/layers.py EA_CONV9, default on TPU) captures the same win with
# cross-op fusion this pallas_call forfeits — UNet fwd 19.34 ms (conv9)
# vs 21.56 ms (this kernel) vs 27.83 ms (native conv). Full numbers in
# PROFILE.md "Conv lowering decision".
_RESNET_FUSED = os.environ.get("EA_RESNET_FUSED", "0") == "1"


def resnet_fused(params, x, trow, *, num_groups: int = 32,
                 eps: float = 1e-5):
    """Fused SD resnet block; returns None when the kernel does not apply
    (caller falls back to the composed ops). `trow` is the per-image
    time-embedding projection (B, Cout) or None.

    Dispatches on REAL TPU only — interpret-mode equivalence is covered by
    a dedicated test (tests/test_core_layers.py) rather than routing every
    CPU test through the (slow) interpreted 9-tap convs."""
    if _DISABLED or not _RESNET_FUSED or not _on_tpu():
        return None
    n, h, w, cin = x.shape
    w1 = params["conv1"]["kernel"]
    cout = w1.shape[3]
    if (w1.shape[:2] != (3, 3) or params["conv2"]["kernel"].shape[:2] != (3, 3)
            or cin % num_groups or cout % num_groups or (h * w) % 8
            or _resnet_vmem_need(h, w, cin, cout, x.dtype.itemsize)
            > _vmem_limit_bytes() * 3 // 4):
        return None
    if trow is None:
        trow = jnp.zeros((n, cout), x.dtype)
    return _resnet_diff(params, x, trow, num_groups, eps)


def group_norm_silu(params, x, *, num_groups: int = 32, eps: float = 1e-5,
                    apply_silu: bool = True):
    """Fused GroupNorm(+SiLU); XLA fallback off-TPU / for huge blocks.

    Differentiable: forward runs the Pallas kernel, backward re-derives
    through the pure-XLA reference (custom_vjp)."""
    n, h, w, c = x.shape
    block_bytes = h * w * c * x.dtype.itemsize
    if (not _DISABLED and (_on_tpu() or _INTERPRET)
            and c % num_groups == 0 and block_bytes <= _max_block_bytes()):
        return _gn_silu(params["scale"], params["bias"], x,
                        num_groups, eps, apply_silu)
    return _gn_silu_reference(params["scale"], params["bias"], x,
                              num_groups, eps, apply_silu)
