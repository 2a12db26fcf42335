"""BLIP-2 captioner: EVA-ViT image encoder + Q-Former + OPT decoder.

The reference uses BLIP2 (OPT-2.7B) through `transformers` for
auto-prompting (/root/reference/editany_lora.py:98-107,512-520: fp16,
`generate(**inputs, max_new_tokens=50)`) and per-region semantic labels
(sam2semantic.py:60-71, max_new_tokens=15). This is a functional JAX
implementation of the Salesforce/blip2-opt-2.7b architecture:

- vision: EVA ViT-g/14 (1408-d, 39 blocks, 224^2, class token, no final
  norm head — Q-Former consumes the full token sequence)
- Q-Former: 12-layer BERT-base encoder over 32 learned query tokens with
  cross-attention to image tokens every other layer
- language_projection: 768 -> 2560
- OPT-2.7B decoder (32 layers, 2560-d, 32 heads, ReLU FFN, learned
  positions with offset 2, pre-LN) consuming [query embeds ; prompt ids]

TPU design: greedy decode is one jitted `lax.scan` over a fixed
max_new_tokens with a preallocated KV cache (the reference's HF
`generate` re-dispatches per token from Python). bf16 weights; the
autoregressive hot loop is matmul-bound on the MXU.

Param layouts follow HF module names so checkpoints/convert.py can map
`Blip2ForConditionalGeneration` state dicts directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from editanything_tpu.core import layers as L


@dataclasses.dataclass(frozen=True)
class BLIP2Config:
    # vision (EVA ViT-g/14)
    image_size: int = 224
    patch_size: int = 14
    vision_hidden: int = 1408
    vision_layers: int = 39
    vision_heads: int = 16
    vision_mlp: int = 6144
    # Q-Former
    num_query_tokens: int = 32
    qformer_hidden: int = 768
    qformer_layers: int = 12
    qformer_heads: int = 12
    qformer_mlp: int = 3072
    cross_attention_frequency: int = 2
    # OPT
    opt_hidden: int = 2560
    opt_layers: int = 32
    opt_heads: int = 32
    opt_ffn: int = 10240
    vocab_size: int = 50272
    max_positions: int = 2048
    bos_token_id: int = 2
    eos_token_id: int = 2
    pad_token_id: int = 1

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def tiny_blip2_config() -> BLIP2Config:
    """Test-sized architecture (same structure, tiny dims)."""
    return BLIP2Config(
        image_size=28, patch_size=14, vision_hidden=16, vision_layers=2,
        vision_heads=2, vision_mlp=32,
        num_query_tokens=4, qformer_hidden=16, qformer_layers=2,
        qformer_heads=2, qformer_mlp=32, cross_attention_frequency=2,
        opt_hidden=16, opt_layers=2, opt_heads=2, opt_ffn=32,
        vocab_size=128, max_positions=64)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _attn_init(key, d, dtype, kv_dim=None):
    kv = kv_dim or d
    ks = jax.random.split(key, 4)
    return {"q": L.init_linear(ks[0], d, d, dtype),
            "k": L.init_linear(ks[1], kv, d, dtype),
            "v": L.init_linear(ks[2], kv, d, dtype),
            "o": L.init_linear(ks[3], d, d, dtype)}


def init_blip2(key, cfg: BLIP2Config, dtype=jnp.float32):
    kv, kq, ko, km = jax.random.split(key, 4)

    # ---- vision
    ks = iter(jax.random.split(kv, 8 + cfg.vision_layers * 4))
    nxt = lambda: next(ks)
    d = cfg.vision_hidden
    vis = {
        "patch_embed": L.init_conv2d(nxt(), 3, d, cfg.patch_size, dtype),
        "cls_token": jax.random.normal(nxt(), (1, 1, d), dtype) * 0.02,
        "pos_embed": jax.random.normal(
            nxt(), (1, cfg.num_patches + 1, d), dtype) * 0.02,
        "layers": {},
        "post_layernorm": L.init_layer_norm(d, dtype),
    }
    for i in range(cfg.vision_layers):
        vis["layers"][str(i)] = {
            "norm1": L.init_layer_norm(d, dtype),
            "attn": _attn_init(nxt(), d, dtype),
            "norm2": L.init_layer_norm(d, dtype),
            "mlp": {"fc1": L.init_linear(nxt(), d, cfg.vision_mlp, dtype),
                    "fc2": L.init_linear(nxt(), cfg.vision_mlp, d, dtype)},
        }

    # ---- Q-Former
    ks = iter(jax.random.split(kq, 8 + cfg.qformer_layers * 8))
    nxt = lambda: next(ks)
    dq = cfg.qformer_hidden
    qf = {
        "query_tokens": jax.random.normal(
            nxt(), (1, cfg.num_query_tokens, dq), dtype) * 0.02,
        "layernorm": L.init_layer_norm(dq, dtype),
        "layers": {},
    }
    for i in range(cfg.qformer_layers):
        layer = {
            "attention": _attn_init(nxt(), dq, dtype),
            "attention_norm": L.init_layer_norm(dq, dtype),
            "ffn": {"fc1": L.init_linear(nxt(), dq, cfg.qformer_mlp, dtype),
                    "fc2": L.init_linear(nxt(), cfg.qformer_mlp, dq, dtype)},
            "ffn_norm": L.init_layer_norm(dq, dtype),
        }
        if i % cfg.cross_attention_frequency == 0:
            layer["crossattention"] = _attn_init(
                nxt(), dq, dtype, kv_dim=cfg.vision_hidden)
            layer["crossattention_norm"] = L.init_layer_norm(dq, dtype)
        qf["layers"][str(i)] = layer

    # ---- OPT
    ks = iter(jax.random.split(ko, 8 + cfg.opt_layers * 4))
    nxt = lambda: next(ks)
    do = cfg.opt_hidden
    opt = {
        "embed_tokens": {"weight": jax.random.normal(
            nxt(), (cfg.vocab_size, do), dtype) * 0.02},
        "embed_positions": {"weight": jax.random.normal(
            nxt(), (cfg.max_positions + 2, do), dtype) * 0.02},
        "final_layer_norm": L.init_layer_norm(do, dtype),
        "layers": {},
    }
    for i in range(cfg.opt_layers):
        opt["layers"][str(i)] = {
            "self_attn_layer_norm": L.init_layer_norm(do, dtype),
            "self_attn": _attn_init(nxt(), do, dtype),
            "final_layer_norm": L.init_layer_norm(do, dtype),
            "fc1": L.init_linear(nxt(), do, cfg.opt_ffn, dtype),
            "fc2": L.init_linear(nxt(), cfg.opt_ffn, do, dtype),
        }

    proj = L.init_linear(km, dq, do, dtype)
    return {"vision_model": vis, "qformer": qf,
            "language_projection": proj, "language_model": opt}


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _mha(p, q_in, kv_in, heads, mask=None):
    b, n, d = q_in.shape
    q = L.linear(p["q"], q_in).reshape(b, n, heads, -1).transpose(0, 2, 1, 3)
    k = L.linear(p["k"], kv_in).reshape(b, kv_in.shape[1], heads, -1) \
        .transpose(0, 2, 1, 3)
    v = L.linear(p["v"], kv_in).reshape(b, kv_in.shape[1], heads, -1) \
        .transpose(0, 2, 1, 3)
    out = L.attention(q, k, v, mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    return L.linear(p["o"], out)


def vision_encoder(params, cfg: BLIP2Config, pixels):
    """(B, H, W, 3) normalized pixels -> (B, 1+P, D) image tokens."""
    p = params["vision_model"]
    x = L.conv2d(p["patch_embed"], pixels, stride=cfg.patch_size,
                 padding="VALID")
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, d)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"][:, :x.shape[1]]
    for i in range(cfg.vision_layers):
        lp = p["layers"][str(i)]
        h = L.layer_norm(lp["norm1"], x)
        x = x + _mha(lp["attn"], h, h, cfg.vision_heads)
        h = L.layer_norm(lp["norm2"], x)
        h = L.linear(lp["mlp"]["fc1"], h)
        h = L.gelu(h)
        x = x + L.linear(lp["mlp"]["fc2"], h)
    return L.layer_norm(p["post_layernorm"], x)


def qformer(params, cfg: BLIP2Config, image_tokens):
    """(B, 1+P, Dv) -> (B, Q, Dq) query outputs (BERT post-LN blocks)."""
    p = params["qformer"]
    b = image_tokens.shape[0]
    x = jnp.broadcast_to(
        p["query_tokens"],
        (b,) + p["query_tokens"].shape[1:]).astype(image_tokens.dtype)
    x = L.layer_norm(p["layernorm"], x)
    for i in range(cfg.qformer_layers):
        lp = p["layers"][str(i)]
        x = L.layer_norm(lp["attention_norm"],
                         x + _mha(lp["attention"], x, x, cfg.qformer_heads))
        if "crossattention" in lp:
            x = L.layer_norm(
                lp["crossattention_norm"],
                x + _mha(lp["crossattention"], x, image_tokens,
                         cfg.qformer_heads))
        h = L.linear(lp["ffn"]["fc1"], x)
        h = L.gelu(h)
        x = L.layer_norm(lp["ffn_norm"], x + L.linear(lp["ffn"]["fc2"], h))
    return x


def _opt_layer(lp, cfg, x, mask, cache=None, pos=None):
    """Pre-LN OPT block. cache: dict(k, v) of (B, H, T, Dh) preallocated;
    pos: current write index (decode mode, x is (B, 1, D))."""
    heads = cfg.opt_heads
    b, n, d = x.shape
    res = x
    h = L.layer_norm(lp["self_attn_layer_norm"], x)
    q = L.linear(lp["self_attn"]["q"], h).reshape(b, n, heads, -1) \
        .transpose(0, 2, 1, 3)
    k = L.linear(lp["self_attn"]["k"], h).reshape(b, n, heads, -1) \
        .transpose(0, 2, 1, 3)
    v = L.linear(lp["self_attn"]["v"], h).reshape(b, n, heads, -1) \
        .transpose(0, 2, 1, 3)
    if cache is not None:
        k = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                         (0, 0, pos, 0))
        v = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                         (0, 0, pos, 0))
        new_cache = {"k": k, "v": v}
    else:
        new_cache = None
    att = L.attention(q, k, v, mask=mask)
    att = att.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = res + L.linear(lp["self_attn"]["o"], att)
    res = x
    h = L.layer_norm(lp["final_layer_norm"], x)
    h = jax.nn.relu(L.linear(lp["fc1"], h))
    x = res + L.linear(lp["fc2"], h)
    return x, new_cache


def opt_forward(params, cfg: BLIP2Config, inputs_embeds, *,
                caches=None, pos=None, total_len=None):
    """OPT decoder over embeddings. Prefill: caches=None, causal mask.
    Decode: inputs_embeds (B, 1, D), caches = per-layer KV, pos = index."""
    p = params["language_model"]
    b, n, d = inputs_embeds.shape
    if caches is None:
        positions = jnp.arange(n)
        i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        mask = (j <= i)[None, None]
    else:
        positions = jnp.asarray([pos])
        t = caches[0]["k"].shape[2] if total_len is None else total_len
        mask = (jnp.arange(t) <= pos)[None, None, None, :]
    x = inputs_embeds + p["embed_positions"]["weight"][positions + 2]
    new_caches = []
    for i2 in range(cfg.opt_layers):
        lp = p["layers"][str(i2)]
        cache_i = caches[i2] if caches is not None else None
        x, nc = _opt_layer(lp, cfg, x, mask, cache=cache_i, pos=pos)
        new_caches.append(nc)
    x = L.layer_norm(p["final_layer_norm"], x)
    logits = x @ p["embed_tokens"]["weight"].T
    return logits, new_caches


def _prefill_caches(params, cfg: BLIP2Config, inputs_embeds, max_len):
    """Run the prompt through OPT once, writing K/V into preallocated
    (B, H, max_len, Dh) caches; returns (last-token logits, caches)."""
    p = params["language_model"]
    b, n, d = inputs_embeds.shape
    heads = cfg.opt_heads
    dh = d // heads
    positions = jnp.arange(n)
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = (j <= i)[None, None]
    x = inputs_embeds + p["embed_positions"]["weight"][positions + 2]
    caches = []
    for li in range(cfg.opt_layers):
        lp = p["layers"][str(li)]
        res = x
        h = L.layer_norm(lp["self_attn_layer_norm"], x)
        q = L.linear(lp["self_attn"]["q"], h).reshape(b, n, heads, dh) \
            .transpose(0, 2, 1, 3)
        k = L.linear(lp["self_attn"]["k"], h).reshape(b, n, heads, dh) \
            .transpose(0, 2, 1, 3)
        v = L.linear(lp["self_attn"]["v"], h).reshape(b, n, heads, dh) \
            .transpose(0, 2, 1, 3)
        ck = jnp.zeros((b, heads, max_len, dh), k.dtype) \
            .at[:, :, :n].set(k)
        cv = jnp.zeros((b, heads, max_len, dh), v.dtype) \
            .at[:, :, :n].set(v)
        caches.append({"k": ck, "v": cv})
        att = L.attention(q, k, v, mask=mask)
        att = att.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = res + L.linear(lp["self_attn"]["o"], att)
        res = x
        h = L.layer_norm(lp["final_layer_norm"], x)
        h = jax.nn.relu(L.linear(lp["fc1"], h))
        x = res + L.linear(lp["fc2"], h)
    x = L.layer_norm(p["final_layer_norm"], x)
    logits = x[:, -1] @ p["embed_tokens"]["weight"].T
    return logits, caches


def make_caption_fn(cfg: BLIP2Config, *, prompt_len: int,
                    max_new_tokens: int = 50):
    """Builds a jittable greedy captioner.

    fn(params, pixels, prompt_ids) -> (B, max_new_tokens) int32 token ids
    (eos-padded after the first eos). prompt_ids: (B, prompt_len), the text
    prompt after the image (BLIP2 conditions OPT on [query embeds; prompt]).
    """
    def fn(params, pixels, prompt_ids):
        img = vision_encoder(params, cfg, pixels)
        queries = qformer(params, cfg, img)
        qemb = L.linear(params["language_projection"], queries)
        p = params["language_model"]
        temb = p["embed_tokens"]["weight"][prompt_ids]
        emb = jnp.concatenate([qemb, temb.astype(qemb.dtype)], axis=1)
        b, n0, d = emb.shape
        max_len = n0 + max_new_tokens
        logits, caches = _prefill_caches(params, cfg, emb, max_len)
        tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def body(carry, _):
            tok, pos, caches, done = carry
            temb1 = p["embed_tokens"]["weight"][tok][:, None]
            logits, caches = opt_forward(params, cfg, temb1,
                                         caches=caches, pos=pos,
                                         total_len=max_len)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            done = done | (tok == cfg.eos_token_id)
            nxt = jnp.where(done, cfg.eos_token_id, nxt)
            return (nxt, pos + 1, caches, done), tok

        carry = (tok0, jnp.asarray(n0, jnp.int32), caches,
                 jnp.zeros((b,), bool))
        _, toks = jax.lax.scan(body, carry, (), length=max_new_tokens)
        return toks.T                      # (B, max_new_tokens)

    return fn
