"""CLIP text encoders (ViT-L for SD1.5, OpenCLIP-H tower for SD2.1).

Behavioral spec: /root/reference/ldm/modules/encoders/modules.py:88-193
(`FrozenCLIPEmbedder` with layer selection / clip-skip, and
`FrozenOpenCLIPEmbedder` penultimate-layer for SD2.1 per cldm_v21.yaml:82-85).
Long-prompt 77-token windowing lives in engine/prompts.py (the reference's
`get_pipeline_embeds`, editany_lora.py:110-194, and `hack_everything`,
cldm/hack.py:23-68).

Param layout matches HF transformers CLIPTextModel
(text_model.embeddings/encoder.layers.N.{self_attn,layer_norm1,mlp,...}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from editanything_tpu.core import layers as L
from editanything_tpu.models.config import CLIPTextConfig


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16 + cfg.num_layers * 8))
    nxt = lambda: next(ks)
    d = cfg.hidden_size

    def attn_params():
        return {
            "q_proj": L.init_linear(nxt(), d, d, dtype),
            "k_proj": L.init_linear(nxt(), d, d, dtype),
            "v_proj": L.init_linear(nxt(), d, d, dtype),
            "out_proj": L.init_linear(nxt(), d, d, dtype),
        }

    layers = {}
    for i in range(cfg.num_layers):
        layers[str(i)] = {
            "layer_norm1": L.init_layer_norm(d, dtype),
            "self_attn": attn_params(),
            "layer_norm2": L.init_layer_norm(d, dtype),
            "mlp": {
                "fc1": L.init_linear(nxt(), d, cfg.intermediate_size, dtype),
                "fc2": L.init_linear(nxt(), cfg.intermediate_size, d, dtype),
            },
        }
    return {
        "embeddings": {
            "token_embedding": {"weight": jax.random.normal(
                nxt(), (cfg.vocab_size, d), dtype) * 0.02},
            "position_embedding": {"weight": jax.random.normal(
                nxt(), (cfg.max_position_embeddings, d), dtype) * 0.01},
        },
        "encoder": {"layers": layers},
        "final_layer_norm": L.init_layer_norm(d, dtype),
    }


def _act(cfg):
    return L.quick_gelu if cfg.hidden_act == "quick_gelu" else L.gelu


def _causal_mask(n):
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (j <= i)[None, None]   # (1, 1, N, N) True = attend


def _encoder_layer(params, cfg: CLIPTextConfig, x, mask):
    b, n, d = x.shape
    h = cfg.num_heads
    res = x
    x = L.layer_norm(params["layer_norm1"], x)
    q = L.linear(params["self_attn"]["q_proj"], x)
    k = L.linear(params["self_attn"]["k_proj"], x)
    v = L.linear(params["self_attn"]["v_proj"], x)
    q = q.reshape(b, n, h, -1).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, h, -1).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, h, -1).transpose(0, 2, 1, 3)
    att = L.attention(q, k, v, mask=mask)
    att = att.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = res + L.linear(params["self_attn"]["out_proj"], att)

    res = x
    x = L.layer_norm(params["layer_norm2"], x)
    x = L.linear(params["mlp"]["fc1"], x)
    x = _act(cfg)(x)
    x = L.linear(params["mlp"]["fc2"], x)
    return res + x


def apply(params, cfg: CLIPTextConfig, input_ids, *, layer_skip=None):
    """(B, N) token ids -> (B, N, D) hidden states for the UNet context.

    `layer_skip` overrides cfg.layer_skip: 0 = final_layer_norm(last layer)
    output (SD1.5); k>0 = k-th-from-last layer output, normed — the
    "clip skip" / penultimate-layer option (hack.py:23-68 semantics).
    """
    skip = cfg.layer_skip if layer_skip is None else layer_skip
    emb = params["embeddings"]
    x = emb["token_embedding"]["weight"][input_ids]
    n = input_ids.shape[1]
    x = x + emb["position_embedding"]["weight"][:n]
    mask = _causal_mask(n)
    num = cfg.num_layers - skip
    for i in range(num):
        x = _encoder_layer(params["encoder"]["layers"][str(i)], cfg, x, mask)
    return L.layer_norm(params["final_layer_norm"], x)
