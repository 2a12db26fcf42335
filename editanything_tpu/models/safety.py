"""Stable Diffusion safety checker — CLIP ViT-L/14 vision tower + NSFW head.

Behavioral spec: the reference pipelines register a
`StableDiffusionSafetyChecker` as an optional component
(/root/reference/utils/stable_diffusion_controlnet_inpaint.py:391-454,
`run_safety_checker` in utils/stable_diffusion_controlnet.py:643-653) but
every EditAnything entry point constructs them with `safety_checker=None`
(editany_lora.py:369-411, stable_diffusion_controlnet.py:88). This module
provides the full capability for users who enable it:

- a HF-layout CLIPVisionModel tower (patch conv, class token, pre/post
  layernorm, quick-GELU encoder — weight-compatible with
  `CompVis/stable-diffusion-safety-checker`'s `vision_model.*` keys),
- the cosine-similarity concept head (17 NSFW concepts + 3 special-care
  concepts with per-concept thresholds; flagged images are blacked out,
  matching diffusers' StableDiffusionSafetyChecker.forward).

Pipelines take `safety_checker=None` by default — identical to the
reference's own operating point.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.core import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    num_concepts: int = 17
    num_special: int = 3

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def tiny_vision_config() -> CLIPVisionConfig:
    """For tests."""
    return CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            num_layers=2, num_heads=2, intermediate_size=64,
                            projection_dim=16, num_concepts=4, num_special=2)


def init_safety_checker(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16 + cfg.num_layers * 8))
    nxt = lambda: next(ks)
    d = cfg.hidden_size

    layers = {}
    for i in range(cfg.num_layers):
        layers[str(i)] = {
            "layer_norm1": L.init_layer_norm(d, dtype),
            "self_attn": {
                "q_proj": L.init_linear(nxt(), d, d, dtype),
                "k_proj": L.init_linear(nxt(), d, d, dtype),
                "v_proj": L.init_linear(nxt(), d, d, dtype),
                "out_proj": L.init_linear(nxt(), d, d, dtype),
            },
            "layer_norm2": L.init_layer_norm(d, dtype),
            "mlp": {
                "fc1": L.init_linear(nxt(), d, cfg.intermediate_size, dtype),
                "fc2": L.init_linear(nxt(), cfg.intermediate_size, d, dtype),
            },
        }
    return {
        "vision_model": {
            "embeddings": {
                "class_embedding": jax.random.normal(nxt(), (d,), dtype) * 0.02,
                "patch_embedding": {"kernel": jax.random.normal(
                    nxt(), (cfg.patch_size, cfg.patch_size, 3, d),
                    dtype) * 0.02},
                "position_embedding": {"weight": jax.random.normal(
                    nxt(), (cfg.num_patches + 1, d), dtype) * 0.02},
            },
            # HF's actual (misspelled) attribute name, kept for
            # weight-compatibility: vision_model.pre_layrnorm
            "pre_layrnorm": L.init_layer_norm(d, dtype),
            "encoder": {"layers": layers},
            "post_layernorm": L.init_layer_norm(d, dtype),
        },
        "visual_projection": {"kernel": jax.random.normal(
            nxt(), (d, cfg.projection_dim), dtype) * 0.02},
        "concept_embeds": jax.random.normal(
            nxt(), (cfg.num_concepts, cfg.projection_dim), dtype),
        "special_care_embeds": jax.random.normal(
            nxt(), (cfg.num_special, cfg.projection_dim), dtype),
        "concept_embeds_weights": jnp.full((cfg.num_concepts,), 0.2, dtype),
        "special_care_embeds_weights": jnp.full((cfg.num_special,), 0.2,
                                                dtype),
    }


def _vision_layer(p, cfg: CLIPVisionConfig, x):
    b, n, d = x.shape
    h = cfg.num_heads
    res = x
    x = L.layer_norm(p["layer_norm1"], x)
    q = L.linear(p["self_attn"]["q_proj"], x).reshape(b, n, h, -1) \
        .transpose(0, 2, 1, 3)
    k = L.linear(p["self_attn"]["k_proj"], x).reshape(b, n, h, -1) \
        .transpose(0, 2, 1, 3)
    v = L.linear(p["self_attn"]["v_proj"], x).reshape(b, n, h, -1) \
        .transpose(0, 2, 1, 3)
    att = L.attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, d)
    x = res + L.linear(p["self_attn"]["out_proj"], att)
    res = x
    x = L.layer_norm(p["layer_norm2"], x)
    x = L.linear(p["mlp"]["fc1"], x)
    x = L.quick_gelu(x)
    x = L.linear(p["mlp"]["fc2"], x)
    return res + x


def vision_pooled(params, cfg: CLIPVisionConfig, pixels):
    """(B, S, S, 3) normalized pixels -> (B, D) pooled CLS embedding
    (HF CLIPVisionModel pooler_output)."""
    vm = params["vision_model"]
    h = L.conv2d({"kernel": vm["embeddings"]["patch_embedding"]["kernel"]},
                 pixels, stride=cfg.patch_size, padding="VALID")
    b = h.shape[0]
    h = h.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        vm["embeddings"]["class_embedding"][None, None, :].astype(h.dtype),
        (b, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + vm["embeddings"]["position_embedding"]["weight"][None] \
        .astype(h.dtype)
    h = L.layer_norm(vm["pre_layrnorm"], h)
    for i in range(cfg.num_layers):
        h = _vision_layer(vm["encoder"]["layers"][str(i)], cfg, h)
    return L.layer_norm(vm["post_layernorm"], h[:, 0])


def _cosine(a, b):
    """Normalized a (B, D) @ b (K, D)^T -> (B, K) cosine similarity
    (diffusers' cosine_distance)."""
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return an @ bn.T


def check(params, cfg: CLIPVisionConfig, pixels):
    """Safety scores for preprocessed pixels.

    Returns (has_nsfw (B,) bool, concept_scores (B, K)). Score/threshold
    math mirrors diffusers StableDiffusionSafetyChecker.forward: the
    special-care adjustment lowers every concept threshold by 0.01 when any
    special-care concept fires."""
    pooled = vision_pooled(params, cfg, pixels)
    emb = pooled.astype(jnp.float32) @ \
        params["visual_projection"]["kernel"].astype(jnp.float32)
    special = _cosine(emb, params["special_care_embeds"]
                      .astype(jnp.float32))
    concept = _cosine(emb, params["concept_embeds"].astype(jnp.float32))
    adjustment = 0.0
    special_scores = special - \
        params["special_care_embeds_weights"].astype(jnp.float32)[None] + \
        adjustment
    special_care = jnp.any(special_scores > 0, axis=1, keepdims=True)
    special_adjustment = jnp.where(special_care, 0.01, 0.0)
    concept_scores = concept - \
        params["concept_embeds_weights"].astype(jnp.float32)[None] + \
        special_adjustment
    return jnp.any(concept_scores > 0, axis=1), concept_scores


# CLIPImageProcessor normalization constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images_uint8: np.ndarray, cfg: CLIPVisionConfig) -> np.ndarray:
    """uint8 (B, H, W, 3) -> normalized (B, S, S, 3) fp32 for the tower
    (CLIPImageProcessor: shortest-edge bicubic resize, center crop,
    rescale, normalize)."""
    from PIL import Image
    s = cfg.image_size
    out = np.empty((images_uint8.shape[0], s, s, 3), np.float32)
    for i, img in enumerate(images_uint8):
        h, w = img.shape[:2]
        # HF get_resize_output_image_size: short side = s, long side
        # TRUNCATED int(s * long / short)
        if h <= w:
            nh, nw = s, max(int(s * w / h), s)
        else:
            nh, nw = max(int(s * h / w), s), s
        r = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC))
        y0, x0 = (nh - s) // 2, (nw - s) // 2
        out[i] = r[y0:y0 + s, x0:x0 + s].astype(np.float32) / 255.0
    return (out - CLIP_MEAN) / CLIP_STD


class SafetyChecker:
    """Pipeline-facing wrapper: uint8 images in, censored images + flags out
    (flagged images blacked out, diffusers semantics)."""

    def __init__(self, params, cfg: CLIPVisionConfig = CLIPVisionConfig()):
        self.params = params
        self.cfg = cfg
        self._check = jax.jit(lambda px: check(params, cfg, px)[0])

    def __call__(self, images_uint8: np.ndarray):
        px = preprocess(images_uint8, self.cfg)
        nsfw = np.asarray(self._check(jnp.asarray(px)))
        out = np.array(images_uint8, copy=True)
        out[nsfw] = 0
        return out, nsfw
