"""VLPart — open-vocabulary part detector (Swin-B FPN + RPN + cascade
R-CNN + CLIP-text classifier), fixed-shape XLA inference.

Behavioral spec: /root/reference/vlpart/ —
- model assembly + text embeddings: vlpart.py:25-115 (`build_vlpart`,
  `get_text_embeddings`: "a {part}" prompts + 'background', L2-normalized;
  pixel mean/std ImageNet)
- cascade heads: vlpart_roi_heads.py:33-152 (3 stages, IoUs .5/.6/.7,
  class-agnostic boxes, scores averaged over stages)
- classifier: vlpart_fast_rcnn.py:23-111 (`TexeEmbedClassifier`: linear to
  1024-d, L2-normalize x50 temperature, dot text embeddings, sigmoid)
- RPN config: vlpart.py:27-36 (anchors 32..512 on p2..p6, ratios .5/1/2)

TPU design: proposals/detections live in fixed-size slabs with validity
masks; NMS is the exact greedy scan from perception/amg.py; ROIAlign is
gather+bilinear (models/detection.py). Detection feeds prompt2mask
(perception/grounding.py) exactly like the torch pipeline feeds SAM.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.core import layers as L
from editanything_tpu.models import detection as D
from editanything_tpu.models import swin as SW
from editanything_tpu.models import clip_text as CT
from editanything_tpu.models.config import CLIPTextConfig
from editanything_tpu.perception.amg import greedy_nms


@dataclasses.dataclass(frozen=True)
class VLPartConfig:
    swin: SW.SwinConfig = dataclasses.field(default_factory=SW.swin_base)
    fpn_channels: int = 256
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)   # p2..p6
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    pre_nms_topk: int = 1000          # per level (test)
    post_nms_topk: int = 512          # fixed proposal slab
    rpn_nms_thresh: float = 0.7
    pooler_resolution: int = 7
    box_head_fc_dim: int = 1024
    num_cascade_stages: int = 3
    cascade_weights: Tuple[Tuple[float, ...], ...] = (
        (10.0, 10.0, 5.0, 5.0), (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0))
    zs_weight_dim: int = 1024
    norm_temperature: float = 50.0
    test_score_thresh: float = 0.0
    test_nms_thresh: float = 0.5
    test_topk: int = 100
    # CLIP text tower (RN50's: width 512 -> 1024-d projected embeddings)
    text: CLIPTextConfig = dataclasses.field(
        default_factory=lambda: CLIPTextConfig(
            hidden_size=512, intermediate_size=2048, num_layers=12,
            num_heads=8))

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_ratios)


def tiny_vlpart_config() -> VLPartConfig:
    return VLPartConfig(
        swin=SW.SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                           num_heads=(1, 2, 2, 2), window_size=4),
        fpn_channels=16, pre_nms_topk=64, post_nms_topk=32,
        pooler_resolution=3, box_head_fc_dim=32, zs_weight_dim=32,
        test_topk=16,
        text=CLIPTextConfig(vocab_size=2000, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=4,
                            max_position_embeddings=16))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_vlpart(key, cfg: VLPartConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)
    c = cfg.fpn_channels
    a = cfg.num_anchors
    pooled = c * cfg.pooler_resolution ** 2
    fc = cfg.box_head_fc_dim

    stages = {}
    for s in range(cfg.num_cascade_stages):
        stages[str(s)] = {
            "fc1": L.init_linear(nxt(), pooled, fc, dtype),
            "fc2": L.init_linear(nxt(), fc, fc, dtype),
            "bbox_pred": {
                "0": L.init_linear(nxt(), fc, fc, dtype),
                "2": L.init_linear(nxt(), fc, 4, dtype),
            },
            "cls_score": L.init_linear(nxt(), fc, cfg.zs_weight_dim, dtype),
        }

    return {
        "backbone": SW.init_swin(nxt(), cfg.swin, dtype),
        "fpn": SW.init_fpn(nxt(), tuple(cfg.swin.stage_dim(i)
                                        for i in range(len(cfg.swin.depths))),
                           c, dtype),
        "rpn": {
            "conv": L.init_conv2d(nxt(), c, c, 3, dtype),
            "objectness_logits": L.init_conv2d(nxt(), c, a, 1, dtype),
            "anchor_deltas": L.init_conv2d(nxt(), c, a * 4, 1, dtype),
        },
        "roi_heads": stages,
        "text_encoder": {
            "clip": CT.init_clip_text(nxt(), cfg.text, dtype),
            "text_projection": jax.random.normal(
                nxt(), (cfg.text.hidden_size, cfg.zs_weight_dim), dtype)
            * cfg.text.hidden_size ** -0.5,
        },
    }


# ---------------------------------------------------------------------------
# text embeddings (vlpart.py:78-84)
# ---------------------------------------------------------------------------

def encode_vocabulary(params, cfg: VLPartConfig, tokenizer,
                      vocabulary: str, prefix: str = "a ") -> jnp.ndarray:
    """'dog head.dog nose' -> (zs_dim, K+1) L2-normalized embeddings with a
    trailing 'background' row."""
    names = [v for v in vocabulary.split(".") if v.strip()]
    texts = [prefix + x.lower().replace(":", " ") for x in names]
    texts.append("background")
    ctx = cfg.text.max_position_embeddings
    ids = tokenizer(texts, pad_to=ctx, truncate=True)
    hidden = CT.apply(params["text_encoder"]["clip"], cfg.text,
                      jnp.asarray(ids))
    # CLIP pools the EOS-token hidden state, then projects
    eos = jnp.argmax((jnp.asarray(ids) == tokenizer.eos_id)
                     .astype(jnp.int32), axis=1)
    pooled = hidden[jnp.arange(len(texts)), eos]
    emb = pooled @ params["text_encoder"]["text_projection"]
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb.T                                  # (zs_dim, K+1)


# ---------------------------------------------------------------------------
# RPN
# ---------------------------------------------------------------------------

def rpn_proposals(params, cfg: VLPartConfig, feats: Dict[str, jnp.ndarray],
                  image_hw: Tuple[int, int]):
    """Fixed-shape proposals: (post_nms_topk, 4) boxes + validity."""
    all_boxes, all_scores = [], []
    for i, name in enumerate(["p2", "p3", "p4", "p5", "p6"]):
        f = feats[name][0]
        h, w, _ = f.shape
        stride = 2 ** (i + 2)
        t = jax.nn.relu(L.conv2d(params["rpn"]["conv"], f[None], padding=1))
        obj = L.conv2d(params["rpn"]["objectness_logits"], t, padding=0)[0]
        dlt = L.conv2d(params["rpn"]["anchor_deltas"], t, padding=0)[0]
        a = cfg.num_anchors
        obj = obj.reshape(h * w * a)
        dlt = dlt.reshape(h * w * a, 4)
        anchors = jnp.asarray(D.level_anchors(
            h, w, stride, cfg.anchor_sizes[i], cfg.anchor_ratios))
        boxes = D.apply_deltas(dlt.astype(jnp.float32), anchors)
        boxes = D.clip_boxes(boxes, image_hw)
        k = min(cfg.pre_nms_topk, obj.shape[0])
        scores, idx = jax.lax.top_k(obj.astype(jnp.float32), k)
        all_boxes.append(boxes[idx])
        all_scores.append(scores)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    # drop degenerate boxes, then exact NMS over the merged set
    wh_ok = ((boxes[:, 2] - boxes[:, 0]) > 1e-3) & \
            ((boxes[:, 3] - boxes[:, 1]) > 1e-3)
    keep = greedy_nms(boxes, scores, wh_ok, cfg.rpn_nms_thresh)
    scores = jnp.where(keep, scores, -jnp.inf)
    k = cfg.post_nms_topk
    top_scores, idx = jax.lax.top_k(scores, k)
    return boxes[idx], top_scores > -jnp.inf


# ---------------------------------------------------------------------------
# cascade heads
# ---------------------------------------------------------------------------

def _run_stage(params, cfg: VLPartConfig, feats, boxes, text_embed, stage):
    p = params["roi_heads"][str(stage)]
    pooled = D.multilevel_roi_align(feats, boxes,
                                    out_size=cfg.pooler_resolution)
    x = pooled.reshape(pooled.shape[0], -1)
    x = jax.nn.relu(L.linear(p["fc1"], x))
    x = jax.nn.relu(L.linear(p["fc2"], x))
    # class-agnostic box deltas (vlpart_fast_rcnn.py:74-79)
    d = jax.nn.relu(L.linear(p["bbox_pred"]["0"], x))
    deltas = L.linear(p["bbox_pred"]["2"], d)
    # text-embedding classifier (:23-47)
    e = L.linear(p["cls_score"], x)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-6)
    logits = cfg.norm_temperature * (e @ text_embed.astype(e.dtype))
    return logits, deltas


def detect(params, cfg: VLPartConfig, pixels, text_embed):
    """pixels (1, H, W, 3) ImageNet-normalized -> fixed-slab detections:
    dict(boxes (T, 4), scores (T,), classes (T,), valid (T,))."""
    hw = (pixels.shape[1], pixels.shape[2])
    swin_feats = SW.apply(params["backbone"], cfg.swin, pixels)
    fpn = SW.fpn_apply(params["fpn"],
                       [swin_feats[f"swin{i}"]
                        for i in range(len(cfg.swin.depths))])
    boxes, valid = rpn_proposals(params, cfg, fpn, hw)

    scores_sum = None
    for s in range(cfg.num_cascade_stages):
        logits, deltas = _run_stage(params, cfg, fpn, boxes, text_embed, s)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        scores_sum = probs if scores_sum is None else scores_sum + probs
        boxes = D.clip_boxes(
            D.apply_deltas(deltas.astype(jnp.float32), boxes,
                           weights=cfg.cascade_weights[s]), hw)
    scores = scores_sum / cfg.num_cascade_stages      # (T, K+1)

    # fast_rcnn_inference: drop the background column, per-class NMS
    fg = scores[:, :-1]
    n, k = fg.shape
    flat_scores = fg.reshape(-1)
    flat_boxes = jnp.repeat(boxes, k, axis=0)
    flat_classes = jnp.tile(jnp.arange(k), n)
    flat_valid = jnp.repeat(valid, k) & \
        (flat_scores > cfg.test_score_thresh)
    # batched_nms trick: offset boxes per class so NMS is class-local
    offsets = flat_classes.astype(jnp.float32)[:, None] * \
        (max(hw) + 2.0)
    keep = greedy_nms(flat_boxes + offsets, flat_scores, flat_valid,
                      cfg.test_nms_thresh)
    sel_scores = jnp.where(keep, flat_scores, -jnp.inf)
    t = min(cfg.test_topk, sel_scores.shape[0])
    top, idx = jax.lax.top_k(sel_scores, t)
    return {
        "boxes": flat_boxes[idx],
        "scores": jnp.where(top > -jnp.inf, top, 0.0),
        "classes": flat_classes[idx],
        "valid": top > -jnp.inf,
    }


# ---------------------------------------------------------------------------
# host-side Detector wrapper (perception.grounding.Detector protocol)
# ---------------------------------------------------------------------------

PIXEL_MEAN = np.array([123.675, 116.280, 103.530], np.float32)
PIXEL_STD = np.array([58.395, 57.120, 57.375], np.float32)


class VLPartDetector:
    """detect(image, text) -> (boxes, scores, labels); resizes the short
    side to `short_side` like the reference's ResizeShortestEdge([800],
    1333) (sam2vlpart_edit.py:121)."""

    def __init__(self, params, cfg: VLPartConfig, tokenizer, *,
                 short_side: int = 800, max_side: int = 1333):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.short_side = short_side
        self.max_side = max_side
        self._detect = jax.jit(
            lambda p, x, t: detect(p, cfg, x, t))

    def __call__(self, image: np.ndarray, text: str):
        from PIL import Image
        h, w = image.shape[:2]
        scale = min(self.short_side / min(h, w), self.max_side / max(h, w))
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        resized = np.asarray(Image.fromarray(image).resize(
            (nw, nh), Image.BILINEAR), np.float32)
        px = (resized - PIXEL_MEAN) / PIXEL_STD
        text_embed = encode_vocabulary(self.params, self.cfg,
                                       self.tokenizer, text)
        out = jax.device_get(self._detect(self.params, px[None],
                                          jnp.asarray(text_embed)))
        valid = out["valid"]
        boxes = out["boxes"][valid] / scale
        scores = out["scores"][valid]
        names = [v for v in text.split(".") if v.strip()]
        labels = [names[int(c)] for c in out["classes"][valid]]
        return boxes, scores, labels
