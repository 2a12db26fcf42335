"""GroundingDINO — open-vocabulary object detector, XLA-native inference.

Behavioral spec: the reference consumes the external groundingdino package
with config /root/reference/utils/GroundingDINO_SwinT_OGC.py (Swin-T,
BERT-base text encoder, 6+6 layer deformable DETR, 900 queries, 4 feature
levels, 8 heads, 4 sampling points, bi-directional image<->text fusion,
contrastive token-level classification) driven at
/root/reference/sam2groundingdino_edit.py:130-201 (`prompt2mask`:
box/text thresholds 0.25, top-2 boxes -> SAM).

TPU design notes:
- MSDeformAttn (CUDA kernel in the reference's dependency) becomes
  bilinear gather + einsum over fixed (levels, points) sampling grids
  (SURVEY.md section 2.9)
- text is padded to a fixed max_text_len with attention masking; image
  tokens are the flattened multi-scale pyramid (static per resolution
  bucket)
- query selection (two_stage 'standard') is a fixed top-num_queries
  lax.top_k over token-text contrastive scores
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.core import layers as L
from editanything_tpu.models import swin as SW


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    swin: SW.SwinConfig = dataclasses.field(default_factory=SW.swin_tiny)
    return_interm_indices: Tuple[int, ...] = (1, 2, 3)
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    num_queries: int = 900
    num_feature_levels: int = 4
    n_points: int = 4
    max_text_len: int = 256
    pe_temperature: float = 20.0


def tiny_dino_config() -> DINOConfig:
    return DINOConfig(
        swin=SW.SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                           num_heads=(1, 2, 2, 2), window_size=4),
        bert=BertConfig(vocab_size=200, hidden=16, layers=1, heads=2,
                        intermediate=32, max_positions=32),
        hidden_dim=16, nheads=2, enc_layers=1, dec_layers=1,
        dim_feedforward=32, num_queries=12, n_points=2, max_text_len=16)


# ---------------------------------------------------------------------------
# BERT text encoder
# ---------------------------------------------------------------------------

def init_bert(key, cfg: BertConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 8 + cfg.layers * 8))
    nxt = lambda: next(ks)
    d = cfg.hidden
    layers = {}
    for i in range(cfg.layers):
        layers[str(i)] = {
            "attention": {
                "q": L.init_linear(nxt(), d, d, dtype),
                "k": L.init_linear(nxt(), d, d, dtype),
                "v": L.init_linear(nxt(), d, d, dtype),
                "o": L.init_linear(nxt(), d, d, dtype),
                "norm": L.init_layer_norm(d, dtype),
            },
            "mlp": {
                "fc1": L.init_linear(nxt(), d, cfg.intermediate, dtype),
                "fc2": L.init_linear(nxt(), cfg.intermediate, d, dtype),
                "norm": L.init_layer_norm(d, dtype),
            },
        }
    return {
        "embeddings": {
            "word": jax.random.normal(nxt(), (cfg.vocab_size, d), dtype)
            * 0.02,
            "position": jax.random.normal(nxt(), (cfg.max_positions, d),
                                          dtype) * 0.02,
            "token_type": jax.random.normal(nxt(), (cfg.type_vocab, d),
                                            dtype) * 0.02,
            "norm": L.init_layer_norm(d, dtype),
        },
        "layers": layers,
    }


def bert_apply(params, cfg: BertConfig, ids, attn_mask):
    """ids (B, T), attn_mask (B, T) bool -> (B, T, D) (post-LN BERT)."""
    b, t = ids.shape
    emb = params["embeddings"]
    x = emb["word"][ids] + emb["position"][jnp.arange(t)][None] \
        + emb["token_type"][jnp.zeros_like(ids)]
    x = L.layer_norm(emb["norm"], x)
    mask = attn_mask[:, None, None, :]                    # (B, 1, 1, T)
    for i in range(cfg.layers):
        lp = params["layers"][str(i)]
        a = lp["attention"]
        h = cfg.heads
        q = L.linear(a["q"], x).reshape(b, t, h, -1).transpose(0, 2, 1, 3)
        k = L.linear(a["k"], x).reshape(b, t, h, -1).transpose(0, 2, 1, 3)
        v = L.linear(a["v"], x).reshape(b, t, h, -1).transpose(0, 2, 1, 3)
        att = L.attention(q, k, v, mask=mask)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, -1)
        x = L.layer_norm(a["norm"], x + L.linear(a["o"], att))
        m = lp["mlp"]
        y = L.gelu(L.linear(m["fc1"], x))
        x = L.layer_norm(m["norm"], x + L.linear(m["fc2"], y))
    return x


# ---------------------------------------------------------------------------
# multi-scale deformable attention (gather + einsum; no CUDA kernel)
# ---------------------------------------------------------------------------

def init_deform_attn(key, d, heads, levels, points, dtype):
    ks = jax.random.split(key, 4)
    return {
        "sampling_offsets": L.init_linear(ks[0], d,
                                          heads * levels * points * 2,
                                          dtype, zero=True),
        "attention_weights": L.init_linear(ks[1], d, heads * levels * points,
                                           dtype, zero=True),
        "value_proj": L.init_linear(ks[2], d, d, dtype),
        "output_proj": L.init_linear(ks[3], d, d, dtype),
    }


def _bilinear_sample(value_hw, locs):
    """value_hw (H, W, D); locs (N, 2) in [0,1] normalized -> (N, D)."""
    h, w, d = value_hw.shape
    x = locs[:, 0] * w - 0.5
    y = locs[:, 1] * h - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    tx = jnp.clip(x - x0, 0, 1)[:, None]
    ty = jnp.clip(y - y0, 0, 1)[:, None]
    xi0, xi1 = x0.astype(jnp.int32), x1.astype(jnp.int32)
    yi0, yi1 = y0.astype(jnp.int32), y1.astype(jnp.int32)
    f00 = value_hw[yi0, xi0]
    f01 = value_hw[yi0, xi1]
    f10 = value_hw[yi1, xi0]
    f11 = value_hw[yi1, xi1]
    fx0 = f00 * (1 - tx) + f01 * tx
    fx1 = f10 * (1 - tx) + f11 * tx
    return fx0 * (1 - ty) + fx1 * ty


def deform_attn(params, query, reference_points, value_flat, shapes,
                *, heads: int, points: int):
    """query (N, D); reference_points (N, L, 2) normalized; value_flat
    (sumHW, D); shapes list of (H, W). Returns (N, D)."""
    n, d = query.shape
    levels = len(shapes)
    dh = d // heads
    value = L.linear(params["value_proj"], value_flat)

    offs = L.linear(params["sampling_offsets"], query) \
        .reshape(n, heads, levels, points, 2)
    w = L.linear(params["attention_weights"], query) \
        .reshape(n, heads, levels * points)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1) \
        .reshape(n, heads, levels, points)

    out = jnp.zeros((n, heads, dh), jnp.float32)
    start = 0
    for li, (h, wd) in enumerate(shapes):
        v = value[start:start + h * wd].reshape(h, wd, heads, dh)
        start += h * wd
        norm = jnp.asarray([wd, h], jnp.float32)
        for pi in range(points):
            # per-head sampling locations: (N, heads, 2)
            locs = reference_points[:, None, li] + offs[:, :, li, pi] / norm
            for hi in range(heads):
                s = _bilinear_sample(v[:, :, hi], locs[:, hi])   # (N, dh)
                out = out.at[:, hi].add(
                    s.astype(jnp.float32) * w[:, hi, li, pi][:, None])
    return L.linear(params["output_proj"],
                    out.reshape(n, d).astype(query.dtype))


# ---------------------------------------------------------------------------
# fusion / enhancer / decoder blocks
# ---------------------------------------------------------------------------

def _mha(p, q_in, kv_in, heads, mask=None):
    n, d = q_in.shape[-2], q_in.shape[-1]
    single = q_in.ndim == 2
    if single:
        q_in, kv_in = q_in[None], kv_in[None]
    b = q_in.shape[0]
    m = kv_in.shape[1]
    q = L.linear(p["q"], q_in).reshape(b, -1, heads, d // heads) \
        .transpose(0, 2, 1, 3)
    k = L.linear(p["k"], kv_in).reshape(b, m, heads, d // heads) \
        .transpose(0, 2, 1, 3)
    v = L.linear(p["v"], kv_in).reshape(b, m, heads, d // heads) \
        .transpose(0, 2, 1, 3)
    out = L.attention(q, k, v, mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, -1, d)
    out = L.linear(p["o"], out)
    return out[0] if single else out


def _init_mha(key, d, dtype, kv_dim=None):
    ks = jax.random.split(key, 4)
    kv = kv_dim or d
    return {"q": L.init_linear(ks[0], d, d, dtype),
            "k": L.init_linear(ks[1], kv, d, dtype),
            "v": L.init_linear(ks[2], kv, d, dtype),
            "o": L.init_linear(ks[3], d, d, dtype)}


def _init_ffn(key, d, hidden, dtype):
    ks = jax.random.split(key, 2)
    return {"fc1": L.init_linear(ks[0], d, hidden, dtype),
            "fc2": L.init_linear(ks[1], hidden, d, dtype),
            "norm": L.init_layer_norm(d, dtype)}


def _ffn(p, x):
    return L.layer_norm(p["norm"],
                        x + L.linear(p["fc2"],
                                     jax.nn.relu(L.linear(p["fc1"], x))))


def init_dino(key, cfg: DINOConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 64 + (cfg.enc_layers + cfg.dec_layers) * 16))
    nxt = lambda: next(ks)
    d = cfg.hidden_dim
    lv = cfg.num_feature_levels

    enc = {}
    for i in range(cfg.enc_layers):
        enc[str(i)] = {
            "self_attn": init_deform_attn(nxt(), d, cfg.nheads, lv,
                                          cfg.n_points, dtype),
            "self_norm": L.init_layer_norm(d, dtype),
            "ffn": _init_ffn(nxt(), d, cfg.dim_feedforward, dtype),
            # text enhancer (self-attn over text)
            "text_attn": _init_mha(nxt(), d, dtype),
            "text_norm": L.init_layer_norm(d, dtype),
            "text_ffn": _init_ffn(nxt(), d, cfg.dim_feedforward, dtype),
            # bi-direction fusion
            "i2t_attn": _init_mha(nxt(), d, dtype),
            "t2i_attn": _init_mha(nxt(), d, dtype),
            "fusion_norm_img": L.init_layer_norm(d, dtype),
            "fusion_norm_txt": L.init_layer_norm(d, dtype),
        }

    dec = {}
    for i in range(cfg.dec_layers):
        dec[str(i)] = {
            "self_attn": _init_mha(nxt(), d, dtype),
            "self_norm": L.init_layer_norm(d, dtype),
            "text_cross": _init_mha(nxt(), d, dtype),
            "text_norm": L.init_layer_norm(d, dtype),
            "cross_attn": init_deform_attn(nxt(), d, cfg.nheads, lv,
                                           cfg.n_points, dtype),
            "cross_norm": L.init_layer_norm(d, dtype),
            "ffn": _init_ffn(nxt(), d, cfg.dim_feedforward, dtype),
        }

    swin_dims = [cfg.swin.stage_dim(i) for i in cfg.return_interm_indices]
    input_proj = {str(i): L.init_conv2d(nxt(), sd, d, 1, dtype)
                  for i, sd in enumerate(swin_dims)}
    # extra level: stride-2 conv on the coarsest feature
    input_proj[str(len(swin_dims))] = L.init_conv2d(
        nxt(), swin_dims[-1], d, 3, dtype)

    bbox_head = {
        "0": L.init_linear(nxt(), d, d, dtype),
        "1": L.init_linear(nxt(), d, d, dtype),
        "2": L.init_linear(nxt(), d, 4, dtype, zero=True),
    }
    return {
        "backbone": SW.init_swin(nxt(), cfg.swin, dtype),
        "bert": init_bert(nxt(), cfg.bert, dtype),
        "feat_map": L.init_linear(nxt(), cfg.bert.hidden, d, dtype),
        "input_proj": input_proj,
        "level_embed": jax.random.normal(nxt(), (lv, d), dtype) * 0.02,
        "encoder": enc,
        "decoder": dec,
        "enc_output": L.init_linear(nxt(), d, d, dtype),
        "enc_output_norm": L.init_layer_norm(d, dtype),
        "tgt_embed": jax.random.normal(nxt(), (cfg.num_queries, d),
                                       dtype) * 0.02,
        "bbox_embed": bbox_head,
        "ref_point_head": {
            "0": L.init_linear(nxt(), 2 * d, d, dtype),
            "1": L.init_linear(nxt(), d, d, dtype),
        },
    }


def _bbox_mlp(p, x):
    x = jax.nn.relu(L.linear(p["0"], x))
    x = jax.nn.relu(L.linear(p["1"], x))
    return L.linear(p["2"], x)


def _sine_pos_2d(shapes, d, temperature):
    """Flattened multi-scale sine position embeddings (sumHW, D)."""
    outs = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        dim = d // 4
        freq = temperature ** (2 * (np.arange(dim) // 2) / dim)
        ex = gx[..., None] * 2 * np.pi / freq
        ey = gy[..., None] * 2 * np.pi / freq
        pe = np.concatenate([
            np.stack([np.sin(ex[..., 0::2]), np.cos(ex[..., 1::2])],
                     -1).reshape(h, w, -1),
            np.stack([np.sin(ey[..., 0::2]), np.cos(ey[..., 1::2])],
                     -1).reshape(h, w, -1)], axis=-1)
        outs.append(pe.reshape(h * w, -1))
    pe = np.concatenate(outs, axis=0)
    if pe.shape[1] < d:
        pe = np.pad(pe, ((0, 0), (0, d - pe.shape[1])))
    return jnp.asarray(pe[:, :d], jnp.float32)


def _box_sine_embed(boxes, d, temperature=10000.0):
    """(N, 4) sigmoid-space cxcywh -> (N, 2D) sine embedding (cx, cy)."""
    dim = d // 2
    freq = temperature ** (2 * (jnp.arange(dim) // 2) / dim)
    out = []
    for i in range(4):
        e = boxes[:, i:i + 1] * 2 * np.pi / freq
        out.append(jnp.concatenate([jnp.sin(e[:, 0::2]),
                                    jnp.cos(e[:, 1::2])], axis=-1))
    return jnp.concatenate(out, axis=-1)[:, :2 * d]


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def dino_forward(params, cfg: DINOConfig, pixels, text_ids, text_mask):
    """pixels (1, H, W, 3) normalized; text_ids/mask (1, T).

    Returns dict(logits (Q, T), boxes (Q, 4) normalized cxcywh)."""
    d = cfg.hidden_dim

    # text
    txt = bert_apply(params["bert"], cfg.bert, text_ids, text_mask)[0]
    txt = L.linear(params["feat_map"], txt)                  # (T, D)
    tmask = text_mask[0]                                     # (T,)

    # image pyramid
    swin_feats = SW.apply(params["backbone"], cfg.swin, pixels)
    feats = [swin_feats[f"swin{i}"] for i in cfg.return_interm_indices]
    srcs = [L.conv2d(params["input_proj"][str(i)], f, padding=0)
            for i, f in enumerate(feats)]
    extra = L.conv2d(params["input_proj"][str(len(feats))], feats[-1],
                     stride=2, padding=[(1, 1), (1, 1)])
    srcs.append(extra)

    shapes = [(s.shape[1], s.shape[2]) for s in srcs]
    flat = jnp.concatenate(
        [s[0].reshape(-1, d) + params["level_embed"][i][None]
         for i, s in enumerate(srcs)], axis=0)               # (sumHW, D)
    pos = _sine_pos_2d(shapes, d, cfg.pe_temperature)

    # per-token reference points: own normalized center at every level
    centers = []
    for h, w in shapes:
        ys = (jnp.arange(h) + 0.5) / h
        xs = (jnp.arange(w) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        centers.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    centers = jnp.concatenate(centers, axis=0)               # (sumHW, 2)
    ref_pts = jnp.broadcast_to(centers[:, None],
                               (centers.shape[0], len(shapes), 2))

    # encoder: deformable img self-attn + text enhancer + fusion
    img = flat
    key_mask = tmask[None, None, None, :]
    for i in range(cfg.enc_layers):
        lp = params["encoder"][str(i)]
        # bi-direction fusion (image<->text cross-attention)
        i2t = _mha(lp["i2t_attn"], img, txt, cfg.nheads, mask=key_mask)
        t2i = _mha(lp["t2i_attn"], txt, img, cfg.nheads)
        img = L.layer_norm(lp["fusion_norm_img"], img + i2t)
        txt = L.layer_norm(lp["fusion_norm_txt"], txt + t2i)
        # text enhancer
        te = _mha(lp["text_attn"], txt, txt, cfg.nheads, mask=key_mask)
        txt = L.layer_norm(lp["text_norm"], txt + te)
        txt = _ffn(lp["text_ffn"], txt)
        # deformable image self-attention
        sa = deform_attn(lp["self_attn"], img + pos, ref_pts, img, shapes,
                         heads=cfg.nheads, points=cfg.n_points)
        img = L.layer_norm(lp["self_norm"], img + sa)
        img = _ffn(lp["ffn"], img)

    # language-guided query selection (two_stage 'standard')
    mem = L.layer_norm(params["enc_output_norm"],
                       L.linear(params["enc_output"], img))
    cls_all = mem @ txt.T                                    # (sumHW, T)
    cls_all = jnp.where(tmask[None], cls_all, -1e4)
    sel_scores = jnp.max(cls_all, axis=-1)
    q = cfg.num_queries
    _, top_idx = jax.lax.top_k(sel_scores, q)
    # initial proposals: selected token centers with a size prior, refined
    # by the (shared) box head in inverse-sigmoid space
    proposals = jnp.concatenate([centers[top_idx],
                                 jnp.full((q, 2), 0.1)], axis=-1)
    ref_boxes = jax.nn.sigmoid(_bbox_mlp(params["bbox_embed"], mem[top_idx])
                               + _inverse_sigmoid(proposals))
    tgt = params["tgt_embed"]                                # (Q, D)

    # decoder
    x = tgt
    boxes = ref_boxes
    for i in range(cfg.dec_layers):
        lp = params["decoder"][str(i)]
        query_sine = _box_sine_embed(boxes, d)
        qpos = L.linear(params["ref_point_head"]["1"], jax.nn.relu(
            L.linear(params["ref_point_head"]["0"], query_sine)))
        sa = _mha(lp["self_attn"], x + qpos, x + qpos, cfg.nheads)
        x = L.layer_norm(lp["self_norm"], x + sa)
        tc = _mha(lp["text_cross"], x, txt, cfg.nheads, mask=key_mask)
        x = L.layer_norm(lp["text_norm"], x + tc)
        refs = jnp.broadcast_to(boxes[:, None, :2],
                                (q, len(shapes), 2))
        ca = deform_attn(lp["cross_attn"], x + qpos, refs, img, shapes,
                         heads=cfg.nheads, points=cfg.n_points)
        x = L.layer_norm(lp["cross_norm"], x + ca)
        x = _ffn(lp["ffn"], x)
        # iterative box refinement
        boxes = jax.nn.sigmoid(_bbox_mlp(params["bbox_embed"], x)
                               + _inverse_sigmoid(boxes))

    logits = x @ txt.T                                       # (Q, T)
    logits = jnp.where(tmask[None], logits, -1e4)
    return {"logits": logits, "boxes": boxes}


# ---------------------------------------------------------------------------
# host-side predict (groundingdino.util.inference.predict semantics)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class GroundingDINODetector:
    """detect(image, caption) -> (boxes xyxy pixels, scores, phrases),
    thresholds per sam2groundingdino_edit.py:130 (0.25/0.25)."""

    def __init__(self, params, cfg: DINOConfig, tokenizer, *,
                 box_threshold: float = 0.25, text_threshold: float = 0.25,
                 short_side: int = 800, max_side: int = 1333):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        self.short_side = short_side
        self.max_side = max_side
        self._fwd = jax.jit(lambda p, x, ids, m: dino_forward(
            p, cfg, x, ids, m))

    def __call__(self, image: np.ndarray, caption: str):
        from PIL import Image
        caption = caption.lower().strip()
        if not caption.endswith("."):
            caption = caption + "."
        h, w = image.shape[:2]
        scale = min(self.short_side / min(h, w), self.max_side / max(h, w))
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        px = np.asarray(Image.fromarray(image).resize(
            (nw, nh), Image.BILINEAR), np.float32) / 255.0
        px = (px - IMAGENET_MEAN) / IMAGENET_STD

        t = self.cfg.max_text_len
        ids, mask, tokens = self.tokenizer.encode_padded(caption, t)
        out = jax.device_get(self._fwd(
            self.params, px[None], jnp.asarray(ids)[None],
            jnp.asarray(mask)[None]))
        probs = 1.0 / (1.0 + np.exp(-out["logits"]))        # (Q, T)
        scores = probs.max(axis=1)
        keep = scores > self.box_threshold
        boxes_n = out["boxes"][keep]
        kept_probs = probs[keep]
        # cxcywh normalized -> xyxy pixels in the ORIGINAL frame
        cx, cy, bw, bh = [boxes_n[:, i] for i in range(4)]
        boxes = np.stack([(cx - bw / 2) * w, (cy - bh / 2) * h,
                          (cx + bw / 2) * w, (cy + bh / 2) * h], axis=-1)
        phrases = []
        for row in kept_probs:
            sel = [tokens[i] for i in np.nonzero(
                row > self.text_threshold)[0] if i < len(tokens)]
            phrases.append(" ".join(s for s in sel
                                    if s not in ("[CLS]", "[SEP]", ".")))
        return boxes, scores[keep], phrases
