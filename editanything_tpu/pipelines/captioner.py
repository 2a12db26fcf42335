"""BLIP2 auto-captioning + region-level semantic labels.

Behavioral spec:
- auto prompt: /root/reference/editany_lora.py:512-520 `get_blip2_text`
  (fp16, `generate(max_new_tokens=50)`, strip) prepended to the user
  prompt ("BLIP2 prompt: ..." :751-758)
- region labels: /root/reference/sam2semantic.py:60-146 — rank SAM masks
  by area, crop each region with padding, BLIP2 "what is this?"
  classification (max_new_tokens=15), labeled overlay

TPU design: decode loops are compiled scans (models/blip2.py); region
crops are resized to the fixed 224^2 vision input and batched through ONE
captioner call instead of the reference's per-region Python loop.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.models import blip2 as B

# CLIP-style normalization used by BLIP2's vision tower
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images_uint8: np.ndarray, image_size: int) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> normalized (B, S, S, 3) float."""
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    b = x.shape[0]
    x = jax.image.resize(x, (b, image_size, image_size, 3),
                         method="bicubic")
    return (x - _MEAN) / _STD


class Captioner:
    """Greedy BLIP2 captioner with compiled decode."""

    def __init__(self, params, cfg: B.BLIP2Config, tokenizer,
                 *, prompt: str = "", max_new_tokens: int = 50):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.prompt_ids = [tokenizer.bos_id] + tokenizer.encode(prompt) \
            if prompt else [tokenizer.bos_id]
        self.fn = jax.jit(B.make_caption_fn(
            cfg, prompt_len=len(self.prompt_ids),
            max_new_tokens=max_new_tokens))

    def __call__(self, images_uint8: np.ndarray) -> List[str]:
        """(B, H, W, 3) uint8 -> list of caption strings."""
        px = preprocess(images_uint8, self.cfg.image_size)
        b = px.shape[0]
        prompt = jnp.broadcast_to(
            jnp.asarray(self.prompt_ids, jnp.int32)[None],
            (b, len(self.prompt_ids)))
        toks = np.asarray(jax.device_get(self.fn(self.params, px, prompt)))
        outs = []
        for row in toks:
            keep = row[row != self.cfg.eos_token_id]
            outs.append(self.tokenizer.decode(keep).strip())
        return outs


def rank_and_crop_regions(image_uint8: np.ndarray,
                          masks: np.ndarray, valid: np.ndarray,
                          areas: np.ndarray, *, top_k: int = 10,
                          pad: int = 8) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Rank masks by area (desc) and crop padded bounding boxes
    (sam2semantic.py:73-98 semantics). Returns (indices, crops)."""
    order = np.argsort(-np.where(np.asarray(valid), np.asarray(areas), -1))
    h, w = image_uint8.shape[:2]
    idxs, crops = [], []
    for i in order[:top_k]:
        if not valid[i]:
            break
        m = np.asarray(masks[i])
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            continue
        y0, y1 = max(ys.min() - pad, 0), min(ys.max() + pad + 1, h)
        x0, x1 = max(xs.min() - pad, 0), min(xs.max() + pad + 1, w)
        idxs.append(int(i))
        crops.append(image_uint8[y0:y1, x0:x1])
    return np.asarray(idxs), crops


def semantic_labels(image_uint8: np.ndarray, masks: np.ndarray,
                    valid: np.ndarray, areas: np.ndarray,
                    captioner: Captioner, *, top_k: int = 10
                    ) -> List[Tuple[int, str]]:
    """Region-level semantics: (mask index, label) for the top_k largest
    regions — all crops batched through ONE captioner call (the reference
    loops BLIP2 per region, sam2semantic.py:84-97)."""
    idxs, crops = rank_and_crop_regions(image_uint8, masks, valid, areas,
                                        top_k=top_k)
    if len(crops) == 0:
        return []
    s = captioner.cfg.image_size
    batch = np.stack([
        np.asarray(jax.image.resize(jnp.asarray(c, jnp.float32),
                                    (s, s, 3), method="bilinear"))
        for c in crops]).astype(np.uint8)
    labels = captioner(batch)
    return list(zip(idxs.tolist(), labels))
