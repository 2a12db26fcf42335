"""Shared detection ops: anchors, box transforms, ROIAlign, fixed-shape NMS.

Behavioral spec: detectron2's ops as consumed by the reference's VLPart
(/root/reference/vlpart/vlpart_roi_heads.py:12-28 imports ROIPooler,
Box2BoxTransform, batched_nms, Matcher; anchors per vlpart/vlpart.py:34-36).
All re-implemented XLA-native with fixed shapes (SURVEY.md section 2.9:
detectron2's C++/CUDA NMS + ROIAlign -> sorted-candidate masked NMS +
gather/bilinear pooling).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.perception.amg import greedy_nms  # exact greedy NMS


# ---------------------------------------------------------------------------
# anchors + box transform (detectron2 defaults)
# ---------------------------------------------------------------------------

def level_anchors(h: int, w: int, stride: int, size: float,
                  ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """(H*W*A, 4) xyxy anchors for one FPN level (detectron2
    DefaultAnchorGenerator: cell centers at (x+0.5)*stride)."""
    ws, hs = [], []
    area = size * size
    for r in ratios:
        aw = np.sqrt(area / r)
        ah = aw * r
        ws.append(aw)
        hs.append(ah)
    ws, hs = np.asarray(ws), np.asarray(hs)                  # (A,)
    sx = (np.arange(w) + 0.5) * stride
    sy = (np.arange(h) + 0.5) * stride
    cx, cy = np.meshgrid(sx, sy)                             # (H, W)
    cx = cx.reshape(-1, 1)
    cy = cy.reshape(-1, 1)
    boxes = np.stack([cx - ws / 2, cy - hs / 2, cx + ws / 2, cy + hs / 2],
                     axis=-1)                                # (HW, A, 4)
    return boxes.reshape(-1, 4).astype(np.float32)


def apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0),
                 scale_clamp: float = float(np.log(1000.0 / 16))):
    """Box2BoxTransform.apply_deltas (detectron2 semantics)."""
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.minimum(deltas[:, 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[:, 3] / wh, scale_clamp)
    pcx = dx * widths + ctr_x
    pcy = dy * heights + ctr_y
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - pw / 2, pcy - ph / 2,
                      pcx + pw / 2, pcy + ph / 2], axis=-1)


def clip_boxes(boxes, hw: Tuple[int, int]):
    h, w = hw
    return jnp.stack([
        jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
        jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], axis=-1)


# ---------------------------------------------------------------------------
# ROIAlign (aligned=True bilinear sampling, 2x2 samples per bin)
# ---------------------------------------------------------------------------

def roi_align(feat, boxes, *, out_size: int = 7, stride: int = 1,
              samples: int = 2):
    """feat (H, W, C); boxes (N, 4) xyxy pixels -> (N, out, out, C).

    detectron2 ROIAlignV2 semantics (aligned=True: -0.5 pixel offset),
    fixed `samples` points per bin axis (sampling_ratio=2), average-pooled.
    """
    h, w, c = feat.shape
    n = boxes.shape[0]
    b = boxes / stride
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-4)
    bh = jnp.maximum(y1 - y0, 1e-4)

    g = out_size * samples
    # sample centers: aligned=True continuous coords, offset -0.5
    steps = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = x0[:, None] + steps[None, :] * bw[:, None] - 0.5     # (N, G)
    ys = y0[:, None] + steps[None, :] * bh[:, None] - 0.5

    def bilinear(coords, size):
        c0 = jnp.clip(jnp.floor(coords), 0, size - 1)
        c1 = jnp.clip(c0 + 1, 0, size - 1)
        t = jnp.clip(coords - c0, 0.0, 1.0)
        return c0.astype(jnp.int32), c1.astype(jnp.int32), t

    xi0, xi1, tx = bilinear(xs, w)
    yi0, yi1, ty = bilinear(ys, h)

    # gather rows then columns: (N, G, W, C) would be huge; gather per-box
    # (N, G, G, C) via advanced indexing on the two grids
    def gather(yi, xi):
        return feat[yi[:, :, None], xi[:, None, :]]           # (N, G, G, C)

    f00 = gather(yi0, xi0)
    f01 = gather(yi0, xi1)
    f10 = gather(yi1, xi0)
    f11 = gather(yi1, xi1)
    fx0 = f00 * (1 - tx[:, None, :, None]) + f01 * tx[:, None, :, None]
    fx1 = f10 * (1 - tx[:, None, :, None]) + f11 * tx[:, None, :, None]
    vals = fx0 * (1 - ty[:, :, None, None]) + fx1 * ty[:, :, None, None]

    vals = vals.reshape(n, out_size, samples, out_size, samples, c)
    return vals.mean(axis=(2, 4))


def assign_fpn_level(boxes, *, min_level: int = 2, max_level: int = 5,
                     canonical_size: float = 224.0,
                     canonical_level: int = 4):
    """detectron2 assign_boxes_to_levels: floor(L0 + log2(sqrt(area)/224))."""
    area = jnp.maximum((boxes[:, 2] - boxes[:, 0])
                       * (boxes[:, 3] - boxes[:, 1]), 1e-6)
    lvl = jnp.floor(canonical_level
                    + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(feats: Dict[str, jnp.ndarray], boxes,
                         *, out_size: int = 7,
                         levels=("p2", "p3", "p4", "p5")):
    """ROIPooler over FPN levels: pool every box at every level, select by
    the level assignment (fixed-shape alternative to per-level gathers)."""
    lvl = assign_fpn_level(boxes)
    pooled = None
    for i, name in enumerate(levels):
        stride = 2 ** (i + 2)
        p = roi_align(feats[name][0], boxes, out_size=out_size,
                      stride=stride)
        sel = (lvl == i + 2).astype(p.dtype)[:, None, None, None]
        pooled = p * sel if pooled is None else pooled + p * sel
    return pooled
