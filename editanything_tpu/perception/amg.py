"""SAM automatic mask generation — fixed-shape, fully compiled.

Replaces `SamAutomaticMaskGenerator` (external pip package; driven at
/root/reference/editany_lora.py:522-525) with an XLA-native design
(SURVEY.md section 7 "hard parts" item 1):

- the 32x32 point grid is decoded in fixed batches under `lax.scan`
  (the torch version loops in Python over 64-point batches);
- quality filters (predicted IoU, stability score) are dense masks, not
  list filtering;
- NMS is exact greedy box-NMS over score-sorted fixed-size candidate
  tensors (a `lax.scan` over candidates, vectorized suppression per step);
- output is a fixed MAX_MASKS slab of 256^2 mask logits + validity flags,
  from which `encode_id_map` builds the reference's uint16 R=id%256 /
  G=id//256 ControlNet condition (editany_lora.py:426-449 `show_anns`,
  ids in candidate order starting at 1, later masks painted over earlier).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.models import sam as SAM


@dataclasses.dataclass(frozen=True)
class AMGConfig:
    points_per_side: int = 32
    points_per_batch: int = 256
    pred_iou_thresh: float = 0.88
    stability_score_thresh: float = 0.95
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.7
    mask_threshold: float = 0.0
    max_masks: int = 256          # fixed output slots after NMS

    @property
    def num_points(self) -> int:
        return self.points_per_side ** 2

    @property
    def num_candidates(self) -> int:
        return self.num_points * 3   # multimask outputs per point


def _grid_points(cfg: AMGConfig, h: int, w: int) -> np.ndarray:
    """Evenly spaced point grid over the (unpadded) image, pixel coords."""
    n = cfg.points_per_side
    offset = 1.0 / (2 * n)
    ticks = np.linspace(offset, 1.0 - offset, n)
    gx, gy = np.meshgrid(ticks * w, ticks * h)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)


def _mask_stats(logits, threshold, offset):
    """Per-candidate stability score, area, and bbox from (N, H, W) logits."""
    hi = jnp.sum((logits > threshold + offset), axis=(1, 2))
    lo = jnp.sum((logits > threshold - offset), axis=(1, 2))
    stability = hi.astype(jnp.float32) / jnp.maximum(lo, 1).astype(jnp.float32)

    mask = logits > threshold
    area = jnp.sum(mask, axis=(1, 2))

    h, w = logits.shape[1], logits.shape[2]
    rows = jnp.any(mask, axis=2)                     # (N, H)
    cols = jnp.any(mask, axis=1)                     # (N, W)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    big = jnp.asarray(10 ** 6)
    y0 = jnp.min(jnp.where(rows, ridx, big), axis=1)
    y1 = jnp.max(jnp.where(rows, ridx, -1), axis=1)
    x0 = jnp.min(jnp.where(cols, cidx, big), axis=1)
    x1 = jnp.max(jnp.where(cols, cidx, -1), axis=1)
    boxes = jnp.stack([x0, y0, x1 + 1, y1 + 1], axis=-1).astype(jnp.float32)
    return stability, area, boxes


def _box_iou(boxes):
    """(N, 4) xyxy -> (N, N) IoU matrix."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    x0 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y0 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x1 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y1 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def greedy_nms(boxes, scores, valid, iou_thresh):
    """Exact greedy NMS on fixed-size inputs. Returns keep flags (N,) bool.

    Score-sorted sequential suppression with vectorized suppression per
    step (matches torchvision.ops.nms order). The loop is a
    `lax.while_loop` bounded by the number of VALID candidates — invalid
    ones sort to the back and can never be kept, so stopping there is
    exact. In the AMG the quality filters typically pass a few hundred of
    3072 candidates, cutting the sequential chain ~10x."""
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou = _box_iou(boxes)[order][:, order]           # sorted IoU matrix
    valid_s = valid[order]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    def cond(carry):
        i, _, _ = carry
        return i < n_valid

    def body(carry):
        i, alive, kept = carry
        is_kept = alive[i] & valid_s[i]
        suppress = is_kept & (iou[i] > iou_thresh)
        suppress = suppress.at[i].set(False)
        return i + 1, alive & ~suppress, kept.at[i].set(is_kept)

    _, _, kept_sorted = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), jnp.ones((n,), bool),
                     jnp.zeros((n,), bool)))
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(kept_sorted)
    return keep & valid


def select_candidates(logits, iou, amg_cfg: AMGConfig):
    """The full post-decode selection chain on (C, H, W) candidate logits +
    (C,) predicted-IoU scores: quality filters -> greedy box NMS -> fixed
    max_masks slot compaction in candidate order (the reference paints masks
    in generation order, editany_lora.py:433-440). Pure function so the
    numpy-oracle equivalence test can drive it with arbitrary inputs."""
    c = logits.shape[0]
    stability, areas, boxes = _mask_stats(
        logits, amg_cfg.mask_threshold, amg_cfg.stability_score_offset)
    valid = (iou > amg_cfg.pred_iou_thresh) & \
            (stability > amg_cfg.stability_score_thresh) & (areas > 0)
    keep = greedy_nms(boxes, iou, valid, amg_cfg.box_nms_thresh)

    # compact to max_masks fixed slots, preserving candidate order
    slot_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep, slot_rank, c)          # c = overflow bin
    k = amg_cfg.max_masks
    # build via scatter: out[slot[i]] = i for kept i < k
    src = jnp.arange(c, dtype=jnp.int32)
    sel = jnp.full((k + 1,), -1, jnp.int32)
    sel = sel.at[jnp.clip(slot, 0, k)].set(src, mode="drop")
    sel = sel[:k]
    slot_valid = sel >= 0
    sel_safe = jnp.maximum(sel, 0)
    return {
        "logits": logits[sel_safe],
        "valid": slot_valid,
        "scores": jnp.where(slot_valid, iou[sel_safe], 0.0),
        "boxes": jnp.where(slot_valid[:, None], boxes[sel_safe], 0.0),
        "areas": jnp.where(slot_valid, areas[sel_safe], 0),
    }


def build_amg(sam_cfg: SAM.SAMConfig, amg_cfg: AMGConfig):
    """Returns jittable fns (encode_fn, generate_fn):

    encode_fn(params, image)  -> (1, 64, 64, 256) embedding
    generate_fn(params, embedding, points) ->
        dict(logits (C, 256, 256) [C=max_masks, low-res mask logits],
             valid (C,), scores (C,), boxes (C, 4), areas (C,))
    `points`: (num_points, 2) pixel coords in the 1024-space.
    """
    def encode_fn(params, image):
        return SAM.image_encoder(params["image_encoder"], sam_cfg, image)

    def decode_batch(params, embedding, image_pe, pts, twoway_packed):
        """pts (P, 2) -> per-candidate (3P, 256, 256) logits + scores."""
        p = pts.shape[0]
        coords = pts[:, None, :]                      # (P, 1, 2)
        labels = jnp.ones((p, 1), jnp.int32)
        sparse = SAM.encode_points(params["prompt_encoder"], sam_cfg,
                                   coords, labels)
        # batch-1 dense prompt: every grid point uses the no-mask embedding,
        # which routes the decode through the VMEM-resident two-way
        # transformer kernel (core/kernels.py sam_twoway)
        dense = SAM.no_mask_dense_embedding(params["prompt_encoder"],
                                            sam_cfg, 1)
        masks, iou = SAM.mask_decoder(params["mask_decoder"], sam_cfg,
                                      embedding, image_pe, sparse, dense,
                                      twoway_packed=twoway_packed)
        # multimask outputs: tokens 1..3 (token 0 is the single-mask head)
        return masks[:, 1:4], iou[:, 1:4]

    def generate_fn(params, embedding, points):
        image_pe = SAM.dense_positional_encoding(params["prompt_encoder"],
                                                 sam_cfg)
        n = points.shape[0]
        bs = amg_cfg.points_per_batch
        assert n % bs == 0, (n, bs)
        batches = points.reshape(n // bs, bs, 2)
        # hoist the kernel weight stacking out of the scan body (XLA does
        # not reliably LICM ~5-8 MB of copies out of while loops)
        from editanything_tpu.core.kernels import pack_twoway
        packed = pack_twoway(params["mask_decoder"]["transformer"])

        def body(_, pts):
            m, i = decode_batch(params, embedding, image_pe, pts, packed)
            return _, (m.reshape(-1, m.shape[-2], m.shape[-1]),
                       i.reshape(-1))

        _, (logits, iou) = jax.lax.scan(body, None, batches)
        c = n * 3
        logits = logits.reshape(c, logits.shape[-2], logits.shape[-1])
        iou = iou.reshape(c)
        return select_candidates(logits, iou, amg_cfg)

    return encode_fn, generate_fn


def _resize_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) bilinear interpolation weights, exactly
    jax.image.resize's triangle kernel along one axis: resize is linear and
    separable, so the matrix IS resize applied to the identity."""
    return jax.image.resize(jnp.eye(n_in, dtype=jnp.float32),
                            (n_out, n_in), method="bilinear")


def upscale_masks(logits, out_hw: Tuple[int, int]):
    """Bilinear-upscale a (C, h, w) mask-logit slab to (C, H, W) as two
    separable interpolation MATMULS instead of jax.image.resize's gathers.

    TPU rationale: resize lowers to gather chains that run at a few GB/s;
    the same linear map as matmuls rides the MXU (measured: 219 ms -> ~10 ms
    for 256 x 256^2 -> 1024^2). fp32 accumulation, identical weights
    (produced by resize itself on the identity), so results match
    jax.image.resize up to reassociation."""
    c, mh, mw = logits.shape
    ah = _resize_matrix(mh, out_hw[0])
    aw = _resize_matrix(mw, out_hw[1])
    up = jnp.einsum("cmn,wn->cmw", logits, aw.astype(logits.dtype),
                    preferred_element_type=jnp.float32)
    return jnp.einsum("hm,cmw->chw", ah, up,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw", "mask_threshold"))
def encode_id_map(logits, valid, *, out_hw: Tuple[int, int],
                  mask_threshold: float = 0.0):
    """Masks -> the ControlNet condition map (show_anns semantics,
    editany_lora.py:426-449): uint16 id painted in slot order starting at 1
    (later masks overwrite), encoded R=id%256, G=id//256, B=0.

    logits: (C, 256, 256); returns (H, W, 3) uint8 at out_hw (the caller
    resizes to the generation resolution with INTER_LINEAR just like the
    reference, :771-774).
    """
    c, mh, mw = logits.shape
    up = upscale_masks(logits, out_hw)
    masks = (up > mask_threshold) & valid[:, None, None]
    ids = jnp.arange(1, c + 1, dtype=jnp.uint16)[:, None, None]
    # later slots overwrite earlier: take the max id... no — LAST mask wins,
    # which for ordered ids equals the max id among covering masks
    id_map = jnp.max(jnp.where(masks, ids, 0), axis=0)   # (H, W) uint16
    r = (id_map % 256).astype(jnp.uint8)
    g = (id_map // 256).astype(jnp.uint8)
    b = jnp.zeros_like(r)
    return jnp.stack([r, g, b], axis=-1)
