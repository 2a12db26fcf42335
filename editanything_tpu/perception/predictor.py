"""Interactive SAM predictor — cached embedding + point/box prompts.

Serves the reference's click-to-segment flow (`SamPredictor.set_image` +
`predict(point_coords, point_labels, multimask_output=False)`,
/root/reference/editany_lora.py:527-543, and box prompts
sam2vlpart_edit.py:150-159 `predict_torch(boxes=...)`).

TPU design: `set_image` runs the ViT encoder once and caches the embedding
(the reference re-encodes per image too, :531); `predict` is a tiny jitted
decoder call — interactive clicks cost ~ms, not an encoder pass. Points are
padded to a fixed slot count so repeated clicks never retrace.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.models import sam as SAM

MAX_POINTS = 16     # fixed prompt slots: no retrace as clicks accumulate


class SamPredictor:
    """Stateful convenience wrapper over pure jitted functions."""

    def __init__(self, params, cfg: SAM.SAMConfig):
        self.params = params
        self.cfg = cfg
        self._embedding = None
        self._input_hw: Optional[Tuple[int, int]] = None
        self._orig_hw: Optional[Tuple[int, int]] = None

        @jax.jit
        def _encode(params, image):
            return SAM.image_encoder(params["image_encoder"], cfg, image)

        @functools.partial(jax.jit, static_argnames=("multimask",))
        def _predict(params, embedding, coords, labels, multimask):
            image_pe = SAM.dense_positional_encoding(
                params["prompt_encoder"], cfg)
            sparse = SAM.encode_points(params["prompt_encoder"], cfg,
                                       coords[None], labels[None])
            dense = SAM.no_mask_dense_embedding(params["prompt_encoder"],
                                                cfg, 1)
            masks, iou = SAM.mask_decoder(params["mask_decoder"], cfg,
                                          embedding, image_pe, sparse, dense)
            if multimask:
                return masks[0, 1:4], iou[0, 1:4]
            return masks[0, 0:1], iou[0, 0:1]

        self._encode_fn = _encode
        self._predict_fn = _predict

    # -- reference-compatible API ------------------------------------------

    def set_image(self, image: np.ndarray):
        """image: (H, W, 3) uint8. Resizes long side to img_size, pads,
        encodes once."""
        h, w = image.shape[:2]
        self._orig_hw = (h, w)
        scale = self.cfg.img_size / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        from PIL import Image
        resized = np.asarray(
            Image.fromarray(image).resize((nw, nh), Image.BILINEAR))
        self._input_hw = (nh, nw)
        x = SAM.preprocess(jnp.asarray(resized), self.cfg)
        self._embedding = self._encode_fn(self.params, x)

    def _transform_points(self, coords):
        h, w = self._orig_hw
        nh, nw = self._input_hw
        return coords.astype(np.float32) * np.array([nw / w, nh / h],
                                                    np.float32)

    def predict(self, point_coords=None, point_labels=None, box=None,
                multimask_output: bool = True):
        """Returns (masks (K, H_orig, W_orig) bool, iou (K,), lowres logits)."""
        assert self._embedding is not None, "call set_image first"
        coords = np.zeros((MAX_POINTS, 2), np.float32)
        labels = np.full((MAX_POINTS,), -1, np.int32)
        n = 0
        if point_coords is not None:
            pts = self._transform_points(np.asarray(point_coords))
            k = len(pts)
            coords[:k] = pts
            labels[:k] = np.asarray(point_labels, np.int32)
            n += k
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(2, 2)
            bx = self._transform_points(bx)
            coords[n:n + 2] = bx
            labels[n:n + 2] = (2, 3)
            n += 2
        masks, iou = self._predict_fn(self.params, self._embedding,
                                      jnp.asarray(coords),
                                      jnp.asarray(labels),
                                      multimask_output)
        masks = np.asarray(self._upscale(masks))
        return masks > 0.0, np.asarray(iou), masks

    def _upscale(self, lowres):
        """(K, 256, 256) logits -> (K, H_orig, W_orig), matching the torch
        postprocess: resize to padded 1024, crop the unpadded region,
        resize to the original size."""
        from editanything_tpu.perception.amg import upscale_masks
        k = lowres.shape[0]
        s = self.cfg.img_size
        nh, nw = self._input_hw
        oh, ow = self._orig_hw
        # separable-matmul bilinear (amg.upscale_masks): identical weights
        # to jax.image.resize without its gather lowering
        up = upscale_masks(lowres, (s, s))
        up = up[:, :nh, :nw]
        return upscale_masks(up, (oh, ow))
