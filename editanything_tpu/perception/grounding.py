"""Text-grounded masks: detector boxes -> SAM masks -> clean union mask.

Behavioral spec: /root/reference/sam2vlpart_edit.py:119-178 (`prompt2mask`
with VLPart part boxes, score filter 0.7, SAM box prompts, 400px hole
removal) and sam2groundingdino_edit.py:130-201 (GroundingDINO variant:
box/text thresholds 0.25, top-2 boxes). `remove_small_regions` re-implements
segment_anything.utils.amg.remove_small_regions (cv2 connected components)
with scipy.ndimage.

The detector is a pluggable callable (`detect(image, text) -> boxes,
scores, labels`) so the edit flow ships independently of the detection
models (SURVEY.md section 7 'hard parts' item 6: keep the prompt2mask seam).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Protocol, Sequence, Tuple

import numpy as np
from scipy import ndimage

from editanything_tpu.perception.predictor import SamPredictor


class Detector(Protocol):
    def __call__(self, image: np.ndarray, text: str
                 ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        """image uint8 (H, W, 3), text prompt ->
        (boxes (N, 4) xyxy pixels, scores (N,), labels list)."""
        ...


def remove_small_regions(mask: np.ndarray, area_thresh: float,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """segment_anything.utils.amg.remove_small_regions semantics:
    mode='holes' fills holes < area_thresh; mode='islands' removes
    connected components < area_thresh."""
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask.astype(bool)).astype(np.uint8)
    regions, n_labels = ndimage.label(working, structure=np.ones((3, 3)))
    sizes = ndimage.sum_labels(working, regions,
                               index=np.arange(1, n_labels + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask.astype(bool), False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels + 1) if i not in fill]
        if not fill:
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


def prompt2mask(detector: Detector, sam_predictor: SamPredictor,
                image: np.ndarray, text_prompt: str, *,
                score_thresh: float = 0.7,
                union_score_thresh: float = 0.5,
                max_boxes: Optional[int] = None,
                small_region_area: float = 400.0) -> np.ndarray:
    """Text -> union binary mask (H, W, 3) uint8 {0, 255}
    (sam2vlpart_edit.py:119-178 flow)."""
    h, w = image.shape[:2]
    boxes, scores, _ = detector(image, text_prompt)
    keep = np.asarray(scores) >= score_thresh
    boxes = np.asarray(boxes)[keep]
    scores = np.asarray(scores)[keep]
    if max_boxes is not None and len(boxes) > max_boxes:
        order = np.argsort(-scores)[:max_boxes]
        boxes, scores = boxes[order], scores[order]

    final = np.zeros((h, w), bool)
    if len(boxes) > 0:
        sam_predictor.set_image(image)
        for box, score in zip(boxes, scores):
            if score < union_score_thresh:
                continue
            masks, _, _ = sam_predictor.predict(box=box,
                                                multimask_output=False)
            m = masks[0]
            m, _ = remove_small_regions(m, small_region_area, mode="holes")
            final |= m
    out = final.astype(np.uint8) * 255
    return np.dstack([out, out, out])


class TextGuidedEditPipeline:
    """Text-described region edit (sam2vlpart_edit.py:181-238 /
    sam2groundingdino_edit.py:204-262): prompt2mask -> SAM condition ->
    single-control inpaint."""

    def __init__(self, editor, detector: Detector, **prompt2mask_kw):
        self.editor = editor
        self.detector = detector
        self.kw = prompt2mask_kw

    def __call__(self, *, image: np.ndarray, mask_prompt: str,
                 prompt: str, **process_kw):
        mask = prompt2mask(self.detector, self.editor.sam_predictor,
                           image, mask_prompt, **self.kw)
        return self.editor.process(image=image, mask=mask[..., 0],
                                   prompt=prompt, **process_kw)
