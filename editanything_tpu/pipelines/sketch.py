"""Sketch -> image: per-color region IDs become the SAM-style condition map.

Behavioral spec: /root/reference/sketch2image.py:93-111 (`get_sam_control`:
each non-white canvas color becomes region id 1..K painted into a uint16 ID
map, encoded R=id%256 G=id//256; white = background => scale_map 0 so the
ControlNet exerts no force on unsketched area, :106-107,154) and
utils/sketch_helpers.py (high-frequency color extraction / similarity
merge / quantization for free-hand sketches).

These are host-side numpy ops; generation itself goes through
GenerationPipeline with `scale_map` (the per-pixel conditioning scale path
of ControlNetModel2, utils/stable_diffusion_controlnet.py:785-802).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from editanything_tpu.pipelines.generate import GenerationPipeline


def sketch_condition(image: np.ndarray,
                     colors: Optional[Sequence[Tuple[int, int, int]]] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """RGB sketch -> (condition_map uint8 (H, W, 3), scale_map float (H, W)).

    colors: palette in region order (non-white entries get ids 1..K); if
    None, the image's high-frequency colors are used (sketch_helpers
    semantics). White pixels get scale 0 (sketch2image.py:106-107).
    """
    arr = np.asarray(image, np.uint8)
    h, w = arr.shape[:2]
    if colors is None:
        colors = high_freq_colors(arr)
    id_map = np.zeros((h, w), np.uint16)
    ptr = 0
    for color in colors:
        r, g, b = color
        if (r, g, b) == (255, 255, 255):
            continue
        match = np.all(arr == np.array([r, g, b], np.uint8), axis=-1)
        ptr += 1
        id_map[match] = ptr
    white = np.all(arr == 255, axis=-1)
    scale_map = (~white).astype(np.float32)
    cond = np.zeros((h, w, 3), np.uint8)
    cond[..., 0] = (id_map % 256).astype(np.uint8)
    cond[..., 1] = (id_map // 256).astype(np.uint8)
    return cond, scale_map


def color_distance(c1, c2) -> float:
    return float(sum((a - b) ** 2 for a, b in zip(c1, c2)) ** 0.5)


def opaque_color_on_white(color, a: float):
    """Color at alpha `a` composited on white
    (sketch_helpers.py:80-84)."""
    return tuple(int((1 - a) * 255 + a * c) for c in color)


def high_freq_colors(arr: np.ndarray,
                     similarity_threshold: float = 30.0
                     ) -> List[Tuple[int, int, int]]:
    """Frequent colors with near-duplicate merging
    (sketch_helpers.py:9-33 semantics, numpy instead of PIL loops)."""
    flat = arr.reshape(-1, 3)
    uniq, counts = np.unique(flat, axis=0, return_counts=True)
    order = np.argsort(-counts)
    uniq, counts = uniq[order], counts[order]
    mean_freq = counts.mean()
    keep = counts > max(2, mean_freq * 1.25)
    cands = [tuple(int(v) for v in c) for c in uniq[keep]]
    freqs = list(counts[keep])
    # merge similar colors into the more frequent one
    merged: List[Tuple[int, int, int]] = []
    for i, c in enumerate(cands):
        dominated = any(
            (color_distance(c, other) < similarity_threshold
             or color_distance(c, opaque_color_on_white(other, 0.5)) < 5)
            and freqs[j] > freqs[i]
            for j, other in enumerate(cands) if j != i)
        if not dominated:
            merged.append(c)
    return merged


def quantize_to_palette(arr: np.ndarray,
                        palette: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """Pixels not in the palette become white
    (sketch_helpers.py:36-49 `color_quantization`)."""
    out = np.full_like(arr, 255)
    pal = np.array(list(palette), np.uint8)          # (K, 3)
    mask = np.any(np.all(arr[:, :, None, :] == pal[None, None], axis=-1),
                  axis=-1)
    out[mask] = arr[mask]
    return out


class SketchPipeline:
    """sketch2image.py process() semantics on top of GenerationPipeline."""

    def __init__(self, bundle, controlnet: str = "sam"):
        self.gen = GenerationPipeline(bundle, controlnet=controlnet)

    def __call__(self, *, sketch: np.ndarray, prompt: str,
                 colors: Optional[Sequence[Tuple[int, int, int]]] = None,
                 use_scale_map: bool = True,
                 control_scale: float = 1.0, **kwargs) -> np.ndarray:
        cond, scale_map = sketch_condition(sketch, colors)
        return self.gen(prompt=prompt, condition_image=cond,
                        control_scale=control_scale,
                        scale_map=scale_map if use_scale_map else None,
                        **kwargs)
