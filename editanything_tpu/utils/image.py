"""Host-side image utilities (numpy/PIL — these run on CPU, not TPU).

Behavioral spec: /root/reference/annotator/util.py:9-73 (`HWC3`,
`resize_image`, `resize_points`, `get_bounding_box`). The reference uses
cv2; this image has PIL, and the semantics are preserved:

- `resize_image`: scale so the SHORT side hits `resolution`, then round both
  sides to the nearest multiple of 64 (the UNet/VAE stride constraint);
  LANCZOS when upscaling, area-style (PIL BOX reducing filter) when
  downscaling (reference :28-38 uses INTER_LANCZOS4 / INTER_AREA).
- `get_bounding_box` keeps the reference's exact (odd) axis convention
  (:57-73): rows = any over axis 0, cols = any over axis 1, returned as
  [rmin, cmin, rmax, cmax] — i.e. x from column-reduction of axis 0.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image


def HWC3(x: np.ndarray) -> np.ndarray:
    """uint8 gray/RGB/RGBA -> RGB; alpha composited over white
    (reference annotator/util.py:9-25)."""
    assert x.dtype == np.uint8
    if x.ndim == 2:
        x = x[:, :, None]
    assert x.ndim == 3
    c = x.shape[2]
    assert c in (1, 3, 4)
    if c == 3:
        return x
    if c == 1:
        return np.concatenate([x, x, x], axis=2)
    color = x[:, :, 0:3].astype(np.float32)
    alpha = x[:, :, 3:4].astype(np.float32) / 255.0
    y = color * alpha + 255.0 * (1.0 - alpha)
    return y.clip(0, 255).astype(np.uint8)


def resize_image(input_image: np.ndarray, resolution: int) -> np.ndarray:
    """Short side -> `resolution`; H and W rounded to multiples of 64
    (reference annotator/util.py:28-38)."""
    h0, w0 = input_image.shape[:2]
    k = float(resolution) / min(h0, w0)
    h = int(np.round(h0 * k / 64.0)) * 64
    w = int(np.round(w0 * k / 64.0)) * 64
    resample = Image.LANCZOS if k > 1 else Image.BOX
    img = Image.fromarray(input_image)
    return np.asarray(img.resize((w, h), resample))


def resize_points(clicked_points: Sequence[Tuple[int, int, int]],
                  original_shape: Tuple[int, ...],
                  resolution: int) -> List[Tuple[int, int, int]]:
    """Scale (x, y, label) click coords with the short-side resize
    (reference annotator/util.py:40-55)."""
    oh, ow = original_shape[0], original_shape[1]
    scale = float(resolution) / min(float(oh), float(ow))
    return [(int(round(x * scale)), int(round(y * scale)), lab)
            for (x, y, lab) in clicked_points]


def save_input_to_file(func):
    """Decorator pickling each call's args/kwargs to `input_data.pkl` for
    headless replay (reference annotator/util.py:77-95 +
    editany_nogradio.py; replay via `editanything-tpu replay`)."""
    import functools
    import pickle

    @functools.wraps(func)
    def wrapper(self, *args, **kwargs):
        result = func(self, *args, **kwargs)
        with open("input_data.pkl", "wb") as f:
            pickle.dump({"args": args, "kwargs": kwargs}, f)
        return result

    return wrapper


def get_bounding_box(mask) -> List[int]:
    """Mask -> [rmin, cmin, rmax, cmax], preserving the reference's
    swapped-axis convention exactly (annotator/util.py:57-73)."""
    mask = np.array(mask).astype(np.uint8)
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    rows = np.any(mask, axis=0)
    cols = np.any(mask, axis=1)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return [int(rmin), int(cmin), int(rmax), int(cmax)]
