"""Host-side image-folder loading for the finetune trainers.

Behavioral spec: the reference's DreamBoothDataset
(/root/reference/tools/train_dreambooth_inpaint.py:84-160) and
TextualInversionDataset (/root/reference/utils/texutal_inversion.py:477-560)
both load a flat directory of images, optionally center-crop to square,
resize to `resolution` (bicubic), random-horizontal-flip, and normalize to
[-1, 1]. Host-side numpy only; batches feed jitted VAE/CLIP preprocessors.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
from PIL import Image

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_images(directory: str) -> List[str]:
    return sorted(
        os.path.join(directory, n) for n in os.listdir(directory)
        if n.lower().endswith(IMAGE_EXTS))


class ImageFolder:
    """Indexable folder of images -> (resolution, resolution, 3) float
    arrays in [-1, 1] with the reference's crop/flip augmentation."""

    def __init__(self, directory: str, *, resolution: int = 512,
                 center_crop: bool = False, flip_p: float = 0.5,
                 seed: int = 0):
        self.paths = list_images(directory)
        if not self.paths:
            raise FileNotFoundError(f"no images in {directory}")
        self.resolution = resolution
        self.center_crop = center_crop
        self.flip_p = flip_p
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = Image.open(self.paths[idx % len(self.paths)]).convert("RGB")
        arr = np.asarray(img, np.uint8)
        if self.center_crop:
            h, w = arr.shape[:2]
            c = min(h, w)
            arr = arr[(h - c) // 2:(h + c) // 2, (w - c) // 2:(w + c) // 2]
        img = Image.fromarray(arr).resize(
            (self.resolution, self.resolution), Image.BICUBIC)
        arr = np.asarray(img, np.float32)
        if self._rng.uniform() < self.flip_p:
            arr = arr[:, ::-1]
        return arr / 127.5 - 1.0

    def sample_batch(self, batch_size: int) -> np.ndarray:
        """(B, R, R, 3) float [-1, 1], images drawn with replacement."""
        idx = self._rng.randint(0, len(self.paths), size=batch_size)
        return np.stack([self[i] for i in idx])
