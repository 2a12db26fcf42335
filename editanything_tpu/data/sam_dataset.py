"""SA-1B ControlNet training dataset — host-side numpy pipeline.

Behavioral spec: /root/reference/utils/sam_dataset.py (SAMDataset):
- data.txt lines are python dict literals {'target': jpg, 'source': json,
  'prompt': str} (the reference `eval`s them, :17; we literal_eval)
- the json is an SA-1B annotation file; every mask's COCO RLE is decoded
  and painted id=i+1 into a uint16 map (:34-52), encoded R=id%256,
  G=id//256 — here via the native single-pass codec (ops/rle.cc) instead
  of pycocotools + a Python paint loop
- paired aug (utils/transforms.py): RandomResizedCrop(512, scale (0.9, 1))
  bilinear for the image / NEAREST for the hint, RandomHorizontalFlip(0.5),
  image normalized to [-1, 1], hint left in [0, 1] (Normalize applies only
  to the image in their Compose, transforms.py:77-88)
- returns dict(jpg=(H, W, 3) float [-1,1], txt=str, hint=(H, W, 3) [0,1])

TPU notes: everything here is host-side; `make_batcher` runs a
thread-pooled prefetcher producing device-ready numpy batches (the
reference uses torch DataLoader workers).
"""

from __future__ import annotations

import ast
import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from editanything_tpu.ops import rle as rle_codec


def _random_resized_crop_params(rng: np.random.RandomState,
                                h: int, w: int,
                                scale=(0.9, 1.0),
                                ratio=(3. / 4., 4. / 3.)):
    """torchvision RandomResizedCrop.get_params semantics."""
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = rng.randint(0, h - ch + 1)
            left = rng.randint(0, w - cw + 1)
            return top, left, ch, cw
    # fallback: center crop at the clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


class SAMDataset:
    """Indexable dataset of (image, caption, SAM-ID-map hint) samples."""

    def __init__(self, data_path: str, txt_path: str, *,
                 resolution: int = 512, scale=(0.9, 1.0),
                 hflip_p: float = 0.5, seed: int = 0):
        self.data: List[Dict] = []
        with open(txt_path, "rt") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.data.append(ast.literal_eval(line))
        self.data_path = data_path
        self.resolution = resolution
        self.scale = scale
        self.hflip_p = hflip_p
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.data)

    def load_hint(self, json_path: str) -> np.ndarray:
        """Annotation json -> (H, W, 3) uint8 R/G-encoded ID map."""
        with open(json_path, "r", encoding="utf-8") as f:
            anno = json.load(f)
        h = int(anno["image"]["height"])
        w = int(anno["image"]["width"])
        rles = [a["segmentation"] for a in anno["annotations"]]
        idm = rle_codec.id_map(rles, h, w)
        out = np.zeros((h, w, 3), np.uint8)
        out[..., 0] = (idm % 256).astype(np.uint8)
        out[..., 1] = (idm // 256).astype(np.uint8)
        return out

    def __getitem__(self, idx: int) -> Dict:
        item = self.data[idx]
        target = np.asarray(Image.open(
            os.path.join(self.data_path, item["target"])).convert("RGB"))
        hint = self.load_hint(os.path.join(self.data_path, item["source"]))

        h, w = target.shape[:2]
        top, left, ch, cw = _random_resized_crop_params(
            self._rng, h, w, scale=self.scale)
        r = self.resolution
        img = Image.fromarray(target[top:top + ch, left:left + cw]) \
            .resize((r, r), Image.BILINEAR)
        hnt = Image.fromarray(hint[top:top + ch, left:left + cw]) \
            .resize((r, r), Image.NEAREST)
        img_a = np.asarray(img, np.float32)
        hnt_a = np.asarray(hnt, np.float32)
        if self._rng.rand() < self.hflip_p:
            img_a = img_a[:, ::-1]
            hnt_a = hnt_a[:, ::-1]
        jpg = img_a / 255.0 * 2.0 - 1.0          # Normalize(0.5, 0.5)
        hint_01 = hnt_a / 255.0                  # ToTensor only
        return dict(jpg=jpg.astype(np.float32), txt=item["prompt"],
                    hint=hint_01.astype(np.float32))


def make_batcher(dataset: SAMDataset, *, batch_size: int,
                 num_workers: int = 8, prefetch: int = 4,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True) -> Iterator[Dict]:
    """Thread-pooled prefetching batch iterator (one epoch).

    Yields dict(jpg=(B,H,W,3) f32, txt=list[str], hint=(B,H,W,3) f32).
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    n_batches = (len(order) // batch_size if drop_last
                 else -(-len(order) // batch_size))

    def gen():
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        SENTINEL = object()

        def worker(batch_ids_list):
            for ids in batch_ids_list:
                samples = [dataset[int(i)] for i in ids]
                q.put({
                    "jpg": np.stack([s["jpg"] for s in samples]),
                    "txt": [s["txt"] for s in samples],
                    "hint": np.stack([s["hint"] for s in samples]),
                })
            q.put(SENTINEL)

        batches = [order[i * batch_size:(i + 1) * batch_size]
                   for i in range(n_batches)]
        shards = [batches[i::num_workers] for i in range(num_workers)]
        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in shards if s]
        for t in threads:
            t.start()
        finished = 0
        while finished < len(threads):
            item = q.get()
            if item is SENTINEL:
                finished += 1
            else:
                yield item

    return gen()
