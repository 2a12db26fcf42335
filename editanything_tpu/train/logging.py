"""Training observability: metric logging, sample-grid images, profiling.

Behavioral spec (SURVEY.md section 5): the reference logs
loss_simple/loss_vlb/lr through Lightning (`ddpm.py:442-452`) and dumps
DDIM sample grids every 300 steps via `ImageLogger`
(/root/reference/cldm/logger.py:11-76, @rank_zero_only). The reference has
no tracing/profiling at all; here `profile_steps` wraps a step range in a
jax.profiler trace (TensorBoard-viewable).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    """JSONL metric stream + stdout, host-process 0 only (the
    @rank_zero_only equivalent; with jax there is one controller process
    per host, and multi-host callers gate on jax.process_index())."""

    def __init__(self, log_dir: str, *, every: int = 10,
                 is_main: Optional[bool] = None):
        import jax
        self.is_main = (jax.process_index() == 0) if is_main is None \
            else is_main
        self.every = every
        self.path = os.path.join(log_dir, "metrics.jsonl")
        if self.is_main:
            os.makedirs(log_dir, exist_ok=True)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict) -> None:
        if not self.is_main or step % self.every != 0:
            return
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(" ".join(f"{k}={v}" for k, v in rec.items()), flush=True)


class ImageLogger:
    """Sample-grid dumps every N steps (cldm/logger.py:11-76 semantics:
    inputs / reconstructions / samples saved as one PNG grid)."""

    def __init__(self, log_dir: str, *, every: int = 300, max_images: int = 4,
                 is_main: Optional[bool] = None):
        import jax
        self.is_main = (jax.process_index() == 0) if is_main is None \
            else is_main
        self.dir = os.path.join(log_dir, "images")
        self.every = every
        self.max_images = max_images
        if self.is_main:
            os.makedirs(self.dir, exist_ok=True)

    def maybe_log(self, step: int, images: Dict[str, np.ndarray]) -> bool:
        """images: name -> (B, H, W, 3) in [-1, 1] or [0, 1]."""
        if not self.is_main or step % self.every != 0:
            return False
        from PIL import Image
        for name, batch in images.items():
            arr = np.asarray(batch)[:self.max_images]
            if arr.min() < -0.01:                    # [-1, 1] -> [0, 1]
                arr = (arr + 1.0) / 2.0
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            grid = np.concatenate(list(arr), axis=1)  # horizontal strip
            Image.fromarray(grid).save(
                os.path.join(self.dir, f"{name}_{step:08d}.png"))
        return True


@contextlib.contextmanager
def profile_steps(log_dir: str, *, enabled: bool = True):
    """jax.profiler trace around a step range; view in TensorBoard.
    (The reference ships no profiler at all — SURVEY.md section 5.)"""
    import jax
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
