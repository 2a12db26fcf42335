"""Long-prompt embedding: 77-token windows, batched through CLIP in one call.

Behavioral spec: /root/reference/editany_lora.py:110-194
(`get_pipeline_embeds`) — tokenize prompt and negative prompt without
truncation, pad the shorter to the longer, encode in windows of the
encoder's 77-token context, concatenate window embeddings along the
sequence axis (so UNet cross-attention sees 77*W context tokens). Also
covers cldm/hack.py:23-68 (`hack_everything` 3x77 windowing + clip_skip).

TPU design: the reference loops windows through the text encoder
sequentially (:188-193); here all windows of both prompts ride the batch
axis through ONE jitted encoder call. Window count is rounded up to full
77-token windows (eos-padded) so shapes stay static per window-count
bucket — a causal encoder gives identical hidden states for the real
tokens, and the trailing eos context tokens are the standard
diffusers-community long-prompt recipe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.models import clip_text
from editanything_tpu.models.config import CLIPTextConfig


def window_ids(tokenizer, prompt: str, negative_prompt: str = "",
               max_windows: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize both prompts to (W, 77) int32 window grids (shared W)."""
    ctx = tokenizer.context_length
    p = tokenizer.encode(prompt)
    n = tokenizer.encode(negative_prompt)
    # one BOS + one EOS around the whole stream, like
    # `tokenizer(prompt, truncation=False)` in the reference
    p = [tokenizer.bos_id] + p + [tokenizer.eos_id]
    n = [tokenizer.bos_id] + n + [tokenizer.eos_id]
    length = max(len(p), len(n))
    w = max(1, -(-length // ctx))
    if max_windows is not None:
        w = min(w, max_windows)
    total = w * ctx

    def grid(ids):
        arr = np.full((total,), tokenizer.eos_id, np.int32)
        arr[:min(len(ids), total)] = ids[:total]
        return arr.reshape(w, ctx)

    return grid(p), grid(n)


def encode_windows(params, cfg: CLIPTextConfig, ids: jnp.ndarray,
                   *, layer_skip: Optional[int] = None) -> jnp.ndarray:
    """(W, 77) ids -> (1, W*77, D) context via one encoder call."""
    hidden = clip_text.apply(params, cfg, ids, layer_skip=layer_skip)
    w, n, d = hidden.shape
    return hidden.reshape(1, w * n, d)


def get_pipeline_embeds(params, cfg: CLIPTextConfig, tokenizer,
                        prompt: str, negative_prompt: str = "",
                        *, layer_skip: Optional[int] = None,
                        max_windows: Optional[int] = None):
    """prompt/negative -> (cond, uncond) context, each (1, W*77, D).

    Both prompts' windows are stacked into one (2W, 77) batch and encoded
    in a single call (the reference runs 2W sequential encoder calls).
    """
    pids, nids = window_ids(tokenizer, prompt, negative_prompt,
                            max_windows=max_windows)
    w = pids.shape[0]
    ids = jnp.concatenate([jnp.asarray(pids), jnp.asarray(nids)], axis=0)
    hidden = clip_text.apply(params, cfg, ids, layer_skip=layer_skip)
    d = hidden.shape[-1]
    cond = hidden[:w].reshape(1, -1, d)
    uncond = hidden[w:].reshape(1, -1, d)
    return cond, uncond
