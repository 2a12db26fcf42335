"""Textual inversion — learn placeholder-token embeddings on TPU.

Behavioral spec: /root/reference/utils/texutal_inversion.py (main :563)
invoked by the cross-image-drag flow when no embedding exists
(editany_lora.py:732-745 + utils/run_texutal_inversion.sh: SD1.5, 10
vectors, 3000 steps, scaled lr 5e-4):

- N new embedding rows are appended for the placeholder token, initialized
  from an initializer token (:623-660)
- training: standard eps-MSE diffusion loss; ONLY the new embedding rows
  receive gradients (the torch version zeroes grads of all other rows,
  :744-753) — here the update is masked to the new rows, which is exactly
  equivalent and avoids materializing a full-vocab gradient mask
- prompts come from the CLIP "a photo of a {}" template set (:424-452)

TPU design: the whole (text-encode -> noise -> UNet -> loss -> masked
update) step is one jit; the UNet and VAE stay frozen (no grads traced
through their params thanks to stop_gradient on everything but the
embedding table rows).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from editanything_tpu.models import clip_text as CT
from editanything_tpu.models import unet as U
from editanything_tpu.samplers import schedule as sched

# reference :424-452
IMAGENET_TEMPLATES_SMALL = [
    "a photo of a {}", "a rendering of a {}", "a cropped photo of the {}",
    "the photo of a {}", "a photo of a clean {}", "a photo of a dirty {}",
    "a dark photo of the {}", "a photo of my {}", "a photo of the cool {}",
    "a close-up photo of a {}", "a bright photo of the {}",
    "a cropped photo of a {}", "a photo of the {}", "a good photo of the {}",
    "a photo of one {}", "a close-up photo of the {}",
    "a rendition of the {}", "a photo of the clean {}", "a rendition of a {}",
    "a photo of a nice {}", "a good photo of a {}", "a photo of the nice {}",
    "a photo of the small {}", "a photo of the weird {}",
    "a photo of the large {}", "a photo of a cool {}",
    "a photo of a small {}",
]


class TIState(NamedTuple):
    embeddings: jnp.ndarray    # full (V + num_vectors, D) table
    opt_state: optax.OptState
    step: jnp.ndarray


def add_placeholder_tokens(text_params, tokenizer, *, num_vectors: int,
                           initializer_token: str):
    """Append num_vectors rows initialized from the initializer token's
    embedding. Returns (new text_params, placeholder ids)."""
    table = text_params["embeddings"]["token_embedding"]["weight"]
    init_ids = tokenizer.encode(initializer_token)
    init_vec = table[init_ids[0]]
    new_rows = jnp.tile(init_vec[None], (num_vectors, 1))
    new_table = jnp.concatenate([table, new_rows], axis=0)
    params = jax.tree.map(lambda x: x, text_params)
    params["embeddings"]["token_embedding"]["weight"] = new_table
    v = table.shape[0]
    return params, list(range(v, v + num_vectors))


def placeholder_prompt_ids(tokenizer, template: str,
                           placeholder_ids: Sequence[int],
                           pad_to: int) -> List[int]:
    """Tokenize a template with the placeholder ids spliced in."""
    before, after = template.split("{}")
    ids = (tokenizer.encode(before.strip()) + list(placeholder_ids)
           + tokenizer.encode(after.strip()))
    row = [tokenizer.bos_id] + ids[:pad_to - 2] + [tokenizer.eos_id]
    return row + [tokenizer.eos_id] * (pad_to - len(row))


def make_ti_train_step(text_cfg, unet_cfg, schedule: sched.NoiseSchedule,
                       optimizer, placeholder_ids: Sequence[int]):
    """Returns step(state, text_params, unet_params, batch, key).

    batch = {"latents": (B,h,w,4), "input_ids": (B,77)}. text_params'
    embedding table is REPLACED by state.embeddings each step; only the
    placeholder rows are updated (masked update == the reference's
    zero-other-grads trick)."""
    pid0, pid1 = min(placeholder_ids), max(placeholder_ids) + 1

    def loss_fn(embeddings, text_params, unet_params, batch, key):
        tp = dict(text_params)
        emb = dict(tp["embeddings"])
        te = dict(emb["token_embedding"])
        te["weight"] = embeddings
        emb["token_embedding"] = te
        tp["embeddings"] = emb
        ctx = CT.apply(tp, text_cfg, batch["input_ids"])
        lat = batch["latents"]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (lat.shape[0],), 0,
                               schedule.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape, lat.dtype)
        noisy = sched.add_noise(schedule, lat, noise, t)
        pred = U.apply(unet_params, unet_cfg, noisy, t,
                       ctx.astype(noisy.dtype))
        return jnp.mean(jnp.square(pred.astype(jnp.float32)
                                   - noise.astype(jnp.float32)))

    def step(state: TIState, text_params, unet_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.embeddings, text_params, unet_params, batch, key)
        # mask the update to the placeholder rows only
        row = jnp.arange(grads.shape[0])[:, None]
        mask = ((row >= pid0) & (row < pid1)).astype(grads.dtype)
        grads = grads * mask
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.embeddings)
        emb = optax.apply_updates(state.embeddings, updates * mask)
        return TIState(emb, opt_state, state.step + 1), {"loss": loss}

    return step


def learned_embeddings(state: TIState, placeholder_ids: Sequence[int]):
    """The rows to save as the TI checkpoint (reference save_progress
    :160-168 format: {placeholder: (N, D)})."""
    return state.embeddings[min(placeholder_ids):max(placeholder_ids) + 1]


def load_textual_inversion(text_params, embeds: jnp.ndarray):
    """Append learned embedding rows to a text encoder's table (the
    `pipe.load_textual_inversion` path, editany_lora.py:734). Returns
    (params, ids of the appended rows)."""
    table = text_params["embeddings"]["token_embedding"]["weight"]
    new_table = jnp.concatenate([table, embeds.astype(table.dtype)], axis=0)
    params = jax.tree.map(lambda x: x, text_params)
    params["embeddings"]["token_embedding"]["weight"] = new_table
    v = table.shape[0]
    return params, list(range(v, v + embeds.shape[0]))
