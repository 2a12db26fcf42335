"""Runnable textual-inversion training program.

Behavioral spec: /root/reference/utils/texutal_inversion.py (main :563)
driven by utils/run_texutal_inversion.sh (SD1.5, placeholder "<new-obj>",
initializer "mark", 10 vectors, batch 4, 3000 steps, lr 5e-4 --scale_lr,
constant schedule) and the cross-image-drag staging flow
(editany_lora.py:732-745): the editor stages the masked ref crop under
utils/tmp/textinv/img, this program learns the placeholder embedding from
that folder, and the resulting embedding file feeds back into
`process(ref_textinv_path=...)`.

TPU design: the per-step math (text encode -> q_sample -> UNet -> eps-MSE
-> placeholder-row-masked update) is the single jit from
train/textual_inversion.py; this module adds the program around it — the
image-folder dataset with template prompts, the jitted VAE-encode
preprocessor, lr scaling/warmup, orbax checkpoint/resume, progress saves
(save_progress :160-168 -> .npy of the learned rows), and the CLI main.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from editanything_tpu.data.image_folder import ImageFolder
from editanything_tpu.models import clip_text as CT
from editanything_tpu.models import vae as V
from editanything_tpu.samplers import make_schedule
from editanything_tpu.train.checkpointing import CheckpointManager
from editanything_tpu.train.logging import MetricLogger
from editanything_tpu.train.textual_inversion import (
    IMAGENET_TEMPLATES_SMALL, TIState, add_placeholder_tokens,
    learned_embeddings, make_ti_train_step, placeholder_prompt_ids)

# reference :456-474 (style templates, learnable_property="style")
IMAGENET_STYLE_TEMPLATES_SMALL = [
    "a painting in the style of {}", "a rendering in the style of {}",
    "a cropped painting in the style of {}",
    "the painting in the style of {}",
    "a clean painting in the style of {}",
    "a dirty painting in the style of {}",
    "a dark painting in the style of {}", "a picture in the style of {}",
    "a cool painting in the style of {}",
    "a close-up painting in the style of {}",
    "a bright painting in the style of {}",
    "a good painting in the style of {}",
]


def save_embedding(path: str, embeds: np.ndarray) -> None:
    """Native TI checkpoint: .npy of the (num_vectors, D) learned rows
    (the torch reference saves {placeholder: tensor} via torch.save,
    :160-168; the editor's load path np.loads this file)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, np.asarray(embeds, np.float32))
    # np.save appends .npy when missing; keep the exact requested name
    if os.path.exists(path + ".npy"):
        os.replace(path + ".npy", path)


def train_textual_inversion(
        *, data_dir: str, output_path: str, bundle=None,
        placeholder_token: str = "<new-obj>",
        initializer_token: str = "mark",
        num_vectors: int = 10, learnable_property: str = "object",
        max_steps: int = 3000, lr: float = 5e-4, scale_lr: bool = True,
        batch_size: int = 4, resolution: int = 512,
        center_crop: bool = False, flip_p: float = 0.5,
        save_steps: int = 500, out_dir: Optional[str] = None,
        ckpt_every: int = 500, log_every: int = 50, seed: int = 0):
    """Learn placeholder embeddings from an image folder. Returns
    (TIState, placeholder_ids); writes the learned rows to `output_path`
    and registers the placeholder in the bundle's tokenizer so prompts
    containing it resolve to the new rows."""
    if bundle is None:
        from editanything_tpu.pipelines import random_bundle
        bundle = random_bundle(jax.random.PRNGKey(seed), tiny=False,
                               controlnet_names=())

    tok = bundle.tokenizer
    text_params, placeholder_ids = add_placeholder_tokens(
        bundle.text, tok, num_vectors=num_vectors,
        initializer_token=initializer_token)
    bundle.text = text_params
    tok.add_placeholder(placeholder_token, placeholder_ids)

    templates = IMAGENET_STYLE_TEMPLATES_SMALL \
        if learnable_property == "style" else IMAGENET_TEMPLATES_SMALL
    ctx_len = bundle.text_cfg.max_position_embeddings
    prompt_rows = np.asarray([
        placeholder_prompt_ids(tok, t, placeholder_ids, ctx_len)
        for t in templates], np.int32)

    dataset = ImageFolder(data_dir, resolution=resolution,
                          center_crop=center_crop, flip_p=flip_p, seed=seed)
    if scale_lr:
        lr = lr * batch_size    # reference --scale_lr (single process)
    optimizer = optax.adam(lr)
    step_fn = jax.jit(make_ti_train_step(
        bundle.text_cfg, bundle.unet_cfg, make_schedule(), optimizer,
        placeholder_ids))
    encode = jax.jit(lambda p, x, k: V.encode_to_latents(
        p, bundle.vae_cfg, x, key=k))

    table = text_params["embeddings"]["token_embedding"]["weight"]
    state = TIState(table, optimizer.init(table), jnp.asarray(0, jnp.int32))

    metrics = ckpt = None
    if out_dir:
        metrics = MetricLogger(out_dir, every=log_every)
        ckpt = CheckpointManager(os.path.join(out_dir, "ckpt"),
                                 save_interval_steps=ckpt_every)
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    step = int(state.step)
    while step < max_steps:
        imgs = dataset.sample_batch(batch_size).astype(np.float32)
        ids = prompt_rows[rng.randint(0, len(prompt_rows), size=batch_size)]
        key, k_vae, k_step = jax.random.split(key, 3)
        latents = encode(bundle.vae, jnp.asarray(imgs, bundle.dtype), k_vae)
        state, m = step_fn(state, text_params, bundle.unet,
                           {"latents": latents.astype(jnp.float32),
                            "input_ids": jnp.asarray(ids)}, k_step)
        step = int(state.step)
        if metrics is not None:
            metrics.log(step, m)
        if ckpt is not None:
            ckpt.maybe_save(step, state)
        if step % save_steps == 0 or step >= max_steps:
            save_embedding(output_path,
                           learned_embeddings(state, placeholder_ids))

    save_embedding(output_path, learned_embeddings(state, placeholder_ids))
    if ckpt is not None:
        ckpt.save(step, state)
        ckpt.close()
    # feed the learned rows back into the live bundle so a subsequent
    # process(ref_textinv_path=...) — or direct prompting with the
    # placeholder — picks them up without reloading (editany_lora.py:734)
    tp = dict(bundle.text)
    emb = dict(tp["embeddings"])
    te = dict(emb["token_embedding"])
    te["weight"] = state.embeddings
    emb["token_embedding"] = te
    tp["embeddings"] = emb
    bundle.text = tp
    return state, placeholder_ids


def main(argv=None):
    p = argparse.ArgumentParser("train-ti")
    p.add_argument("--train-data-dir", required=True,
                   help="folder of images (the editor stages the ref crop "
                        "under ./utils/tmp/textinv/img)")
    p.add_argument("--output", default="./utils/tmp/textinv/model/"
                   "learned_embeds.npy")
    p.add_argument("--bundle-spec", help="json naming the checkpoints "
                   "(apps/cli.py format); random weights when omitted")
    p.add_argument("--placeholder-token", default="<new-obj>")
    p.add_argument("--initializer-token", default="mark")
    p.add_argument("--num-vectors", type=int, default=10)
    p.add_argument("--learnable-property", default="object",
                   choices=("object", "style"))
    p.add_argument("--max-train-steps", type=int, default=3000)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--no-scale-lr", action="store_true")
    p.add_argument("--train-batch-size", type=int, default=4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--center-crop", action="store_true")
    p.add_argument("--save-steps", type=int, default=500)
    p.add_argument("--out-dir", default="./runs/ti")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    bundle = None
    if args.bundle_spec:
        from editanything_tpu.apps.cli import _build_bundle
        bundle, _ = _build_bundle(args.bundle_spec)
    train_textual_inversion(
        data_dir=args.train_data_dir, output_path=args.output,
        bundle=bundle, placeholder_token=args.placeholder_token,
        initializer_token=args.initializer_token,
        num_vectors=args.num_vectors,
        learnable_property=args.learnable_property,
        max_steps=args.max_train_steps, lr=args.learning_rate,
        scale_lr=not args.no_scale_lr, batch_size=args.train_batch_size,
        resolution=args.resolution, center_crop=args.center_crop,
        save_steps=args.save_steps, out_dir=args.out_dir, seed=args.seed)
    print("saved embedding:", args.output)


if __name__ == "__main__":
    main()
