"""Runnable DreamBooth-inpainting training program (full finetune + LoRA).

Behavioral spec: /root/reference/tools/train_dreambooth_inpaint.py
(main :405): when prior preservation is on and the class folder holds
fewer than num_class_images, the missing class images are GENERATED with
the inference pipeline first (:431-470 — a random image under a full-image
random_mask through the 9-ch inpaint pipeline, i.e. effectively txt2img);
training batches are [instance; class] halves with per-sample random
rectangle/ellipse masks (collate_fn :546-587), loss = instance eps-MSE +
prior_loss_weight * class eps-MSE (:604-630); AdamW + lr schedule;
accelerate save_state/resume (:266-268, :655-680). The LoRA variant
(utils/train_dreambooth_lora_inpaint.py) trains rank-r adapters instead.

TPU design: the per-step math is the single jit from
train/dreambooth_inpaint.py (make_db_train_step / make_db_lora_train_step);
class-image generation reuses the SAME compiled denoise engine as
inference (engine/denoise.py, controlnets=()); VAE/CLIP encodes run in a
jitted preprocessor; orbax checkpoint/resume replaces accelerate.
"""

from __future__ import annotations

import argparse
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from editanything_tpu.data.image_folder import ImageFolder, list_images
from editanything_tpu.models import clip_text as CT
from editanything_tpu.models import vae as V
from editanything_tpu.samplers import make_schedule, make_timesteps
from editanything_tpu.train.checkpointing import (CheckpointManager,
                                                  save_params)
from editanything_tpu.train.dreambooth_inpaint import (
    DBState, init_lora_deltas, make_db_lora_train_step, make_db_train_step,
    random_mask)
from editanything_tpu.train.logging import MetricLogger


class LoRAState(NamedTuple):
    deltas: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def generate_class_images(bundle, *, class_dir: str, class_prompt: str,
                          num_class_images: int, resolution: int = 512,
                          num_steps: int = 30, guidance_scale: float = 7.5,
                          batch_size: int = 2, seed: int = 0) -> int:
    """Fill `class_dir` up to num_class_images with generated samples of
    class_prompt (reference :431-470: a full-mask inpaint over a throwaway
    image — txt2img through the inpaint UNet). Returns how many were
    generated. Supports both 9-ch inpaint and plain 4-ch UNets."""
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.engine import prompts as P
    from editanything_tpu.pipelines.generate import to_uint8
    from PIL import Image

    os.makedirs(class_dir, exist_ok=True)
    existing = len(list_images(class_dir))
    need = num_class_images - existing
    if need <= 0:
        return 0

    b = bundle
    nine_ch = b.unet_cfg.in_channels == 9
    dcfg = DenoiseConfig(
        unet=b.unet_cfg, controlnets=(), num_steps=num_steps,
        inpaint_mode="unet9" if nine_ch else "none")
    schedule = make_schedule()
    denoise = build_denoiser(dcfg, schedule,
                             make_timesteps(num_steps))

    def program(params, latents, context, inputs):
        final = denoise(params, latents, context, inputs)
        return V.decode_from_latents(params["vae"], b.vae_cfg,
                                     final.astype(latents.dtype))

    program = jax.jit(program)
    cond, uncond = P.get_pipeline_embeds(b.text, b.text_cfg, b.tokenizer,
                                         class_prompt, "")
    h = w = resolution
    key = jax.random.PRNGKey(seed)
    done = 0
    while done < need:
        n = min(batch_size, need - done)
        key, k = jax.random.split(key)
        latents = jax.random.normal(k, (n, h // 8, w // 8, 4), jnp.float32)
        context = {
            "cond": jnp.broadcast_to(cond, (n,) + cond.shape[1:]
                                     ).astype(b.dtype),
            "uncond": jnp.broadcast_to(uncond, (n,) + uncond.shape[1:]
                                       ).astype(b.dtype)}
        inputs = {"controlnet_conds": [], "controlnet_scales": [],
                  "guidance_scale": float(guidance_scale)}
        if nine_ch:
            # full-image mask: masked image is all-zero ([-1,1] space)
            gray = jnp.zeros((n, h, w, 3), b.dtype)
            mlat = V.encode_to_latents(b.vae, b.vae_cfg, gray)
            inputs["mask"] = jnp.ones((n, h // 8, w // 8, 1), jnp.float32)
            inputs["masked_image_latents"] = mlat.astype(jnp.float32)
        params = {"unet": b.unet, "controlnets": [], "vae": b.vae}
        imgs = to_uint8(jax.device_get(
            program(params, latents.astype(b.dtype), context, inputs)))
        for i in range(n):
            Image.fromarray(imgs[i]).save(
                os.path.join(class_dir, f"class_{existing + done + i}.jpg"))
        done += n
    return done


class DreamBoothBatcher:
    """Host-side batches matching the reference collate_fn (:546-587):
    images in [-1, 1], per-sample random masks, masked image =
    image * (mask < 0.5); [instance; class] halves with prior."""

    def __init__(self, instance_dir: str, *,
                 class_dir: Optional[str] = None, resolution: int = 512,
                 center_crop: bool = False, seed: int = 0):
        self.instance = ImageFolder(instance_dir, resolution=resolution,
                                    center_crop=center_crop, flip_p=0.0,
                                    seed=seed)
        self.cls = ImageFolder(class_dir, resolution=resolution,
                               center_crop=center_crop, flip_p=0.0,
                               seed=seed + 1) if class_dir else None
        self.resolution = resolution
        self._rng = np.random.RandomState(seed + 2)

    def next(self, batch_size: int):
        imgs = self.instance.sample_batch(batch_size)
        if self.cls is not None:
            imgs = np.concatenate([imgs,
                                   self.cls.sample_batch(batch_size)])
        r = self.resolution
        masks = np.stack([random_mask(self._rng, (r, r))
                          for _ in range(imgs.shape[0])])[..., None]
        masked = imgs * (masks < 0.5)
        return (imgs.astype(np.float32), masks.astype(np.float32),
                masked.astype(np.float32))


def train(*, instance_data_dir: str, instance_prompt: str,
          output_dir: str, bundle=None,
          class_data_dir: Optional[str] = None,
          class_prompt: Optional[str] = None,
          with_prior_preservation: bool = False,
          prior_loss_weight: float = 1.0, num_class_images: int = 100,
          class_gen_steps: int = 30, use_lora: bool = False,
          lora_rank: int = 4, batch_size: int = 1, lr: float = 5e-6,
          lr_warmup_steps: int = 0, max_steps: int = 400,
          resolution: int = 512, center_crop: bool = False,
          ckpt_every: int = 100, log_every: int = 10, seed: int = 0):
    """Run DreamBooth-inpaint finetuning. Returns the final state
    (DBState, or LoRAState when use_lora). Saves the finetuned UNet params
    (or the LoRA delta tree) under output_dir via orbax."""
    if bundle is None:
        from editanything_tpu.models import config as C
        from editanything_tpu.pipelines import random_bundle
        import dataclasses as _dc
        bundle = random_bundle(jax.random.PRNGKey(seed), tiny=False,
                               controlnet_names=())
        # DreamBooth-inpaint expects the 9-ch inpainting UNet
        from editanything_tpu.models import unet as U
        ucfg = C.sd15_inpaint_unet()
        bundle = _dc.replace(bundle, unet_cfg=ucfg,
                             unet=U.init_unet(jax.random.PRNGKey(seed),
                                              ucfg, bundle.dtype))

    if with_prior_preservation:
        assert class_data_dir and class_prompt, \
            "prior preservation needs --class-data-dir and --class-prompt"
        n = generate_class_images(
            bundle, class_dir=class_data_dir, class_prompt=class_prompt,
            num_class_images=num_class_images, resolution=resolution,
            num_steps=class_gen_steps, seed=seed)
        if n:
            print(f"generated {n} class images in {class_data_dir}")

    batcher = DreamBoothBatcher(
        instance_data_dir,
        class_dir=class_data_dir if with_prior_preservation else None,
        resolution=resolution, center_crop=center_crop, seed=seed)

    # frozen text contexts, computed once (reference tokenizes per batch
    # but the prompts are constant)
    ctx_len = bundle.text_cfg.max_position_embeddings
    ids = [bundle.tokenizer(instance_prompt, pad_to=ctx_len, truncate=True)]
    if with_prior_preservation:
        ids.append(bundle.tokenizer(class_prompt, pad_to=ctx_len,
                                    truncate=True))
    contexts = jax.jit(lambda p, i: CT.apply(p, bundle.text_cfg, i))(
        bundle.text, jnp.concatenate([jnp.asarray(x) for x in ids]))

    schedule = make_schedule()
    lr_sched = optax.warmup_constant_schedule(0.0, lr, lr_warmup_steps) \
        if lr_warmup_steps else lr
    optimizer = optax.adamw(lr_sched, weight_decay=1e-2)
    plw = prior_loss_weight if with_prior_preservation else 0.0

    def prep(vae_params, imgs, masks, masked):
        lat = V.encode_to_latents(vae_params, bundle.vae_cfg,
                                  imgs.astype(bundle.dtype))
        mlat = V.encode_to_latents(vae_params, bundle.vae_cfg,
                                   masked.astype(bundle.dtype))
        m = jax.image.resize(
            masks, (masks.shape[0], masks.shape[1] // 8,
                    masks.shape[2] // 8, 1), method="nearest")
        return (lat.astype(jnp.float32), m.astype(jnp.float32),
                mlat.astype(jnp.float32))

    prep = jax.jit(prep)

    if use_lora:
        deltas = init_lora_deltas(jax.random.PRNGKey(seed + 1),
                                  bundle.unet, rank=lora_rank)
        step_fn = jax.jit(make_db_lora_train_step(
            bundle.unet_cfg, schedule, optimizer,
            prior_loss_weight=plw))
        state = LoRAState(deltas, optimizer.init(deltas),
                          jnp.asarray(0, jnp.int32))
    else:
        step_fn = jax.jit(make_db_train_step(
            bundle.unet_cfg, schedule, optimizer, prior_loss_weight=plw),
            donate_argnums=(0,))
        state = DBState(bundle.unet, optimizer.init(bundle.unet),
                        jnp.asarray(0, jnp.int32))

    metrics = MetricLogger(output_dir, every=log_every)
    ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"),
                             save_interval_steps=ckpt_every)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored

    b_inst = contexts[0:1]
    b_cls = contexts[1:2] if with_prior_preservation else None
    key = jax.random.PRNGKey(seed)
    step = int(state.step)
    while step < max_steps:
        imgs, masks, masked = batcher.next(batch_size)
        latents, mlat, masked_lat = prep(bundle.vae, jnp.asarray(imgs),
                                         jnp.asarray(masks),
                                         jnp.asarray(masked))
        ctx = jnp.broadcast_to(b_inst, (batch_size,) + b_inst.shape[1:])
        if b_cls is not None:
            ctx = jnp.concatenate([
                ctx, jnp.broadcast_to(b_cls,
                                      (batch_size,) + b_cls.shape[1:])])
        batch = {"latents": latents, "mask": mlat,
                 "masked_latents": masked_lat,
                 "context": ctx.astype(bundle.dtype)}
        key, sub = jax.random.split(key)
        if use_lora:
            carry, m = step_fn((state.deltas, state.opt_state, state.step),
                               bundle.unet, batch, sub)
            state = LoRAState(*carry)
        else:
            state, m = step_fn(state, batch, sub)
        step = int(state.step)
        metrics.log(step, m)
        ckpt.maybe_save(step, state)

    ckpt.save(step, state)
    ckpt.close()
    out = os.path.join(output_dir,
                       "lora_deltas" if use_lora else "unet")
    save_params(out, state.deltas if use_lora else state.unet_params)
    print(f"saved {'LoRA deltas' if use_lora else 'UNet params'} to {out}")
    return state


def main(argv=None):
    p = argparse.ArgumentParser("train-dreambooth")
    p.add_argument("--instance-data-dir", required=True)
    p.add_argument("--instance-prompt", required=True)
    p.add_argument("--output-dir", default="./runs/dreambooth")
    p.add_argument("--bundle-spec", help="json naming the checkpoints "
                   "(apps/cli.py format); random weights when omitted")
    p.add_argument("--class-data-dir")
    p.add_argument("--class-prompt")
    p.add_argument("--with-prior-preservation", action="store_true")
    p.add_argument("--prior-loss-weight", type=float, default=1.0)
    p.add_argument("--num-class-images", type=int, default=100)
    p.add_argument("--use-lora", action="store_true")
    p.add_argument("--lora-rank", type=int, default=4)
    p.add_argument("--train-batch-size", type=int, default=1)
    p.add_argument("--learning-rate", type=float, default=5e-6)
    p.add_argument("--lr-warmup-steps", type=int, default=0)
    p.add_argument("--max-train-steps", type=int, default=400)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--center-crop", action="store_true")
    p.add_argument("--checkpointing-steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    bundle = None
    if args.bundle_spec:
        from editanything_tpu.apps.cli import _build_bundle
        bundle, _ = _build_bundle(args.bundle_spec)
    train(instance_data_dir=args.instance_data_dir,
          instance_prompt=args.instance_prompt,
          output_dir=args.output_dir, bundle=bundle,
          class_data_dir=args.class_data_dir,
          class_prompt=args.class_prompt,
          with_prior_preservation=args.with_prior_preservation,
          prior_loss_weight=args.prior_loss_weight,
          num_class_images=args.num_class_images, use_lora=args.use_lora,
          lora_rank=args.lora_rank, batch_size=args.train_batch_size,
          lr=args.learning_rate, lr_warmup_steps=args.lr_warmup_steps,
          max_steps=args.max_train_steps, resolution=args.resolution,
          center_crop=args.center_crop,
          ckpt_every=args.checkpointing_steps, seed=args.seed)


if __name__ == "__main__":
    main()
