"""ControlNet training entry point — the sam_train_sd21.py equivalent.

Behavioral spec: /root/reference/sam_train_sd21.py:11-39 (batch 4/device,
lr 1e-5, SAMDataset, ImageLogger every 300 steps, 8-way data parallel) +
cldm/cldm.py:416-423 (train the control branch only, frozen base).

TPU design: pjit data parallelism over a (data, model) mesh with optional
FSDP parameter sharding (parallel/sharding.py); the VAE/CLIP encodes run
in a separate jitted preprocessing step feeding the train step (the
reference does this inside get_input on-GPU, cldm/cldm.py:318-326);
orbax checkpoints + JSONL metrics + sample grids replace Lightning.
"""

from __future__ import annotations

import argparse
import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.models import clip_text as CT
from editanything_tpu.models import config as C
from editanything_tpu.models import vae as V
from editanything_tpu.samplers import make_schedule
from editanything_tpu.train import init_train_state, make_train_step
from editanything_tpu.train.checkpointing import CheckpointManager
from editanything_tpu.train.controlnet_train import make_optimizer
from editanything_tpu.train.logging import ImageLogger, MetricLogger


def make_preprocessor(vae_cfg, text_cfg, tokenizer, *, resolution=512):
    """Returns a jitted fn (vae_params, text_params, jpg, ids) ->
    dict(latents, context); the hint passes through untouched."""
    def fn(vae_params, text_params, jpg, ids):
        latents = V.encode_to_latents(vae_params, vae_cfg, jpg)
        context = CT.apply(text_params, text_cfg, ids)
        return latents, context
    return jax.jit(fn)


def train(*, data_path: str, txt_path: str, out_dir: str,
          bundle=None, batch_size: int = 4, lr: float = 1e-5,
          max_steps: int = 10000, resolution: int = 512,
          log_every: int = 10, image_every: int = 300,
          ckpt_every: int = 1000, seed: int = 0,
          mesh=None, remat: bool = True):
    """Run ControlNet training. `bundle` supplies frozen UNet/VAE/text
    weights + the trainable ControlNet init (random graft by default,
    checkpoints/surgery.graft_controlnet_from_unet for warm starts)."""
    from editanything_tpu.data import SAMDataset, make_batcher
    from editanything_tpu.pipelines import random_bundle

    bundle = bundle or random_bundle(jax.random.PRNGKey(seed), tiny=False,
                                     controlnet_names=("sam",))
    cn_cfg, cn_params = bundle.controlnets["sam"]
    schedule = make_schedule()
    optimizer = make_optimizer(lr)
    # remat (dots_saveable) by default: the un-rematerialized fwd
    # activation set does not fit one chip's HBM at SD1.5 scale
    train_step = jax.jit(make_train_step(cn_cfg, schedule, optimizer,
                                         remat=remat),
                         donate_argnums=(0,))
    state = init_train_state(cn_params, optimizer)
    pre = make_preprocessor(bundle.vae_cfg, bundle.text_cfg,
                            bundle.tokenizer)

    if mesh is not None:
        from editanything_tpu.parallel import replicate, shard_params_tp
        bundle.unet = replicate(mesh, bundle.unet)
        state = state._replace(
            cn_params=shard_params_tp(mesh, state.cn_params,
                                      also_fsdp=True))

    dataset = SAMDataset(data_path, txt_path, resolution=resolution,
                         seed=seed)
    metrics_log = MetricLogger(out_dir, every=log_every)
    image_log = ImageLogger(out_dir, every=image_every)
    ckpt = CheckpointManager(out_dir + "/ckpt",
                             save_interval_steps=ckpt_every)

    restored = ckpt.restore(state)
    if restored is not None:
        state = restored

    key = jax.random.PRNGKey(seed)
    step = int(state.step)
    ctx_len = bundle.text_cfg.max_position_embeddings
    while step < max_steps:
        for batch in make_batcher(dataset, batch_size=batch_size,
                                  seed=seed + step):
            ids = bundle.tokenizer(batch["txt"], pad_to=ctx_len,
                                   truncate=True)
            latents, context = pre(bundle.vae, bundle.text,
                                   jnp.asarray(batch["jpg"]),
                                   jnp.asarray(ids))
            key, sub = jax.random.split(key)
            state, m = train_step(
                state, bundle.unet,
                {"latents": latents, "hint": jnp.asarray(batch["hint"]),
                 "context": context}, sub)
            step = int(state.step)
            metrics_log.log(step, m)
            image_log.maybe_log(step, {"input": batch["jpg"],
                                       "hint": batch["hint"]})
            ckpt.maybe_save(step, state)
            if step >= max_steps:
                break
    ckpt.save(step, state)
    ckpt.close()
    return state


def main(argv=None):
    p = argparse.ArgumentParser("train-controlnet")
    p.add_argument("--data-path", required=True)
    p.add_argument("--txt-path", required=True)
    p.add_argument("--out-dir", default="./runs/controlnet")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--resolution", type=int, default=512)
    args = p.parse_args(argv)
    train(data_path=args.data_path, txt_path=args.txt_path,
          out_dir=args.out_dir, batch_size=args.batch_size, lr=args.lr,
          max_steps=args.max_steps, resolution=args.resolution)


if __name__ == "__main__":
    main()
