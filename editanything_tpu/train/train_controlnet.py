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


def make_sample_program(unet_cfg, cn_cfg, vae_cfg, schedule, *,
                        num_steps: int = 20, guidance_scale: float = 9.0):
    """In-training sampling previews: one jitted DDIM program conditioned
    on the training hints with the CURRENT (or EMA) ControlNet — the
    reference's only training-quality signal (`log_images` DDIM grids,
    /root/reference/cldm/logger.py:27-76, cldm/cldm.py:348-406).

    Returns fn(unet, cn_params, vae, latents, context, hint) -> images
    in [-1, 1]; context = {"cond": (B,N,D), "uncond": (B,N,D)}.
    """
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.samplers import make_timesteps

    dcfg = DenoiseConfig(
        unet=unet_cfg, controlnets=(cn_cfg,), num_steps=num_steps,
        sampler="ddim", prediction_type=schedule.prediction_type)
    denoise = build_denoiser(dcfg, schedule, make_timesteps(num_steps))

    def program(unet, cn_params, vae, latents, context, hint):
        inputs = {"controlnet_conds": [hint],
                  "controlnet_scales": [1.0],
                  "guidance_scale": float(guidance_scale)}
        final = denoise({"unet": unet, "controlnets": [cn_params]},
                        latents, context, inputs)
        return V.decode_from_latents(vae, vae_cfg,
                                     final.astype(latents.dtype))

    return jax.jit(program)


def train(*, data_path: str, txt_path: str, out_dir: str,
          bundle=None, batch_size: int = 4, lr: float = 1e-5,
          max_steps: int = 10000, resolution: int = 512,
          log_every: int = 10, image_every: int = 300,
          ckpt_every: int = 1000, seed: int = 0,
          mesh=None, remat: bool = True,
          use_ema: bool = True, config_yaml: str = None,
          sample_steps: int = 20, sample_guidance: float = 9.0,
          export_path: str = None):
    """Run ControlNet training. `bundle` supplies frozen UNet/VAE/text
    weights + the trainable ControlNet init (random graft by default,
    checkpoints/surgery.graft_controlnet_from_unet for warm starts).

    Reference-parity knobs (closed in round 5):
    - use_ema: LitEma-ramp shadow params, ON by default like the
      reference (ldm/models/diffusion/ddpm.py:57,94-95); checkpointed with
      the state and used for the final export + EMA sample grids.
    - config_yaml: a cldm YAML (models/cldm_v21.yaml layout) supplying the
      noise schedule + prediction type (v for SD2.1) instead of the SD1.5
      eps default — the create_model(yaml) path of sam_train_sd21.py:21.
    - sampling previews: every `image_every` steps a compiled DDIM run on
      a FIXED validation batch with the in-training (and EMA) ControlNet
      dumps input/hint/reconstruction/samples grids — the reference's
      log_images signal (cldm/logger.py:27-76, cldm/cldm.py:348-406).
    - export_path: final ControlNet (EMA weights when enabled) saved as a
      diffusers-layout safetensors.
    """
    from editanything_tpu.data import SAMDataset, make_batcher
    from editanything_tpu.pipelines import random_bundle

    bundle = bundle or random_bundle(jax.random.PRNGKey(seed), tiny=False,
                                     controlnet_names=("sam",))
    cn_cfg, cn_params = bundle.controlnets["sam"]
    if config_yaml is not None:
        from editanything_tpu.checkpoints.legacy import \
            configs_from_cldm_yaml
        cfgs = configs_from_cldm_yaml(config_yaml)
        schedule = cfgs["schedule"]
    else:
        schedule = make_schedule()
    optimizer = make_optimizer(lr)
    # remat (dots_saveable) by default: the un-rematerialized fwd
    # activation set does not fit one chip's HBM at SD1.5 scale
    train_step = jax.jit(make_train_step(cn_cfg, schedule, optimizer,
                                         remat=remat),
                         donate_argnums=(0,))
    state = init_train_state(cn_params, optimizer, use_ema=use_ema)
    pre = make_preprocessor(bundle.vae_cfg, bundle.text_cfg,
                            bundle.tokenizer)
    sample = make_sample_program(bundle.unet_cfg, cn_cfg, bundle.vae_cfg,
                                 schedule, num_steps=sample_steps,
                                 guidance_scale=sample_guidance)

    if mesh is not None:
        from editanything_tpu.parallel import replicate, shard_params_tp
        bundle.unet = replicate(mesh, bundle.unet)
        state = state._replace(
            cn_params=shard_params_tp(mesh, state.cn_params,
                                      also_fsdp=True),
            ema_params=None if state.ema_params is None else
            shard_params_tp(mesh, state.ema_params, also_fsdp=True))

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
    val = None     # fixed validation batch for the sampling previews

    def _sample_grids(batch, latents, context_cond):
        """input/hint/recon/samples(/EMA) grids, cldm log_images parity."""
        b = latents.shape[0]
        uncond_ids = bundle.tokenizer([""] * b, pad_to=ctx_len,
                                      truncate=True)
        uncond = CT.apply(bundle.text, bundle.text_cfg,
                          jnp.asarray(uncond_ids))
        ctx = {"cond": context_cond.astype(bundle.dtype),
               "uncond": uncond.astype(bundle.dtype)}
        noise = jax.random.normal(jax.random.PRNGKey(seed + 7),
                                  latents.shape, jnp.float32
                                  ).astype(bundle.dtype)
        hint = jnp.asarray(batch["hint"]).astype(bundle.dtype)
        grids = {
            "input": batch["jpg"],
            "hint": batch["hint"],
            "reconstruction": np.asarray(V.decode_from_latents(
                bundle.vae, bundle.vae_cfg,
                latents.astype(bundle.dtype))),
            "samples": np.asarray(sample(bundle.unet, state.cn_params,
                                         bundle.vae, noise, ctx, hint)),
        }
        if state.ema_params is not None:
            grids["samples_ema"] = np.asarray(sample(
                bundle.unet, state.ema_params, bundle.vae, noise, ctx,
                hint))
        return grids

    while step < max_steps:
        for batch in make_batcher(dataset, batch_size=batch_size,
                                  seed=seed + step):
            ids = bundle.tokenizer(batch["txt"], pad_to=ctx_len,
                                   truncate=True)
            latents, context = pre(bundle.vae, bundle.text,
                                   jnp.asarray(batch["jpg"]),
                                   jnp.asarray(ids))
            if val is None:
                val = (batch, latents, context)
            key, sub = jax.random.split(key)
            state, m = train_step(
                state, bundle.unet,
                {"latents": latents, "hint": jnp.asarray(batch["hint"]),
                 "context": context}, sub)
            step = int(state.step)
            metrics_log.log(step, m)
            if step % image_log.every == 0:
                image_log.maybe_log(step, _sample_grids(*val))
            ckpt.maybe_save(step, state)
            if step >= max_steps:
                break
    ckpt.save(step, state)
    ckpt.close()
    if export_path:
        from safetensors.numpy import save_file
        from editanything_tpu.checkpoints import tree_to_diffusers
        final = state.ema_params if state.ema_params is not None \
            else state.cn_params
        save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
                   for k, v in tree_to_diffusers(
                       jax.device_get(final)).items()}, export_path)
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
    p.add_argument("--config-yaml", default=None,
                   help="cldm YAML for schedule/v-pred (cldm_v21.yaml)")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--export-path", default=None,
                   help="final (EMA) ControlNet as diffusers safetensors")
    args = p.parse_args(argv)
    train(data_path=args.data_path, txt_path=args.txt_path,
          out_dir=args.out_dir, batch_size=args.batch_size, lr=args.lr,
          max_steps=args.max_steps, resolution=args.resolution,
          config_yaml=args.config_yaml, use_ema=not args.no_ema,
          export_path=args.export_path)


if __name__ == "__main__":
    main()
