"""ControlNet training — pjit data-parallel (+FSDP/TP shardings).

Re-implements the reference's training semantics (not its Lightning stack):
- loss: eps-MSE (or v-target) on noised latents with the control branch
  trainable and the base UNet frozen —
  /root/reference/ldm/models/diffusion/ddpm.py:885-920 (`p_losses`, simple
  loss; the VLB term has weight elbo_weight=0 in the shipped config) +
  /root/reference/cldm/cldm.py:328-341 (`apply_model`), :416-423
  (`configure_optimizers`: AdamW over control params only, sd_locked).
- distribution: the reference uses 8-GPU Lightning DDP
  (sam_train_sd21.py:35). Here: a (data, model) mesh; gradients are
  reduced by XLA from the shardings (no NCCL/DDP machinery), parameters may
  be FSDP-sharded along `data`, and attention/FFN kernels may be
  tensor-sharded along `model` (parallel/sharding.py).

The train step consumes pre-encoded latents + conditioning: VAE encode and
CLIP encode run in the data pipeline or a preprocessing jit, exactly like
`get_input` does on-GPU in the reference (cldm/cldm.py:318-326).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from editanything_tpu.models import controlnet as CN
from editanything_tpu.models import unet as U
from editanything_tpu.samplers import schedule as sched


class TrainState(NamedTuple):
    cn_params: dict          # trainable ControlNet branch
    opt_state: optax.OptState
    step: jnp.ndarray
    ema_params: Optional[dict] = None    # LitEma parity (ldm ema.py:5)


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.0):
    """AdamW, lr 1e-5 (sam_train_sd21.py:13). (The reference README
    mentions Adan as 'considered' but ships AdamW — cldm/cldm.py:422.)"""
    if weight_decay:
        return optax.adamw(lr, weight_decay=weight_decay)
    return optax.adam(lr)


def init_train_state(cn_params, optimizer, *,
                     use_ema: bool = False) -> TrainState:
    # own copies: train steps DONATE the state, and the caller's bundle
    # must keep its ControlNet buffers alive (e.g. a resume re-init after
    # a prior run already consumed them)
    params = jax.tree.map(jnp.copy, cn_params)
    return TrainState(params, optimizer.init(params),
                      jnp.asarray(0, jnp.int32),
                      jax.tree.map(jnp.copy, params) if use_ema
                      else None)


def make_train_step(cn_cfg, schedule: sched.NoiseSchedule, optimizer,
                    *, prediction_type: Optional[str] = None,
                    remat=False):
    """Returns train_step(state, unet_params, batch, key) -> (state, metrics).

    batch = {"latents": (B,h,w,4) scaled VAE latents,
             "hint":    (B,8h,8w,3) control condition in [0,1],
             "context": (B,N,D) text-encoder states}

    remat: rematerialize the CN+UNet backward. True (= "dots") uses the
    `dots_saveable` policy — matmul/conv outputs are kept, elementwise
    chains (GroupNorm, SiLU, attention softmax pieces) recompute in the
    bwd pass; measured on the v5e chip this fits SD1.5 CN+UNet training
    up to batch 4 x 64x64 latents (batch 8 still exceeds 16 GB HBM
    because every conv output is saved). "full" saves nothing across the
    backbone boundary — one extra forward of FLOPs, smallest footprint —
    for the largest per-chip batches. "offload" saves no-batch-dim dot
    outputs to pinned HOST memory instead of HBM (weight-gradient
    contractions stream back during the backward over PCIe/ICI) — trades
    transfer bandwidth for the residency that OOMs batch 8. False keeps
    the plain fwd activation set (fine for tiny/test configs and sharded
    meshes)."""
    pred_type = prediction_type or schedule.prediction_type
    ucfg = cn_cfg.unet

    def backbone(cn_params, unet_params, noisy, t, context, hint):
        down, mid = CN.apply(cn_params, cn_cfg, noisy, t, context, hint)
        return U.apply(unet_params, ucfg, noisy, t, context,
                       down_block_residuals=down, mid_block_residual=mid)

    if remat == "full":
        backbone = jax.checkpoint(backbone)
    elif remat == "offload":
        backbone = jax.checkpoint(
            backbone,
            policy=jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                "device", "pinned_host"))
    elif remat:
        backbone = jax.checkpoint(
            backbone, policy=jax.checkpoint_policies.dots_saveable)

    def loss_fn(cn_params, unet_params, batch, key):
        k_t, k_n = jax.random.split(key)
        lat = batch["latents"]
        b = lat.shape[0]
        t = jax.random.randint(k_t, (b,), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape, lat.dtype)
        noisy = sched.add_noise(schedule, lat, noise, t)

        pred = backbone(cn_params, unet_params, noisy, t,
                        batch["context"], batch["hint"])

        if pred_type == "epsilon":
            target = noise
        elif pred_type == "v_prediction":
            a, s = sched.alpha_sigma(schedule, t)
            shape = (-1,) + (1,) * (lat.ndim - 1)
            target = (a.reshape(shape) * noise.astype(jnp.float32)
                      - s.reshape(shape) * lat.astype(jnp.float32)
                      ).astype(lat.dtype)
        else:
            raise ValueError(pred_type)

        loss = jnp.mean(jnp.square(pred.astype(jnp.float32)
                                   - target.astype(jnp.float32)))
        return loss

    def train_step(state: TrainState, unet_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.cn_params, unet_params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.cn_params)
        cn_params = optax.apply_updates(state.cn_params, updates)
        ema = state.ema_params
        if ema is not None:
            # LitEma semantics (ldm/modules/ema.py:5): decay ramps as
            # (1+step)/(10+step) capped at 0.9999
            decay = jnp.minimum(0.9999,
                                (1.0 + state.step) / (10.0 + state.step))
            ema = jax.tree.map(
                lambda e, p: e * decay + (1.0 - decay) * p, ema, cn_params)
        new_state = TrainState(cn_params, opt_state, state.step + 1, ema)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step
