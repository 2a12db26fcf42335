"""DreamBooth inpainting finetune (9-ch UNet) with prior preservation.

Behavioral spec: /root/reference/tools/train_dreambooth_inpaint.py
(main :405): finetune the SD-inpaint UNet on instance images with
`random_mask` augmentation (:59-81 — random rectangle/ellipse masks),
optional prior preservation (class images generated beforehand; instance
and class batches concatenated, loss = instance MSE + w * prior MSE,
:604-630), AdamW. The LoRA variant (utils/train_dreambooth_lora_inpaint.py)
trains low-rank adapters instead of full weights — here via a rank-r
delta tree on the same step.

TPU design: the masked-latent prep (mask resize + masked-image VAE encode)
and the 9-channel UNet step compile into one jit; random masks are drawn
host-side (PIL-free numpy shapes).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from editanything_tpu.models import unet as U
from editanything_tpu.samplers import schedule as sched


def random_mask(rng: np.random.RandomState, hw: Tuple[int, int],
                ratio: float = 1.0, mask_full_image: bool = False
                ) -> np.ndarray:
    """Random rectangle or ellipse mask (reference :59-81), numpy."""
    h, w = hw
    if mask_full_image:
        sh, sw = int(h * ratio), int(w * ratio)
    else:
        sh, sw = rng.randint(0, int(h * ratio) + 1), \
            rng.randint(0, int(w * ratio) + 1)
    cy = rng.randint(sh // 2, max(h - sh // 2, sh // 2) + 1)
    cx = rng.randint(sw // 2, max(w - sw // 2, sw // 2) + 1)
    yy, xx = np.mgrid[0:h, 0:w]
    if mask_full_image or rng.randint(0, 2) == 0:
        m = ((np.abs(yy - cy) <= sh // 2) & (np.abs(xx - cx) <= sw // 2))
    else:   # ellipse
        a, b = max(sh // 2, 1), max(sw // 2, 1)
        m = ((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2 <= 1.0
    return m.astype(np.float32)


class DBState(NamedTuple):
    unet_params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_db_train_step(unet_cfg, schedule: sched.NoiseSchedule, optimizer,
                       *, prior_loss_weight: float = 0.0):
    """Returns step(state, batch, key) -> (state, metrics).

    batch = {"latents": (B,h,w,4) target latents,
             "mask": (B,h,w,1) latent-res edit mask,
             "masked_latents": (B,h,w,4) VAE latents of the masked image,
             "context": (B,N,D)}
    When prior_loss_weight > 0, the batch is [instance; class] halves
    (reference :604-630)."""

    def loss_fn(unet_params, batch, key):
        lat = batch["latents"]
        b = lat.shape[0]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape, lat.dtype)
        noisy = sched.add_noise(schedule, lat, noise, t)
        unet_in = jnp.concatenate(
            [noisy, batch["mask"].astype(noisy.dtype),
             batch["masked_latents"].astype(noisy.dtype)], axis=-1)
        pred = U.apply(unet_params, unet_cfg, unet_in, t, batch["context"])
        err = jnp.square(pred.astype(jnp.float32)
                         - noise.astype(jnp.float32))
        if prior_loss_weight > 0:
            inst, prior = jnp.split(err, 2, axis=0)
            return jnp.mean(inst) + prior_loss_weight * jnp.mean(prior)
        return jnp.mean(err)

    def step(state: DBState, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.unet_params,
                                                  batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.unet_params)
        params = optax.apply_updates(state.unet_params, updates)
        return DBState(params, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


# ---------------------------------------------------------------------------
# LoRA variant (utils/train_dreambooth_lora_inpaint.py semantics)
# ---------------------------------------------------------------------------

def init_lora_deltas(key, params, *, rank: int = 4, targets=("to_q", "to_k",
                                                             "to_v")):
    """Rank-r (down, up) pairs for every attention projection named in
    `targets`. up is zero-initialized so training starts at identity."""
    deltas = {}
    keys = jax.random.split(key, 4096)
    i = 0

    def walk(tree, path, out):
        nonlocal i
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in targets and "kernel" in v:
                    kern = v["kernel"]
                    din, dout = kern.shape
                    out["/".join(path + [k])] = {
                        "down": jax.random.normal(
                            keys[i], (din, rank), kern.dtype) * 0.01,
                        "up": jnp.zeros((rank, dout), kern.dtype)}
                    i += 1
                else:
                    walk(v, path + [k], out)
        return out

    return walk(params, [], {})


def apply_lora_deltas(params, deltas, multiplier: float = 1.0):
    """params with kernel += m * down @ up for each delta (functional)."""
    out = jax.tree.map(lambda x: x, params)
    for path, d in deltas.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        leaf = dict(node[parts[-1]])
        leaf["kernel"] = leaf["kernel"] + multiplier * (d["down"] @ d["up"])
        node[parts[-1]] = leaf
    return out


def make_db_lora_train_step(unet_cfg, schedule: sched.NoiseSchedule,
                            optimizer, *, prior_loss_weight: float = 0.0):
    """Same step as make_db_train_step but only LoRA deltas train."""

    def loss_fn(deltas, unet_params, batch, key):
        merged = apply_lora_deltas(unet_params, deltas)
        lat = batch["latents"]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (lat.shape[0],), 0,
                               schedule.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape, lat.dtype)
        noisy = sched.add_noise(schedule, lat, noise, t)
        unet_in = jnp.concatenate(
            [noisy, batch["mask"].astype(noisy.dtype),
             batch["masked_latents"].astype(noisy.dtype)], axis=-1)
        pred = U.apply(merged, unet_cfg, unet_in, t, batch["context"])
        err = jnp.square(pred.astype(jnp.float32)
                         - noise.astype(jnp.float32))
        if prior_loss_weight > 0:
            inst, prior = jnp.split(err, 2, axis=0)
            return jnp.mean(inst) + prior_loss_weight * jnp.mean(prior)
        return jnp.mean(err)

    def step(carry, unet_params, batch, key):
        deltas, opt_state, n = carry
        loss, grads = jax.value_and_grad(loss_fn)(deltas, unet_params,
                                                  batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, deltas)
        deltas = optax.apply_updates(deltas, updates)
        return (deltas, opt_state, n + 1), {"loss": loss}

    return step
