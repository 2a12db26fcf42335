"""Diffusion noise schedules & timestep grids as data (no scheduler objects).

Replaces the stateful scheduler classes the reference uses (diffusers
UniPCMultistepScheduler at /root/reference/editany_lora.py:383 and the legacy
DDIM machinery at /root/reference/ldm/modules/diffusionmodules/util.py:21-75)
with precomputed arrays: everything a compiled sampling loop needs is indexed
by step counter inside `lax.scan`.

All schedule state is float32 — scheduler math is precision-sensitive
(SURVEY.md section 7 "hard parts" item 7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class NoiseSchedule(NamedTuple):
    """Precomputed diffusion schedule over the full training grid.

    alphas_cumprod: (T,) cumulative product of (1 - beta).
    prediction_type: "epsilon" (SD1.5) or "v_prediction" (SD2.1-768; the
        v-parameterization at /root/reference/ldm/models/diffusion/ddpm.py:893-900).
    """
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int
    prediction_type: str = "epsilon"

    @property
    def final_alpha_cumprod(self):
        return jnp.asarray(1.0, jnp.float32)


def make_schedule(num_train_timesteps: int = 1000,
                  beta_start: float = 0.00085,
                  beta_end: float = 0.012,
                  beta_schedule: str = "scaled_linear",
                  prediction_type: str = "epsilon") -> NoiseSchedule:
    """Stable Diffusion's schedule. `scaled_linear` = linear in sqrt(beta)
    (reference: ldm/modules/diffusionmodules/util.py:21-38 "linear")."""
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    elif beta_schedule == "squaredcos_cap_v2":
        t = np.arange(num_train_timesteps + 1, dtype=np.float64)
        f = np.cos((t / num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.clip(1 - f[1:] / f[:-1], 0, 0.999)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return NoiseSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


def make_timesteps(num_inference_steps: int, num_train_timesteps: int = 1000,
                   spacing: str = "linspace", steps_offset: int = 0) -> np.ndarray:
    """Descending inference timestep grid (static; computed host-side).

    "linspace" matches diffusers UniPCMultistepScheduler's default;
    "leading" (+steps_offset 1) matches the SD DDIM configuration.
    """
    if spacing == "linspace":
        ts = (np.linspace(0, num_train_timesteps - 1, num_inference_steps + 1)
              .round()[::-1][:-1].astype(np.int64))
    elif spacing == "leading":
        ratio = num_train_timesteps // num_inference_steps
        ts = ((np.arange(num_inference_steps) * ratio).round()[::-1]
              .astype(np.int64) + steps_offset)
    elif spacing == "trailing":
        ts = np.round(
            np.arange(num_train_timesteps, 0,
                      -num_train_timesteps / num_inference_steps)
        ).astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep spacing {spacing!r}")
    return ts


def alpha_sigma(schedule: NoiseSchedule, t):
    """(sqrt(abar_t), sqrt(1-abar_t)); t = -1 means the final (clean) state."""
    abar = jnp.where(t >= 0,
                     schedule.alphas_cumprod[jnp.maximum(t, 0)],
                     schedule.final_alpha_cumprod)
    return jnp.sqrt(abar), jnp.sqrt(1.0 - abar)


def add_noise(schedule: NoiseSchedule, x0, noise, t):
    """q(x_t | x_0) forward sample (reference: ddpm.py:356 q_sample)."""
    a, s = alpha_sigma(schedule, t)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    a = a.reshape(shape) if a.ndim else a
    s = s.reshape(shape) if s.ndim else s
    return (a * x0.astype(jnp.float32) + s * noise.astype(jnp.float32)).astype(x0.dtype)


def to_x0(schedule: NoiseSchedule, sample, model_output, t):
    """Convert the network output to an x0 prediction (fp32)."""
    a, s = alpha_sigma(schedule, t)
    x = sample.astype(jnp.float32)
    m = model_output.astype(jnp.float32)
    if schedule.prediction_type == "epsilon":
        return (x - s * m) / a
    elif schedule.prediction_type == "v_prediction":
        return a * x - s * m
    elif schedule.prediction_type == "sample":
        return m
    raise ValueError(schedule.prediction_type)


def to_epsilon(schedule: NoiseSchedule, sample, model_output, t):
    """Convert the network output to an epsilon prediction (fp32)."""
    a, s = alpha_sigma(schedule, t)
    x = sample.astype(jnp.float32)
    m = model_output.astype(jnp.float32)
    if schedule.prediction_type == "epsilon":
        return m
    elif schedule.prediction_type == "v_prediction":
        return a * m + s * x
    elif schedule.prediction_type == "sample":
        return (x - a * m) / s
    raise ValueError(schedule.prediction_type)
