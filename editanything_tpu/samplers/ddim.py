"""DDIM step math as a pure function.

Re-implements the update rule of the reference's DDIM samplers
(/root/reference/cldm/ddim_hacked.py:181-231 `p_sample_ddim`, incl. the
v-parameterization branches at :194-197 and :214-217) without the schedule
buffers / object state: callers pass the NoiseSchedule and both timesteps.
"""

from __future__ import annotations

import jax.numpy as jnp

from editanything_tpu.samplers import schedule as sched


def ddim_step(schedule: sched.NoiseSchedule, sample, model_output, t, t_prev,
              *, eta: float = 0.0, noise=None):
    """One x_t -> x_{t_prev} DDIM update. Returns (prev_sample, pred_x0).

    t_prev = -1 denotes the final step to the clean sample (alpha_bar = 1).
    All math in fp32; result cast back to `sample.dtype`.
    """
    a_t, s_t = sched.alpha_sigma(schedule, t)
    a_prev, s_prev = sched.alpha_sigma(schedule, t_prev)

    x = sample.astype(jnp.float32)
    pred_x0 = sched.to_x0(schedule, x, model_output, t)
    eps = sched.to_epsilon(schedule, x, model_output, t)

    if eta > 0.0:
        # sigma_t from the DDIM paper eq. (16)
        var = (s_prev / s_t) ** 2 * (1.0 - (a_t / a_prev) ** 2)
        sigma = eta * jnp.sqrt(var)
    else:
        sigma = jnp.asarray(0.0, jnp.float32)

    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev ** 2 - sigma ** 2, 0.0)) * eps
    prev = a_prev * pred_x0 + dir_xt
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        prev = prev + sigma * noise.astype(jnp.float32)
    return prev.astype(sample.dtype), pred_x0.astype(sample.dtype)


def stochastic_encode(schedule: sched.NoiseSchedule, x0, t, noise):
    """x0 -> x_t by forward diffusion (ddim_hacked.py:254-266
    `stochastic_encode`): the img2img entry — noise a clean latent to an
    intermediate timestep, then `decode` denoises from there."""
    return sched.add_noise(schedule, x0.astype(jnp.float32),
                           noise.astype(jnp.float32), t)


def ddim_encode_step(schedule: sched.NoiseSchedule, sample, model_output,
                     t, t_next):
    """One DETERMINISTIC inversion step x_t -> x_{t_next} with t_next > t
    (ddim_hacked.py:234-252 `encode`): runs the DDIM ODE backwards so a
    real image can be inverted into the latent trajectory (used for
    faithful img2img / editing without a mask)."""
    a_t, s_t = sched.alpha_sigma(schedule, t)
    a_next, s_next = sched.alpha_sigma(schedule, t_next)
    x = sample.astype(jnp.float32)
    pred_x0 = sched.to_x0(schedule, x, model_output, t)
    eps = sched.to_epsilon(schedule, x, model_output, t)
    return a_next * pred_x0 + s_next * eps
