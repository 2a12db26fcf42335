"""DPM-Solver++ (2M multistep) — pure scan math.

Behavioral spec: /root/reference/ldm/models/diffusion/dpm_solver/
dpm_solver.py:7-1153 (full DPM_Solver, orders 1-3 single/multistep; the
practically-used configuration is the 2nd-order multistep data-prediction
variant, equivalent to diffusers' DPMSolverMultistepScheduler
algorithm_type="dpmsolver++", solver_order=2).

Math (log-SNR space, lambda = log(alpha/sigma)):
  h   = lambda_prev - lambda_t
  D   = x0_t                                  (first step)
      = (1 + 1/(2r)) x0_t - 1/(2r) x0_{t-1}   (r = h_prev/h)
  x   = (sigma_prev/sigma_t) x - alpha_prev (e^{-h} - 1) D
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from editanything_tpu.samplers import schedule as sched


class DPMState(NamedTuple):
    sample: jnp.ndarray
    x0_prev: jnp.ndarray
    h_prev: jnp.ndarray         # scalar


def dpm_init(sample) -> DPMState:
    x = sample.astype(jnp.float32)
    return DPMState(x, jnp.zeros_like(x), jnp.asarray(0.0, jnp.float32))


def _alpha_sigma_lambda(schedule, t):
    a = jnp.where(t >= 0, schedule.alphas_cumprod[jnp.maximum(t, 0)],
                  schedule.final_alpha_cumprod)
    alpha = jnp.sqrt(a)
    sigma = jnp.sqrt(jnp.maximum(1.0 - a, 1e-12))
    return alpha, sigma, jnp.log(alpha) - jnp.log(sigma)


def _to_x0(schedule, sample, model_output, t):
    a = schedule.alphas_cumprod[t]
    sa, ss = jnp.sqrt(a), jnp.sqrt(1.0 - a)
    out = model_output.astype(jnp.float32)
    if schedule.prediction_type == "v_prediction":
        return sa * sample - ss * out
    return (sample - ss * out) / sa


def dpm_step(schedule: sched.NoiseSchedule, state: DPMState, model_output,
             ts, step):
    """One DPM-Solver++(2M) update; `ts` is the full timestep grid and
    `step` the scan counter (order ramps 1 -> 2 after the first step; the
    final step drops to order 1 for stability, diffusers' lower_order_final)."""
    n = ts.shape[0]
    t = ts[step]
    t_prev = jnp.where(step + 1 < n, ts[jnp.minimum(step + 1, n - 1)], -1)

    x = state.sample
    x0 = _to_x0(schedule, x, model_output, t)

    a_t, s_t, lam_t = _alpha_sigma_lambda(schedule, t)
    a_p, s_p, lam_p = _alpha_sigma_lambda(schedule, t_prev)
    h = lam_p - lam_t

    r = state.h_prev / jnp.where(h == 0, 1.0, h)
    d2 = (1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-8))) * x0 \
        - (1.0 / (2.0 * jnp.maximum(r, 1e-8))) * state.x0_prev
    use_first_order = (step == 0) | (step == n - 1)
    d = jnp.where(use_first_order, x0, d2)

    x_new = (s_p / s_t) * x - a_p * (jnp.exp(-h) - 1.0) * d
    return DPMState(x_new, x0, h), x_new
