"""DPM-Solver++ multistep (orders 1-3) — pure scan math.

Behavioral spec: /root/reference/ldm/models/diffusion/dpm_solver/
dpm_solver.py:7-1153 (full DPM_Solver, orders 1-3 single/multistep; the
practically-used configuration is the 2nd-order multistep data-prediction
variant, equivalent to diffusers' DPMSolverMultistepScheduler
algorithm_type="dpmsolver++"; order 3 matches its solver_order=3).

Math (log-SNR space, lambda = log(alpha/sigma), h = lambda_prev - lambda_t,
phi1 = e^{-h} - 1, all data-prediction):
  order 1:  x = (sigma_p/sigma_t) x - alpha_p phi1 x0_t
  order 2:  D = (1 + 1/(2r0)) x0_t - 1/(2r0) x0_{t-1}      (r0 = h_0/h)
            x = (sigma_p/sigma_t) x - alpha_p phi1 D
  order 3:  D1_0 = (x0_t - x0_{t-1})/r0, D1_1 = (x0_{t-1} - x0_{t-2})/r1
            D1 = D1_0 + r0/(r0+r1) (D1_0 - D1_1)
            D2 = (D1_0 - D1_1)/(r0+r1)                      (r1 = h_1/h)
            x = (sigma_p/sigma_t) x - alpha_p phi1 x0_t
                + alpha_p (phi1/h + 1) D1
                - alpha_p ((phi1 + h)/h^2 - 1/2) D2
Order ramps with warmup (min(order, step+1)) and drops toward the end
(min(..., n-step)); see dpm_step for why the tail drop is unconditional
here while diffusers gates it on < 15 steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from editanything_tpu.samplers import schedule as sched


class DPMState(NamedTuple):
    sample: jnp.ndarray
    x0_prev: jnp.ndarray
    x0_prev2: jnp.ndarray
    h_prev: jnp.ndarray         # scalar
    h_prev2: jnp.ndarray        # scalar


def dpm_init(sample) -> DPMState:
    x = sample.astype(jnp.float32)
    return DPMState(x, jnp.zeros_like(x), jnp.zeros_like(x),
                    jnp.asarray(0.0, jnp.float32),
                    jnp.asarray(0.0, jnp.float32))


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
             ts, step, *, order: int = 2):
    """One DPM-Solver++ multistep update; `ts` is the full timestep grid
    and `step` the scan counter. Effective order per step is
    min(order, step+1, n-step): warmup ramps 1 -> order and the tail
    drops back down (see inline comment for why the tail drop is
    unconditional in this discretization)."""
    n = ts.shape[0]
    t = ts[step]
    t_prev = jnp.where(step + 1 < n, ts[jnp.minimum(step + 1, n - 1)], -1)

    x = state.sample
    x0 = _to_x0(schedule, x, model_output, t)

    a_t, s_t, lam_t = _alpha_sigma_lambda(schedule, t)
    a_p, s_p, lam_p = _alpha_sigma_lambda(schedule, t_prev)
    h = lam_p - lam_t
    phi1 = jnp.exp(-h) - 1.0
    hs = jnp.where(h == 0, 1.0, h)

    # warmup ramp AND unconditional lower-order tail. diffusers gates the
    # tail drop on len(timesteps) < 15, but its sigma schedule never steps
    # to sigma=0; ours ends at final_alpha_cumprod (t_prev = -1), where
    # lambda jumps by ~10 and multistep extrapolation through that h
    # diverges (measured: order 2 at the final step turns a 0.02 endpoint
    # error into 0.6). The tail drop is a stability requirement of this
    # discretization, not an option.
    eff = jnp.minimum(jnp.minimum(order, step + 1), n - step)

    r0 = jnp.maximum(state.h_prev / hs, 1e-8)
    d2 = (1.0 + 1.0 / (2.0 * r0)) * x0 \
        - (1.0 / (2.0 * r0)) * state.x0_prev
    d = jnp.where(eff >= 2, d2, x0)

    x_new = (s_p / s_t) * x - a_p * phi1 * d
    if order >= 3:
        r1 = jnp.maximum(state.h_prev2 / hs, 1e-8)
        d1_0 = (x0 - state.x0_prev) / r0
        d1_1 = (state.x0_prev - state.x0_prev2) / r1
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        dd2 = (d1_0 - d1_1) / (r0 + r1)
        x3 = (s_p / s_t) * x - a_p * phi1 * x0 \
            + a_p * (phi1 / hs + 1.0) * d1 \
            - a_p * ((phi1 + hs) / (hs * hs) - 0.5) * dd2
        x_new = jnp.where(eff >= 3, x3, x_new)

    new_state = DPMState(x_new, x0, state.x0_prev, h, state.h_prev)
    return new_state, x_new
