"""PLMS (pseudo linear multistep) sampler — pure scan math.

Behavioral spec: /root/reference/ldm/models/diffusion/plms.py:12-244
(`PLMSSampler`): Adams-Bashforth multistep over eps predictions with the
DDIM x_prev formula; warm-up uses the 2nd-order midpoint ("prime") rule
(p_sample_plms :163-236: 1st step Euler+midpoint correction, then 2/3/4th
order AB coefficients over the eps history).

State carries the last 3 eps predictions in fixed slots; the order ramps
up with the step counter (scan xs), never via data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from editanything_tpu.samplers import schedule as sched


class PLMSState(NamedTuple):
    sample: jnp.ndarray
    eps_hist: jnp.ndarray       # (3, *sample.shape) newest first


def plms_init(sample) -> PLMSState:
    x = sample.astype(jnp.float32)
    return PLMSState(x, jnp.zeros((3,) + x.shape, jnp.float32))


def _to_eps(schedule, sample, model_output, t):
    """Convert the model output to an eps prediction (handles v-param,
    ddpm.py:893-900)."""
    a = schedule.alphas_cumprod[t]
    sa, ss = jnp.sqrt(a), jnp.sqrt(1.0 - a)
    out = model_output.astype(jnp.float32)
    if schedule.prediction_type == "v_prediction":
        return sa * out + ss * sample
    return out


def _x_prev(schedule, sample, eps, t, t_prev):
    """DDIM deterministic step given an eps estimate (plms.py:181-191)."""
    a_t = schedule.alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0,
                       schedule.alphas_cumprod[jnp.maximum(t_prev, 0)],
                       schedule.final_alpha_cumprod)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


def plms_step(schedule: sched.NoiseSchedule, state: PLMSState, model_output,
              model_output_next, t, t_prev, step):
    """One PLMS update.

    `model_output_next`: the model re-evaluated at (x_prev_1st, t_prev) —
    only used at step 0 for the midpoint warm-up (callers may pass the
    same output again to skip the extra eval; that degrades step 0 to
    Euler, matching `old_eps == []` + no corrector)."""
    x = state.sample
    eps = _to_eps(schedule, x, model_output, t)
    h = state.eps_hist

    e2 = (3 * eps - h[0]) / 2
    e3 = (23 * eps - 16 * h[0] + 5 * h[1]) / 12
    e4 = (55 * eps - 59 * h[0] + 37 * h[1] - 9 * h[2]) / 24
    # step 0: midpoint of eps(t) and eps(t_prev) (plms.py:220-224)
    eps_next = _to_eps(schedule, _x_prev(schedule, x, eps, t, t_prev),
                       model_output_next, jnp.maximum(t_prev, 0))
    e0 = (eps + eps_next) / 2

    eps_prime = jnp.where(step == 0, e0,
                          jnp.where(step == 1, e2,
                                    jnp.where(step == 2, e3, e4)))
    x_new = _x_prev(schedule, x, eps_prime, t, t_prev)
    hist = jnp.concatenate([eps[None], h[:2]], axis=0)
    return PLMSState(x_new, hist), x_new
