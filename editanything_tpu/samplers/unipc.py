"""UniPC multistep sampler (predictor-corrector, bh2) as pure scan math.

The reference gets UniPC from diffusers' UniPCMultistepScheduler
(/root/reference/editany_lora.py:383 sets it as THE inference scheduler).
This is a from-scratch implementation of the UniPC algorithm (Zhao et al.,
"UniPC: A Unified Predictor-Corrector Framework for Fast Sampling of
Diffusion Models") specialized the way SD uses it:

- data-prediction mode (model outputs converted to x0 predictions)
- bh2 variant (B(h) = expm1(h)), solver order 2, lower-order warmup
- corrector applied from the 2nd step on, using the fresh model output

Everything is expressed over a fixed-size history buffer so the whole
sampling loop compiles once under `lax.scan` (SURVEY.md section 7, engine/).
State is fp32; the 2x2 corrector solve is closed-form (no linalg in the
compiled graph).

Algebra (data prediction). With lambda = log(alpha/sigma), h = lambda_t -
lambda_s0, hh = -h, phi1 = expm1(hh), B_h = phi1 (bh2):
  predictor order 1:  x_t = (sigma_t/sigma_s0) x - alpha_t phi1 m0
  predictor order 2:  ... - alpha_t B_h rho_p D1,  rho_p = (phi1/hh - 1)/B_h,
                      D1 = (m1 - m0)/r0, r0 = (lambda_s1 - lambda_s0)/h
  corrector order 1:  x_t = x_t^P-form with + alpha_t B_h * 0.5 * (m_t - m0)
  corrector order 2:  solve [[1,1],[r0,1]] rho = [b1, b2],
                      b1 = (phi1/hh - 1)/B_h, b2 = 2*((phi1/hh - 1)/hh - 0.5)/B_h
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from editanything_tpu.samplers import schedule as sched


class UniPCState(NamedTuple):
    sample: jnp.ndarray         # current x_t (model input for this step)
    last_sample: jnp.ndarray    # x at previous timestep (pre-predictor)
    m_hist: jnp.ndarray         # (2, *shape) x0-prediction history; [0] newest
    step_index: jnp.ndarray     # i32 scalar
    t_hist: jnp.ndarray         # (2,) i32 timesteps of m_hist entries


def _lambda(schedule: sched.NoiseSchedule, t):
    a, s = sched.alpha_sigma(schedule, t)
    return jnp.log(a) - jnp.log(s)


def unipc_init(sample) -> UniPCState:
    x = sample.astype(jnp.float32)
    return UniPCState(
        sample=x,
        last_sample=jnp.zeros_like(x),
        m_hist=jnp.zeros((2,) + x.shape, jnp.float32),
        step_index=jnp.asarray(0, jnp.int32),
        t_hist=jnp.zeros((2,), jnp.int32),
    )


def _uni_p(schedule, x, m0, m1, t_next, s0, s1, order):
    """Predictor update: x at s0 -> x at t_next, using x0 preds m0@s0, m1@s1."""
    a_t, sig_t = sched.alpha_sigma(schedule, t_next)
    _, sig_s0 = sched.alpha_sigma(schedule, s0)
    lam_t = _lambda(schedule, t_next)
    lam_s0 = _lambda(schedule, s0)
    lam_s1 = _lambda(schedule, s1)
    h = lam_t - lam_s0
    hh = -h
    phi1 = jnp.expm1(hh)
    b_h = phi1  # bh2
    x_t1 = (sig_t / sig_s0) * x - a_t * phi1 * m0

    r0 = (lam_s1 - lam_s0) / h
    rho_p = (phi1 / hh - 1.0) / b_h
    d1 = (m1 - m0) / jnp.where(r0 == 0, 1.0, r0)
    second = -a_t * b_h * rho_p * d1
    return jnp.where(order >= 2, x_t1 + second, x_t1)


def _uni_c(schedule, last_x, this_x, m_t, m0, m1, t, s0, s1, order):
    """Corrector: refine this_x (predictor output at t) with fresh x0 pred m_t@t.

    last_x is the sample at s0 the predictor started from.
    """
    a_t, sig_t = sched.alpha_sigma(schedule, t)
    _, sig_s0 = sched.alpha_sigma(schedule, s0)
    lam_t = _lambda(schedule, t)
    lam_s0 = _lambda(schedule, s0)
    lam_s1 = _lambda(schedule, s1)
    h = lam_t - lam_s0
    hh = -h
    phi1 = jnp.expm1(hh)
    b_h = phi1

    x_t1 = (sig_t / sig_s0) * last_x - a_t * phi1 * m0
    d1_t = m_t - m0

    # order 1: rho_c = [0.5] applied to D1_t
    corr1 = -a_t * b_h * 0.5 * d1_t

    # order 2: rhos = solve([[1, 1], [r0, 1]], [b1, b2])
    r0 = (lam_s1 - lam_s0) / h
    b1 = (phi1 / hh - 1.0) / b_h
    b2 = 2.0 * ((phi1 / hh - 1.0) / hh - 0.5) / b_h
    denom = jnp.where(r0 == 1.0, 1.0, 1.0 - r0)
    rho0 = (b1 - b2) / denom
    rho1 = b1 - rho0
    d1_0 = (m1 - m0) / jnp.where(r0 == 0, 1.0, r0)
    corr2 = -a_t * b_h * (rho0 * d1_0 + rho1 * d1_t)

    corr = jnp.where(order >= 2, corr2, corr1)
    return x_t1 + corr


def unipc_step(schedule: sched.NoiseSchedule, state: UniPCState, model_output,
               timesteps: jnp.ndarray, *, order: int = 2, step=None):
    """One UniPC step inside a compiled loop.

    `model_output` is the raw network output at (state.sample,
    timesteps[i]). `timesteps` is the full descending grid; index past the
    end resolves to -1 (the clean state). Returns (new_state, prev_sample);
    prev_sample is the model input for the next step, in fp32.

    `step`: the loop counter. Inside `lax.scan`, ALWAYS pass the counter from
    the scan xs (e.g. `jax.lax.scan(body, st, jnp.arange(n))`), not from the
    carried state: the TPU backend in this environment miscompiles
    predicates on scan-carried scalars (they observe the post-increment
    value), which silently corrupts the order/corrector gating. Eager
    callers may omit it and rely on state.step_index.
    """
    i = state.step_index if step is None else jnp.asarray(step, jnp.int32)
    n = timesteps.shape[0]
    t_cur = timesteps[i]
    t_next = jnp.where(i + 1 < n, timesteps[jnp.minimum(i + 1, n - 1)], -1)

    m_t = sched.to_x0(schedule, state.sample, model_output, t_cur)

    s0 = state.t_hist[0]
    s1 = state.t_hist[1]
    m0 = state.m_hist[0]
    m1 = state.m_hist[1]

    # Effective order ramps up over the first steps (history warmup) and back
    # down at the tail ("lower_order_final": the final predictor step must be
    # order 1 so x_{t=-1} = pred_x0 exactly — higher orders divide by the
    # vanishing lambda gap).
    max_order = jnp.asarray(order, jnp.int32)

    # ---- corrector for the previous predictor step (skipped at i == 0);
    # its order is whatever the previous predictor used.
    c_order = jnp.minimum(jnp.minimum(max_order, i), n - i + 1)
    corrected = _uni_c(schedule, state.last_sample, state.sample, m_t,
                       m0, m1, t_cur, s0, s1, c_order)
    x = jnp.where(i > 0, corrected, state.sample)

    # ---- shift history: m_t becomes m0 (evaluated at t_cur)
    m_hist = jnp.stack([m_t, m0])
    t_hist = jnp.stack([t_cur, s0]).astype(jnp.int32)

    # ---- predictor to t_next
    p_order = jnp.minimum(jnp.minimum(i + 1, max_order), n - i)
    prev = _uni_p(schedule, x, m_hist[0], m_hist[1], t_next,
                  t_hist[0], t_hist[1], p_order)

    new_state = UniPCState(
        sample=prev,
        last_sample=x,
        m_hist=m_hist,
        step_index=i + 1,
        t_hist=t_hist,
    )
    return new_state, prev
