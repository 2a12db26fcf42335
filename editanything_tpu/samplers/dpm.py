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
import numpy as np

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


# ---------------------------------------------------------------------------
# DPM-Solver++ singlestep (orders 1-3)
# ---------------------------------------------------------------------------
#
# Behavioral spec: /root/reference/ldm/models/diffusion/dpm_solver/
# dpm_solver.py:515 (singlestep_dpm_solver_second_update) and :599
# (..._third_update), predict_x0 + solver_type='dpm_solver'. The reference
# places the intra-block evaluation points at fixed log-SNR fractions
# (r1=1/2 for order 2; r1=1/3, r2=2/3 for order 3) of each block's
# [lambda_s, lambda_t] interval. Our timestep grid is discrete (integer
# indices into alphas_cumprod), so the plan builder snaps each fraction to
# the nearest discrete timestep and the step math recomputes the ACTUAL
# r-fractions from the snapped grid — the update stays an exact solver for
# the chosen discretization rather than approximating the continuous one.


class SinglestepPlan(NamedTuple):
    """Host-side (numpy, static) per-model-eval schedule for a singlestep
    run. All arrays have length num_steps = total model evaluations."""
    ts: np.ndarray        # timestep of each model eval
    phase: np.ndarray     # 0-based position within the current block
    bsize: np.ndarray     # total evals in the current block (1, 2 or 3)
    t_end: np.ndarray     # block's target timestep (-1 = clean sample)


def singlestep_plan(schedule: sched.NoiseSchedule, num_steps: int,
                    order: int) -> SinglestepPlan:
    """Split `num_steps` model evals into order-sized blocks.

    Blocks of `order` evals over a uniform outer timestep grid (reference
    get_orders_and_timesteps_for_singlestep_solver, dpm_solver.py:219-247,
    'time_uniform' skip), with two placement choices the discrete grid
    forces:
    - the final update targets alpha_cumprod = 1 (t = -1), where lambda
      jumps by ~10 and any extrapolation through that interval diverges, so
      one eval is reserved for a dedicated order-1 block [0, -1] — the
      endpoint is then exactly the x0 prediction at t=0 (same stability
      requirement as the multistep tail drop);
    - the leftover (num_steps-1) % order block runs FIRST, at high t where
      lambda varies slowest — a low-order block over the near-clean tail
      (where lambda changes fastest per timestep) costs ~10x more endpoint
      error (measured on the analytic-ODE harness)."""
    assert 1 <= order <= 3
    main = num_steps - 1
    blocks = ([main % order] if main % order else []) \
        + [order] * (main // order) + [1]

    T = schedule.num_train_timesteps
    nb = len(blocks)
    # Outer grid [T-1, ..., 0] then the clean state: the forced order-1
    # final block is exactly [0, -1], so the run's last model eval sits at
    # t=0 and the endpoint is that x0 prediction — the final lambda jump
    # (~10 units, unreachable by any solver order) happens where the
    # prediction is already best.
    grid = (np.linspace(0, T - 1, nb).round()[::-1].astype(np.int64)
            if nb > 1 else np.asarray([T - 1], np.int64))
    outer = np.concatenate([grid, np.asarray([-1], np.int64)])

    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    lam_all = 0.5 * (np.log(acp) - np.log(np.maximum(1.0 - acp, 1e-12)))

    def lam(t):
        return lam_all[t] if t >= 0 else 0.5 * np.log(1e12)

    ts, phase, bsize, t_end = [], [], [], []
    fracs = {1: (), 2: (0.5,), 3: (1.0 / 3.0, 2.0 / 3.0)}
    for j, k in enumerate(blocks):
        t_s, t_e = int(outer[j]), int(outer[j + 1])
        pts = [t_s]
        lam_s, lam_e = lam(t_s), lam(t_e)
        for r in fracs[k]:
            target = lam_s + r * (lam_e - lam_s)
            # lambda is monotonically decreasing in t: nearest discrete t,
            # clamped strictly inside the block. A block too narrow to hold
            # an interior point (t_s - 1 < t_e + 1) degenerates to
            # repeating t_s: the phase-0 move is then a no-op (h = 0 guard)
            # and the phase-1 correction vanishes exactly (the two model
            # evals see identical sample and t, so m_s1 - m_s == 0).
            lo, hi = max(t_e, 0) + 1, t_s - 1
            if lo > hi:
                ti = t_s
            else:
                ti = int(np.argmin(np.abs(lam_all - target)))
                ti = int(np.clip(ti, lo, hi))
            pts.append(ti)
        for p, t in enumerate(pts):
            ts.append(t)
            phase.append(p)
            bsize.append(k)
            t_end.append(t_e)
    return SinglestepPlan(np.asarray(ts, np.int64),
                          np.asarray(phase, np.int64),
                          np.asarray(bsize, np.int64),
                          np.asarray(t_end, np.int64))


class SinglestepState(NamedTuple):
    sample: jnp.ndarray     # running sample (always at the NEXT eval's t)
    x_s: jnp.ndarray        # sample at the current block's start
    m_s: jnp.ndarray        # x0 prediction at block start
    m_s1: jnp.ndarray       # x0 prediction at first intermediate


def singlestep_init(sample) -> SinglestepState:
    x = sample.astype(jnp.float32)
    z = jnp.zeros_like(x)
    return SinglestepState(x, z, z, z)


def singlestep_step(schedule: sched.NoiseSchedule, state: SinglestepState,
                    model_output, plan_ts, plan_phase, plan_bsize,
                    plan_t_end, step):
    """One model-eval-granularity update of the singlestep solver.

    plan_* are the (device-resident) SinglestepPlan arrays; `step` is the
    scan counter. Returns (state, new_sample). The running sample after
    eval i always sits at noise level plan_ts[i+1] (or t_end at a block's
    last eval), so step-indexed consumers (inpaint latent blending) treat
    it exactly like the multistep samplers' output."""
    i = step
    n = plan_ts.shape[0]
    phase = plan_phase[i]
    k = plan_bsize[i]
    t_i = plan_ts[i]
    t_e = plan_t_end[i]
    t_s = plan_ts[jnp.maximum(i - phase, 0)]
    t_s1 = plan_ts[jnp.minimum(jnp.maximum(i - phase + 1, 0), n - 1)]

    x0 = _to_x0(schedule, state.sample, model_output, jnp.maximum(t_i, 0))
    x_s = jnp.where(phase == 0, state.sample, state.x_s)
    m_s = jnp.where(phase == 0, x0, state.m_s)
    m_s1 = jnp.where(phase == 1, x0, state.m_s1)

    a_s, s_s, lam_s = _alpha_sigma_lambda(schedule, t_s)
    a_s1, s_s1, lam_s1 = _alpha_sigma_lambda(schedule, t_s1)
    a_e, s_e, lam_e = _alpha_sigma_lambda(schedule, t_e)
    h = lam_e - lam_s
    hs = jnp.where(h == 0, 1.0, h)
    r1 = jnp.clip((lam_s1 - lam_s) / hs, 1e-4, 1.0 - 1e-4)

    last = phase == k - 1

    # --- phase 0: first-order move from s to the next grid point
    #     (the intermediate s1, or t_end when the block is order 1)
    a_n = jnp.where(last, a_e, a_s1)
    s_n = jnp.where(last, s_e, s_s1)
    lam_n = jnp.where(last, lam_e, lam_s1)
    x_p0 = (s_n / s_s) * x_s - a_n * jnp.expm1(-(lam_n - lam_s)) * m_s

    # --- phase 1, order 2 (dpm_solver.py:546-556): close the block
    phi1 = jnp.expm1(-h)
    x_p1_close = (s_e / s_s) * x_s - a_e * phi1 * m_s \
        - (0.5 / r1) * a_e * phi1 * (m_s1 - m_s)

    # --- phase 1, order 3 (dpm_solver.py:648-656): move to s2
    #     (= plan_ts[i+1]); r2 is s2's actual lambda fraction
    t_s2 = plan_ts[jnp.minimum(i + 1, n - 1)]
    a_s2, s_s2, lam_s2 = _alpha_sigma_lambda(schedule, t_s2)
    r2 = jnp.clip((lam_s2 - lam_s) / hs, 1e-4, 1.0 - 1e-4)
    phi12 = jnp.expm1(-r2 * h)
    phi22 = phi12 / (r2 * hs) + 1.0
    x_p1_mid = (s_s2 / s_s) * x_s - a_s2 * phi12 * m_s \
        + (r2 / r1) * a_s2 * phi22 * (m_s1 - m_s)

    # --- phase 2, order 3 (dpm_solver.py:658-663): close the block.
    #     r2 here must be SELF's fraction: at phase 2, t_i IS s2.
    a_i, s_i, lam_i = _alpha_sigma_lambda(schedule, t_i)
    r2_self = jnp.clip((lam_i - lam_s) / hs, 1e-4, 1.0 - 1e-4)
    phi2 = phi1 / hs + 1.0
    x_p2 = (s_e / s_s) * x_s - a_e * phi1 * m_s \
        + (1.0 / r2_self) * a_e * phi2 * (x0 - m_s)

    x_new = jnp.where(
        phase == 0, x_p0,
        jnp.where(phase == 1, jnp.where(last, x_p1_close, x_p1_mid), x_p2))

    new_state = SinglestepState(x_new, x_s, m_s, m_s1)
    return new_state, x_new
