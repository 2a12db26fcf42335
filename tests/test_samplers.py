"""Sampler correctness via analytic diffusion properties.

diffusers isn't available in this image, so instead of golden traces we test
against closed-form structure: for data ~ N(mu, s2), E[x0 | x_t] is linear in
x_t, so an "exact" trajectory is computable by integrating the probability-
flow ODE on the full 1000-step grid. Any correct sampler must (a) track it,
(b) converge at its design order on interior intervals (the final jump to the
clean state is inherently first-order in the grid for every sampler — the
remaining posterior variance is O(t_last) — so order is measured away from
the endpoint), and (c) be exactly scan/jit-compatible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.samplers import (
    make_schedule, make_timesteps, add_noise, ddim_step,
    unipc_init, unipc_step,
)
from editanything_tpu.samplers import schedule as sched


SCHED = make_schedule()
MU, S2 = 0.7, 0.25


def _eps_model(x, t):
    a, sig = sched.alpha_sigma(SCHED, t)
    x0 = (a * S2 * x + sig**2 * MU) / (a**2 * S2 + sig**2)
    return (x - a * x0) / sig


@jax.jit
def _run_ddim(x, ts):
    n = len(ts)

    def body(x, i):
        t = ts[i]
        t_prev = jnp.where(i + 1 < n, ts[jnp.minimum(i + 1, n - 1)], -1)
        x, _ = ddim_step(SCHED, x, _eps_model(x, t), t, t_prev)
        return x, ()

    return jax.lax.scan(body, x, jnp.arange(n))[0]


@jax.jit
def _run_unipc(x, ts):
    """Full UniPC run; consumes every timestep, ends at the clean state.

    NOTE: `step=i` comes from the scan xs, not the carried state — the TPU
    backend miscompiles predicates on scan-carried scalars (see unipc_step
    docstring)."""
    n = len(ts)

    def body(state, i):
        eps = _eps_model(state.sample, ts[i])
        state, _ = unipc_step(SCHED, state, eps, ts, step=i)
        return state, ()

    st, _ = jax.lax.scan(body, unipc_init(x), jnp.arange(n))
    return st.sample


@jax.jit
def _run_unipc_interior(x, ts):
    """Run all but the final step: result is the sample AT ts[-1] (interior
    grid point), where design order is observable."""
    n = len(ts)

    def body(state, i):
        eps = _eps_model(state.sample, ts[i])
        state, _ = unipc_step(SCHED, state, eps, ts, step=i)
        return state, ()

    st, _ = jax.lax.scan(body, unipc_init(x), jnp.arange(n - 1))
    return st.sample


def _interior_grid(n, t_end=200):
    return jnp.asarray(
        np.linspace(999, t_end, n).round().astype(np.int64))


X_T = jnp.full((4,), 1.3, jnp.float32)


@jax.jit
def _run_ddim_interior(x, ts):
    """DDIM stepping ts[i] -> ts[i+1] only (no final jump to the clean
    state): result is the sample AT ts[-1]."""
    n = len(ts)

    def body(x, i):
        x, _ = ddim_step(SCHED, x, _eps_model(x, ts[i]), ts[i], ts[i + 1])
        return x, ()

    return jax.lax.scan(body, x, jnp.arange(n - 1))[0]


@pytest.fixture(scope="module")
def exact():
    """Fine-grid integrations: full trajectory endpoint and value at t=200."""
    full = np.asarray(_run_ddim(X_T, jnp.arange(999, -1, -1)))
    interior = np.asarray(_run_ddim_interior(X_T, jnp.arange(999, 199, -1)))
    return full[0], interior[0]


def test_ddim_tracks_exact_ode(exact):
    # DDIM is first-order: at 50 steps a few % error is the true behavior
    # (measured 0.0369 here); at 200 steps it must tighten ~4x.
    e50 = abs(float(_run_ddim(X_T, jnp.asarray(make_timesteps(50)))[0]) - exact[0])
    e200 = abs(float(_run_ddim(X_T, jnp.asarray(make_timesteps(200)))[0]) - exact[0])
    assert e50 < 0.06, e50
    assert e200 < e50 / 3, (e50, e200)


def test_ddim_first_order_convergence(exact):
    errs = [abs(float(_run_ddim(X_T, jnp.asarray(make_timesteps(n)))[0]) - exact[0])
            for n in (25, 50, 100)]
    assert errs[0] > errs[1] > errs[2], errs
    ratio = errs[0] / errs[2]
    assert 2.5 < ratio < 8, errs     # ~4 expected for order 1 over 4x steps


def test_unipc_tracks_exact_ode(exact):
    e = abs(float(_run_unipc(X_T, jnp.asarray(make_timesteps(30)))[0]) - exact[0])
    assert e < 0.05, e


def test_unipc_second_order_on_interior(exact):
    """Away from the endpoint, UniPC-2 error must shrink ~h^2.

    Coarse grids keep the error above the fp32 noise floor (~1e-4 on this
    problem): 3->9 points is 4x smaller h => ~16x less error for order 2;
    require >6x (order 1 would give ~4x)."""
    errs = [abs(float(_run_unipc_interior(X_T, _interior_grid(n))[0]) - exact[1])
            for n in (3, 5, 9)]
    assert errs[0] > errs[1] > errs[2], errs
    assert errs[0] / errs[2] > 6, errs


def test_unipc_beats_ddim_on_interior(exact):
    """At equal step budget on the interior interval, the order-2
    predictor-corrector must be far more accurate than DDIM."""
    ts = _interior_grid(11)
    e_uni = abs(float(_run_unipc_interior(X_T, ts)[0]) - exact[1])
    # DDIM over the same grid, stopping at ts[-1] (same model-eval budget)
    x = X_T
    for i in range(len(ts) - 1):
        x, _ = ddim_step(SCHED, x, _eps_model(x, ts[i]), ts[i], ts[i + 1])
    e_ddim = abs(float(x[0]) - exact[1])
    assert e_uni < e_ddim / 3, (e_uni, e_ddim)


def test_ddim_inverts_known_eps_one_step():
    """If the model returns the exact eps that was added, a single DDIM step
    t->-1 recovers x0 exactly."""
    x0 = jax.random.normal(jax.random.PRNGKey(0), (8,))
    noise = jax.random.normal(jax.random.PRNGKey(1), (8,))
    t = jnp.asarray(500)
    x_t = add_noise(SCHED, x0, noise, t)
    got, pred_x0 = ddim_step(SCHED, x_t, noise, t, jnp.asarray(-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-5)


def test_v_prediction_consistency():
    """v-param and eps-param must produce identical DDIM steps when the model
    outputs are consistent (SD2.1 v-parameterization, ddpm.py:893-900)."""
    sch_eps = make_schedule(prediction_type="epsilon")
    sch_v = make_schedule(prediction_type="v_prediction")
    x = jax.random.normal(jax.random.PRNGKey(2), (6,))
    eps = jax.random.normal(jax.random.PRNGKey(3), (6,))
    t, t_prev = jnp.asarray(700), jnp.asarray(650)
    a, s = sched.alpha_sigma(sch_eps, t)
    x0 = (x - s * eps) / a
    v = a * eps - s * x0
    out_eps, _ = ddim_step(sch_eps, x, eps, t, t_prev)
    out_v, _ = ddim_step(sch_v, x, v, t, t_prev)
    np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out_v), atol=1e-5)


def test_unipc_scan_matches_eager():
    """The compiled scan trajectory must bit-match the eager step loop."""
    ts = jnp.asarray(make_timesteps(12))
    got = np.asarray(_run_unipc(X_T, ts))

    state = unipc_init(X_T)
    for i in range(len(ts)):
        eps = _eps_model(state.sample, ts[i])
        state, _ = unipc_step(SCHED, state, eps, ts)
    # compiled-scan vs eager op-by-op differ only by fp reassociation
    np.testing.assert_allclose(got, np.asarray(state.sample), atol=1e-4)
    assert np.all(np.isfinite(got))


def test_unipc_final_step_is_exact_x0():
    """The last predictor step (to the clean state) must return exactly the
    model's x0 prediction — any higher-order term there divides by a
    vanishing lambda gap."""
    ts = jnp.asarray(make_timesteps(6))
    state = unipc_init(X_T)
    for i in range(len(ts)):
        pre_sample = state.sample          # the model-eval point
        eps = _eps_model(state.sample, ts[i])
        state, _ = unipc_step(SCHED, state, eps, ts)
    # the final predictor (order clamped to 1) emits exactly the x0
    # prediction made at the final model-eval point — never a blow-up
    final_x0 = sched.to_x0(SCHED, pre_sample,
                           _eps_model(pre_sample, ts[-1]), ts[-1])
    np.testing.assert_allclose(np.asarray(state.sample),
                               np.asarray(final_x0), atol=1e-5)
    assert np.all(np.isfinite(np.asarray(state.sample)))


def test_timestep_grids():
    ts = make_timesteps(50, spacing="linspace")
    # linspace drops the trailing t=0 (the sampler's final step targets the
    # clean state itself), so the grid ends at ~T/steps
    assert ts[0] == 999 and ts[-1] == 20 and len(ts) == 50
    assert all(np.diff(ts) < 0)
    ts = make_timesteps(50, spacing="leading", steps_offset=1)
    assert len(ts) == 50 and ts[-1] == 1
    ts = make_timesteps(50, spacing="trailing")
    assert ts[0] == 999 and len(ts) == 50


def test_add_noise_matches_q_sample_formula():
    x0 = jnp.ones((3,))
    noise = jnp.full((3,), 2.0)
    t = jnp.asarray(100)
    abar = SCHED.alphas_cumprod[100]
    want = np.sqrt(abar) * 1.0 + np.sqrt(1 - abar) * 2.0
    np.testing.assert_allclose(np.asarray(add_noise(SCHED, x0, noise, t)),
                               np.full(3, want), rtol=1e-6)


# ---------------------------------------------------------------------------
# PLMS + DPM-Solver++ (plms.py / dpm.py)
# ---------------------------------------------------------------------------

from editanything_tpu.samplers import (plms_init, plms_step,
                                       dpm_init, dpm_step)


@jax.jit
def _run_plms(x, ts):
    n = len(ts)

    def body(state, i):
        t = ts[i]
        t_prev = jnp.where(i + 1 < n, ts[jnp.minimum(i + 1, n - 1)], -1)
        out = _eps_model(state.sample, t)
        from editanything_tpu.samplers import plms as P
        eps = P._to_eps(SCHED, state.sample, out, t)
        x1 = P._x_prev(SCHED, state.sample, eps, t, t_prev)
        out_next = jax.lax.cond(
            i == 0, lambda _: _eps_model(x1, jnp.maximum(t_prev, 0)),
            lambda _: out, None)
        state, _ = plms_step(SCHED, state, out, out_next, t, t_prev, i)
        return state, ()

    return jax.lax.scan(body, plms_init(x), jnp.arange(n))[0].sample


@jax.jit
def _run_dpm(x, ts):
    n = len(ts)

    def body(state, i):
        out = _eps_model(state.sample, ts[i])
        state, _ = dpm_step(SCHED, state, out, ts, i)
        return state, ()

    return jax.lax.scan(body, dpm_init(x), jnp.arange(n))[0].sample


def test_plms_tracks_exact_ode(exact):
    e = abs(float(_run_plms(X_T, jnp.asarray(make_timesteps(50)))[0])
            - exact[0])
    assert e < 0.05, e


def test_plms_beats_ddim(exact):
    ts = jnp.asarray(make_timesteps(50))
    e_plms = abs(float(_run_plms(X_T, ts)[0]) - exact[0])
    e_ddim = abs(float(_run_ddim(X_T, ts)[0]) - exact[0])
    assert e_plms < e_ddim, (e_plms, e_ddim)


def test_dpm_tracks_exact_ode(exact):
    e = abs(float(_run_dpm(X_T, jnp.asarray(make_timesteps(30)))[0])
            - exact[0])
    assert e < 0.05, e


def test_dpm_beats_ddim(exact):
    ts = jnp.asarray(make_timesteps(30))
    e_dpm = abs(float(_run_dpm(X_T, ts)[0]) - exact[0])
    e_ddim = abs(float(_run_ddim(X_T, ts)[0]) - exact[0])
    assert e_dpm < e_ddim, (e_dpm, e_ddim)


def test_new_samplers_in_engine():
    """plms/dpm compile inside the full denoise program."""
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    ucfg = C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)
    params = {"unet": U.init_unet(jax.random.PRNGKey(0), ucfg),
              "controlnets": []}
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = {"cond": jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32)),
           "uncond": jnp.zeros((1, 4, 32))}
    for sampler in ("plms", "dpm"):
        cfg = DenoiseConfig(unet=ucfg, num_steps=3, sampler=sampler)
        run = jax.jit(build_denoiser(cfg, SCHED, make_timesteps(3)))
        out = run(params, lat, ctx, {"guidance_scale": 5.0})
        assert np.isfinite(np.asarray(out)).all(), sampler


def test_ddim_invert_then_sample_roundtrip():
    """encode (inversion) + ddim_step back must converge to the start as
    the grid refines (the ODE is reversible; discretization error is
    first-order)."""
    from editanything_tpu.samplers.ddim import ddim_encode_step
    x0 = jnp.full((4,), MU, jnp.float32) + 0.1

    def roundtrip(n_steps):
        ts = np.linspace(0, 600, n_steps + 1).round().astype(int).tolist()
        x = x0
        for t, t_next in zip(ts[:-1], ts[1:]):
            x = ddim_encode_step(SCHED, x, _eps_model(x, t), t, t_next)
        for t, t_prev in zip(reversed(ts[1:]), reversed(ts[:-1])):
            x, _ = ddim_step(SCHED, x, _eps_model(x, t), t, t_prev)
        return abs(float(x[0]) - float(x0[0]))

    e_coarse, e_fine = roundtrip(3), roundtrip(12)
    # first-order: ~2.7x error reduction for 4x steps (measured 0.057->0.021)
    assert e_fine < e_coarse / 2, (e_coarse, e_fine)
    assert e_fine < 0.03, e_fine


def test_stochastic_encode_statistics():
    from editanything_tpu.samplers.ddim import stochastic_encode
    from editanything_tpu.samplers import schedule as S
    x0 = jnp.ones((2048,), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(0), (2048,))
    t = 500
    xt = stochastic_encode(SCHED, x0, jnp.asarray(t), noise)
    a, s = S.alpha_sigma(SCHED, jnp.asarray(t))
    assert abs(float(jnp.mean(xt)) - float(a)) < 0.05
    assert abs(float(jnp.std(xt)) - float(s)) < 0.05


def _run_dpm3(x, ts):
    n = len(ts)

    def body(state, i):
        out = _eps_model(state.sample, ts[i])
        state, _ = dpm_step(SCHED, state, out, ts, i, order=3)
        return state, ()

    return jax.lax.scan(body, dpm_init(x), jnp.arange(n))[0].sample


def test_dpm3_tracks_exact_ode(exact):
    e = abs(float(_run_dpm3(X_T, jnp.asarray(make_timesteps(30)))[0])
            - exact[0])
    assert e < 0.05, e


def _run_dpm_interior(x, ts, order):
    """All but the final step: the sample AT ts[-1], where design order is
    observable (the final step to t=-1 crosses a ~10-unit lambda jump that
    forces order 1 and dominates endpoint error)."""
    n = len(ts)

    def body(state, i):
        out = _eps_model(state.sample, ts[i])
        state, _ = dpm_step(SCHED, state, out, ts, i, order=order)
        return state, ()

    st, _ = jax.lax.scan(body, dpm_init(x), jnp.arange(n - 1))
    return st.sample


def test_dpm3_beats_dpm2_on_interior(exact):
    """Third-order multistep converges faster than second on the analytic
    ODE interior (reference dpm_solver.py ships orders 1-3)."""
    ts = _interior_grid(20)
    e3 = abs(float(_run_dpm_interior(X_T, ts, 3)[0]) - exact[1])
    e2 = abs(float(_run_dpm_interior(X_T, ts, 2)[0]) - exact[1])
    assert e3 < e2, (e3, e2)


def test_dpm3_in_engine():
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    ucfg = C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)
    params = {"unet": U.init_unet(jax.random.PRNGKey(0), ucfg),
              "controlnets": []}
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = {"cond": jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32)),
           "uncond": jnp.zeros((1, 4, 32))}
    cfg = DenoiseConfig(unet=ucfg, num_steps=4, sampler="dpm3")
    run = jax.jit(build_denoiser(cfg, SCHED, make_timesteps(4)))
    out = run(params, lat, ctx, {"guidance_scale": 5.0})
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# DPM-Solver++ singlestep (dpm.py singlestep_*)
# ---------------------------------------------------------------------------

from editanything_tpu.samplers import (singlestep_plan, singlestep_init,
                                       singlestep_step)


def _run_dpm_ss(x, num_steps, order):
    plan = singlestep_plan(SCHED, num_steps, order)
    p_ts, p_ph, p_bs, p_end = (jnp.asarray(a) for a in plan)

    def body(state, i):
        out = _eps_model(state.sample, p_ts[i])
        state, _ = singlestep_step(SCHED, state, out, p_ts, p_ph, p_bs,
                                   p_end, i)
        return state, ()

    return jax.lax.scan(body, singlestep_init(x),
                        jnp.arange(num_steps))[0].sample


def test_singlestep_plan_structure():
    for order in (2, 3):
        plan = singlestep_plan(SCHED, 30, order)
        assert len(plan.ts) == 30
        assert plan.bsize[-1] == 1          # forced first-order tail
        assert plan.t_end[-1] == -1
        i = 0
        while i < 30:
            k = int(plan.bsize[i])
            assert list(plan.phase[i:i + k]) == list(range(k))
            # eval points strictly decrease through the block to its target
            pts = list(plan.ts[i:i + k]) + [int(plan.t_end[i])]
            assert all(a > b for a, b in zip(pts, pts[1:])), pts
            i += k


def test_dpm_singlestep_tracks_exact_ode(exact):
    for order in (1, 2, 3):
        e = abs(float(_run_dpm_ss(X_T, 30, order)[0]) - exact[0])
        assert e < 0.05, (order, e)


def test_dpm_singlestep2_beats_ddim(exact):
    e_ss = abs(float(_run_dpm_ss(X_T, 30, 2)[0]) - exact[0])
    e_ddim = abs(float(_run_ddim(X_T, jnp.asarray(make_timesteps(30)))[0])
                 - exact[0])
    assert e_ss < e_ddim, (e_ss, e_ddim)


def test_dpm_singlestep_in_engine():
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    ucfg = C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)
    params = {"unet": U.init_unet(jax.random.PRNGKey(0), ucfg),
              "controlnets": []}
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = {"cond": jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32)),
           "uncond": jnp.zeros((1, 4, 32))}
    for sampler in ("dpms2", "dpms3"):
        cfg = DenoiseConfig(unet=ucfg, num_steps=5, sampler=sampler)
        run = jax.jit(build_denoiser(cfg, SCHED, make_timesteps(5)))
        out = run(params, lat, ctx, {"guidance_scale": 5.0})
        assert np.isfinite(np.asarray(out)).all(), sampler


def test_singlestep_plan_degenerate_narrow_blocks():
    """Blocks too narrow for an interior eval (adjacent outer points) must
    degrade gracefully: the intermediate repeats t_s (the step math's h=0 /
    m_s1==m_s guards make that exact), never inverts past the target."""
    n = 600
    plan = singlestep_plan(SCHED, n, 2)
    i = 0
    while i < n:
        k = int(plan.bsize[i])
        pts = list(plan.ts[i:i + k]) + [int(plan.t_end[i])]
        assert all(a >= b for a, b in zip(pts, pts[1:])), pts
        assert pts[0] > pts[-1]
        i += k
    out = _run_dpm_ss(X_T, n, 2)
    assert np.isfinite(np.asarray(out)).all()
