"""Engine tests: compiled denoise loops with CFG / ControlNet / inpainting,
and data-parallel sharding over the virtual 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from editanything_tpu.engine import DenoiseConfig, build_denoiser
from editanything_tpu.models import config as C
from editanything_tpu.models import unet as U
from editanything_tpu.models import controlnet as CN
from editanything_tpu.samplers import make_schedule, make_timesteps
from editanything_tpu.parallel import make_mesh, shard_batch, replicate


TINY = C.UNetConfig(
    block_out_channels=(32, 64), layers_per_block=1,
    cross_attention_dim=32, attention_head_dim=(2, 2),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    norm_num_groups=8,
)
SCHED = make_schedule()
STEPS = 4
TS = make_timesteps(STEPS)


@pytest.fixture(scope="module")
def unet_params():
    return U.init_unet(jax.random.PRNGKey(0), TINY)


def _ctx(b=1):
    k = jax.random.PRNGKey(5)
    return {"cond": jax.random.normal(k, (b, 4, 32)),
            "uncond": jnp.zeros((b, 4, 32))}


def test_basic_denoise_runs_and_jits(unet_params):
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS, sampler="unipc")
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    out = run({"unet": unet_params}, lat, _ctx(),
              {"guidance_scale": 7.5})
    assert out.shape == lat.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_sampler_variant(unet_params):
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS, sampler="ddim")
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    out = run({"unet": unet_params}, lat, _ctx(), {"guidance_scale": 5.0})
    assert out.shape == lat.shape and np.all(np.isfinite(np.asarray(out)))


def test_ddim_eta_stochastic(unet_params):
    """eta > 0 adds per-step noise (editany_demo.py:265 slider through
    ddim_hacked.py:219-224): output differs from the deterministic run,
    is reproducible for a fixed eta_key, and changes with the key."""
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    det = jax.jit(build_denoiser(
        DenoiseConfig(unet=TINY, num_steps=STEPS, sampler="ddim"),
        SCHED, TS))({"unet": unet_params}, lat, _ctx(),
                    {"guidance_scale": 5.0})
    run = jax.jit(build_denoiser(
        DenoiseConfig(unet=TINY, num_steps=STEPS, sampler="ddim", eta=1.0),
        SCHED, TS))
    s1 = run({"unet": unet_params}, lat, _ctx(),
             {"guidance_scale": 5.0, "eta_key": jax.random.PRNGKey(7)})
    s1b = run({"unet": unet_params}, lat, _ctx(),
              {"guidance_scale": 5.0, "eta_key": jax.random.PRNGKey(7)})
    s2 = run({"unet": unet_params}, lat, _ctx(),
             {"guidance_scale": 5.0, "eta_key": jax.random.PRNGKey(8)})
    assert np.all(np.isfinite(np.asarray(s1)))
    assert not np.allclose(np.asarray(det), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_ref_write_pass_scales(unet_params):
    """ref_controlnet_scales (the reference's Pos/Content Control Scale
    sliders -> ref_controlnet_conditioning_scale, editany_lora.py:818-828)
    change the output; absent, the main scales apply."""
    from editanything_tpu.engine.refctrl import RefConfig
    cn_cfg = C.ControlNetConfig(unet=TINY)
    cn = jax.tree.map(lambda x: x + 0.01,
                      CN.init_controlnet(jax.random.PRNGKey(2), cn_cfg))
    cfg = DenoiseConfig(unet=TINY, controlnets=(cn_cfg,), num_steps=STEPS,
                        inpaint_mode="blend", alignment_ratio=0.5,
                        ref=RefConfig(reference_attn=True,
                                      reference_adain=False, do_cfg=True))
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    base = {
        "guidance_scale": 5.0,
        "controlnet_conds": [jnp.zeros((1, 64, 64, 3)) + 0.3],
        "controlnet_scales": [1.0],
        "mask": jnp.ones((1, 8, 8, 1)),
        "image_latents": jnp.zeros((1, 8, 8, 4)),
        "noise": lat,
        "ref_image_latents": jax.random.normal(jax.random.PRNGKey(3),
                                               (1, 8, 8, 4)),
        "ref_mask": jnp.ones((1, 8, 8, 1)),
        "ref_context": jax.random.normal(jax.random.PRNGKey(4), (1, 4, 32)),
        "ref_controlnet_conds": [jnp.zeros((1, 64, 64, 3)) + 0.7],
    }
    params = {"unet": unet_params, "controlnets": [cn]}
    o_default = run(params, lat, _ctx(), base)
    o_zero = run(params, lat, _ctx(),
                 {**base, "ref_controlnet_scales": [0.0]})
    o_one = run(params, lat, _ctx(),
                {**base, "ref_controlnet_scales": [1.0]})
    assert not np.allclose(np.asarray(o_zero), np.asarray(o_one))
    # ref scale 1.0 == main scale 1.0 == the no-override default
    np.testing.assert_allclose(np.asarray(o_default), np.asarray(o_one),
                               atol=1e-6)


def test_cfg_guidance_changes_output(unet_params):
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS)
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    o1 = run({"unet": unet_params}, lat, _ctx(), {"guidance_scale": 1.0})
    o2 = run({"unet": unet_params}, lat, _ctx(), {"guidance_scale": 9.0})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_no_guidance_mode(unet_params):
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS, guidance=False)
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out = run({"unet": unet_params}, lat, _ctx(2), {})
    assert out.shape == lat.shape


def test_controlnet_conditioning(unet_params):
    cn_cfg = C.ControlNetConfig(unet=TINY)
    cn = CN.init_controlnet(jax.random.PRNGKey(2), cn_cfg)
    cn = jax.tree.map(lambda a: a + 0.01 if a.ndim == 4 else a, cn)
    cfg = DenoiseConfig(unet=TINY, controlnets=(cn_cfg,), num_steps=STEPS)
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    params = {"unet": unet_params, "controlnets": [cn]}
    cond_a = jnp.zeros((1, 64, 64, 3))
    cond_b = jnp.ones((1, 64, 64, 3))
    oa = run(params, lat, _ctx(),
             {"controlnet_conds": [cond_a], "controlnet_scales": [1.0],
              "guidance_scale": 7.5})
    ob = run(params, lat, _ctx(),
             {"controlnet_conds": [cond_b], "controlnet_scales": [1.0],
              "guidance_scale": 7.5})
    oz = run(params, lat, _ctx(),
             {"controlnet_conds": [cond_b], "controlnet_scales": [0.0],
              "guidance_scale": 7.5})
    assert not np.allclose(np.asarray(oa), np.asarray(ob))
    # scale 0 kills conditioning: output matches the zero-cond-with-zero-
    # hint-embedding path only if hint itself is nulled; at least differs
    # from scale 1
    assert not np.allclose(np.asarray(ob), np.asarray(oz))


def test_inpaint_blend_preserves_outside(unet_params):
    """With alignment_ratio=1.0 the outside-mask region must exactly equal
    the original image latents after the final paste (reference
    stable_diffusion_controlnet_inpaint.py:1658-1664)."""
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS, inpaint_mode="blend",
                        alignment_ratio=None)
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    out = run({"unet": unet_params}, lat, _ctx(),
              {"guidance_scale": 7.5, "mask": mask, "image_latents": img,
               "noise": noise})
    outside = np.asarray((1 - mask) * (out - img))
    np.testing.assert_allclose(outside, 0.0, atol=1e-5)
    inside = np.asarray(mask * (out - img))
    assert np.abs(inside).max() > 1e-3   # edit region actually generated


def test_inpaint_partial_alignment(unet_params):
    """alignment_ratio < 1: blending stops early, outside region is NOT
    exactly the original (freely harmonized in late steps)."""
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS, inpaint_mode="blend",
                        alignment_ratio=0.5)
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    out = run({"unet": unet_params}, lat, _ctx(),
              {"guidance_scale": 7.5, "mask": mask, "image_latents": img,
               "noise": noise})
    outside = np.asarray((1 - mask) * (out - img))
    assert np.abs(outside).max() > 1e-3


def test_inpaint_unet9_channel_concat():
    cfg9 = dataclasses.replace(TINY, in_channels=9)
    p9 = U.init_unet(jax.random.PRNGKey(0), cfg9)
    cfg = DenoiseConfig(unet=cfg9, num_steps=STEPS, inpaint_mode="unet9")
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    mask = jnp.zeros((1, 8, 8, 1))
    mlat = jnp.zeros((1, 8, 8, 4))
    out = run({"unet": p9}, lat, _ctx(),
              {"guidance_scale": 7.5, "mask": mask,
               "masked_image_latents": mlat})
    assert out.shape == (1, 8, 8, 4)


def test_data_parallel_denoise_on_mesh(unet_params):
    """Full denoise sharded over the 8-device virtual mesh: batch of 8
    (samples x CFG handled internally) with replicated params."""
    mesh = make_mesh(n_data=8)
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS)
    run = build_denoiser(cfg, SCHED, TS)
    lat = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 4))
    ctx = {"cond": jax.random.normal(jax.random.PRNGKey(5), (8, 4, 32)),
           "uncond": jnp.zeros((8, 4, 32))}
    params = replicate(mesh, {"unet": unet_params})
    lat_s = shard_batch(mesh, lat)
    ctx_s = shard_batch(mesh, ctx)

    with mesh:
        out = jax.jit(run)(params, lat_s, ctx_s, {"guidance_scale": 7.5})
    assert out.shape == (8, 8, 8, 4)
    # sharded result must match single-device result
    ref = jax.jit(run)({"unet": unet_params}, lat, ctx,
                       {"guidance_scale": 7.5})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_deterministic_given_latents(unet_params):
    cfg = DenoiseConfig(unet=TINY, num_steps=STEPS)
    run = jax.jit(build_denoiser(cfg, SCHED, TS))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    o1 = run({"unet": unet_params}, lat, _ctx(), {"guidance_scale": 7.5})
    o2 = run({"unet": unet_params}, lat, _ctx(), {"guidance_scale": 7.5})
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_train_step_with_ema():
    """EMA params track training params with the LitEma ramping decay."""
    import optax
    from editanything_tpu.models import config as C
    from editanything_tpu.models import controlnet as CN
    from editanything_tpu.models import unet as UU
    from editanything_tpu.samplers import make_schedule
    from editanything_tpu.train import init_train_state, make_train_step
    from editanything_tpu.train.controlnet_train import make_optimizer
    import jax
    import jax.numpy as jnp
    import numpy as np

    ucfg = C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    key = jax.random.PRNGKey(0)
    unet_p = UU.init_unet(key, ucfg)
    cn_p = CN.init_controlnet(key, cn_cfg)
    opt = make_optimizer(1e-2)
    step = jax.jit(make_train_step(cn_cfg, make_schedule(), opt))
    state = init_train_state(cn_p, opt, use_ema=True)
    batch = {"latents": jax.random.normal(key, (1, 8, 8, 4)),
             "hint": jax.random.uniform(key, (1, 64, 64, 3)),
             "context": jax.random.normal(key, (1, 4, 32))}
    s1, _ = step(state, unet_p, batch, jax.random.PRNGKey(1))
    # after step 0: decay = 1/10 -> ema = 0.1*old + 0.9*new
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    old, new, ema = leaf(cn_p), leaf(s1.cn_params), leaf(s1.ema_params)
    np.testing.assert_allclose(ema, 0.1 * old + 0.9 * new,
                               rtol=1e-4, atol=1e-6)


def test_encoder_cache_key_steps_exact():
    """encoder_interval=1 vs >1: key steps identical, non-key approximate.

    With interval >= num_steps, ONLY step 0 is a key step; with interval=1
    everything is exact. A 1-step run must therefore be identical; a
    multi-step cached run must differ from exact but stay finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as UU
    from editanything_tpu.models import controlnet as CNN
    from editanything_tpu.samplers import make_schedule, make_timesteps

    ucfg = C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    key = jax.random.PRNGKey(0)
    params = {"unet": UU.init_unet(key, ucfg),
              "controlnets": [CNN.init_controlnet(key, cn_cfg)]}
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = {"cond": jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32)),
           "uncond": jnp.zeros((1, 4, 32))}
    inputs = {"guidance_scale": 5.0,
              "controlnet_conds": [jnp.zeros((1, 64, 64, 3))],
              "controlnet_scales": [1.0]}
    schedule = make_schedule()

    def run(steps, interval):
        cfg = DenoiseConfig(unet=ucfg, controlnets=(cn_cfg,),
                            num_steps=steps, sampler="ddim",
                            encoder_interval=interval)
        fn = jax.jit(build_denoiser(cfg, schedule, make_timesteps(steps)))
        return np.asarray(fn(params, lat, ctx, inputs))

    # 1 step: cached == exact (step 0 is always a key step)
    np.testing.assert_allclose(run(1, 4), run(1, 1), rtol=1e-5, atol=1e-5)
    # 4 steps: approximate but finite and different
    exact = run(4, 1)
    cached = run(4, 2)
    assert np.isfinite(cached).all()
    assert not np.allclose(cached, exact)


def test_train_step_remat_matches_plain():
    """remat=True (dots_saveable rematerialization) must be a pure memory
    optimization: identical loss and identical updated params."""
    from editanything_tpu.models import config as C
    from editanything_tpu.models import controlnet as CN
    from editanything_tpu.models import unet as UU
    from editanything_tpu.samplers import make_schedule
    from editanything_tpu.train import init_train_state, make_train_step
    from editanything_tpu.train.controlnet_train import make_optimizer
    import jax
    import numpy as np

    ucfg = C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    key = jax.random.PRNGKey(0)
    unet_p = UU.init_unet(key, ucfg)
    cn_p = CN.init_controlnet(key, cn_cfg)
    opt = make_optimizer(1e-2)
    batch = {"latents": jax.random.normal(key, (2, 8, 8, 4)),
             "hint": jax.random.uniform(key, (2, 64, 64, 3)),
             "context": jax.random.normal(key, (2, 4, 32))}
    outs = {}
    for remat in (False, True, "full", "offload"):
        step = jax.jit(make_train_step(cn_cfg, make_schedule(), opt,
                                       remat=remat))
        state = init_train_state(cn_p, opt)
        try:
            s1, metrics = step(state, unet_p, batch, jax.random.PRNGKey(1))
        except Exception as e:
            # only the specific unsupported-memory-space error may skip the
            # offload leg; real offload-policy regressions must still fail
            if remat == "offload" and (
                    "pinned_host" in str(e) or "memory kind" in str(e)
                    or "Memory space" in str(e) or "memory space" in str(e)):
                continue  # backend without pinned_host memory space
            raise
        outs[remat] = (float(metrics["loss"]), s1.cn_params)
    for remat in [r for r in (True, "full", "offload") if r in outs]:
        np.testing.assert_allclose(outs[False][0], outs[remat][0], rtol=1e-6)
        for a, b in zip(jax.tree.leaves(outs[False][1]),
                        jax.tree.leaves(outs[remat][1])):
            # recompute reassociates fusions; updates are adam(lr 1e-2) steps
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
