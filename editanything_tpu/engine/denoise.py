"""The compiled edit program: one-jit denoising loops with CFG, multi-
ControlNet conditioning, and inpaint mask blending.

This replaces the reference's Python-level per-step pipeline loops
(/root/reference/utils/stable_diffusion_controlnet_inpaint.py:1539-1664 and
utils/stable_diffusion_controlnet.py:570-627): the entire
steps x (ControlNet(s) + UNet + CFG + scheduler + mask-blend) program is a
single `lax.scan` compiled once per (resolution, batch) bucket — no Python in
the loop, no per-step dispatch, latents donated in HBM.

Feature parity carried over (SURVEY.md section 2.3):
- classifier-free guidance via batch doubling (:1542-1544)
- multi-ControlNet residual summing ([SAM ctrl, inpaint ctrl] :1607-1615)
- per-pixel conditioning scale maps (ControlNetModel2 :785-802)
- guess mode (cond-only ControlNet pass, zero uncond residuals :579-602)
- 9-ch inpaint UNets (mask+masked-latents concat :1448-1468)
- 4-ch alignment blending: for steps i < T*alignment_ratio, re-noise the
  original latents to t_{i+1} and paste the outside-mask region (:1647-1656);
  alignment_ratio in {1.0, None} => single final paste (:1658-1664)
- alpha mixing variant ((1-a)*latents + a*renoised outside mask, :2039-2051)

TPU notes: the CFG pair rides the batch axis (shard it over the mesh data
axis); all gating uses the scan xs counter, never carried scalars (see
tpu-scan-carry note in samplers/unipc.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from editanything_tpu.engine import refctrl
from editanything_tpu.models import unet as U
from editanything_tpu.models import controlnet as CN
from editanything_tpu.samplers import schedule as sched
from editanything_tpu.samplers import ddim as ddim_mod
from editanything_tpu.samplers import unipc as unipc_mod
from editanything_tpu.samplers import plms as plms_mod
from editanything_tpu.samplers import dpm as dpm_mod


@dataclasses.dataclass(frozen=True)
class DenoiseConfig:
    """Static structure of a denoising program (hashable: jit static arg)."""
    unet: "editanything_tpu.models.config.UNetConfig"
    controlnets: tuple = ()              # tuple of ControlNetConfig
    num_steps: int = 30
    sampler: str = "unipc"               # "unipc" | "ddim"
    # DDIM stochasticity (the reference's eta slider, editany_demo.py:265;
    # UniPC/PLMS/DPM ignore it exactly as diffusers' schedulers do). When
    # > 0 the inputs dict must carry "eta_key" (PRNGKey data) for the
    # per-step noise draw.
    eta: float = 0.0
    guidance: bool = True                # classifier-free guidance
    guess_mode: bool = False
    # inpainting:
    inpaint_mode: str = "none"           # "none" | "unet9" | "blend" | "mix"
    alignment_ratio: Optional[float] = None   # "blend": paste-while < ratio
    alpha_weight: float = 0.5            # "mix" variant blend factor
    prediction_type: str = "epsilon"
    timestep_spacing: str = "linspace"
    # reference-only control (cross-image drag); extra inputs required:
    # ref_image_latents, ref_mask, ref_context, ref_controlnet_conds
    ref: Optional[refctrl.RefConfig] = None
    # Faster-Diffusion-style encoder caching (arXiv:2312.09608): run the
    # ControlNets + UNet encoder only every k-th step, reuse the cached
    # residuals in between (the encoder changes slowly across adjacent
    # timesteps; the decoder always runs). 1 = exact/off. Approximate —
    # opt-in for latency-critical serving.
    encoder_interval: int = 1


def _cat2(x):
    return jnp.concatenate([x, x], axis=0)


def _shard_fold(key):
    """Decorrelate per-step noise across mesh shards: under
    parallel.mesh_jit (shard_map over `data`) every shard sees the same
    eta/mix key but different samples — folding in the shard index keeps
    draws independent. A no-op outside a mapped `data` axis."""
    try:
        return jax.random.fold_in(key, jax.lax.axis_index("data"))
    except NameError:
        return key


def build_denoiser(cfg: DenoiseConfig, schedule: sched.NoiseSchedule,
                   timesteps):
    """Returns a pure jittable fn running the full sampling loop.

    fn(params, latents, context, inputs) -> final latents, where
      params  = {"unet": tree, "controlnets": [tree, ...]}
      latents = (B, h, w, 4) initial noise (fp32/bf16)
      context = {"cond": (B, N, D), "uncond": (B, N, D)}
      inputs  = dict of optional data tensors:
        "controlnet_conds": list of (B, 8h, 8w, 3)
        "controlnet_scales": list of scalars
        "controlnet_scale_maps": list of (B, 8h, 8w) or None
        "guidance_scale": scalar
        "mask": (B, h, w, 1) 1=edit region     [inpaint modes]
        "image_latents": (B, h, w, 4) original-image latents  [blend/mix]
        "masked_image_latents": (B, h, w, 4)   [unet9]
        "noise": (B, h, w, 4) noise reused for re-noising [blend/mix]
    """
    ts = jnp.asarray(timesteps, jnp.int32)
    n = cfg.num_steps
    assert len(ts) == n
    # guess mode batches cond-only through the ControlNet while ref banks
    # assume the CFG pair; the combination is broken in the reference too
    assert not (cfg.ref is not None and cfg.guess_mode), \
        "reference-only control is incompatible with guess_mode"
    assert cfg.encoder_interval == 1 or (cfg.ref is None
                                         and not cfg.guess_mode), \
        "encoder caching is incompatible with ref mode / guess mode"

    def precompute_hints(params, inputs, dtype, context=None):
        """Hoist the loop-invariant per-edit work out of the scan:
        (a) the ControlNet hint conv stacks — each full-res condition image
        is encoded ONCE per edit instead of once per step (the reference
        re-runs controlnet_cond_embedding all `steps` times); and
        (b) every cross-attention (k, v) projection of the text context —
        ~60 small matmuls per step that XLA does not LICM out of the scan
        body (models.unet.context_kv / models.controlnet.context_kv)."""
        do_cfg = cfg.guidance
        hoisted = {}
        if context is not None:
            ctx = (jnp.concatenate([context["uncond"], context["cond"]],
                                   axis=0) if do_cfg else context["cond"])
            hoisted["kv_unet"] = U.context_kv(params["unet"], cfg.unet, ctx)
            if cfg.controlnets:
                cn_ctx = context["cond"] if (cfg.guess_mode and do_cfg) \
                    else ctx
                hoisted["kv_cns"] = [
                    CN.context_kv(p, c, cn_ctx)
                    for p, c in zip(params["controlnets"],
                                    list(cfg.controlnets))]
        if not cfg.controlnets:
            return hoisted
        conds = inputs["controlnet_conds"]
        if cfg.guess_mode and do_cfg:
            hoisted["main"] = [
                CN._hint_embedding(p, c.astype(dtype))
                for p, c in zip(params["controlnets"], conds)]
        else:
            hoisted["main"] = [
                CN._hint_embedding(p, (_cat2(c) if do_cfg else c)
                                   .astype(dtype))
                for p, c in zip(params["controlnets"], conds)]
        if cfg.ref is not None:
            hoisted["ref"] = [
                CN._hint_embedding(p, c.astype(dtype))
                for p, c in zip(params["controlnets"],
                                inputs["ref_controlnet_conds"])]
        return hoisted

    def model_output(params, latents, t, context, inputs, hoisted=None):
        """ControlNet(s) + UNet + CFG at one timestep."""
        guidance_scale = inputs.get("guidance_scale", 7.5)
        do_cfg = cfg.guidance
        hoisted = hoisted or {}

        if do_cfg:
            lat_in = _cat2(latents)
            ctx = jnp.concatenate([context["uncond"], context["cond"]], axis=0)
        else:
            lat_in = latents
            ctx = context["cond"]

        # 9-ch inpaint UNet: concat mask + masked-image latents per step
        unet_in = lat_in
        if cfg.inpaint_mode == "unet9":
            mask = inputs["mask"]
            mlat = inputs["masked_image_latents"]
            extra = jnp.concatenate([mask, mlat], axis=-1)
            if do_cfg:
                extra = _cat2(extra)
            unet_in = jnp.concatenate([lat_in, extra.astype(lat_in.dtype)],
                                      axis=-1)

        tb = jnp.full((unet_in.shape[0],), t, jnp.int32)

        # reference-only control: write pass over noised ref latents fills
        # the feature banks each step (reference driver
        # stable_diffusion_controlnet_inpaint.py:1562-1605)
        ref_unet = ref_cn = None
        if cfg.ref is not None:
            ref_lat = inputs["ref_image_latents"].astype(jnp.float32)
            noise = inputs["noise"].astype(jnp.float32)
            ref_xt = sched.add_noise(schedule, ref_lat, noise, t) \
                .astype(latents.dtype)
            w_cn = refctrl.RefState(cfg.ref, "write",
                                    ref_mask=inputs["ref_mask"],
                                    inpaint_mask=inputs["mask"])
            w_un = refctrl.RefState(cfg.ref, "write",
                                    ref_mask=inputs["ref_mask"],
                                    inpaint_mask=inputs["mask"])
            tb_ref = jnp.full((ref_xt.shape[0],), t, jnp.int32)
            ref_ctx = inputs["ref_context"].astype(latents.dtype)
            rdown, rmid = None, None
            if cfg.controlnets:
                # the write pass takes its own conditioning scales (the
                # reference's ref_controlnet_conditioning_scale — UI "Pos /
                # Content Control Scale", editany_lora.py:818-828)
                ref_scales = inputs.get("ref_controlnet_scales") \
                    or inputs["controlnet_scales"]
                rdown, rmid = CN.multi_controlnet_apply(
                    params["controlnets"], list(cfg.controlnets), ref_xt,
                    tb_ref, ref_ctx, inputs["ref_controlnet_conds"],
                    ref_scales, None,
                    guess_mode=cfg.guess_mode, ref=w_cn,
                    hint_embeddings=hoisted.get("ref"))
            U.apply(params["unet"], cfg.unet, ref_xt, tb_ref, ref_ctx,
                    down_block_residuals=rdown, mid_block_residual=rmid,
                    ref=w_un)
            ref_unet, ref_cn = w_un.reader(), w_cn.reader()

        down_res, mid_res = None, None
        if cfg.controlnets:
            conds = inputs["controlnet_conds"]
            scales = inputs["controlnet_scales"]
            smaps = inputs.get("controlnet_scale_maps") or [None] * len(conds)
            if cfg.guess_mode and do_cfg:
                # guess mode: ControlNet sees only the cond half; uncond
                # residuals are zero (reference :579-602)
                half = latents
                tb_h = jnp.full((half.shape[0],), t, jnp.int32)
                cn_in = half if cfg.inpaint_mode != "unet9" else half
                down_c, mid_c = CN.multi_controlnet_apply(
                    params["controlnets"], list(cfg.controlnets), cn_in, tb_h,
                    context["cond"], conds, scales, smaps, guess_mode=True,
                    ref=ref_cn, hint_embeddings=hoisted.get("main"),
                    ctx_kvs=hoisted.get("kv_cns"))
                down_res = tuple(jnp.concatenate([jnp.zeros_like(r), r], axis=0)
                                 for r in down_c)
                mid_res = jnp.concatenate([jnp.zeros_like(mid_c), mid_c], axis=0)
            else:
                conds_in = [(_cat2(c) if do_cfg else c) for c in conds]
                smaps_in = [(_cat2(m) if (do_cfg and m is not None) else m)
                            for m in smaps]
                down_res, mid_res = CN.multi_controlnet_apply(
                    params["controlnets"], list(cfg.controlnets), lat_in, tb,
                    ctx, conds_in, scales, smaps_in,
                    guess_mode=cfg.guess_mode, ref=ref_cn,
                    hint_embeddings=hoisted.get("main"),
                    ctx_kvs=hoisted.get("kv_cns"))

        out = U.apply(params["unet"], cfg.unet, unet_in, tb, ctx,
                      down_block_residuals=down_res,
                      mid_block_residual=mid_res, ref=ref_unet,
                      ctx_kv=hoisted.get("kv_unet"))

        if do_cfg:
            uncond, cond = jnp.split(out, 2, axis=0)
            out = uncond + guidance_scale * (cond - uncond)
        return out

    # -- Faster-Diffusion encoder caching (arXiv:2312.09608) ---------------

    def _model_inputs(latents, t, context, inputs):
        """Shared CFG batching + 9-ch concat for the cached path."""
        do_cfg = cfg.guidance
        lat_in = _cat2(latents) if do_cfg else latents
        ctx = jnp.concatenate([context["uncond"], context["cond"]], axis=0) \
            if do_cfg else context["cond"]
        unet_in = lat_in
        if cfg.inpaint_mode == "unet9":
            extra = jnp.concatenate(
                [inputs["mask"], inputs["masked_image_latents"]], axis=-1)
            if do_cfg:
                extra = _cat2(extra)
            unet_in = jnp.concatenate([lat_in, extra.astype(lat_in.dtype)],
                                      axis=-1)
        tb = jnp.full((unet_in.shape[0],), t, jnp.int32)
        return lat_in, unet_in, ctx, tb

    def _encoder_pass(params, unet_in, lat_in, tb, ctx, inputs, hoisted):
        """ControlNets + UNet encoder/middle with residual injection; the
        cacheable half of a denoise step."""
        ucfg = cfg.unet
        hoisted = hoisted or {}
        temb = U.time_embed(params["unet"], ucfg, tb, unet_in.dtype)
        h, residuals = U.encode(params["unet"], ucfg, unet_in, temb, ctx,
                                ctx_kv=hoisted.get("kv_unet"))
        h = U.middle(params["unet"], ucfg, h, temb, ctx,
                     ctx_kv=hoisted.get("kv_unet"))
        if cfg.controlnets:
            do_cfg = cfg.guidance
            conds = inputs["controlnet_conds"]
            scales = inputs["controlnet_scales"]
            smaps = inputs.get("controlnet_scale_maps") or [None] * len(conds)
            conds_in = [(_cat2(c) if do_cfg else c) for c in conds]
            smaps_in = [(_cat2(m) if (do_cfg and m is not None) else m)
                        for m in smaps]
            down, mid = CN.multi_controlnet_apply(
                params["controlnets"], list(cfg.controlnets), lat_in, tb,
                ctx, conds_in, scales, smaps_in,
                hint_embeddings=hoisted.get("main"),
                ctx_kvs=hoisted.get("kv_cns"))
            residuals = [r + c.astype(r.dtype)
                         for r, c in zip(residuals, down)]
            h = h + mid.astype(h.dtype)
        return tuple(residuals) + (h,)

    def model_output_cached(params, latents, t, context, inputs, hoisted,
                            cache, is_key):
        """Step with encoder caching: the encoder half runs only when
        is_key (lax.cond — paid at runtime only on key steps); the decoder
        always runs with the CURRENT timestep embedding."""
        guidance_scale = inputs.get("guidance_scale", 7.5)
        do_cfg = cfg.guidance
        lat_in, unet_in, ctx, tb = _model_inputs(latents, t, context, inputs)

        cache = jax.lax.cond(
            is_key,
            lambda _: _encoder_pass(params, unet_in, lat_in, tb, ctx,
                                    inputs, hoisted),
            lambda _: cache, None)
        residuals, h = list(cache[:-1]), cache[-1]
        temb = U.time_embed(params["unet"], cfg.unet, tb, unet_in.dtype)
        out = U.decode(params["unet"], cfg.unet, h, residuals, temb, ctx,
                       ctx_kv=(hoisted or {}).get("kv_unet"))
        if do_cfg:
            uncond, cond = jnp.split(out, 2, axis=0)
            out = uncond + guidance_scale * (cond - uncond)
        return out, cache

    def init_encoder_cache(params, latents, context, inputs, hoisted):
        """Zeros pytree with the encoder-pass structure (step 0 is always
        a key step, so contents never leak into outputs)."""
        lat_in, unet_in, ctx, tb = _model_inputs(
            latents, jnp.asarray(0, jnp.int32), context, inputs)
        shapes = jax.eval_shape(
            lambda: _encoder_pass(params, unet_in, lat_in, tb, ctx,
                                  inputs, hoisted))
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def blend_outside_mask(latents, i, inputs, t_next=None):
        """Per-step latent blending with the re-noised original.

        "blend" (reference :1647-1656): requires alignment_ratio set; for
        steps i < T*ratio, paste renoised(image_latents, t_{i+1}) OUTSIDE
        the edit mask (the re-noising reuses the INITIAL noise, `noise =
        latents` before the loop, :1446). alignment_ratio None => no
        per-step blend (final paste only, :1658-1664).

        "mix" (reference :2039-2051): runs for every i < T-1 with FRESH
        noise per step (torch.randn_like): outside the mask a hard paste
        of the renoised original while i < T*ratio (free afterwards);
        INSIDE the mask always (1-alpha)*latents + alpha*renoised.
        """
        if cfg.inpaint_mode not in ("blend", "mix"):
            return latents
        mask = inputs["mask"].astype(jnp.float32)       # 1 = edit region
        img = inputs["image_latents"].astype(jnp.float32)

        if cfg.inpaint_mode == "mix":
            key = jnp.asarray(inputs["noise_key"], jnp.uint32)
            noise = jax.random.normal(
                _shard_fold(jax.random.fold_in(
                    jax.random.wrap_key_data(key), i)),
                img.shape, jnp.float32)
        else:
            if cfg.alignment_ratio is None:
                return latents
            noise = inputs["noise"].astype(jnp.float32)

        if t_next is None:      # singlestep passes its own plan grid
            t_next = ts[jnp.minimum(i + 1, n - 1)]
        renoised = sched.add_noise(schedule, img, noise, t_next)
        last = (i + 1) >= n

        if cfg.inpaint_mode == "mix":
            inside = (1.0 - cfg.alpha_weight) * latents + \
                cfg.alpha_weight * renoised
            active = i < jnp.asarray(cfg.alignment_ratio
                                     if cfg.alignment_ratio is not None
                                     else 1.0) * n
            outside = jnp.where(active, renoised, latents)
            out = mask * inside + (1.0 - mask) * outside
            # reference loop skips the blend at the final step (i < T-1)
            return jnp.where(last, latents, out)
        else:
            active = (i < jnp.asarray(cfg.alignment_ratio) * n) & ~last
            outside = jnp.where(active, renoised, latents)
            return mask * latents + (1.0 - mask) * outside

    def final_paste(latents, inputs):
        """"blend" with alignment_ratio in {None, 1.0}: single clean paste
        of the unnoised original outside the mask at the end (reference
        :1658-1664). "mix" never final-pastes."""
        if cfg.inpaint_mode != "blend":
            return latents
        if cfg.alignment_ratio is not None and cfg.alignment_ratio < 1.0:
            return latents
        mask = inputs["mask"].astype(jnp.float32)
        img = inputs["image_latents"].astype(jnp.float32)
        return mask * latents + (1.0 - mask) * img

    k_enc = cfg.encoder_interval

    if cfg.sampler == "unipc":
        def run(params, latents, context, inputs):
            hoisted = precompute_hints(params, inputs, latents.dtype, context)
            state = unipc_mod.unipc_init(latents)

            if k_enc > 1:
                cache0 = init_encoder_cache(params, latents, context,
                                            inputs, hoisted)

                def body(carry, i):
                    state, cache = carry
                    t = ts[i]
                    out, cache = model_output_cached(
                        params, state.sample.astype(latents.dtype), t,
                        context, inputs, hoisted, cache, i % k_enc == 0)
                    state, prev = unipc_mod.unipc_step(
                        schedule, state, out, ts, step=i)
                    prev = blend_outside_mask(prev, i, inputs)
                    return (state._replace(sample=prev), cache), ()

                (state, _), _ = jax.lax.scan(body, (state, cache0),
                                             jnp.arange(n))
                return final_paste(state.sample,
                                   inputs).astype(latents.dtype)

            def body(state, i):
                t = ts[i]
                out = model_output(params, state.sample.astype(latents.dtype),
                                   t, context, inputs, hoisted)
                state, prev = unipc_mod.unipc_step(
                    schedule, state, out, ts, step=i)
                prev = blend_outside_mask(prev, i, inputs)
                state = state._replace(sample=prev)
                return state, ()

            state, _ = jax.lax.scan(body, state, jnp.arange(n))
            return final_paste(state.sample, inputs).astype(latents.dtype)
    elif cfg.sampler == "ddim":
        def _eta_noise(inputs, i, shape):
            """Per-step stochastic-DDIM noise (ddim_hacked.py:219-224),
            derived from the folded eta_key so the scan stays carry-free."""
            if cfg.eta <= 0.0:
                return None
            key = _shard_fold(jax.random.fold_in(
                jnp.asarray(inputs["eta_key"], jnp.uint32), i))
            return jax.random.normal(key, shape, jnp.float32)

        def run(params, latents, context, inputs):
            hoisted = precompute_hints(params, inputs, latents.dtype, context)

            if k_enc > 1:
                cache0 = init_encoder_cache(params, latents, context,
                                            inputs, hoisted)

                def body(carry, i):
                    x, cache = carry
                    t = ts[i]
                    t_prev = jnp.where(i + 1 < n,
                                       ts[jnp.minimum(i + 1, n - 1)], -1)
                    out, cache = model_output_cached(
                        params, x.astype(latents.dtype), t, context,
                        inputs, hoisted, cache, i % k_enc == 0)
                    x, _ = ddim_mod.ddim_step(
                        schedule, x, out, t, t_prev, eta=cfg.eta,
                        noise=_eta_noise(inputs, i, x.shape))
                    x = blend_outside_mask(x, i, inputs)
                    return (x, cache), ()

                (x, _), _ = jax.lax.scan(
                    body, (latents.astype(jnp.float32), cache0),
                    jnp.arange(n))
                return final_paste(x, inputs).astype(latents.dtype)

            def body(x, i):
                t = ts[i]
                t_prev = jnp.where(i + 1 < n, ts[jnp.minimum(i + 1, n - 1)], -1)
                out = model_output(params, x.astype(latents.dtype), t,
                                   context, inputs, hoisted)
                x, _ = ddim_mod.ddim_step(
                    schedule, x, out, t, t_prev, eta=cfg.eta,
                    noise=_eta_noise(inputs, i, x.shape))
                x = blend_outside_mask(x, i, inputs)
                return x, ()

            x, _ = jax.lax.scan(body, latents.astype(jnp.float32),
                                jnp.arange(n))
            return final_paste(x, inputs).astype(latents.dtype)
    elif cfg.sampler in ("dpm", "dpm3"):
        dpm_order = 3 if cfg.sampler == "dpm3" else 2

        def run(params, latents, context, inputs):
            hoisted = precompute_hints(params, inputs, latents.dtype, context)
            state = dpm_mod.dpm_init(latents)

            def body(state, i):
                t = ts[i]
                out = model_output(params, state.sample.astype(latents.dtype),
                                   t, context, inputs, hoisted)
                state, prev = dpm_mod.dpm_step(schedule, state, out, ts, i,
                                               order=dpm_order)
                prev = blend_outside_mask(prev, i, inputs)
                state = state._replace(sample=prev)
                return state, ()

            state, _ = jax.lax.scan(body, state, jnp.arange(n))
            return final_paste(state.sample, inputs).astype(latents.dtype)
    elif cfg.sampler in ("dpms1", "dpms2", "dpms3"):
        # DPM-Solver++ singlestep. The eval grid is lambda-aware (block
        # intermediates at log-SNR fractions), so the plan supersedes the
        # caller-provided `ts`; n model evals either way.
        ss_order = int(cfg.sampler[-1])

        def run(params, latents, context, inputs):
            plan = dpm_mod.singlestep_plan(schedule, n, ss_order)
            p_ts = jnp.asarray(plan.ts)
            p_phase = jnp.asarray(plan.phase)
            p_bsize = jnp.asarray(plan.bsize)
            p_end = jnp.asarray(plan.t_end)
            hoisted = precompute_hints(params, inputs, latents.dtype, context)
            state = dpm_mod.singlestep_init(latents)

            def body(state, i):
                t = p_ts[i]
                out = model_output(params, state.sample.astype(latents.dtype),
                                   t, context, inputs, hoisted)
                state, prev = dpm_mod.singlestep_step(
                    schedule, state, out, p_ts, p_phase, p_bsize, p_end, i)
                prev = blend_outside_mask(
                    prev, i, inputs, t_next=p_ts[jnp.minimum(i + 1, n - 1)])
                state = state._replace(sample=prev)
                return state, ()

            state, _ = jax.lax.scan(body, state, jnp.arange(n))
            return final_paste(state.sample, inputs).astype(latents.dtype)
    elif cfg.sampler == "plms":
        def run(params, latents, context, inputs):
            hoisted = precompute_hints(params, inputs, latents.dtype, context)
            state = plms_mod.plms_init(latents)

            def body(state, i):
                t = ts[i]
                t_prev = jnp.where(i + 1 < n,
                                   ts[jnp.minimum(i + 1, n - 1)], -1)
                x = state.sample.astype(latents.dtype)
                out = model_output(params, x, t, context, inputs, hoisted)
                # midpoint warm-up needs a second eval at (x_1st, t_prev);
                # lax.cond pays it at runtime only on step 0
                # (plms.py:220-224)
                eps = plms_mod._to_eps(schedule, state.sample,
                                       out.astype(jnp.float32), t)
                x1 = plms_mod._x_prev(schedule, state.sample, eps, t,
                                      t_prev)

                def warmup(_):
                    return model_output(params, x1.astype(latents.dtype),
                                        jnp.maximum(t_prev, 0), context,
                                        inputs, hoisted)

                out_next = jax.lax.cond(i == 0, warmup,
                                        lambda _: out, None)
                state, prev = plms_mod.plms_step(
                    schedule, state, out, out_next, t, t_prev, i)
                prev = blend_outside_mask(prev, i, inputs)
                state = state._replace(sample=prev)
                return state, ()

            state, _ = jax.lax.scan(body, state, jnp.arange(n))
            return final_paste(state.sample, inputs).astype(latents.dtype)
    else:
        raise ValueError(f"unknown sampler {cfg.sampler!r}")

    return run
