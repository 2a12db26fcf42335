"""Headline benchmark on the real TPU chip.

Measures the 512^2 / 50-step ControlNet edit core (the BASELINE.md north-star
workload): 50 x (2-ControlNet [SAM + inpaint] + SD1.5 UNet + CFG + UniPC +
inpaint mask blending) compiled as ONE lax.scan, plus the VAE decode to
pixels — bf16 weights, batch 1 edit (CFG pair = batch 2 through the models).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is the <5 s end-to-end target (BASELINE.md) divided by measured
latency (>1 = faster than target). SAM mask generation is not yet included
(perception lands in a later slice); the denoise+decode core dominates the
reference's budget.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    from editanything_tpu.models import controlnet as CN
    from editanything_tpu.models import vae as V
    from editanything_tpu.samplers import make_schedule, make_timesteps

    dtype = jnp.bfloat16
    steps = 50
    ucfg = C.sd15_unet()
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    vcfg = C.VAEConfig()
    schedule = make_schedule()
    ts = make_timesteps(steps)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    unet_params = jax.jit(lambda k: U.init_unet(k, ucfg, dtype))(ks[0])
    cn_sam = jax.jit(lambda k: CN.init_controlnet(k, cn_cfg, dtype))(ks[1])
    cn_inp = jax.jit(lambda k: CN.init_controlnet(k, cn_cfg, dtype))(ks[2])
    vae_params = jax.jit(lambda k: V.init_vae(k, vcfg, dtype))(ks[3])

    dcfg = DenoiseConfig(unet=ucfg, controlnets=(cn_cfg, cn_cfg),
                         num_steps=steps, sampler="unipc",
                         inpaint_mode="blend", alignment_ratio=None)
    denoise = build_denoiser(dcfg, schedule, ts)

    def edit(params, latents, context, inputs):
        final = denoise(params, latents, context, inputs)
        img = V.decode_from_latents(params["vae"], vcfg, final.astype(dtype))
        return img

    edit_jit = jax.jit(edit, donate_argnums=(1,))

    b = 1
    params = {"unet": unet_params, "controlnets": [cn_sam, cn_inp],
              "vae": vae_params}
    context = {"cond": jax.random.normal(ks[4], (b, 77, 768), dtype),
               "uncond": jax.random.normal(ks[5], (b, 77, 768), dtype)}
    mask = jnp.zeros((b, 64, 64, 1), dtype).at[:, 16:48, 16:48].set(1.0)
    inputs = {
        "controlnet_conds": [
            jax.random.uniform(ks[6], (b, 512, 512, 3), dtype),
            jax.random.uniform(ks[7], (b, 512, 512, 3), dtype)],
        "controlnet_scales": [0.5, 1.0],
        "guidance_scale": 9.0,
        "mask": mask,
        "image_latents": jax.random.normal(ks[4], (b, 64, 64, 4), jnp.float32),
        "noise": jax.random.normal(ks[5], (b, 64, 64, 4), jnp.float32),
    }

    def run_once():
        lat = jax.random.normal(ks[3], (b, 64, 64, 4), dtype)
        img = edit_jit(params, lat, context, inputs)
        img.block_until_ready()
        return img

    run_once()                      # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]

    target_s = 5.0                  # BASELINE.md north star (e2e on v5e-8)
    print(json.dumps({
        "metric": "edit_core_latency_512px_50step_1chip",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(target_s / p50, 3),
    }))


if __name__ == "__main__":
    main()
