"""Secondary benchmarks: edits/sec/chip at batch, SAM masks/sec.

BASELINE.md metrics beyond the headline e2e latency (bench.py):
  - 512^2 x 50-step edits/sec/chip at num_samples batching
  - SAM ViT-H masks/sec through the compiled AMG

Run: python bench/bench_throughput.py [--batch 4] [--steps 50]
Prints one JSON line per metric.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EA_COMPILE_CACHE",
                                 "/tmp/ea_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def bench_edit_throughput(batch: int, steps: int, _setup_cache={}):
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    from editanything_tpu.models import controlnet as CN
    from editanything_tpu.models import vae as V
    from editanything_tpu.samplers import make_schedule, make_timesteps

    dtype = jnp.bfloat16
    ucfg = C.sd15_unet()
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    vcfg = C.VAEConfig()
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    if "params" not in _setup_cache:
        _setup_cache["params"] = {
            "unet": jax.jit(lambda k: U.init_unet(k, ucfg, dtype))(ks[0]),
            "controlnets": [
                jax.jit(lambda k: CN.init_controlnet(k, cn_cfg, dtype))(ks[1]),
                jax.jit(lambda k: CN.init_controlnet(k, cn_cfg, dtype))(ks[2])],
            "vae": jax.jit(lambda k: V.init_vae(k, vcfg, dtype))(ks[3]),
        }
    params = _setup_cache["params"]
    dcfg = DenoiseConfig(unet=ucfg, controlnets=(cn_cfg, cn_cfg),
                         num_steps=steps, sampler="unipc",
                         inpaint_mode="blend", alignment_ratio=None)
    denoise = build_denoiser(dcfg, make_schedule(), make_timesteps(steps))

    def edit(params, latents, context, inputs):
        final = denoise(params, latents, context, inputs)
        return V.decode_from_latents(params["vae"], vcfg,
                                     final.astype(dtype))

    fn = jax.jit(edit)  # no donation: bf16 in, fp32 carry
    b = batch
    context = {"cond": jax.random.normal(ks[4], (b, 77, 768), dtype),
               "uncond": jax.random.normal(ks[5], (b, 77, 768), dtype)}
    inputs = {
        "controlnet_conds": [
            jax.random.uniform(ks[6], (b, 512, 512, 3), dtype),
            jax.random.uniform(ks[7], (b, 512, 512, 3), dtype)],
        "controlnet_scales": [0.5, 1.0],
        "guidance_scale": 9.0,
        "mask": jnp.ones((b, 64, 64, 1), dtype),
        "image_latents": jax.random.normal(ks[4], (b, 64, 64, 4),
                                           jnp.float32),
        "noise": jax.random.normal(ks[5], (b, 64, 64, 4), jnp.float32),
    }

    def run():
        lat = jax.random.normal(ks[3], (b, 64, 64, 4), dtype)
        out = fn(params, lat, context, inputs)
        return float(jnp.sum(out))

    run()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[1]
    # NOTE: XLA's cost_analysis() counts a lax.scan body ONCE, so a
    # FLOPs/s figure derived from it under-reports ~50x here — deliberately
    # not printed.
    rec = {
        "metric": f"edits_per_sec_per_chip_512px_{steps}step_batch{b}",
        "value": round(b / p50, 3), "unit": "edits/s",
        "latency_s": round(p50, 3),
        "ms_per_step": round(p50 / steps * 1000, 2)}
    print(json.dumps(rec))
    return rec


def bench_sam_masks(detect_res: int = 1024):
    from editanything_tpu.models import sam as SAM
    from editanything_tpu.perception import AMGConfig, build_amg
    from editanything_tpu.perception.amg import _grid_points

    dtype = jnp.bfloat16
    cfg = SAM.SAMConfig(embed_dim=1280, depth=32, num_heads=16,
                        global_attn_indexes=(7, 15, 23, 31))   # ViT-H
    acfg = AMGConfig()
    params = jax.jit(lambda k: SAM.init_sam(k, cfg, dtype))(
        jax.random.PRNGKey(0))
    enc, gen = build_amg(cfg, acfg)
    enc, gen = jax.jit(enc), jax.jit(gen)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, detect_res, detect_res, 3), dtype)
    pts = jnp.asarray(_grid_points(acfg, detect_res, detect_res))

    def run():
        emb = enc(params, x)
        out = gen(params, emb, pts)
        return float(jnp.sum(out["scores"]))

    run()
    times = []
    n_masks = None
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[1]
    print(json.dumps({
        "metric": "sam_vith_image_to_masks_latency",
        "value": round(p50, 4), "unit": "s",
        "masks_per_sec_upper_bound": round(acfg.max_masks / p50, 1)}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--skip-sam", action="store_true")
    p.add_argument("--curve", action="store_true",
                   help="measure the batch 1/2/4/8 throughput curve")
    a = p.parse_args()
    if a.curve:
        curve = [bench_edit_throughput(b, a.steps) for b in (1, 2, 4, 8)]
        best = max(curve, key=lambda r: r["value"])
        print(json.dumps({"metric": "edit_throughput_curve_best",
                          "value": best["value"], "unit": "edits/s",
                          "at_batch": int(best["metric"].rsplit("batch")[-1])}))
    else:
        bench_edit_throughput(a.batch, a.steps)
    if not a.skip_sam:
        bench_sam_masks()
