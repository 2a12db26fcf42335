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

# sitecustomize (axon TPU plugin) imports jax at interpreter start, so the
# jax_platforms default was captured before JAX_PLATFORMS=cpu could apply
# (same workaround as tests/conftest.py) — needed for the virtual-mesh runs.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def bench_edit_throughput(batch: int, steps: int, *, mesh_devices: int = 0,
                          tiny: bool = False, _setup_cache={}):
    """mesh_devices > 0: data-parallel over a (mesh_devices,)-device
    `data` mesh — weights replicated, the batch sharded P('data').
    The 50 x (2CN+UNet+CFG+sampler) scan has NO cross-sample terms, so XLA
    inserts zero collectives: per-chip work is exactly the single-chip
    batch/N program, making edits/s ~ N * single-chip edits/s at batch/N
    (the scaling model in PROFILE.md). On this one-real-chip image run it
    with JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8 (and
    --tiny, CPU can't do SD-scale) to validate the mechanics."""
    from editanything_tpu.engine import DenoiseConfig, build_denoiser
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    from editanything_tpu.models import controlnet as CN
    from editanything_tpu.models import vae as V
    from editanything_tpu.samplers import make_schedule, make_timesteps

    dtype = jnp.bfloat16
    if tiny:
        ucfg = C.UNetConfig(
            block_out_channels=(32, 64), layers_per_block=1,
            cross_attention_dim=32, attention_head_dim=(2, 2),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            norm_num_groups=8)
        vcfg = C.VAEConfig(block_out_channels=(16, 32, 32, 32),
                           layers_per_block=1, norm_num_groups=8)
    else:
        ucfg = C.sd15_unet()
        vcfg = C.VAEConfig()
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    res = 64 if tiny else 512
    ctx_dim = ucfg.cross_attention_dim
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

    mesh = None
    if mesh_devices:
        from editanything_tpu.parallel.sharding import (make_mesh, replicate,
                                                        shard_batch)
        assert batch % mesh_devices == 0, "batch must divide the data axis"
        mesh = make_mesh(n_data=mesh_devices)
        if "mesh_params" not in _setup_cache:
            _setup_cache["mesh_params"] = replicate(mesh, params)
        params = _setup_cache["mesh_params"]
    dcfg = DenoiseConfig(unet=ucfg, controlnets=(cn_cfg, cn_cfg),
                         num_steps=steps, sampler="unipc",
                         inpaint_mode="blend", alignment_ratio=None)
    denoise = build_denoiser(dcfg, make_schedule(), make_timesteps(steps))

    def edit(params, latents, context, inputs):
        final = denoise(params, latents, context, inputs)
        return V.decode_from_latents(params["vae"], vcfg,
                                     final.astype(dtype))

    if mesh is not None:
        from editanything_tpu.parallel.sharding import mesh_jit
        fn = mesh_jit(edit, mesh)   # shard_map: zero-collective DP program
    else:
        fn = jax.jit(edit)  # no donation: bf16 in, fp32 carry
    b = batch
    lr = res // 8
    context = {"cond": jax.random.normal(ks[4], (b, 77, ctx_dim), dtype),
               "uncond": jax.random.normal(ks[5], (b, 77, ctx_dim), dtype)}
    inputs = {
        "controlnet_conds": [
            jax.random.uniform(ks[6], (b, res, res, 3), dtype),
            jax.random.uniform(ks[7], (b, res, res, 3), dtype)],
        "controlnet_scales": [0.5, 1.0],
        "guidance_scale": 9.0,
        "mask": jnp.ones((b, lr, lr, 1), dtype),
        "image_latents": jax.random.normal(ks[4], (b, lr, lr, 4),
                                           jnp.float32),
        "noise": jax.random.normal(ks[5], (b, lr, lr, 4), jnp.float32),
    }
    lat0 = jax.random.normal(ks[3], (b, lr, lr, 4), dtype)
    if mesh is not None:
        context = shard_batch(mesh, context)
        lat0 = shard_batch(mesh, lat0)
        inputs = jax.tree.map(
            lambda x: shard_batch(mesh, x)
            if hasattr(x, "ndim") and x.ndim > 0 and x.shape[0] == b else x,
            inputs)

    def run():
        out = fn(params, lat0, context, inputs)
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
    tag = (f"mesh{mesh_devices}dp_" if mesh_devices else "per_chip_") \
        + ("tiny_" if tiny else "")
    rec = {
        "metric": f"edits_per_sec_{tag}{res}px_{steps}step_batch{b}",
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
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="data-parallel over an N-device 'data' mesh "
                        "(virtual CPU mesh: JAX_PLATFORMS=cpu XLA_FLAGS="
                        "--xla_force_host_platform_device_count=N, + --tiny)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model @ 64px (mesh mechanics off-chip)")
    a = p.parse_args()
    kw = dict(mesh_devices=a.mesh, tiny=a.tiny)
    if a.curve:
        curve = [bench_edit_throughput(b, a.steps, **kw) for b in (1, 2, 4, 8)]
        best = max(curve, key=lambda r: r["value"])
        print(json.dumps({"metric": "edit_throughput_curve_best",
                          "value": best["value"], "unit": "edits/s",
                          "at_batch": int(best["metric"].rsplit("batch")[-1])}))
    else:
        bench_edit_throughput(a.batch, a.steps, **kw)
    if not a.skip_sam:
        bench_sam_masks()
