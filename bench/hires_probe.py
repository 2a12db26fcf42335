"""Isolate the 4096^2-bucket pieces on chip, smallest first.

The full tile_refine at 4096^2 (512^2 latents) crashed the TPU worker
during execution after the hint-embedding fix let it compile. Stages:

    python bench/hires_probe.py flash     # N=262144 flash attention alone
    python bench/hires_probe.py gn        # GroupNorm+SiLU at (2,512,512,320)
    python bench/hires_probe.py unet      # one SD1.5 UNet fwd at 512^2 latents
    python bench/hires_probe.py hint      # tiled hint embedding at 4096^2
    python bench/hires_probe.py vae       # tiled VAE decode 512^2 -> 4096^2
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EA_COMPILE_CACHE", "/tmp/ea_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    t3 = time.perf_counter()
    print(f"{tag}: compile+run {t1-t0:.1f}s, warm {t3-t2:.3f}s, sum={s:.3e}",
          flush=True)
    return out


def main(which):
    k = jax.random.PRNGKey(0)
    if which == "flash":
        from editanything_tpu.core.flash_attention import flash_attention
        q = jax.random.normal(k, (2, 8, 262144, 40), jnp.bfloat16)
        timed("flash_262144", jax.jit(
            lambda q: flash_attention(q, q, q)), q)
    elif which == "gn":
        from editanything_tpu.core.kernels import group_norm_silu
        from editanything_tpu.core.layers import init_group_norm
        p = init_group_norm(320)
        x = jax.random.normal(k, (2, 512, 512, 320), jnp.bfloat16)
        timed("gn_512sq", jax.jit(
            lambda p, x: group_norm_silu(p, x, num_groups=32)), p, x)
    elif which == "unet":
        from editanything_tpu.models import config as C, unet as U
        ucfg = C.sd15_unet()
        params = jax.jit(lambda k: U.init_unet(k, ucfg, jnp.bfloat16))(k)
        lat = jax.random.normal(k, (2, 512, 512, 4), jnp.bfloat16)
        ctx = jax.random.normal(k, (2, 77, 768), jnp.bfloat16)
        tb = jnp.full((2,), 500, jnp.int32)
        timed("unet_512sq", jax.jit(
            lambda p, l, c: U.apply(p, ucfg, l, tb, c)), params, lat, ctx)
    elif which == "hint":
        from editanything_tpu.models import config as C, controlnet as CN
        cn_cfg = C.ControlNetConfig(unet=C.sd15_unet())
        params = jax.jit(
            lambda k: CN.init_controlnet(k, cn_cfg, jnp.bfloat16))(k)
        cond = jax.random.uniform(k, (2, 4096, 4096, 3), jnp.bfloat16)
        timed("hint_4096", jax.jit(
            lambda p, c: CN._hint_embedding_tiled(p, c)), params, cond)
    elif which == "vae":
        from editanything_tpu.models import config as C, vae as V
        vcfg = C.VAEConfig()
        params = jax.jit(lambda k: V.init_vae(k, vcfg, jnp.bfloat16))(k)
        z = jax.random.normal(k, (1, 512, 512, 4), jnp.bfloat16)
        timed("vae_tiled_4096", jax.jit(
            lambda p, z: V.decode_tiled(p, vcfg, z)), params, z)
    else:
        raise SystemExit(f"unknown stage {which}")


if __name__ == "__main__":
    main(sys.argv[1])
