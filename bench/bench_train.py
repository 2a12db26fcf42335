"""ControlNet training-step benchmark on the real chip.

The reference trains with 8-GPU Lightning DDP at batch 4/GPU, fp32
(/root/reference/sam_train_sd21.py:13-39; it publishes no step/s numbers —
BASELINE.md). This measures OUR per-chip train-step cost (fwd+bwd through
frozen SD1.5 UNet + trainable ControlNet, AdamW on the branch, bf16
params) at 64x64 latents (512^2 images), the exact `make_train_step`
program the multi-chip trainer jits over the mesh
(train/controlnet_train.py).

Methodology: the step runs REP times inside one jit'd lax.scan (state is
the carry, per-iteration PRNG folded from the step index), timed at two
rep counts; (T_hi - T_lo)/(hi - lo) cancels the axon sync floor
(PROFILE.md "methodology").

Run: python bench/bench_train.py [--batches 1,2,4,8]
Prints one JSON line per batch size.
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

LO, HI = 3, 9


def _flops_train_step(batch: int) -> float:
    """Rough model FLOPs for one fwd+bwd: XLA cost-model numbers measured
    per-forward (PROFILE.md): UNet ~1.7 TFLOP + CN ~0.6 TFLOP x batch/2
    at CFG batch 2 => per-image fwd ~1.15 TFLOP; bwd ~2x fwd."""
    per_image_fwd = 1.15e12
    return 3.0 * per_image_fwd * batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--latent", type=int, default=64)
    ap.add_argument("--remat", default="dots", choices=["none", "dots", "full", "offload"],
                    help="dots (dots_saveable) fits up to b4 on one v5e chip; "
                         "b8 exceeds 16 GB HBM under every single-chip remat "
                         "mode (use the FSDP mesh for larger global batches)")
    args = ap.parse_args()

    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    from editanything_tpu.models import controlnet as CN
    from editanything_tpu.samplers import make_schedule
    from editanything_tpu.train import init_train_state, make_train_step
    from editanything_tpu.train.controlnet_train import make_optimizer

    dtype = jnp.bfloat16
    ucfg = C.sd15_unet()
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    unet_params = jax.jit(lambda k: U.init_unet(k, ucfg, dtype))(k1)
    cn_params = jax.jit(lambda k: CN.init_controlnet(k, cn_cfg, dtype))(k2)
    optimizer = make_optimizer(1e-5)
    remat = {"none": False, "dots": True, "full": "full",
             "offload": "offload"}[args.remat]
    train_step = make_train_step(cn_cfg, make_schedule(), optimizer,
                                 remat=remat)
    state0 = jax.jit(lambda p: init_train_state(p, optimizer))(cn_params)

    def run_n(rep):
        def prog(state, unet_params, batch):
            def body(st, i):
                st, metrics = train_step(
                    st, unet_params, batch,
                    jax.random.fold_in(jax.random.PRNGKey(1), i))
                return st, metrics["loss"]
            _, losses = jax.lax.scan(body, state, jnp.arange(rep))
            return losses
        return jax.jit(prog)

    s = args.latent
    for b in [int(x) for x in args.batches.split(",")]:
        batch = {
            "latents": jax.random.normal(key, (b, s, s, 4), dtype),
            "hint": jax.random.uniform(key, (b, 8 * s, 8 * s, 3), dtype),
            "context": jax.random.normal(key, (b, 77, 768), dtype),
        }

        def timed(rep):
            prog = run_n(rep)
            out = prog(state0, unet_params, batch)
            _ = float(jnp.sum(out))          # warm/compile + hard sync
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                o = prog(state0, unet_params, batch)
                _ = float(jnp.sum(o))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        t = (timed(HI) - timed(LO)) / (HI - LO)
        print(json.dumps({
            "metric": f"controlnet_train_step_b{b}_512px_1chip",
            "value": round(t * 1000, 2), "unit": "ms/step",
            "steps_per_sec": round(1.0 / t, 3),
            "images_per_sec": round(b / t, 3),
            "model_tflops": round(_flops_train_step(b) / t / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
