"""On-chip: validate the high-res tile-refinement buckets (2048^2-8192^2).

The reference UI slider reaches 8192 (editany_demo.py:241-247). This drives
the REAL pipeline path (EditPipeline.tile_refine) at the requested
resolutions (argv, default 2048) with SD-scale random weights: proves
compile + VMEM fit + execution, and measures per-step time. Above 2048 the
pipeline auto-switches to the tiled VAE (models/vae.py decode_tiled /
encode_tiled — the reference's vae-slicing analog,
stable_diffusion_controlnet_inpaint.py:454-461), which is what makes the
4096^2 decode (~16 GB one-shot activations) fit one chip's HBM.

    python tools/tile_bucket_check.py 2048 4096
"""
import sys
import time
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ea_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from editanything_tpu.pipelines.bundle import random_bundle
from editanything_tpu.pipelines.edit import EditPipeline

bundle = random_bundle(jax.random.PRNGKey(0), tiny=False,
                       controlnet_names=("sam", "inpaint", "tile"),
                       dtype=jnp.bfloat16)
pipe = EditPipeline(bundle, controls=("sam", "inpaint"))

rng = np.random.default_rng(0)
img = rng.integers(0, 255, (1, 512, 512, 3), np.uint8)
mask = np.zeros((512, 512), np.uint8)
mask[128:384, 128:384] = 255

buckets = {2048: 4, 4096: 2, 8192: 2}
wanted = [int(a) for a in sys.argv[1:]] or [2048]
for res, steps in [(r, buckets.get(r, 2)) for r in wanted]:
    t0 = time.perf_counter()
    out = pipe.tile_refine(img, mask, "a cat", tile_control="tile",
                           refine_image_resolution=res, num_steps=steps,
                           seed=0)
    t_total = time.perf_counter() - t0
    out = np.asarray(out)
    print(f"tile_refine {res}: out {out.shape} finite={np.isfinite(out).all()}"
          f" total {t_total:.1f}s (incl compile)", flush=True)
    # warm timing
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = pipe.tile_refine(img, mask, "a cat", tile_control="tile",
                               refine_image_resolution=res, num_steps=steps,
                               seed=1)
        ts.append(time.perf_counter() - t0)
    warm = min(ts)
    print(f"tile_refine {res}: warm {warm:.2f}s for {steps} steps "
          f"(~{warm/steps*1000:.0f} ms/step upper bound incl. VAE+embed)",
          flush=True)
