"""Text+segmentation -> image generation (the reference's sam2image path).

Behavioral spec: /root/reference/sam2image.py:122-180 `process` and
utils/stable_diffusion_controlnet.py:346-662
(`StableDiffusionControlNetPipeline2.__call__`): CFG denoise loop with a
single SAM-condition ControlNet, optional per-pixel conditioning scale map,
guess mode, UniPC scheduler, `num_images_per_prompt` batching.

TPU design: the whole steps x (ControlNet+UNet+CFG+scheduler) loop plus the
VAE decode is ONE jitted program from engine/denoise.py, cached per
(architecture, resolution, batch) key; prompts embed through one batched
encoder call (engine/prompts.py). Checkpoint switches swap weights only.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.engine import DenoiseConfig, build_denoiser
from editanything_tpu.engine import prompts as P
from editanything_tpu.models import vae as V
from editanything_tpu.pipelines.bundle import ModelBundle
from editanything_tpu.samplers import make_schedule, make_timesteps
from editanything_tpu.utils import HWC3, resize_image


def to_uint8(img_f32: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return np.clip((np.asarray(img_f32, np.float32) + 1.0) * 127.5,
                   0, 255).astype(np.uint8)


class ProgramCache:
    """jit-compiled denoise+decode programs keyed by static structure."""

    def __init__(self):
        self._programs: Dict = {}

    def get(self, bundle: ModelBundle, dcfg: DenoiseConfig, steps_key,
            *, with_scale_maps: bool, decode: bool = True,
            decode_tile: Optional[Tuple[int, int]] = None, mesh=None):
        """decode_tile: (tile, overlap) in LATENT px — tiled VAE decode for
        resolutions whose one-shot decode exceeds HBM (>2048^2).
        mesh: DP mesh — programs compile through parallel.mesh_jit
        (shard_map over `data`) so the Pallas kernels see per-shard shapes
        and GSPMD inserts no activation all-gathers around them."""
        key = (dcfg, steps_key, with_scale_maps, decode, decode_tile,
               bundle.dtype, mesh is not None)
        if key not in self._programs:
            # per-bundle schedule (v-pred for SD2.1); the cache lives on
            # the pipeline instance, so one cache sees one schedule
            schedule = bundle.noise_schedule()
            ts = make_timesteps(dcfg.num_steps,
                                spacing=dcfg.timestep_spacing)
            denoise = build_denoiser(dcfg, schedule, ts)
            vcfg = bundle.vae_cfg
            dt, dov = decode_tile if decode_tile else (None, 32)

            def program(params, latents, context, inputs):
                final = denoise(params, latents, context, inputs)
                if not decode:
                    return final
                return V.decode_from_latents(
                    params["vae"], vcfg, final.astype(latents.dtype),
                    tile=dt, overlap=dov)

            # no donation: the initial latents are bf16 but the sampler
            # carry is fp32, so the buffer is never reusable — donating
            # only produced XLA "donated buffers were not usable" warnings
            # for a 32 KB tensor.
            if mesh is not None:
                from editanything_tpu.parallel.sharding import mesh_jit
                self._programs[key] = mesh_jit(program, mesh)
            else:
                self._programs[key] = jax.jit(program)
        return self._programs[key]


class GenerationPipeline:
    """txt2img with one ControlNet condition (sam2image.py semantics).

    `mesh`: optional jax.sharding.Mesh — the (num_samples x CFG) batch is
    sharded over its `data` axis (weights must be placed with
    bundle.place_on_mesh); computation follows the data shardings, XLA
    inserts no collectives on this embarrassingly-parallel path.
    """

    # one-shot VAE validated on chip up to 2048^2 (PARITY.md bucket table);
    # above this the pipelines switch to tiled encode/decode. Patchable per
    # instance (tests lower it to exercise the tiled path at tiny shapes).
    vae_oneshot_max_px = 2048
    vae_tile_latent = 128        # latent-px decode tile -> 1024^2 image tiles
    vae_tile_overlap = 32

    def __init__(self, bundle: ModelBundle, controlnet: str = "sam",
                 mesh=None):
        self.bundle = bundle
        self.controlnet = controlnet
        self.mesh = mesh
        self.cache = ProgramCache()
        self._encode_oneshot = jax.jit(
            lambda p, x: V.encode_to_latents(p, bundle.vae_cfg, x))
        # tiled encoders cached per (tile, overlap) value so changing the
        # instance attrs after a first compile never reuses a stale tile
        # size (jit caches by shape only)
        self._encode_tiled_cache: Dict = {}
        # per-image NSFW flags from the optional safety checker for the
        # most recent call (None = no checker loaded); diffusers returns
        # (images, has_nsfw_concepts) — our array-out API surfaces the
        # flags here instead
        self.last_nsfw = None

    def _shard(self, tree):
        """Shard leading batch axes over the mesh data axis (no-op off)."""
        if self.mesh is None:
            return tree
        from editanything_tpu.parallel import shard_batch
        return shard_batch(self.mesh, tree)

    def _decode_tile_spec(self, h: int, w: int):
        """(tile, overlap) in latent px for the program's VAE decode, or
        None when the one-shot decode fits (<= vae_oneshot_max_px)."""
        if max(h, w) <= self.vae_oneshot_max_px:
            return None
        return (self.vae_tile_latent, self.vae_tile_overlap)

    def _encode_tiled(self, vae_params, x):
        key = (self.vae_tile_latent, self.vae_tile_overlap)
        fn = self._encode_tiled_cache.get(key)
        if fn is None:
            vcfg = self.bundle.vae_cfg
            f = 2 ** (len(vcfg.block_out_channels) - 1)
            tile_px, ov_px = key[0] * f, key[1] * f
            fn = jax.jit(lambda p, xx: V.encode_to_latents(
                p, vcfg, xx, tile=tile_px, overlap=ov_px))
            self._encode_tiled_cache[key] = fn
        return fn(vae_params, x)

    def _encode(self, vae_params, x):
        """VAE encode -> scaled latents; tiled above the one-shot bound."""
        if max(x.shape[1], x.shape[2]) <= self.vae_oneshot_max_px:
            return self._encode_oneshot(vae_params, x)
        return self._encode_tiled(vae_params, x)

    def prepare_condition(self, condition_map: np.ndarray,
                          h: int, w: int, batch: int) -> jnp.ndarray:
        """uint8 (Hc, Wc, 3) ID map -> (B, H, W, 3) in [0, 1], resized
        bilinear like the reference (sam2image.py:153-156)."""
        cond = jnp.asarray(HWC3(condition_map.astype(np.uint8)),
                           jnp.float32) / 255.0
        cond = jax.image.resize(cond, (h, w, 3), method="bilinear")
        return jnp.broadcast_to(cond[None], (batch, h, w, 3)) \
                  .astype(self.bundle.dtype)

    def embed_prompts(self, prompt: str, negative_prompt: str, batch: int):
        b = self.bundle
        cond, uncond = P.get_pipeline_embeds(
            b.text, b.text_cfg, b.tokenizer, prompt, negative_prompt,
            layer_skip=b.text_cfg.layer_skip)
        rep = lambda x: jnp.broadcast_to(
            x, (batch,) + x.shape[1:]).astype(b.dtype)
        return {"cond": rep(cond), "uncond": rep(uncond)}

    def __call__(self, *, prompt: str, condition_image: np.ndarray,
                 negative_prompt: str = "",
                 num_samples: int = 1, image_resolution: int = 512,
                 num_steps: int = 20, guidance_scale: float = 9.0,
                 control_scale: float = 1.0,
                 scale_map: Optional[np.ndarray] = None,
                 guess_mode: bool = False, sampler: str = "unipc",
                 seed: int = 0, encoder_interval: int = 1) -> np.ndarray:
        """Returns (num_samples, H, W, 3) uint8 images.

        encoder_interval > 1 enables Faster-Diffusion-style encoder
        caching (approximate; see engine/denoise.py)."""
        b = self.bundle
        # resolution handling mirrors sam2image.py:146-156: the output size
        # comes from resizing the condition to `image_resolution`
        sized = resize_image(HWC3(condition_image.astype(np.uint8)),
                             image_resolution)
        h, w = sized.shape[:2]
        lat_h, lat_w = h // 8, w // 8

        dcfg = DenoiseConfig(
            unet=b.unet_cfg,
            controlnets=b.controlnet_cfgs((self.controlnet,)),
            num_steps=num_steps, sampler=sampler, guess_mode=guess_mode,
            prediction_type=b.noise_schedule().prediction_type,
            encoder_interval=encoder_interval)
        program = self.cache.get(b, dcfg, num_steps,
                                 with_scale_maps=scale_map is not None,
                                 decode_tile=self._decode_tile_spec(h, w),
                                 mesh=self.mesh)

        context = self.embed_prompts(prompt, negative_prompt, num_samples)
        cond = self.prepare_condition(condition_image, h, w, num_samples)
        inputs = {
            "controlnet_conds": [cond],
            "controlnet_scales": [float(control_scale)],
            "guidance_scale": float(guidance_scale),
        }
        if scale_map is not None:
            smap = jax.image.resize(
                jnp.asarray(scale_map, jnp.float32), (h, w),
                method="bilinear")
            inputs["controlnet_scale_maps"] = [
                jnp.broadcast_to(smap[None], (num_samples, h, w))]

        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            key, (num_samples, lat_h, lat_w, 4), jnp.float32
        ).astype(b.dtype)

        params = {"unet": b.unet,
                  "controlnets": b.controlnet_params((self.controlnet,)),
                  "vae": b.vae}
        latents = self._shard(latents)
        context = self._shard(context)
        inputs = jax.tree.map(
            lambda x: self._shard(x) if hasattr(x, "ndim") and x.ndim > 1
            and x.shape[0] == num_samples else x, inputs)
        img = program(params, latents, context, inputs)
        out, self.last_nsfw = self.bundle.run_safety(
            to_uint8(jax.device_get(img)))
        return out
