"""The main edit pipeline: multi-ControlNet inpainting + tile refinement.

Behavioral spec: /root/reference/editany_lora.py:609-938
(`EditAnythingLoraModel.process`) and utils/stable_diffusion_controlnet_
inpaint.py:1131-1703 (main + :1707-2088 mixing variant):

- conditions: [SAM ID-map control @ control_scale, inpaint control @ 1.0]
  (editany_lora.py:814-882); inpaint condition = image/255 with masked
  pixels = -1 (:332-340)
- 4-ch UNets: latent mask blending with alignment_ratio; 9-ch inpainting
  UNets: mask + masked-image latents concatenated per step
- alpha-mixing variant (StableDiffusionControlNetInpaintMixingPipeline)
- tile refinement: the SAME inpaint program re-run at refine resolution
  with the tile ControlNet conditioned on the upscaled output itself
  (editany_lora.py:886-936)

TPU design: one jitted scan per (arch, resolution, batch) from
engine/denoise.py; VAE encode/decode inside the program; weights hot-swap
without recompiles.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.engine import DenoiseConfig
from editanything_tpu.engine import prompts as P
from editanything_tpu.models import vae as V
from editanything_tpu.pipelines.bundle import ModelBundle
from editanything_tpu.pipelines.generate import (GenerationPipeline,
                                                 ProgramCache, to_uint8)
from editanything_tpu.samplers import make_schedule, make_timesteps
from editanything_tpu.samplers import schedule as sched
from editanything_tpu.utils import HWC3, resize_image


def make_inpaint_condition(image_01: np.ndarray,
                           mask: np.ndarray) -> np.ndarray:
    """(H, W, 3) float [0,1] + (H, W) mask -> inpaint-ControlNet condition:
    masked pixels set to -1 (reference editany_lora.py:332-340)."""
    cond = np.array(image_01, np.float32, copy=True)
    cond[mask > 0.5] = -1.0
    return cond


class EditPipeline(GenerationPipeline):
    """Inpainting edit with [SAM control, inpaint control] (+ tile refine).

    controls: names into bundle.controlnets; the LAST one (when
    `use_inpaint_condition`) receives the masked-pixel condition, matching
    the reference's [SAM ctrl @ control_scale, inpaint ctrl @ 1.0] wiring.
    """

    def __init__(self, bundle: ModelBundle,
                 controls: Sequence[str] = ("sam", "inpaint"),
                 inpaint_mode: str = "blend", mesh=None):
        super().__init__(bundle, controlnet=controls[0], mesh=mesh)
        self.controls = tuple(controls)
        self.inpaint_mode = inpaint_mode
        self.cache = ProgramCache()

    # -- host-side input prep ------------------------------------------------

    @staticmethod
    def _norm_mask(mask: np.ndarray, h: int, w: int) -> np.ndarray:
        """Any mask input (HxW / HxWxC, 0-1 or 0-255) -> binary (h, w)
        float mask at the target resolution (nearest, >=0.5)."""
        m = np.asarray(mask, np.float32)
        if m.ndim == 3:
            m = m[..., 0]
        if m.max() > 1.5:
            m = m / 255.0
        m = np.asarray(
            jax.image.resize(jnp.asarray(m), (h, w), method="nearest"))
        return (m >= 0.5).astype(np.float32)

    def _prep(self, image: np.ndarray, mask: np.ndarray,
              image_resolution: int):
        img = resize_image(HWC3(image.astype(np.uint8)), image_resolution)
        h, w = img.shape[:2]
        return img, self._norm_mask(mask, h, w), h, w

    def _latent_inputs(self, img_uint8, mask_hw, h, w, num_samples):
        """VAE-encode the masked image; build latent-res mask tensors."""
        b = self.bundle
        img01 = img_uint8.astype(np.float32) / 255.0
        masked01 = img01 * (mask_hw[..., None] < 0.5)
        masked = jnp.asarray(masked01 * 2.0 - 1.0, jnp.float32)[None]
        lat = self._encode(b.vae, masked.astype(b.dtype))
        lat = jnp.broadcast_to(lat, (num_samples,) + lat.shape[1:])
        lat = lat.astype(jnp.float32)
        # nearest-downsample mask to latent res (reference :1484-1489)
        mlat = jax.image.resize(jnp.asarray(mask_hw), (h // 8, w // 8),
                                method="nearest")
        mlat = jnp.broadcast_to(mlat[None, :, :, None],
                                (num_samples, h // 8, w // 8, 1))
        return lat, mlat

    # -- main edit ----------------------------------------------------------

    def __call__(self, *, image: np.ndarray, mask: np.ndarray,
                 prompt: str, condition_image: np.ndarray,
                 negative_prompt: str = "",
                 num_samples: int = 1, image_resolution: int = 512,
                 num_steps: int = 30, guidance_scale: float = 9.0,
                 control_scale: float = 0.5,
                 scale_map: Optional[np.ndarray] = None,
                 alignment_ratio: Optional[float] = None,
                 alpha_weight: float = 0.5,
                 guess_mode: bool = False, sampler: str = "unipc",
                 eta: float = 0.0,
                 seed: int = 0, encoder_interval: int = 1,
                 return_latents: bool = False,
                 # cross-image drag (reference-only control):
                 ref_image: Optional[np.ndarray] = None,
                 ref_mask: Optional[np.ndarray] = None,
                 ref_prompt: Optional[str] = None,
                 reference_attn: bool = True,
                 reference_adain: bool = False,
                 attention_auto_weight: float = 1.0,
                 gn_auto_weight: float = 1.0,
                 style_fidelity: float = 0.5,
                 ref_scale: float = 0.0,
                 ref_sam_scale: Optional[float] = None,
                 ref_inpaint_scale: Optional[float] = None):
        """Returns (num_samples, H, W, 3) uint8 edited images.

        ref_image/ref_mask enable reference-only control: the masked ref
        region's features steer the edit (editany_demo.py:132-225 cross-
        image drag controls; engine/refctrl.py)."""
        b = self.bundle
        img, m, h, w = self._prep(image, mask, image_resolution)

        ref_cfg = None
        if ref_image is not None:
            from editanything_tpu.engine.refctrl import RefConfig
            ref_cfg = RefConfig(
                reference_attn=reference_attn,
                reference_adain=reference_adain,
                attention_auto_weight=attention_auto_weight,
                gn_auto_weight=gn_auto_weight,
                style_fidelity=style_fidelity, ref_scale=ref_scale,
                do_cfg=True)

        dcfg = DenoiseConfig(
            unet=b.unet_cfg, controlnets=b.controlnet_cfgs(self.controls),
            num_steps=num_steps, sampler=sampler, guess_mode=guess_mode,
            eta=float(eta) if sampler == "ddim" else 0.0,
            inpaint_mode=self.inpaint_mode,
            alignment_ratio=alignment_ratio, alpha_weight=alpha_weight,
            prediction_type=b.noise_schedule().prediction_type,
            ref=ref_cfg,
            encoder_interval=encoder_interval if ref_cfg is None else 1)
        program = self.cache.get(b, dcfg, num_steps,
                                 with_scale_maps=scale_map is not None,
                                 decode=not return_latents,
                                 decode_tile=self._decode_tile_spec(h, w),
                                 mesh=self.mesh)

        context = self.embed_prompts(prompt, negative_prompt, num_samples)

        # control conditions: SAM map first, inpaint condition last
        conds = [self.prepare_condition(condition_image, h, w, num_samples)]
        scales = [float(control_scale)]
        if len(self.controls) > 1:
            inp = make_inpaint_condition(img.astype(np.float32) / 255.0, m)
            inp = jnp.broadcast_to(jnp.asarray(inp)[None],
                                   (num_samples, h, w, 3)).astype(b.dtype)
            conds.append(inp)
            scales.append(1.0)

        key = jax.random.PRNGKey(seed)
        k_noise, k_mix = jax.random.split(key)
        image_latents, mask_latents = self._latent_inputs(
            img, m, h, w, num_samples)

        # initial latents; the reference re-noises with this SAME tensor in
        # blend mode ("noise = latents" before the loop, :1446)
        latents = jax.random.normal(k_noise, image_latents.shape, jnp.float32)

        inputs = {
            "controlnet_conds": conds,
            "controlnet_scales": scales,
            "guidance_scale": float(guidance_scale),
            "mask": mask_latents.astype(jnp.float32),
            "image_latents": image_latents,
            "noise": latents,
        }
        if self.inpaint_mode == "unet9":
            inputs["masked_image_latents"] = image_latents
        if self.inpaint_mode == "mix":
            # raw uint32 key data; the engine folds the step index in for
            # the reference's fresh-noise-per-step renoising (:2043)
            inputs["noise_key"] = jax.random.PRNGKey(seed + 1)
        if dcfg.eta > 0.0:
            inputs["eta_key"] = jax.random.PRNGKey(seed + 2)
        if scale_map is not None:
            # the per-pixel map applies to the first (SAM) control only
            smap = jax.image.resize(jnp.asarray(scale_map, jnp.float32),
                                    (h, w), method="bilinear")
            smap = jnp.broadcast_to(smap[None], (num_samples, h, w))
            inputs["controlnet_scale_maps"] = \
                [smap] + [None] * (len(conds) - 1)

        if ref_cfg is not None:
            # ref-image prep: resize to edit res, VAE-encode; ref mask at
            # latent res; cond-only ref prompt embeds; ref conds = main
            # conds with the LAST replaced by the ref image itself
            # (reference :1395-1422)
            rimg = resize_image(HWC3(ref_image.astype(np.uint8)),
                                image_resolution)
            rimg = np.asarray(jax.image.resize(
                jnp.asarray(rimg, jnp.float32), (h, w, 3), method="bilinear"))
            rlat = self._encode(
                b.vae, jnp.asarray(rimg / 127.5 - 1.0)[None].astype(b.dtype))
            rlat = jnp.broadcast_to(rlat, (num_samples,) + rlat.shape[1:]) \
                .astype(jnp.float32)
            rm = np.asarray(ref_mask, np.float32)
            if rm.ndim == 3:
                rm = rm[..., 0]
            if rm.max() > 1.5:
                rm = rm / 255.0
            rm = jax.image.resize(jnp.asarray(rm), (h // 8, w // 8),
                                  method="nearest")
            inputs["ref_image_latents"] = rlat
            inputs["ref_mask"] = (rm >= 0.5).astype(jnp.float32)[
                None, :, :, None]
            rp = ref_prompt if ref_prompt is not None else prompt
            ref_ctx, _ = P.get_pipeline_embeds(
                b.text, b.text_cfg, b.tokenizer, rp, "")
            inputs["ref_context"] = jnp.broadcast_to(
                ref_ctx, (num_samples,) + ref_ctx.shape[1:]).astype(b.dtype)
            ref_conds = [c[:num_samples] for c in conds]
            ref_conds[-1] = jnp.broadcast_to(
                jnp.asarray(rimg / 255.0)[None], (num_samples, h, w, 3)
            ).astype(b.dtype)
            inputs["ref_controlnet_conds"] = ref_conds
            # write-pass conditioning scales (editany_lora.py:818-828:
            # [ref_sam_scale, ref_inpaint_scale]); default = main scales
            if ref_sam_scale is not None or ref_inpaint_scale is not None:
                rs = [float(ref_sam_scale if ref_sam_scale is not None
                            else scales[0])]
                if len(self.controls) > 1:
                    rs.append(float(ref_inpaint_scale
                                    if ref_inpaint_scale is not None
                                    else scales[-1]))
                inputs["ref_controlnet_scales"] = rs

        # "mix": outside-mask region starts as the renoised original
        # (reference :1970-1977)
        if self.inpaint_mode == "mix":
            t0 = int(make_timesteps(num_steps)[0])
            renoised = sched.add_noise(
                b.noise_schedule(), image_latents,
                jax.random.normal(k_mix, image_latents.shape, jnp.float32),
                jnp.asarray(t0))
            keep = 1.0 - mask_latents
            latents = keep * renoised + mask_latents * latents
        latents = latents.astype(b.dtype)

        params = {"unet": b.unet,
                  "controlnets": b.controlnet_params(self.controls),
                  "vae": b.vae}
        latents = self._shard(latents)
        context = self._shard(context)
        inputs = jax.tree.map(
            lambda x: self._shard(x) if hasattr(x, "ndim") and x.ndim > 1
            and x.shape[0] == num_samples else x, inputs)
        out = program(params, latents, context, inputs)
        if return_latents:
            return jax.device_get(out)
        imgs, self.last_nsfw = self.bundle.run_safety(
            to_uint8(jax.device_get(out)))
        return imgs

    # -- tile refinement ------------------------------------------------------

    def tile_refine(self, images_uint8: np.ndarray, mask: np.ndarray,
                    prompt: str, *, tile_control: str = "tile",
                    negative_prompt: str = "",
                    refine_image_resolution: int = 1024,
                    num_steps: int = 30, guidance_scale: float = 9.0,
                    alignment_ratio: float = 0.95,
                    sampler: str = "unipc", seed: int = 0) -> List[np.ndarray]:
        """Second diffusion pass at refine resolution, the tile ControlNet
        conditioned per-sample on the upscaled image itself
        (editany_lora.py:886-936).

        TPU-first deviation from the reference's per-sample Python loop: all
        samples run as ONE batched compiled program (per-sample conditions
        and image latents on the batch axis; the batch rides the mesh data
        axis when sharded). Noise comes from one seed for the whole batch
        rather than the reference's sequential per-sample draws — same
        distribution, different stream."""
        b = self.bundle
        s = int(images_uint8.shape[0])
        imgs = np.stack([
            resize_image(HWC3(np.asarray(im).astype(np.uint8)),
                         refine_image_resolution) for im in images_uint8])
        h, w = imgs.shape[1:3]
        m = self._norm_mask(mask, h, w)

        dcfg = DenoiseConfig(
            unet=b.unet_cfg, controlnets=b.controlnet_cfgs((tile_control,)),
            num_steps=num_steps, sampler=sampler, inpaint_mode="blend",
            prediction_type=b.noise_schedule().prediction_type,
            alignment_ratio=alignment_ratio)
        program = self.cache.get(b, dcfg, num_steps, with_scale_maps=False,
                                 decode_tile=self._decode_tile_spec(h, w),
                                 mesh=self.mesh)

        context = self.embed_prompts(prompt, negative_prompt, s)
        imgs01 = imgs.astype(np.float32) / 255.0
        conds = [jnp.asarray(imgs01).astype(b.dtype)]   # per-sample tile cond

        masked = jnp.asarray(
            imgs01 * (m[None, ..., None] < 0.5) * 2.0 - 1.0, jnp.float32)
        image_latents = self._encode(b.vae, masked.astype(b.dtype)) \
            .astype(jnp.float32)
        mlat = jax.image.resize(jnp.asarray(m), (h // 8, w // 8),
                                method="nearest")
        mask_latents = jnp.broadcast_to(mlat[None, :, :, None],
                                        (s, h // 8, w // 8, 1))

        latents = jax.random.normal(jax.random.PRNGKey(seed),
                                    image_latents.shape, jnp.float32)
        inputs = {
            "controlnet_conds": conds,
            "controlnet_scales": [1.0],
            "guidance_scale": float(guidance_scale),
            "mask": mask_latents.astype(jnp.float32),
            "image_latents": image_latents,
            "noise": latents,
        }
        params = {"unet": b.unet,
                  "controlnets": b.controlnet_params((tile_control,)),
                  "vae": b.vae}
        lat_in = self._shard(latents.astype(b.dtype))
        context = self._shard(context)
        inputs = jax.tree.map(
            lambda x: self._shard(x) if hasattr(x, "ndim") and x.ndim > 1
            and x.shape[0] == s else x, inputs)
        out = program(params, lat_in, context, inputs)
        out, self.last_nsfw = self.bundle.run_safety(
            to_uint8(jax.device_get(out)))
        return [out[i] for i in range(s)]
