"""ModelBundle — all weights + configs one pipeline run needs, as one pytree
container with named ControlNets.

Replaces the reference's pipeline-object rebuilds (editany_lora.py:343-423
`obtain_generation_model`/`obtain_tile_model`, which re-instantiate whole
diffusers pipelines and shuffle them between CPU/GPU on every checkpoint
switch, :659-703). Here the compiled programs are keyed by *architecture*
(DenoiseConfig); switching checkpoints just swaps param trees — no recompile,
no host<->device churn beyond the new weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from editanything_tpu.models import config as C
from editanything_tpu.models import unet as U
from editanything_tpu.models import controlnet as CN
from editanything_tpu.models import vae as V
from editanything_tpu.models import clip_text as CT


@dataclasses.dataclass
class ModelBundle:
    """Configs + params for one base model and its named ControlNets."""
    unet_cfg: C.UNetConfig
    vae_cfg: C.VAEConfig
    text_cfg: C.CLIPTextConfig
    unet: Any                 # param tree
    vae: Any
    text: Any
    tokenizer: Any
    # name -> (ControlNetConfig, params); reference names its checkpoints in
    # config_dict (editany_lora.py:72-79) and wires [SAM ctrl, inpaint ctrl]
    # (+ tile ctrl in the refine pipe)
    controlnets: Dict[str, Tuple[C.ControlNetConfig, Any]] = \
        dataclasses.field(default_factory=dict)
    dtype: Any = jnp.bfloat16
    # optional models.safety.SafetyChecker; None matches the reference's own
    # operating point (safety_checker=None at editany_lora.py:369-411)
    safety: Any = None
    # noise schedule (samplers.NoiseSchedule); None -> the SD1.5 default
    # (eps, scaled_linear 0.00085-0.012). SD2.1 bundles carry a
    # v-prediction schedule (models/cldm_v21.yaml parameterization: v) and
    # every pipeline derives its sampler math + prediction type from here.
    schedule: Any = None

    def noise_schedule(self):
        if self.schedule is None:
            from editanything_tpu.samplers import make_schedule
            self.schedule = make_schedule()
        return self.schedule

    def run_safety(self, images_uint8):
        """uint8 images -> (possibly blacked-out images, nsfw flags);
        pass-through when no checker is loaded (run_safety_checker,
        utils/stable_diffusion_controlnet.py:643-653)."""
        if self.safety is None:
            return images_uint8, None
        return self.safety(images_uint8)

    def controlnet_cfgs(self, names) -> Tuple[C.ControlNetConfig, ...]:
        return tuple(self.controlnets[n][0] for n in names)

    def controlnet_params(self, names):
        return [self.controlnets[n][1] for n in names]

    def swap_controlnet(self, name: str, params) -> None:
        """Hot-swap a ControlNet checkpoint (same arch, no recompile) —
        the TPU answer to the reference's pipeline rebuild (:677-693)."""
        cfg, _ = self.controlnets[name]
        self.controlnets[name] = (cfg, params)


def random_bundle(key=None, *, tiny: bool = True,
                  controlnet_names=("sam", "inpaint"),
                  dtype=jnp.float32, tokenizer=None) -> ModelBundle:
    """Randomly-initialized bundle. tiny=True gives test-sized models;
    tiny=False gives real SD1.5 shapes (for benchmarks; weights random)."""
    key = jax.random.PRNGKey(0) if key is None else key
    if tiny:
        ucfg = C.UNetConfig(
            block_out_channels=(32, 64), layers_per_block=1,
            cross_attention_dim=32, attention_head_dim=(2, 2),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            norm_num_groups=8)
        vcfg = C.VAEConfig(block_out_channels=(16, 32, 32, 32),
                           layers_per_block=1, norm_num_groups=8)
        tcfg = C.CLIPTextConfig(vocab_size=2000, hidden_size=32,
                                intermediate_size=64, num_layers=2,
                                num_heads=4, max_position_embeddings=8)
    else:
        ucfg = C.sd15_unet()
        vcfg = C.VAEConfig()
        tcfg = C.clip_vit_l()

    if tokenizer is None:
        from editanything_tpu.text.tokenizer import tiny_tokenizer
        tokenizer = tiny_tokenizer(
            context_length=tcfg.max_position_embeddings)

    ks = jax.random.split(key, 4 + len(controlnet_names))
    cns = {}
    for i, name in enumerate(controlnet_names):
        cn_cfg = C.ControlNetConfig(unet=ucfg)
        cns[name] = (cn_cfg, CN.init_controlnet(ks[3 + i], cn_cfg, dtype))
    return ModelBundle(
        unet_cfg=ucfg, vae_cfg=vcfg, text_cfg=tcfg,
        unet=U.init_unet(ks[0], ucfg, dtype),
        vae=V.init_vae(ks[1], vcfg, dtype),
        text=CT.init_clip_text(ks[2], tcfg, dtype),
        tokenizer=tokenizer, controlnets=cns, dtype=dtype)


def place_on_mesh(bundle: ModelBundle, mesh) -> ModelBundle:
    """Replicate all weights onto a mesh (inference data parallelism:
    the sample x CFG batch shards over the `data` axis; weights live once
    per chip in HBM — the reference's CPU-offload machinery has no TPU
    equivalent needed, SURVEY.md section 2.8)."""
    from editanything_tpu.parallel import replicate
    return dataclasses.replace(
        bundle,
        unet=replicate(mesh, bundle.unet),
        vae=replicate(mesh, bundle.vae),
        text=replicate(mesh, bundle.text),
        controlnets={k: (cfg, replicate(mesh, p))
                     for k, (cfg, p) in bundle.controlnets.items()})


def load_bundle(*, unet_path: str, vae_path: str, text_path: str,
                tokenizer, controlnet_paths: Dict[str, str],
                unet_cfg: Optional[C.UNetConfig] = None,
                vae_cfg: Optional[C.VAEConfig] = None,
                text_cfg: Optional[C.CLIPTextConfig] = None,
                controlnet_cfg: Optional[C.ControlNetConfig] = None,
                safety_path: Optional[str] = None,
                safety_cfg=None,
                lora_specs=(),
                dtype=jnp.bfloat16) -> ModelBundle:
    """Build a bundle from diffusers-layout safetensors checkpoints
    (the formats inventoried in SURVEY.md section 5 'Checkpoint / resume').

    lora_specs: sequence of (path, multiplier) kohya-format LoRA files
    merged into the UNet + text encoder at load time (the reference
    applies LoRA at pipeline build, editany_lora.py:197-329,381)."""
    from editanything_tpu.checkpoints import (
        load_torch_state_dict, diffusers_to_tree, clip_text_to_tree)

    safety = None
    if safety_path:
        from editanything_tpu.checkpoints.convert import \
            safety_checker_to_tree
        from editanything_tpu.models.safety import (CLIPVisionConfig,
                                                    SafetyChecker)
        safety = SafetyChecker(
            safety_checker_to_tree(load_torch_state_dict(safety_path)),
            safety_cfg or CLIPVisionConfig())

    ucfg = unet_cfg or C.sd15_unet()
    vcfg = vae_cfg or C.VAEConfig()
    tcfg = text_cfg or (C.clip_vit_l() if ucfg.cross_attention_dim == 768
                        else C.openclip_vit_h())
    cns = {}
    for name, path in controlnet_paths.items():
        cn_cfg = controlnet_cfg or C.ControlNetConfig(unet=ucfg)
        cns[name] = (cn_cfg, diffusers_to_tree(
            load_torch_state_dict(path), dtype=dtype))
    unet = diffusers_to_tree(load_torch_state_dict(unet_path), dtype=dtype)
    text = clip_text_to_tree(load_torch_state_dict(text_path), dtype=dtype)
    for spec in lora_specs:
        path, mult = spec if isinstance(spec, (tuple, list)) else (spec, 1.0)
        from editanything_tpu.checkpoints.lora import merge_kohya_lora
        counts = merge_kohya_lora({"unet": unet, "text_encoder": text},
                                  load_torch_state_dict(path),
                                  multiplier=float(mult))
        if counts["merged"] == 0:
            import warnings
            warnings.warn(f"LoRA {path}: no targets merged "
                          f"(skipped {counts['skipped']})")
    return ModelBundle(
        unet_cfg=ucfg, vae_cfg=vcfg, text_cfg=tcfg,
        unet=unet,
        vae=diffusers_to_tree(load_torch_state_dict(vae_path), dtype=dtype),
        text=text,
        tokenizer=tokenizer, controlnets=cns, dtype=dtype, safety=safety)
