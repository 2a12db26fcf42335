"""ldm/cldm-layout checkpoint ingestion (the reference's training-side
weight format) and the file-level surgery tools built on it.

Behavioral spec: the reference loads `.ckpt`/`.safetensors` state dicts
with `model.diffusion_model.*` / `control_model.*` / `first_stage_model.*`
/ `cond_stage_model.(model|transformer).*` naming
(/root/reference/cldm/model.py:12-28), grafts control branches from SD
checkpoints (/root/reference/tools/tool_add_control_sd21.py:27-50), offset-
transfers a trained control to another base
(/root/reference/tool_transfer_control.py:35-58), and converts trained cldm
checkpoints to diffusers layout
(/root/reference/tools/convert_controlnet_to_diffusers.py:80-91). The SD2.x
text tower ships in open_clip layout with fused `in_proj` attention weights
and is consumed at the PENULTIMATE layer
(/root/reference/ldm/modules/encoders/modules.py:134-193) — our
`models/config.py::openclip_vit_h` materializes 23 layers, so the converter
drops OpenCLIP-H's 24th resblock and splits `in_proj_weight` into q/k/v.

Design: every ldm section is first remapped to diffusers/HF KEY NAMING as a
pure string transform, then flows through the one existing layout converter
(convert.state_dict_to_tree) — one place owns tensor-layout rules, this
module owns only naming. All maps are bidirectional so the surgery tools
can synthesize genuine ldm-layout checkpoints from our trees.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from editanything_tpu.checkpoints.convert import (clip_text_to_tree,
                                                  diffusers_to_tree,
                                                  load_torch_state_dict)

# ---------------------------------------------------------------------------
# UNet: model.diffusion_model.*  <->  diffusers UNet2DConditionModel keys
# ---------------------------------------------------------------------------

# ResBlock submodule renames (openaimodel.py:200-236 <-> diffusers resnets)
_RES_LDM2HF = {
    "in_layers.0": "norm1", "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2", "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}
_RES_HF2LDM = {v: k for k, v in _RES_LDM2HF.items()}


def _map_res(rest: str, table: Mapping[str, str]) -> str:
    for old, new in table.items():
        if rest.startswith(old + "."):
            return new + rest[len(old):]
    return rest


def _detect_layers_per_block(keys) -> Optional[int]:
    """Downsample ops sit at input_blocks indices (b+1)*(L+1); the smallest
    one pins L (openaimodel.py input_blocks construction)."""
    ds = [int(m.group(1)) for k in keys
          for m in [re.match(r"input_blocks\.(\d+)\.0\.op\.", k)] if m]
    return min(ds) - 1 if ds else None


def ldm_unet_to_diffusers(sd: Mapping[str, np.ndarray],
                          layers_per_block: int = 2) -> Dict[str, np.ndarray]:
    """ldm UNet keys (prefix already stripped) -> diffusers UNet keys."""
    L = _detect_layers_per_block(sd.keys()) or layers_per_block
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        out_k = _ldm_unet_key(k, L)
        if out_k is not None:
            out[out_k] = v
    return out


def _ldm_unet_key(k: str, L: int) -> Optional[str]:
    if k.startswith("time_embed.0."):
        return "time_embedding.linear_1." + k.split(".", 2)[2]
    if k.startswith("time_embed.2."):
        return "time_embedding.linear_2." + k.split(".", 2)[2]
    if k.startswith("out.0."):
        return "conv_norm_out." + k.split(".", 2)[2]
    if k.startswith("out.2."):
        return "conv_out." + k.split(".", 2)[2]

    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)$", k)
    if m:
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if i == 0:
            return f"conv_in.{rest}" if j == 0 else None
        b, layer = (i - 1) // (L + 1), (i - 1) % (L + 1)
        if layer == L:          # Downsample (op -> conv)
            assert rest.startswith("op."), k
            return f"down_blocks.{b}.downsamplers.0.conv." + rest[3:]
        if j == 0:
            return (f"down_blocks.{b}.resnets.{layer}."
                    + _map_res(rest, _RES_LDM2HF))
        return f"down_blocks.{b}.attentions.{layer}.{rest}"

    m = re.match(r"middle_block\.(\d)\.(.*)$", k)
    if m:
        j, rest = int(m.group(1)), m.group(2)
        if j == 1:
            return f"mid_block.attentions.0.{rest}"
        return (f"mid_block.resnets.{0 if j == 0 else 1}."
                + _map_res(rest, _RES_LDM2HF))

    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.*)$", k)
    if m:
        # up levels carry L+1 resnets each (openaimodel.py output_blocks:
        # range(num_res_blocks + 1)), so groups of L+1 with the upsample
        # riding the level's last block
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        b, layer = i // (L + 1), i % (L + 1)
        if j == 0:
            return (f"up_blocks.{b}.resnets.{layer}."
                    + _map_res(rest, _RES_LDM2HF))
        if rest.startswith("conv."):   # Upsample (attention never has .conv)
            return f"up_blocks.{b}.upsamplers.0." + rest
        return f"up_blocks.{b}.attentions.{layer}.{rest}"
    return None   # non-module keys (none inside the diffusion section)


def diffusers_unet_to_ldm(sd: Mapping[str, np.ndarray],
                          layers_per_block: int = 2) -> Dict[str, np.ndarray]:
    """Inverse of ldm_unet_to_diffusers (for synthesizing ldm ckpts)."""
    L = layers_per_block
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        out[_diffusers_unet_key_to_ldm(k, L)] = v
    return _fix_upsample_index(out)


def _diffusers_unet_key_to_ldm(k: str, L: int) -> str:
    if k.startswith("time_embedding.linear_1."):
        return "time_embed.0." + k.rsplit(".", 1)[1]
    if k.startswith("time_embedding.linear_2."):
        return "time_embed.2." + k.rsplit(".", 1)[1]
    if k.startswith("conv_in."):
        return "input_blocks.0.0." + k.split(".", 1)[1]
    if k.startswith("conv_norm_out."):
        return "out.0." + k.split(".", 1)[1]
    if k.startswith("conv_out."):
        return "out.2." + k.split(".", 1)[1]

    m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", k)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return (f"input_blocks.{1 + b * (L + 1) + l}.0."
                + _map_res(rest, _RES_HF2LDM))
    m = re.match(r"down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$", k)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return f"input_blocks.{1 + b * (L + 1) + l}.1.{rest}"
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)$", k)
    if m:
        b, rest = int(m.group(1)), m.group(2)
        return f"input_blocks.{(b + 1) * (L + 1)}.0.op.{rest}"

    m = re.match(r"mid_block\.resnets\.(\d)\.(.*)$", k)
    if m:
        j = 0 if m.group(1) == "0" else 2
        return f"middle_block.{j}." + _map_res(m.group(2), _RES_HF2LDM)
    m = re.match(r"mid_block\.attentions\.0\.(.*)$", k)
    if m:
        return f"middle_block.1.{m.group(1)}"

    m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", k)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return (f"output_blocks.{b * (L + 1) + l}.0."
                + _map_res(rest, _RES_HF2LDM))
    m = re.match(r"up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$", k)
    if m:
        b, l, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return f"output_blocks.{b * (L + 1) + l}.1.{rest}"
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)$", k)
    if m:
        b, rest = int(m.group(1)), m.group(2)
        # the upsample rides the LAST output block of level b; its module
        # index is 2 when that block carries an attention, else 1 — the
        # index is recovered at merge time by _fix_upsample_index
        return f"output_blocks.{b * (L + 1) + L}.__UP__.conv.{rest}"
    raise KeyError(f"unmapped diffusers UNet key: {k}")


def _fix_upsample_index(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Resolve the __UP__ placeholder: index 2 when the same output block
    has an attention (module 1), else 1 (openaimodel.py output_blocks)."""
    out = {}
    for k, v in sd.items():
        if ".__UP__." in k:
            blk = k.split(".__UP__.")[0]
            has_attn = any(kk.startswith(blk + ".1.") for kk in sd)
            k = k.replace(".__UP__.", ".2." if has_attn else ".1.")
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# ControlNet: control_model.*  <->  diffusers ControlNetModel keys
# ---------------------------------------------------------------------------

# input_hint_block conv positions (cldm/cldm.py:147-163) <-> diffusers
# controlnet_cond_embedding {conv_in, blocks.0-5, conv_out}
_HINT_LDM2HF = {0: "conv_in", 2: "blocks.0", 4: "blocks.1", 6: "blocks.2",
                8: "blocks.3", 10: "blocks.4", 12: "blocks.5",
                14: "conv_out"}
_HINT_HF2LDM = {v: k for k, v in _HINT_LDM2HF.items()}


def ldm_controlnet_to_diffusers(sd: Mapping[str, np.ndarray],
                                layers_per_block: int = 2
                                ) -> Dict[str, np.ndarray]:
    """cldm ControlNet keys (control_model. stripped) -> diffusers keys."""
    L = _detect_layers_per_block(sd.keys()) or layers_per_block
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.match(r"input_hint_block\.(\d+)\.(.*)$", k)
        if m:
            pos = _HINT_LDM2HF[int(m.group(1))]
            out[f"controlnet_cond_embedding.{pos}.{m.group(2)}"] = v
            continue
        m = re.match(r"zero_convs\.(\d+)\.0\.(.*)$", k)
        if m:
            out[f"controlnet_down_blocks.{m.group(1)}.{m.group(2)}"] = v
            continue
        m = re.match(r"middle_block_out\.0\.(.*)$", k)
        if m:
            out[f"controlnet_mid_block.{m.group(1)}"] = v
            continue
        if k.startswith("label_emb."):
            continue
        mapped = _ldm_unet_key(k, L)
        if mapped is not None:
            out[mapped] = v
    return out


def diffusers_controlnet_to_ldm(sd: Mapping[str, np.ndarray],
                                layers_per_block: int = 2
                                ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.match(r"controlnet_cond_embedding\.(conv_in|conv_out"
                     r"|blocks\.\d)\.(.*)$", k)
        if m:
            out[f"input_hint_block.{_HINT_HF2LDM[m.group(1)]}.{m.group(2)}"] \
                = v
            continue
        m = re.match(r"controlnet_down_blocks\.(\d+)\.(.*)$", k)
        if m:
            out[f"zero_convs.{m.group(1)}.0.{m.group(2)}"] = v
            continue
        m = re.match(r"controlnet_mid_block\.(.*)$", k)
        if m:
            out[f"middle_block_out.0.{m.group(1)}"] = v
            continue
        out[_diffusers_unet_key_to_ldm(k, layers_per_block)] = v
    return _fix_upsample_index(out)


# ---------------------------------------------------------------------------
# VAE: first_stage_model.*  <->  diffusers AutoencoderKL keys
# ---------------------------------------------------------------------------

_VAE_RES_LDM2HF = {"nin_shortcut": "conv_shortcut"}
_VAE_RES_HF2LDM = {"conv_shortcut": "nin_shortcut"}
# ldm AttnBlock 1x1 convs (diffusionmodules/model.py:152-177) <-> diffusers
# linear attention; 4-D (C,C,1,1) weights squeeze to (C,C)
_VAE_ATTN_LDM2HF = {"norm": "group_norm", "q": "to_q", "k": "to_k",
                    "v": "to_v", "proj_out": "to_out.0"}
_VAE_ATTN_HF2LDM = {v: k for k, v in _VAE_ATTN_LDM2HF.items()}


def _vae_attn(rest: str, table, squeeze: bool, v):
    mod, leaf = rest.rsplit(".", 1)
    new = table.get(mod, mod)
    a = np.asarray(v)
    if leaf == "weight" and a.ndim == 4 and squeeze:
        a = a[:, :, 0, 0]
    elif leaf == "weight" and a.ndim == 2 and not squeeze:
        a = a[:, :, None, None]
    return f"{new}.{leaf}", a


def ldm_vae_to_diffusers(sd: Mapping[str, np.ndarray]
                         ) -> Dict[str, np.ndarray]:
    """first_stage_model keys (prefix stripped) -> diffusers VAE keys."""
    n_up = 1 + max([int(m.group(1)) for k in sd
                    for m in [re.match(r"decoder\.up\.(\d+)\.", k)] if m],
                   default=-1)
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("loss."):
            continue
        if k.startswith(("quant_conv.", "post_quant_conv.")):
            out[k] = v
            continue
        side, rest = k.split(".", 1)
        if side not in ("encoder", "decoder"):
            continue
        m = re.match(r"down\.(\d+)\.block\.(\d+)\.(.*)$", rest)
        if m:
            out[f"{side}.down_blocks.{m.group(1)}.resnets.{m.group(2)}."
                + _map_res(m.group(3), _VAE_RES_LDM2HF)] = v
            continue
        m = re.match(r"down\.(\d+)\.downsample\.conv\.(.*)$", rest)
        if m:
            out[f"{side}.down_blocks.{m.group(1)}.downsamplers.0.conv."
                + m.group(2)] = v
            continue
        m = re.match(r"up\.(\d+)\.block\.(\d+)\.(.*)$", rest)
        if m:
            b = n_up - 1 - int(m.group(1))   # ldm decoder stores up reversed
            out[f"{side}.up_blocks.{b}.resnets.{m.group(2)}."
                + _map_res(m.group(3), _VAE_RES_LDM2HF)] = v
            continue
        m = re.match(r"up\.(\d+)\.upsample\.conv\.(.*)$", rest)
        if m:
            b = n_up - 1 - int(m.group(1))
            out[f"{side}.up_blocks.{b}.upsamplers.0.conv.{m.group(2)}"] = v
            continue
        m = re.match(r"mid\.block_([12])\.(.*)$", rest)
        if m:
            out[f"{side}.mid_block.resnets.{int(m.group(1)) - 1}."
                + _map_res(m.group(2), _VAE_RES_LDM2HF)] = v
            continue
        m = re.match(r"mid\.attn_1\.(.*)$", rest)
        if m:
            nk, a = _vae_attn(m.group(1), _VAE_ATTN_LDM2HF, True, v)
            out[f"{side}.mid_block.attentions.0.{nk}"] = a
            continue
        if rest.startswith("norm_out."):
            out[f"{side}.conv_norm_out." + rest.split(".", 1)[1]] = v
            continue
        if rest.startswith(("conv_in.", "conv_out.")):
            out[k] = v
            continue
        raise KeyError(f"unmapped ldm VAE key: {k}")
    return out


def diffusers_vae_to_ldm(sd: Mapping[str, np.ndarray]
                         ) -> Dict[str, np.ndarray]:
    n_up = 1 + max([int(m.group(1)) for k in sd
                    for m in [re.match(r"decoder\.up_blocks\.(\d+)\.", k)]
                    if m], default=-1)
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith(("quant_conv.", "post_quant_conv.")):
            out[k] = v
            continue
        side, rest = k.split(".", 1)
        m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", rest)
        if m:
            out[f"{side}.down.{m.group(1)}.block.{m.group(2)}."
                + _map_res(m.group(3), _VAE_RES_HF2LDM)] = v
            continue
        m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)$",
                     rest)
        if m:
            out[f"{side}.down.{m.group(1)}.downsample.conv.{m.group(2)}"] = v
            continue
        m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", rest)
        if m:
            b = n_up - 1 - int(m.group(1))
            out[f"{side}.up.{b}.block.{m.group(2)}."
                + _map_res(m.group(3), _VAE_RES_HF2LDM)] = v
            continue
        m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)$", rest)
        if m:
            b = n_up - 1 - int(m.group(1))
            out[f"{side}.up.{b}.upsample.conv.{m.group(2)}"] = v
            continue
        m = re.match(r"mid_block\.resnets\.([01])\.(.*)$", rest)
        if m:
            out[f"{side}.mid.block_{int(m.group(1)) + 1}."
                + _map_res(m.group(2), _VAE_RES_HF2LDM)] = v
            continue
        m = re.match(r"mid_block\.attentions\.0\.(.*)$", rest)
        if m:
            nk, a = _vae_attn(m.group(1), _VAE_ATTN_HF2LDM, False, v)
            out[f"{side}.mid.attn_1.{nk}"] = a
            continue
        if rest.startswith("conv_norm_out."):
            out[f"{side}.norm_out." + rest.split(".", 1)[1]] = v
            continue
        if rest.startswith(("conv_in.", "conv_out.")):
            out[k] = v
            continue
        raise KeyError(f"unmapped diffusers VAE key: {k}")
    return out


# ---------------------------------------------------------------------------
# Text towers
# ---------------------------------------------------------------------------

def openclip_text_to_hf(sd: Mapping[str, np.ndarray],
                        num_layers: int = 23) -> Dict[str, np.ndarray]:
    """open_clip text tower (cond_stage_model.model. stripped) -> HF
    CLIPTextModel keys (text_model. prefix already stripped, the layout
    clip_text_to_tree consumes).

    - resblocks >= num_layers are DROPPED: the reference reads the
      penultimate layer (modules.py:176-189), equivalently a 23-layer stack
      for OpenCLIP-H, which is exactly what config.openclip_vit_h builds.
    - fused attn.in_proj_{weight,bias} split into q/k/v projections (the
      same split checkpoints/detectors.py does for VLPart's RN50 tower).
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k in ("text_projection", "logit_scale", "attn_mask",
                 "positional_embedding", "token_embedding.weight") \
                or k.startswith(("ln_final.",)):
            continue   # handled below / dropped
        m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)$", k)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        if i >= num_layers:
            continue
        pre = f"encoder.layers.{i}"
        if rest.startswith("attn.in_proj_"):
            leaf = "weight" if rest.endswith("weight") else "bias"
            a = np.asarray(v)
            d = a.shape[0] // 3
            for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                out[f"{pre}.self_attn.{name}.{leaf}"] = a[j * d:(j + 1) * d]
        elif rest.startswith("attn.out_proj."):
            out[f"{pre}.self_attn.out_proj." + rest.rsplit(".", 1)[1]] = v
        elif rest.startswith("ln_1."):
            out[f"{pre}.layer_norm1." + rest.split(".", 1)[1]] = v
        elif rest.startswith("ln_2."):
            out[f"{pre}.layer_norm2." + rest.split(".", 1)[1]] = v
        elif rest.startswith("mlp.c_fc."):
            out[f"{pre}.mlp.fc1." + rest.rsplit(".", 1)[1]] = v
        elif rest.startswith("mlp.c_proj."):
            out[f"{pre}.mlp.fc2." + rest.rsplit(".", 1)[1]] = v
        else:
            raise KeyError(f"unmapped open_clip key: {k}")
    if "token_embedding.weight" in sd:
        out["embeddings.token_embedding.weight"] = \
            sd["token_embedding.weight"]
    if "positional_embedding" in sd:
        out["embeddings.position_embedding.weight"] = \
            sd["positional_embedding"]
    for leaf in ("weight", "bias"):
        if f"ln_final.{leaf}" in sd:
            out[f"final_layer_norm.{leaf}"] = sd[f"ln_final.{leaf}"]
    return out


def hf_text_to_openclip(sd: Mapping[str, np.ndarray]
                        ) -> Dict[str, np.ndarray]:
    """Inverse (merging q/k/v back into in_proj). Layers beyond those
    present are NOT reconstructed — a tower exported this way is the
    truncated penultimate stack."""
    out: Dict[str, np.ndarray] = {}
    fused: Dict[Tuple[int, str], dict] = {}
    for k, v in sd.items():
        k = k.replace("text_model.", "")
        if k == "embeddings.token_embedding.weight":
            out["token_embedding.weight"] = v
            continue
        if k == "embeddings.position_embedding.weight":
            out["positional_embedding"] = v
            continue
        m = re.match(r"final_layer_norm\.(\w+)$", k)
        if m:
            out[f"ln_final.{m.group(1)}"] = v
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.(.*)$", k)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        pre = f"transformer.resblocks.{i}"
        m2 = re.match(r"self_attn\.([qkv])_proj\.(\w+)$", rest)
        if m2:
            fused.setdefault((i, m2.group(2)), {})[m2.group(1)] = np.asarray(v)
            continue
        if rest.startswith("self_attn.out_proj."):
            out[f"{pre}.attn.out_proj." + rest.rsplit(".", 1)[1]] = v
        elif rest.startswith("layer_norm1."):
            out[f"{pre}.ln_1." + rest.split(".", 1)[1]] = v
        elif rest.startswith("layer_norm2."):
            out[f"{pre}.ln_2." + rest.split(".", 1)[1]] = v
        elif rest.startswith("mlp.fc1."):
            out[f"{pre}.mlp.c_fc." + rest.rsplit(".", 1)[1]] = v
        elif rest.startswith("mlp.fc2."):
            out[f"{pre}.mlp.c_proj." + rest.rsplit(".", 1)[1]] = v
    for (i, leaf), parts in fused.items():
        out[f"transformer.resblocks.{i}.attn.in_proj_{leaf}"] = \
            np.concatenate([parts["q"], parts["k"], parts["v"]], axis=0)
    return out


# ---------------------------------------------------------------------------
# Whole-checkpoint ingestion
# ---------------------------------------------------------------------------

_PREFIXES = {
    "unet": "model.diffusion_model.",
    "controlnet": "control_model.",
    "vae": "first_stage_model.",
    "text_openclip": "cond_stage_model.model.",
    "text_hf": "cond_stage_model.transformer.",
}


def _section(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}


def _extract_ema_section(sd: Mapping[str, np.ndarray]) -> Dict:
    """EMA shadow of the diffusion UNet: LitEma buffers live under
    model_ema.* with DOTS REMOVED from the wrapped parameter name
    (ldm/modules/ema.py:5-30, name.replace('.',''))."""
    out = {}
    for k in sd:
        if not k.startswith("model.diffusion_model."):
            continue
        flat = k[len("model."):].replace(".", "")
        ek = "model_ema." + flat
        if ek in sd:
            out[k[len("model.diffusion_model."):]] = sd[ek]
    return out


def ldm_to_tree(sd_or_path, dtype=None, *, layers_per_block: int = 2,
                text_layers: Optional[int] = None,
                extract_ema: bool = False) -> Dict:
    """One-call ldm/cldm checkpoint -> dict of our param trees.

    Returns {"unet", "controlnet", "vae", "text"} (absent sections -> None)
    plus "text_layout" in {"openclip", "hf", None}. `text_layers` truncates
    the open_clip tower (default: all-but-last, the penultimate semantics —
    for OpenCLIP-H that is 23, matching config.openclip_vit_h).
    """
    sd = (load_torch_state_dict(sd_or_path)
          if isinstance(sd_or_path, (str,)) else dict(sd_or_path))

    out: Dict = {"unet": None, "controlnet": None, "vae": None,
                 "text": None, "text_layout": None}

    usec = (_extract_ema_section(sd) if extract_ema
            else _section(sd, _PREFIXES["unet"]))
    if usec:
        out["unet"] = diffusers_to_tree(
            ldm_unet_to_diffusers(usec, layers_per_block), dtype=dtype)
    csec = _section(sd, _PREFIXES["controlnet"])
    if csec:
        out["controlnet"] = diffusers_to_tree(
            ldm_controlnet_to_diffusers(csec, layers_per_block), dtype=dtype)
    vsec = _section(sd, _PREFIXES["vae"])
    if vsec:
        out["vae"] = diffusers_to_tree(ldm_vae_to_diffusers(vsec),
                                       dtype=dtype)
    tsec = _section(sd, _PREFIXES["text_openclip"])
    if tsec:
        n_res = 1 + max(int(m.group(1)) for k in tsec
                        for m in [re.match(r"transformer\.resblocks\.(\d+)\.",
                                           k)] if m)
        nl = text_layers if text_layers is not None else n_res - 1
        out["text"] = clip_text_to_tree(openclip_text_to_hf(tsec, nl),
                                        dtype=dtype)
        out["text_layout"] = "openclip"
    else:
        tsec = _section(sd, _PREFIXES["text_hf"])
        if tsec:
            out["text"] = clip_text_to_tree(tsec, dtype=dtype)
            out["text_layout"] = "hf"
    return out


def load_ldm_bundle(yaml_path: str, ckpt_path: str, *, tokenizer,
                    control_name: str = "sam", dtype=None,
                    extract_ema: bool = False,
                    overrides: Optional[Dict] = None):
    """cldm YAML + ldm/cldm checkpoint -> ModelBundle, one call.

    Mirrors create_model(yaml) + load_state_dict(ckpt)
    (/root/reference/cldm/model.py:12-28, sam_train_sd21.py:21-24) as the
    inference-side intake for the reference's released training
    checkpoints. The checkpoint must carry unet+vae+text; the control
    branch (if present) lands under `control_name`.
    """
    import jax.numpy as jnp
    from editanything_tpu.checkpoints.legacy import configs_from_cldm_yaml
    from editanything_tpu.pipelines.bundle import ModelBundle

    cfgs = configs_from_cldm_yaml(yaml_path)
    cfgs.update(overrides or {})   # e.g. tiny test configs
    dtype = dtype if dtype is not None else jnp.bfloat16
    trees = ldm_to_tree(ckpt_path, dtype=dtype, extract_ema=extract_ema)
    for part in ("unet", "vae", "text"):
        if trees[part] is None:
            raise ValueError(f"checkpoint {ckpt_path} has no {part} section")
    controlnets = {}
    if trees["controlnet"] is not None:
        controlnets[control_name] = (cfgs["controlnet"], trees["controlnet"])
    return ModelBundle(
        unet_cfg=cfgs["unet"], vae_cfg=cfgs["vae"], text_cfg=cfgs["text"],
        unet=trees["unet"], vae=trees["vae"], text=trees["text"],
        tokenizer=tokenizer, controlnets=controlnets, dtype=dtype,
        schedule=cfgs["schedule"]), cfgs


# ---------------------------------------------------------------------------
# File-level surgery tools (the reference's tools/ scripts)
# ---------------------------------------------------------------------------

def add_control(sd: Mapping[str, np.ndarray], *, seed: int = 0,
                hint_channels: int = 3) -> Dict[str, np.ndarray]:
    """SD checkpoint -> cldm checkpoint with a grafted control branch.

    Semantics of tool_add_control_sd{15,21}.py:27-50: every control_model
    key that exists as model.diffusion_model.* is COPIED from it; new keys
    (input_hint_block, zero_convs, middle_block_out) come from scratch init
    — zero-convs zero, hint-stack convs randomly initialized with a zero
    tail, exactly our init_controlnet's init. Pure state-dict -> state-dict;
    shapes/derived config come from the checkpoint itself.
    """
    import jax
    import jax.numpy as jnp
    from editanything_tpu.checkpoints.convert import tree_to_diffusers
    from editanything_tpu.models import config as C
    from editanything_tpu.models.controlnet import init_controlnet

    usec = _section(sd, _PREFIXES["unet"])
    if not usec:
        raise ValueError("checkpoint has no model.diffusion_model section")
    # derive the UNet config pieces the control branch needs
    L = _detect_layers_per_block(usec.keys()) or 2
    block_out, b = [], 0
    while f"input_blocks.{1 + b * (L + 1)}.0.out_layers.3.weight" in usec:
        block_out.append(
            usec[f"input_blocks.{1 + b * (L + 1)}.0.out_layers.3.weight"]
            .shape[0])
        b += 1
    ctx = None
    for k, v in usec.items():
        if k.endswith("attn2.to_k.weight"):
            ctx = np.asarray(v).shape[1]
            break
    n = len(block_out)
    ucfg = C.UNetConfig(
        in_channels=usec["input_blocks.0.0.weight"].shape[1],
        block_out_channels=tuple(block_out), layers_per_block=L,
        cross_attention_dim=ctx or 768,
        attention_head_dim=tuple(max(1, c // 64) for c in block_out),
        down_block_types=tuple(["CrossAttnDownBlock2D"] * (n - 1)
                               + ["DownBlock2D"]),
        up_block_types=tuple(["UpBlock2D"]
                             + ["CrossAttnUpBlock2D"] * (n - 1)))
    cn_cfg = C.ControlNetConfig(unet=ucfg,
                                conditioning_channels=hint_channels)
    scratch = init_controlnet(jax.random.PRNGKey(seed), cn_cfg, jnp.float32)
    scratch_sd = diffusers_controlnet_to_ldm(
        tree_to_diffusers(scratch), layers_per_block=L)

    out = dict(sd)
    copied, added = 0, []
    for k, v in scratch_sd.items():
        src = "model.diffusion_model." + k
        if src in sd:
            out["control_model." + k] = sd[src]
            copied += 1
        else:
            out["control_model." + k] = np.asarray(v)
            added.append(k)
    return out


def transfer_control(base_sd: Mapping[str, np.ndarray],
                     base_with_control_sd: Mapping[str, np.ndarray],
                     new_base_sd: Mapping[str, np.ndarray]
                     ) -> Dict[str, np.ndarray]:
    """Offset-transfer a trained control to another base model:
    new = control + (new_base - base) per key, first/cond stages taken from
    the new base (tool_transfer_control.py:35-58 exactly)."""
    out: Dict[str, np.ndarray] = {}
    for k, p in base_with_control_sd.items():
        if k.startswith(("first_stage_model", "cond_stage_model")):
            out[k] = new_base_sd[k]
            continue
        src = ("model.diffusion_" + k[len("control_"):]
               if k.startswith("control_") else k)
        if src in new_base_sd and src in base_sd:
            out[k] = (np.asarray(p, np.float64)
                      + np.asarray(new_base_sd[src], np.float64)
                      - np.asarray(base_sd[src], np.float64)
                      ).astype(np.asarray(p).dtype)
        else:
            out[k] = np.asarray(p)
    return out


def cldm_controlnet_to_diffusers_sd(sd_or_path, *, extract_ema: bool = False
                                    ) -> Dict[str, np.ndarray]:
    """Trained cldm checkpoint -> diffusers-layout ControlNet state dict
    (tools/convert_controlnet_to_diffusers.py:80-91's output format),
    ready for safetensors.numpy.save_file."""
    sd = (load_torch_state_dict(sd_or_path)
          if isinstance(sd_or_path, str) else dict(sd_or_path))
    csec = _section(sd, _PREFIXES["controlnet"])
    if not csec:
        raise ValueError("checkpoint has no control_model section")
    return {k: np.asarray(v)
            for k, v in ldm_controlnet_to_diffusers(csec).items()}
